"""RefSeq download planner: getValidAssemble selection parity + manifest."""

import os

from megapath_nano_tpu.db.refseq_plan import (plan_downloads, plasmid_plan,
                                              select_assemblies,
                                              write_manifest)
from megapath_nano_tpu.db.taxdump import parse_assembly_summary

_HEADER = ("#assembly_accession\tbioproject\tbiosample\twgs_master\t"
           "refseq_category\ttaxid\tspecies_taxid\torganism_name\t"
           "infraspecific_name\tisolate\tversion_status\tassembly_level\t"
           "release_type\tgenome_rep\tseq_rel_date\tasm_name\tsubmitter\t"
           "gbrs_paired_asm\tpaired_asm_comp\tftp_path\t"
           "excluded_from_refseq\trelation_to_type_material\n")


def _row(acc, cat, taxid, sp, level, ftp="https://x/genomes/" ):
    f = [""] * 22
    f[0] = acc
    f[4] = cat
    f[5] = str(taxid)
    f[6] = str(sp)
    f[7] = f"org {acc}"
    f[11] = level
    f[19] = ftp + acc
    return "\t".join(f) + "\n"


def _summary(tmp_path, rows):
    p = tmp_path / "assembly_summary.txt"
    p.write_text("#comment\n" + _HEADER + "".join(rows))
    return str(p)


def test_selection_rules(tmp_path):
    rows = [
        # species 100: has a reference genome → reference + non-scaffold
        # representative + non-scaffold na are selected
        _row("A1", "reference genome", 1001, 100, "Complete Genome"),
        _row("A2", "representative genome", 1002, 100, "Complete Genome"),
        _row("A3", "representative genome", 1003, 100, "Scaffold"),
        _row("A4", "na", 1004, 100, "Chromosome"),
        _row("A5", "na", 1005, 100, "Contig"),
        # species 200: representative only → its na sibling is selected,
        # the representative itself is not (refseq_download.py:46-49 gates
        # representatives on referenceFound)
        _row("B1", "representative genome", 2001, 200, "Complete Genome"),
        _row("B2", "na", 2002, 200, "Complete Genome"),
        # species 300: na only → nothing selected
        _row("C1", "na", 3001, 300, "Complete Genome"),
    ]
    parsed = parse_assembly_summary(_summary(tmp_path, rows))
    sel = [r["accession"] for r in select_assemblies(parsed)]
    assert sel == ["A1", "A2", "A4", "B2"]


def test_plan_and_manifest(tmp_path):
    rows = [_row("GCF_1.1", "reference genome", 11, 10, "Complete Genome",
                 ftp="https://ftp.ncbi.nlm.nih.gov/genomes/all/")]
    parsed = parse_assembly_summary(_summary(tmp_path, rows))
    specs = plan_downloads(parsed)
    assert len(specs) == 1
    assert specs[0].url == ("https://ftp.ncbi.nlm.nih.gov/genomes/all/"
                            "GCF_1.1/GCF_1.1_genomic.fna.gz")
    assert specs[0].md5_url.endswith("md5checksums.txt")
    out = str(tmp_path / "plan")
    tsv, sh = write_manifest(out, {"bacteria": specs,
                                   "plasmid": plasmid_plan(2)})
    lines = open(tsv).read().splitlines()
    assert lines[0].startswith("division\taccession")
    assert len(lines) == 4           # header + 1 bacteria + 2 plasmid
    body = open(sh).read()
    assert "wget -c -P bacteria" in body and "plasmid.2.1.genomic" in body
    assert os.access(sh, os.X_OK)
