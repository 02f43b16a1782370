"""Taxdump parsing + assembly-taxonomy derivation (genAssemblyMetadata
parity: species from rank walk, genus = parent-of-species with its rank
height, clade treated as no-rank)."""

import subprocess
import sys

import numpy as np

from megapath_nano_tpu.db.taxdump import (GENUS_HEIGHT, Taxonomy,
                                          parse_assembly_summary)

NODES = """\
1\t|\t1\t|\tno rank\t|
2\t|\t1\t|\tsuperkingdom\t|
561\t|\t2\t|\tgenus\t|
562\t|\t561\t|\tspecies\t|
83333\t|\t562\t|\tstrain\t|
570\t|\t2\t|\tclade\t|
573\t|\t570\t|\tspecies\t|
"""
NAMES = """\
1\t|\troot\t|\t\t|\tscientific name\t|
2\t|\tBacteria\t|\t\t|\tscientific name\t|
561\t|\tEscherichia\t|\t\t|\tscientific name\t|
562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|
562\t|\tE. coli\t|\t\t|\tcommon name\t|
573\t|\tKlebsiella pneumoniae\t|\t\t|\tscientific name\t|
"""
SUMMARY = """\
#   See ftp://ftp.ncbi.nlm.nih.gov/genomes/README_assembly_summary.txt
# assembly_accession\tbioproject\ttaxid\tspecies_taxid\torganism_name\tftp_path
GCF_E\tPRJ1\t83333\t562\tEscherichia coli\tftp://x/GCF_E
GCF_K\tPRJ2\t573\t573\tKlebsiella pneumoniae\tftp://x/GCF_K
"""


def _write_dump(tmp_path):
    (tmp_path / "nodes.dmp").write_text(NODES)
    (tmp_path / "names.dmp").write_text(NAMES)
    return str(tmp_path)


def test_walk_species_and_genus(tmp_path):
    taxo = Taxonomy.load(_write_dump(tmp_path))
    # strain 83333 -> species 562, genus = parent(562) = 561 (rank genus)
    tid, sp, gp, h = taxo.assembly_tax_row(83333)
    assert (tid, sp, gp, h) == (83333, 562, 561, GENUS_HEIGHT)
    assert taxo.name_of(562) == "Escherichia coli"   # scientific only
    # species whose parent is a clade: height falls back to no-rank (35)
    tid, sp, gp, h = taxo.assembly_tax_row(573)
    assert (sp, gp, h) == (573, 570, 35)


def test_assembly_summary_parse(tmp_path):
    p = tmp_path / "assembly_summary.txt"
    p.write_text(SUMMARY)
    rows = parse_assembly_summary(str(p))
    expect = {"accession": "GCF_E", "tax_id": 83333,
              "species_tax_id": 562,
              "organism_name": "Escherichia coli"}
    assert {k: rows[0][k] for k in expect} == expect
    assert rows[1]["accession"] == "GCF_K"


def test_build_db_with_taxdump(tmp_path):
    from megapath_nano_tpu.db.refdb import RefDB
    from megapath_nano_tpu.utils.dna import decode, random_sequence

    _write_dump(tmp_path)
    (tmp_path / "assembly_summary.txt").write_text(SUMMARY)
    rng = np.random.default_rng(0)
    for acc in ("GCF_E", "GCF_K"):
        seq = decode(random_sequence(rng, 3000))
        (tmp_path / f"{acc}.fna").write_text(f">{acc}_chr1\n{seq}\n")
    out = str(tmp_path / "db")
    rc = subprocess.run(
        [sys.executable, "-m", "megapath_nano_tpu.cli.build_db", "ref",
         "--fasta", str(tmp_path / "GCF_E.fna"),
         "--fasta", str(tmp_path / "GCF_K.fna"),
         "--assembly_name", "GCF_E", "--assembly_name", "GCF_K",
         "--taxdump", str(tmp_path),
         "--assembly_summary", str(tmp_path / "assembly_summary.txt"),
         "--out", out],
        capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr
    db = RefDB.load(out)
    i = {db.assembly_names[i]: i for i in range(2)}["GCF_E"]
    assert int(db.assembly_tax[i, 0]) == 83333
    assert int(db.assembly_tax[i, 1]) == 562
    assert int(db.assembly_tax[i, 2]) == 561
    assert db.tax_names[562] == "Escherichia coli"
