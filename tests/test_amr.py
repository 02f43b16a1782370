"""AMR module: consensus reconstruction + resistance gene detection on a
synthetic genome carrying known AMR genes."""

import numpy as np

from megapath_nano_tpu.align.pipeline import AlignParams
from megapath_nano_tpu.amr.consensus import consensus_contigs
from megapath_nano_tpu.amr.db import AMRGeneDB, canonical_drug
from megapath_nano_tpu.amr.module import run_amr
from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.taxon.profiler import ProfileOptions, TaxonProfiler
from megapath_nano_tpu.utils.dna import mutate, random_sequence, revcomp


def _world(seed=0):
    rng = np.random.default_rng(seed)
    # two AMR genes embedded in a genome
    gene_blaTEM = random_sequence(rng, 900)
    gene_vanA = random_sequence(rng, 1100)
    other_gene = random_sequence(rng, 800)   # in DB, NOT in genome
    backbone = random_sequence(rng, 20000)
    genome = np.concatenate([
        backbone[:6000], gene_blaTEM, backbone[6000:14000], gene_vanA,
        backbone[14000:]])
    db1 = AMRGeneDB("resfinder", ["blaTEM-1", "vanA", "mecA"],
                    [gene_blaTEM, gene_vanA, other_gene],
                    [["ampicillin"], ["vancomycin"], ["methicillin"]])
    db2 = AMRGeneDB("card", ["TEM-1"], [gene_blaTEM],
                    [["ampicillin", "penicillins"]])
    return rng, genome, [db1, db2]


def test_amr_end_to_end():
    rng, genome, dbs = _world()
    refdb = RefDB.build([genome], ["chr1"], [0], ["asm1"],
                        [(1, 1, 1)], {1: "Bug one"})
    reads = []
    for _ in range(120):
        s = int(rng.integers(0, len(genome) - 900))
        r = mutate(rng, genome[s: s + 900], sub_rate=0.03, ins_rate=0.015,
                   del_rate=0.015)
        if rng.integers(0, 2):
            r = revcomp(r)
        reads.append(r)
    prof = TaxonProfiler(refdb, ProfileOptions(align=AlignParams(backend="jnp")))
    res = prof.profile(reads)

    amr = run_amr(res.best, reads, {0: genome}, dbs, backend="jnp")
    assert len(amr.contigs) > 0
    rf_genes = {h.gene for h in amr.hits_by_db["resfinder"]}
    assert "blaTEM-1" in rf_genes
    assert "vanA" in rf_genes
    assert "mecA" not in rf_genes          # absent gene must not be called
    card_genes = {h.gene for h in amr.hits_by_db["card"]}
    assert "TEM-1" in card_genes
    # merged per-drug table
    assert "AMPICILLIN" in amr.merged
    assert "VANCOMYCIN" in amr.merged
    assert "METHICILLIN" not in amr.merged
    assert set(amr.merged["AMPICILLIN"]) == {"resfinder", "card"}
    # identity of called genes is high (low-error consensus)
    for h in amr.hits_by_db["resfinder"]:
        assert h.identity > 0.95
        assert h.gene_coverage > 0.9


def test_consensus_corrects_read_errors(tmp_path):
    rng = np.random.default_rng(4)
    genome = random_sequence(rng, 5000)
    refdb = RefDB.build([genome], ["c"], [0], ["a"], [(1, 1, 1)])
    reads = [mutate(rng, genome[500:4500], sub_rate=0.04, ins_rate=0.02,
                    del_rate=0.02) for _ in range(40)]
    prof = TaxonProfiler(refdb, ProfileOptions(align=AlignParams(backend="jnp")))
    res = prof.profile(reads)
    contigs = consensus_contigs(res.best, reads, 0, genome)
    assert contigs
    big = max(contigs, key=lambda c: len(c.seq))
    # (indels shift coordinates; compare via identity of an alignment)
    from megapath_nano_tpu.native.banded import banded_align_batch

    window = genome[max(big.start - 64, 0): big.start + len(big.seq) + 64]
    a = banded_align_batch([big.seq], [window], band=256)[0]
    ident = a.n_match / max(a.n_match + a.n_mismatch + a.n_ins + a.n_del, 1)
    assert ident > 0.995, ident
    assert len(big.seq) > 3500


def test_canonical_drug():
    # operation-exact to the reference's remove_endswith + canonicalize
    # (megapath_nano_amr.py:99-107): strip 's', strip ' antibiotic',
    # drop dashes, uppercase
    assert canonical_drug("ampicillins") == "AMPICILLIN"
    assert canonical_drug("beta-lactam antibiotics") == "BETALACTAM"
    assert canonical_drug("Vancomycin") == "VANCOMYCIN"
    assert canonical_drug("aminoglycosides") == "AMINOGLYCOSIDE"


def test_header_parsers():
    from megapath_nano_tpu.amr.db import (parse_card_header,
                                          parse_megares_header,
                                          parse_resfinder_header)
    g, d, a = parse_card_header(
        "gb|GQ343019.1|+|132-1023|ARO:3002999|CblA-1 "
        "[Bacteroides uniformis CL03T12C37]")
    assert (g, a) == ("CblA-1", "GQ343019.1")
    g, d, a = parse_megares_header(
        "MEG_1|Drugs|Aminoglycosides|"
        "Aminoglycoside-resistant_16S_ribosomal_subunit_protein|A16S")
    assert g == "A16S" and d == ["AMINOGLYCOSIDES"] and a == "MEG_1"
    g, d, a = parse_resfinder_header("blaTEM-1B_1_AY458016")
    assert g == "blaTEM-1B_1" and a == "AY458016"


def test_orf_finder_translate_roundtrip():
    from megapath_nano_tpu.amr.orf import (aa_from_str, aa_to_str,
                                           find_orfs, translate)
    from megapath_nano_tpu.utils.dna import encode, revcomp

    # ATG AAA CGT ... TAA on the forward strand
    prot = "MKRLLATGWYV" * 12
    codon_of = {"M": "ATG", "K": "AAA", "R": "CGT", "L": "CTG", "A": "GCT",
                "T": "ACT", "G": "GGT", "W": "TGG", "Y": "TAT", "V": "GTT"}
    dna = "".join(codon_of[c] for c in prot) + "TAA"
    seq = encode(dna)
    assert aa_to_str(translate(seq)) == prot + "*"
    pad = encode("CCCCC")
    contig = np.concatenate([pad, seq, pad])
    orfs = find_orfs(contig, min_aa=50)
    assert orfs, "ORF not found"
    # the repeat protein is stop-free in shifted frames too, so assert the
    # exact ORF is AMONG the candidates (all 6 frames are scanned)
    assert any(aa_to_str(o.aa) == prot for o in orfs)
    # reverse strand too
    orfs_rc = find_orfs(revcomp(contig), min_aa=50)
    assert any(aa_to_str(o.aa) == prot for o in orfs_rc)


def test_protein_scan_and_hydrolytic_profile():
    from megapath_nano_tpu.amr.orf import ORF, aa_from_str
    from megapath_nano_tpu.amr.protein import (ProteinDB,
                                               hydrolytic_profiles,
                                               scan_orfs, sw_protein)

    rng = np.random.default_rng(7)
    aas = "ARNDCQEGHILKMFPSTWYV"
    prot = "M" + "".join(rng.choice(list(aas), 150))
    # exact self-alignment: 100% identity
    a = aa_from_str(prot)
    score, qb, qe, tb, te, ident, alen = sw_protein(a, a)
    assert ident == alen == len(prot) and score > 400
    pdb = ProteinDB.from_records("cbmar", [
        ("blaX", prot, "P00811", "cephalosporinase (class C)"),
        ("blaY", "".join(rng.choice(list(aas), 140)), "P12345",
         "penicillinase"),
    ])
    orf = ORF(start=0, end=3 * len(prot), strand=0, frame=0, aa=a)
    hits = scan_orfs([orf], pdb, min_identity=90.0,
                     min_query_coverage=60.0)
    assert len(hits) == 1 and hits[0].protein == "blaX"
    assert hits[0].identity == 100.0
    assert hydrolytic_profiles(hits) == ["cephalosporinase (class C)"]


def test_protein_scan_tolerates_mutations():
    from megapath_nano_tpu.amr.orf import ORF, aa_from_str
    from megapath_nano_tpu.amr.protein import ProteinDB, scan_orfs

    rng = np.random.default_rng(11)
    aas = "ARNDCQEGHILKMFPSTWYV"
    prot = list("M" + "".join(rng.choice(list(aas), 150)))
    query = prot.copy()
    for i in rng.choice(len(query), 6, replace=False):   # ~96% identity
        query[int(i)] = aas[int(rng.integers(0, 20))]
    pdb = ProteinDB.from_records(
        "cbmar", [("blaZ", "".join(prot), "P1", "carbapenemase")])
    orf = ORF(0, 453, 0, 0, aa_from_str("".join(query)))
    hits = scan_orfs([orf], pdb, min_identity=90.0, min_query_coverage=60.0)
    assert len(hits) == 1 and 90.0 <= hits[0].identity < 100.0


def test_amrfinder_taxon_gating():
    from megapath_nano_tpu.amr.consensus import ConsensusContig
    from megapath_nano_tpu.amr.scan import scan_contigs
    from megapath_nano_tpu.utils.dna import random_sequence

    rng = np.random.default_rng(13)
    gene = random_sequence(rng, 1200)
    db = AMRGeneDB("amrfinder", ["pointmut_X"], [gene.copy()],
                   [["ciprofloxacin"]], accessions=["WP_1"],
                   taxa=["Escherichia"])
    contig = ConsensusContig(sequence_id=0, start=0, seq=np.concatenate(
        [random_sequence(rng, 300), gene, random_sequence(rng, 300)]))
    # no organism -> taxon-restricted gene suppressed
    assert scan_contigs([contig], db) == []
    # matching organism -> reported
    hits = scan_contigs([contig], db, organism="Escherichia coli")
    assert len(hits) == 1 and hits[0].accession == "WP_1"
    # non-matching organism -> suppressed
    assert scan_contigs([contig], db, organism="Klebsiella pneumoniae") == []


def test_results_csv_reference_columns(tmp_path):
    from megapath_nano_tpu.amr.report import merge_results, write_results_csv
    from megapath_nano_tpu.amr.scan import AMRHit

    hits_by_db = {
        "card": [AMRHit("card", "CblA-1", 0, 0.97, 0.9, 500, 0,
                        ["beta-lactam antibiotics"], "GQ343019.1")],
        "resfinder": [AMRHit("resfinder", "blaTEM-1B_1", 0, 0.99, 0.95,
                             600, 0, ["ampicillins"], "AY458016"),
                      AMRHit("resfinder", "blaTEM-2", 1, 0.95, 0.9,
                             550, 0, ["ampicillins"], "AY458017")],
    }
    merged = merge_results(hits_by_db)
    assert "BETALACTAM" in merged and "AMPICILLIN" in merged
    cell = merged["AMPICILLIN"]["resfinder"]
    assert cell["acc_id"] == "AY458016:AY458017"
    assert cell["genes"] == "blaTEM-1B_1[99.00];blaTEM-2[95.00]"
    path = tmp_path / "results.csv"
    write_results_csv(str(path), merged, ["card", "resfinder"])
    lines = open(path).read().strip().split("\n")
    assert lines[0] == ("antibiotic,card_acc_id,card_gene[idscore],"
                       "resfinder_acc_id,resfinder_gene[idscore]")
    amp = [l for l in lines if l.startswith("AMPICILLIN")][0]
    assert "AY458016:AY458017" in amp
