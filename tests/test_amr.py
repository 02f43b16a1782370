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
    assert canonical_drug("ampicillins") == "AMPICILLIN"
    assert canonical_drug("beta-lactam antibiotics") == "BETA-LACTAM"
    assert canonical_drug("Vancomycin") == "VANCOMYCIN"
