"""End-to-end aligner: simulated ONT-style reads with known origins must map
back to the right sequence, strand, and position."""

import numpy as np

from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner
from megapath_nano_tpu.index.minimizer import MinimizerIndex
from megapath_nano_tpu.utils.dna import mutate, random_sequence, revcomp


def _make_world(seed=0, n_genomes=3, glen=20000):
    rng = np.random.default_rng(seed)
    genomes = [random_sequence(rng, glen) for _ in range(n_genomes)]
    index = MinimizerIndex.build(genomes,
                                 [f"genome{i}" for i in range(n_genomes)])
    return rng, genomes, index


def _simulate(rng, genomes, n_reads=60, read_len=800, err=0.08):
    reads, truth = [], []
    for _ in range(n_reads):
        g = int(rng.integers(0, len(genomes)))
        start = int(rng.integers(0, len(genomes[g]) - read_len))
        frag = genomes[g][start: start + read_len]
        read = mutate(rng, frag, sub_rate=err * 0.5, ins_rate=err * 0.25,
                      del_rate=err * 0.25)
        strand = int(rng.integers(0, 2))
        if strand:
            read = revcomp(read)
        reads.append(read)
        truth.append((g, start, start + read_len, strand))
    return reads, truth


def test_simulated_reads_map_correctly():
    rng, genomes, index = _make_world()
    reads, truth = _simulate(rng, genomes)
    aligner = MinimizerAligner(index,
                               params=AlignParams(backend="jnp"))
    result = aligner.map_reads(reads)

    # best alignment per read
    by_read = {}
    for row in result.data:
        rid = row["read_id"]
        if rid not in by_read or row["alignment_score"] > by_read[rid]["alignment_score"]:
            by_read[rid] = row

    n_correct = 0
    n_mapped = 0
    for rid, (g, start, end, strand) in enumerate(truth):
        if rid not in by_read:
            continue
        n_mapped += 1
        row = by_read[rid]
        pos_ok = (row["sequence_id"] == g
                  and abs(row["sequence_from"] - start) < 150
                  and row["strand"] == strand)
        n_correct += int(pos_ok)
    assert n_mapped >= len(truth) * 0.95, f"only {n_mapped}/{len(truth)} mapped"
    assert n_correct >= n_mapped * 0.95, (
        f"only {n_correct}/{n_mapped} mapped correctly")


def test_alignment_fields_sane():
    rng, genomes, index = _make_world(seed=7, n_genomes=2, glen=8000)
    reads, truth = _simulate(rng, genomes, n_reads=20, read_len=500, err=0.05)
    aligner = MinimizerAligner(index, params=AlignParams(backend="jnp"))
    res = aligner.map_reads(reads)
    assert len(res) > 0
    d = res.data
    assert (d["read_to"] > d["read_from"]).all()
    assert (d["sequence_to"] > d["sequence_from"]).all()
    assert (d["alignment_score"] > 0).all()
    assert (d["match"] <= d["read_to"] - d["read_from"]).all()
    # identity should be high-ish for 5% error reads
    ident = d["match"] / (d["sequence_to"] - d["sequence_from"])
    assert ident.mean() > 0.85
    assert (d["mapq"] >= 0).all() and (d["mapq"] <= 60).all()
    # tiebreakers deterministic
    res2 = aligner.map_reads(reads)
    assert np.array_equal(res.data["alignment_score_tiebreaker"],
                          res2.data["alignment_score_tiebreaker"])


def test_no_spurious_mappings():
    rng, genomes, index = _make_world(seed=3, n_genomes=2, glen=10000)
    random_reads = [random_sequence(rng, 600) for _ in range(10)]
    aligner = MinimizerAligner(index, params=AlignParams(backend="jnp"))
    res = aligner.map_reads(random_reads)
    # unrelated random reads shouldn't produce confident long alignments
    if len(res):
        assert (res.data["alignment_score"] < 100).all()


def test_paf_mode_matches_cigar_mode():
    """emit_cigars=False (device full-stats) must reproduce every align_list
    field of the traceback path, just without CIGARs."""
    rng = np.random.default_rng(11)
    genomes = [random_sequence(rng, 30000) for _ in range(3)]
    index = MinimizerIndex.build(genomes, [f"g{i}" for i in range(3)])
    aligner = MinimizerAligner(index, params=AlignParams(backend="jnp"))
    reads = []
    for _ in range(48):
        g = int(rng.integers(0, 3))
        s = int(rng.integers(0, 29000))
        read = mutate(rng, genomes[g][s: s + 800], sub_rate=0.03,
                      ins_rate=0.015, del_rate=0.015)
        if rng.integers(0, 2):
            read = revcomp(read)
        reads.append(read)
    with_cig = aligner.map_reads(reads, emit_cigars=True)
    paf = aligner.map_reads(reads, emit_cigars=False)
    assert paf.cigar_map is None
    assert with_cig.cigar_map
    assert len(paf) == len(with_cig)
    for col in ("read_id", "read_from", "read_to", "strand", "sequence_id",
                "sequence_from", "sequence_to", "match", "edit_dist",
                "alignment_score", "mapq"):
        np.testing.assert_array_equal(paf.data[col], with_cig.data[col],
                                      err_msg=col)
