"""Multi-locus alignment selection (minimap2 -N/-p semantics).

The reference's placement stage runs minimap2 -N 50 -p 1
(megapath_nano.py:1270, lib/aligner.py:206): chimeric ONT reads and repeat
hits each get their own alignment record, including multiple loci on the
SAME sequence, and every downstream depth/spike/noise computation consumes
them. These tests pin that behavior for both the fused PAF path and the
CIGAR-emitting path, plus the select_alignments unit itself.
"""

import numpy as np
import pytest

from megapath_nano_tpu.align.pipeline import (AlignParams, MinimizerAligner,
                                              select_alignments)
from megapath_nano_tpu.index.minimizer import MinimizerIndex
from megapath_nano_tpu.utils.dna import mutate, random_sequence, revcomp


# ---------------------------------------------------------------- unit level

def test_select_single_candidate_is_primary():
    keep, mapq, sec = select_alignments(
        [0], [500], [0], [400], [0], [0], [100], [500])
    assert list(keep) == [0]
    assert not sec[0]
    assert mapq[0] > 0


def test_select_tandem_repeat_two_primaries():
    # same read, same sequence, two disjoint target loci, overlapping query:
    # -p 1 keeps the tie as a secondary; the query intervals fully overlap
    keep, mapq, sec = select_alignments(
        rid=[0, 0], score=[500, 500], q_from=[0, 0], q_to=[400, 400],
        seq=[0, 0], strand=[0, 0], t_from=[1000, 9000], t_to=[1400, 9400],
        secondary_ratio=1.0)
    assert len(keep) == 2
    assert list(sec) == [False, True]
    assert mapq[1] == 0          # secondary records get mapq 0
    assert mapq[0] <= 5          # exact tie: primary mapq collapses


def test_select_chimeric_read_two_primaries():
    # disjoint query intervals -> both primary (split read), both mapq > 0
    keep, mapq, sec = select_alignments(
        rid=[0, 0], score=[500, 450], q_from=[0, 500], q_to=[400, 900],
        seq=[0, 1], strand=[0, 0], t_from=[1000, 2000], t_to=[1400, 2400])
    assert len(keep) == 2
    assert list(sec) == [False, False]
    assert mapq[0] > 0 and mapq[1] > 0


def test_select_secondary_ratio_gate():
    # -p 1: sub-primary-score overlapping hit dropped; -p 0.8: kept
    args = dict(rid=[0, 0], score=[500, 450], q_from=[0, 10],
                q_to=[400, 390], seq=[0, 1], strand=[0, 0],
                t_from=[1000, 3000], t_to=[1400, 3380])
    keep1, _, _ = select_alignments(**args, secondary_ratio=1.0)
    assert list(keep1) == [0]
    keep2, _, sec2 = select_alignments(**args, secondary_ratio=0.8)
    assert len(keep2) == 2 and sec2[1]


def test_select_same_locus_duplicate_dropped():
    # same seq+strand, query AND target both overlapping >= 50% -> dup
    keep, _, _ = select_alignments(
        rid=[0, 0], score=[500, 480], q_from=[0, 20], q_to=[400, 420],
        seq=[0, 0], strand=[0, 0], t_from=[1000, 1030], t_to=[1400, 1420],
        secondary_ratio=0.0)
    assert list(keep) == [0]


def test_select_masked_score_lowers_primary_mapq():
    # a dropped secondary still counts as f2 for the primary's mapq
    _, mapq_alone, _ = select_alignments(
        [0], [500], [0], [400], [0], [0], [0], [400])
    _, mapq_masked, _ = select_alignments(
        rid=[0, 0], score=[500, 490], q_from=[0, 0], q_to=[400, 400],
        seq=[0, 1], strand=[0, 0], t_from=[0, 0], t_to=[400, 400],
        secondary_ratio=1.0)
    assert mapq_masked[0] < mapq_alone[0]


def test_select_max_secondary_cap():
    n = 6
    keep, _, sec = select_alignments(
        rid=[0] * n, score=[500] * n, q_from=[0] * n, q_to=[400] * n,
        seq=list(range(n)), strand=[0] * n,
        t_from=[0] * n, t_to=[400] * n,
        secondary_ratio=1.0, max_secondary=2)
    assert len(keep) == 3            # 1 primary + 2 secondaries
    assert int(np.sum(sec)) == 2


# ------------------------------------------------------------ pipeline level

def _repeat_world(seed=5):
    """One genome containing the same 3 kb cassette at two distant loci."""
    rng = np.random.default_rng(seed)
    cassette = random_sequence(rng, 3000)
    filler1 = random_sequence(rng, 4000)
    filler2 = random_sequence(rng, 6000)
    filler3 = random_sequence(rng, 4000)
    genome = np.concatenate([filler1, cassette, filler2, cassette, filler3])
    loci = [(4000, 7000), (13000, 16000)]
    index = MinimizerIndex.build([genome], ["rep_genome"])
    return rng, genome, cassette, loci, index


@pytest.mark.parametrize("emit_cigars", [False, True])
def test_repeat_read_gets_two_loci_same_sequence(emit_cigars):
    rng, genome, cassette, loci, index = _repeat_world()
    read = mutate(rng, cassette[200:2800], sub_rate=0.02,
                  ins_rate=0.01, del_rate=0.01)
    aligner = MinimizerAligner(index, params=AlignParams(backend="jnp"))
    res = aligner.map_reads([read], emit_cigars=emit_cigars)
    d = res.data
    assert len(d) == 2, f"expected 2 loci, got {len(d)}"
    assert set(d["sequence_id"]) == {0}
    froms = sorted(int(x) for x in d["sequence_from"])
    assert abs(froms[0] - 4200) < 150 and abs(froms[1] - 13200) < 150
    if emit_cigars:
        # each locus individually addressable in the cigar map
        for row in d:
            assert (int(row["read_id"]), 0,
                    int(row["sequence_from"])) in res.cigar_map
        assert (0, 0) in res.cigar_map


def test_chimeric_read_split_mapping():
    rng = np.random.default_rng(9)
    g0 = random_sequence(rng, 15000)
    g1 = random_sequence(rng, 15000)
    index = MinimizerIndex.build([g0, g1], ["gA", "gB"])
    # chimera: first 1.5 kb from g0, last 1.5 kb from g1
    read = np.concatenate([
        mutate(rng, g0[2000:3500], sub_rate=0.02, ins_rate=0.01,
               del_rate=0.01),
        mutate(rng, g1[8000:9500], sub_rate=0.02, ins_rate=0.01,
               del_rate=0.01)])
    aligner = MinimizerAligner(index, params=AlignParams(backend="jnp"))
    res = aligner.map_reads([read])
    d = res.data
    assert len(d) == 2
    assert set(int(s) for s in d["sequence_id"]) == {0, 1}
    # both parts are primaries (disjoint query intervals): nonzero mapq
    assert all(int(m) > 0 for m in d["mapq"])
    # query intervals must not overlap by more than the mask slack
    ivs = sorted((int(r["read_from"]), int(r["read_to"])) for r in d)
    assert ivs[0][1] - ivs[1][0] < 300


def test_depth_doubles_at_repeat_loci():
    """Multi-locus records must feed depth: reads from a repeated cassette
    produce coverage at BOTH copies (what the reference's depth/spike/noise
    beds see, megapath_nano.py:417-482)."""
    rng, genome, cassette, loci, index = _repeat_world(seed=11)
    reads = []
    for _ in range(12):
        s = int(rng.integers(0, 400))
        reads.append(mutate(rng, cassette[s:s + 2400], sub_rate=0.02,
                            ins_rate=0.01, del_rate=0.01))
    aligner = MinimizerAligner(index, params=AlignParams(backend="jnp"))
    res = aligner.map_reads(reads)
    d = res.data
    cov1 = np.sum((d["sequence_from"] > 3500) & (d["sequence_from"] < 7500))
    cov2 = np.sum((d["sequence_from"] > 12500) & (d["sequence_from"] < 16500))
    assert cov1 >= 10 and cov2 >= 10, (cov1, cov2)


def test_unique_read_single_record_with_positive_mapq():
    rng = np.random.default_rng(3)
    genomes = [random_sequence(rng, 20000) for _ in range(3)]
    index = MinimizerIndex.build(genomes, ["a", "b", "c"])
    read = mutate(rng, genomes[1][5000:6200], sub_rate=0.03,
                  ins_rate=0.015, del_rate=0.015)
    aligner = MinimizerAligner(index, params=AlignParams(backend="jnp"))
    res = aligner.map_reads([read])
    d = res.data
    assert len(d) == 1
    assert int(d["sequence_id"][0]) == 1 and int(d["mapq"][0]) >= 30
