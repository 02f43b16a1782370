"""dBG haplotype builder + haplotype realignment."""

import numpy as np

from megapath_nano_tpu.utils.dna import decode, mutate, random_sequence
from megapath_nano_tpu.variant.haplotype import (build_haplotypes,
                                                 realign_to_haplotypes)


def test_haplotypes_include_variant_path():
    rng = np.random.default_rng(0)
    ref = random_sequence(rng, 300)
    donor = ref.copy()
    donor[150] = (donor[150] + 1) % 4       # SNV
    # clean reads covering the whole window from the donor haplotype
    reads = [donor.copy() for _ in range(8)]
    haps = build_haplotypes(ref, reads, min_edge_weight=2)
    assert haps, "no haplotypes built"
    hap_strs = {decode(h) for h in haps}
    assert decode(donor) in hap_strs        # variant haplotype present
    # reference path also present (its edges are protected from pruning)
    assert decode(ref) in hap_strs


def test_low_weight_errors_pruned():
    rng = np.random.default_rng(1)
    ref = random_sequence(rng, 300)
    reads = [ref.copy() for _ in range(8)]
    bad = ref.copy()
    bad[100] = (bad[100] + 1) % 4           # single-read error
    reads.append(bad)
    haps = build_haplotypes(ref, reads, min_edge_weight=2)
    hap_strs = {decode(h) for h in haps}
    assert decode(ref) in hap_strs
    assert decode(bad) not in hap_strs      # weight-1 edge pruned


def test_realign_reads_through_haplotype():
    rng = np.random.default_rng(2)
    ref = random_sequence(rng, 400)
    donor = ref.copy()
    donor[200] = (donor[200] + 1) % 4
    haps = [ref.copy(), donor.copy()]
    # exact donor fragments -> fast path onto haplotype 1
    reads = [donor[50:350].copy(), ref[100:300].copy()]
    out = realign_to_haplotypes(reads, ref, haps)
    assert out[0].hap_index == 1
    assert out[0].ref_pos == 50
    assert out[0].cigar == [(300, "M")]
    assert out[1].hap_index in (0, 1)       # consistent with both before SNV?
    assert out[1].ref_pos == 100

    # read with an extra insertion -> DP fallback still placed correctly
    ins_read = np.concatenate([donor[60:200], [0, 1, 2], donor[200:340]])
    out2 = realign_to_haplotypes([ins_read.astype(np.int8)], ref, haps)
    assert out2[0].hap_index == 1
    assert abs(out2[0].ref_pos - 60) <= 3
    ops = {op for _, op in out2[0].cigar}
    assert "I" in ops and "M" in ops


def test_projection_through_indel_haplotype():
    rng = np.random.default_rng(3)
    ref = random_sequence(rng, 400)
    # haplotype with a 5bp deletion relative to ref
    hap = np.concatenate([ref[:200], ref[205:]])
    reads = [hap[100:300].copy()]
    out = realign_to_haplotypes(reads, ref, [hap])
    a = out[0]
    assert a.hap_index == 0
    assert a.ref_pos == 100
    # the deletion must appear in the projected cigar
    assert ("D" in {op for _, op in a.cigar})
    d_len = sum(l for l, op in a.cigar if op == "D")
    assert d_len == 5
    m_len = sum(l for l, op in a.cigar if op == "M")
    assert m_len == 200                      # read fully matched around it
