"""Taxon core: abundance formulas and abundance-weighted best alignment."""

import numpy as np

from megapath_nano_tpu.align.records import ALIGN_DTYPE, AlignList
from megapath_nano_tpu.taxon.abundance import (AssemblyInfo,
                                               align_stat_by_assembly)
from megapath_nano_tpu.taxon.best_align import best_align_list
from megapath_nano_tpu.taxon.intervals import make_bed


def _mk(rows):
    """rows: (read_id, read_len, seq_id, seq_from, seq_to, match, score, asm)"""
    d = np.zeros(len(rows), ALIGN_DTYPE)
    for i, (rid, rlen, sid, sf, st, match, score, asm) in enumerate(rows):
        d[i]["read_id"] = rid
        d[i]["read_length"] = rlen
        d[i]["read_from"] = 0
        d[i]["read_to"] = rlen
        d[i]["sequence_id"] = sid
        d[i]["sequence_length"] = 10000
        d[i]["sequence_from"] = sf
        d[i]["sequence_to"] = st
        d[i]["match"] = match
        d[i]["edit_dist"] = (st - sf) - match
        d[i]["alignment_score"] = score
        d[i]["assembly_id"] = asm
    return AlignList(d, ["s0", "s1"], ["a0", "a1"], [])


def test_align_stat_formulas():
    al = _mk([
        (0, 1000, 0, 0, 500, 450, 900, 0),
        (1, 800, 0, 400, 900, 480, 950, 0),   # overlaps read0's span
        (2, 600, 1, 0, 300, 290, 580, 1),
    ])
    info = AssemblyInfo.from_lengths([2000, 1000])
    stat = align_stat_by_assembly(al, info)
    s0 = stat[stat["assembly_id"] == 0][0]
    assert s0["total_number_of_read"] == 2
    assert s0["total_aligned_bp"] == 1000
    assert s0["covered_bp"] == 900          # [0,500)+[400,900) merged
    assert abs(s0["average_depth"] - 0.5) < 1e-12
    assert abs(s0["covered_percent"] - 0.45) < 1e-12
    assert abs(s0["average_identity"] - 0.93) < 1e-12
    # no noise: adjusted_average_depth = covered% * aligned/len
    assert abs(s0["adjusted_average_depth"] - 0.45 * 0.5) < 1e-12
    assert s0["adjusted_total_aligned_bp"] == round(0.45 * 0.5 * 2000)


def test_align_stat_with_noise():
    al = _mk([(0, 1000, 0, 0, 500, 450, 900, 0)])
    info = AssemblyInfo.from_lengths([2000])
    noise = make_bed(np.array([0], np.int32), np.array([0], np.int32),
                     np.array([0]), np.array([250]))
    stat = align_stat_by_assembly(al, info, noise)
    s = stat[0]
    assert s["noise_span_bp"] == 250
    assert s["covered_bp"] == 250          # [250,500) survives
    adj_cov = 250 / (2000 - 250)
    adj_depth = adj_cov * 500 / (2000 - 250)
    assert abs(s["adjusted_covered_percent"] - adj_cov) < 1e-12
    assert abs(s["adjusted_average_depth"] - adj_depth) < 1e-12


def test_best_align_unique_reads():
    al = _mk([
        (0, 500, 0, 0, 400, 380, 800, 0),
        (0, 500, 1, 0, 400, 300, 600, 1),    # lower score -> dropped
        (1, 500, 1, 100, 480, 370, 760, 1),
    ])
    info = AssemblyInfo.from_lengths([2000, 1000])
    best = best_align_list(al, info)
    assert len(best) == 2
    by_read = {int(r["read_id"]): r for r in best.data}
    assert by_read[0]["assembly_id"] == 0
    assert by_read[1]["assembly_id"] == 1


def test_best_align_ties_follow_abundance():
    rows = []
    # assembly 0 gets 20 unique reads (high abundance), assembly 1 none
    for r in range(20):
        rows.append((r, 500, 0, r * 400, r * 400 + 400, 390, 800, 0))
    # 30 tied reads hitting both assemblies with equal scores
    for r in range(20, 50):
        rows.append((r, 500, 0, 0, 400, 390, 700, 0))
        rows.append((r, 500, 1, 0, 400, 390, 700, 1))
    al = _mk(rows)
    info = AssemblyInfo.from_lengths([10000, 10000])
    best = best_align_list(al, info)
    tied = best.data[best.data["read_id"] >= 20]
    assert len(tied) == 30
    frac_a0 = (tied["assembly_id"] == 0).mean()
    # abundance weighting: overwhelming majority should go to assembly 0
    assert frac_a0 > 0.8
    # determinism
    best2 = best_align_list(al, info)
    assert np.array_equal(best.data, best2.data)
