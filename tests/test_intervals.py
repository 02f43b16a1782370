"""Interval algebra property tests vs brute-force coverage arrays."""

import numpy as np
import pytest

from megapath_nano_tpu.taxon.intervals import (covered_bp_by_assembly,
                                               depth_segments, intersect_bed,
                                               make_bed, merge_bed,
                                               overlap_bp, subtract_bed)


def _random_bed(rng, n, n_keys=3, span=1000):
    aid = rng.integers(0, n_keys, n).astype(np.int32)
    sid = rng.integers(0, 2, n).astype(np.int32)
    start = rng.integers(0, span, n)
    length = rng.integers(1, 80, n)
    return make_bed(aid, sid, start, start + length)


def _dense(bed, aid, sid, span=2000):
    cov = np.zeros(span, np.int64)
    sel = bed[(bed["assembly_id"] == aid) & (bed["sequence_id"] == sid)]
    for row in sel:
        cov[row["start"]: row["end"]] += 1
    return cov


@pytest.mark.parametrize("seed", range(5))
def test_merge_matches_dense(seed):
    rng = np.random.default_rng(seed)
    bed = _random_bed(rng, 200)
    merged = merge_bed(bed)
    for aid in range(3):
        for sid in range(2):
            dense = _dense(bed, aid, sid) > 0
            mdense = _dense(merged, aid, sid) > 0
            assert np.array_equal(dense, mdense), (seed, aid, sid)
    # merged intervals are disjoint and sorted per key
    for aid in range(3):
        for sid in range(2):
            sel = merged[(merged["assembly_id"] == aid)
                         & (merged["sequence_id"] == sid)]
            assert (sel["start"][1:] > sel["end"][:-1]).all()


@pytest.mark.parametrize("seed", range(5))
def test_depth_matches_dense(seed):
    rng = np.random.default_rng(seed)
    bed = _random_bed(rng, 150)
    segs = depth_segments(bed)
    for aid in range(3):
        for sid in range(2):
            dense = _dense(bed, aid, sid)
            got = np.zeros_like(dense)
            sel = segs[(segs["assembly_id"] == aid)
                       & (segs["sequence_id"] == sid)]
            for row in sel:
                got[row["start"]: row["end"]] = row["depth"]
            assert np.array_equal(dense, got), (seed, aid, sid)


@pytest.mark.parametrize("seed", range(5))
def test_subtract_intersect_overlap(seed):
    rng = np.random.default_rng(seed)
    a = _random_bed(rng, 100)
    b = _random_bed(rng, 100)
    sub = subtract_bed(a, b)
    inter = intersect_bed(a, b)
    for aid in range(3):
        for sid in range(2):
            da = _dense(a, aid, sid) > 0
            db = _dense(b, aid, sid) > 0
            assert np.array_equal(_dense(sub, aid, sid) > 0, da & ~db)
            assert np.array_equal(_dense(inter, aid, sid) > 0, da & db)
    # overlap_bp per query interval
    ov = overlap_bp(a, b)
    for i, row in enumerate(a):
        db = _dense(b, row["assembly_id"], row["sequence_id"]) > 0
        exp = int(db[row["start"]: row["end"]].sum())
        assert ov[i] == exp, i


def test_covered_bp():
    bed = make_bed(np.array([0, 0, 1], np.int32), np.array([0, 0, 0], np.int32),
                   np.array([10, 20, 5]), np.array([30, 40, 15]))
    cov = covered_bp_by_assembly(bed)
    assert cov == {0: 30, 1: 10}


def test_empty_inputs():
    empty = make_bed(np.zeros(0, np.int32), np.zeros(0, np.int32),
                     np.zeros(0, np.int64), np.zeros(0, np.int64))
    assert len(merge_bed(empty)) == 0
    assert len(depth_segments(empty)) == 0
    assert len(subtract_bed(empty, empty)) == 0
    a = make_bed(np.array([0], np.int32), np.array([0], np.int32),
                 np.array([0]), np.array([10]))
    assert overlap_bp(a, empty).tolist() == [0]
    assert np.array_equal(subtract_bed(a, empty), a)
