"""SSW parity: our native scalar aligner vs the reference libssw oracle.

Fixtures in tests/golden/ssw_golden.json were produced by running the
reference's compiled ssw.c (see gen_ssw_golden.py); this is BASELINE config 1
("libssw score/CIGAR parity").
"""

import json
import os

import numpy as np
import pytest

from megapath_nano_tpu.native.ssw import ssw_align

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ssw_golden.json")

with open(GOLDEN) as f:
    FIXTURES = json.load(f)


@pytest.mark.parametrize("case_idx", range(len(FIXTURES)))
def test_ssw_matches_reference(case_idx):
    fx = FIXTURES[case_idx]
    read = np.array(fx["read"], dtype=np.int8)
    ref = np.array(fx["ref"], dtype=np.int8)
    p = fx["params"]
    got = ssw_align(
        read, ref,
        match=p["match"], mismatch=p["mismatch"],
        gap_open=p["gap_open"], gap_extend=p["gap_extend"],
        mask_len=fx["mask_len"],
    )
    exp = fx["expected"]
    assert got.score1 == exp["score1"], f"score1 mismatch in case {case_idx}"
    assert got.score2 == exp["score2"], f"score2 mismatch in case {case_idx}"
    assert got.ref_end == exp["ref_end1"]
    assert got.read_end == exp["read_end1"]
    assert got.ref_begin == exp["ref_begin1"]
    assert got.read_begin == exp["read_begin1"]
    assert got.ref_end2 == exp["ref_end2"]
    got_cigar = [(l << 4) | "MIDNSHP=X".index(op) for l, op in got.cigar]
    assert got_cigar == exp["cigar"], (
        f"CIGAR mismatch in case {case_idx}: {got.cigar_string}"
    )


def test_simple_exact_match():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, size=500, dtype=np.int8)
    read = ref[100:200].copy()
    a = ssw_align(read, ref, match=2, mismatch=2, gap_open=3, gap_extend=1)
    assert a.score1 == 200
    assert a.ref_begin == 100 and a.ref_end == 199
    assert a.read_begin == 0 and a.read_end == 99
    assert a.cigar_string == "100M"


def test_batch_agrees_with_single():
    rng = np.random.default_rng(1)
    reads, refs = [], []
    for _ in range(20):
        ref = rng.integers(0, 4, size=300, dtype=np.int8)
        read = ref[50:150].copy()
        read[::17] = (read[::17] + 1) % 4
        reads.append(read)
        refs.append(ref)
    from megapath_nano_tpu.native.ssw import ssw_align_batch

    batch = ssw_align_batch(reads, refs, match=2, mismatch=2, gap_open=3,
                            gap_extend=1, mask_len=50)
    for read, ref, got in zip(reads, refs, batch):
        single = ssw_align(read, ref, match=2, mismatch=2, gap_open=3,
                           gap_extend=1, mask_len=50)
        assert got.score1 == single.score1
        assert got.cigar == single.cigar
