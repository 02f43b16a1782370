"""Pallas banded SW kernel: correctness vs scalar band reference and vs the
native SSW parity core (when the optimum stays in-band)."""

import numpy as np
import pytest

from megapath_nano_tpu.kernels.sw import banded_sw_reference, banded_sw_scores
from megapath_nano_tpu.native.ssw import ssw_align
from megapath_nano_tpu.utils.dna import mutate, random_sequence

PARAMS = dict(match=2, mismatch=4, gap_open=4, gap_extend=2)


def _pad_batch(reads, refs, q_max, t_max):
    n = len(reads)
    r = np.full((n, q_max), 4, np.int8)
    t = np.full((n, t_max), 5, np.int8)
    rl = np.zeros(n, np.int32)
    tl = np.zeros(n, np.int32)
    for i, (a, b) in enumerate(zip(reads, refs)):
        r[i, : len(a)] = a
        t[i, : len(b)] = b
        rl[i] = len(a)
        tl[i] = len(b)
    return r, rl, t, tl


def test_kernel_matches_scalar_band_reference():
    rng = np.random.default_rng(42)
    reads, refs = [], []
    for _ in range(16):
        ref = random_sequence(rng, 400)
        start = int(rng.integers(0, 180))
        read = mutate(rng, ref[start: start + 200], sub_rate=0.08,
                      ins_rate=0.04, del_rate=0.04)
        reads.append(read)
        refs.append(ref)
    r, rl, t, tl = _pad_batch(reads, refs, 256, 512)
    scores, end_i, end_j = banded_sw_scores(
        r, rl, t, tl, band=128, batch_tile=8, backend="jnp", **PARAMS)
    scores, end_i, end_j = map(np.asarray, (scores, end_i, end_j))
    for i, (read, ref) in enumerate(zip(reads, refs)):
        exp_score, exp_i, exp_j = banded_sw_reference(read, ref, band=128,
                                                      **PARAMS)
        assert scores[i] == exp_score, f"case {i}"
        assert end_i[i] == exp_i and end_j[i] == exp_j, f"case {i} ends"


def test_kernel_matches_ssw_when_in_band():
    """Near-diagonal alignments: banded kernel == unbanded SSW score."""
    rng = np.random.default_rng(3)
    reads, refs = [], []
    for _ in range(12):
        ref = random_sequence(rng, 300)
        # read starts near ref start so the optimum hugs the diagonal
        read = mutate(rng, ref[: 250], sub_rate=0.05, ins_rate=0.02,
                      del_rate=0.02)
        reads.append(read)
        refs.append(ref)
    r, rl, t, tl = _pad_batch(reads, refs, 384, 384)
    scores, _, _ = banded_sw_scores(
        r, rl, t, tl, band=128, batch_tile=8, backend="jnp", **PARAMS)
    scores = np.asarray(scores)
    for i, (read, ref) in enumerate(zip(reads, refs)):
        exact = ssw_align(read, ref, match=PARAMS["match"],
                          mismatch=PARAMS["mismatch"],
                          gap_open=PARAMS["gap_open"],
                          gap_extend=PARAMS["gap_extend"],
                          want_cigar=False)
        assert scores[i] == exact.score1, f"case {i}"


def test_kernel_handles_empty_and_all_n():
    reads = [np.zeros(0, np.int8), np.full(50, 4, np.int8)]
    refs = [np.zeros(0, np.int8), random_sequence(np.random.default_rng(0), 100)]
    r, rl, t, tl = _pad_batch(reads, refs, 128, 128)
    scores, _, _ = banded_sw_scores(r, rl, t, tl, band=128, batch_tile=8,
                                    backend="jnp", **PARAMS)
    assert np.asarray(scores).tolist() == [0, 0]
