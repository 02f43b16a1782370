"""Native banded emit aligner: score parity with exact SSW when in-band,
CIGAR/span/count self-consistency."""

import numpy as np

from megapath_nano_tpu.native.banded import banded_align_batch
from megapath_nano_tpu.native.ssw import ssw_align
from megapath_nano_tpu.utils.dna import mutate, random_sequence

PARAMS = dict(match=2, mismatch=4, gap_open=4, gap_extend=2)


def _cases(n=25, seed=0):
    rng = np.random.default_rng(seed)
    reads, refs = [], []
    for _ in range(n):
        ref = random_sequence(rng, 800)
        read = mutate(rng, ref[:600], sub_rate=0.04, ins_rate=0.02,
                      del_rate=0.02)
        reads.append(read)
        refs.append(ref)
    return reads, refs


def test_score_and_spans_match_exact_ssw():
    reads, refs = _cases()
    alns = banded_align_batch(reads, refs, band=256, **PARAMS)
    for read, ref, a in zip(reads, refs, alns):
        exact = ssw_align(read, ref, mismatch=PARAMS["mismatch"],
                          match=PARAMS["match"],
                          gap_open=PARAMS["gap_open"],
                          gap_extend=PARAMS["gap_extend"], want_cigar=False)
        assert a.score == exact.score1
        assert a.read_end == exact.read_end
        assert a.ref_end == exact.ref_end


def test_cigar_consistency():
    reads, refs = _cases(seed=3)
    alns = banded_align_batch(reads, refs, band=256, **PARAMS)
    for read, ref, a in zip(reads, refs, alns):
        q_span = a.read_end - a.read_begin + 1
        t_span = a.ref_end - a.ref_begin + 1
        m_len = sum(l for l, op in a.cigar if op == "M")
        i_len = sum(l for l, op in a.cigar if op == "I")
        d_len = sum(l for l, op in a.cigar if op == "D")
        assert m_len + i_len == q_span, a.cigar_string
        assert m_len + d_len == t_span
        assert a.n_match + a.n_mismatch == m_len
        assert a.n_ins == i_len and a.n_del == d_len
        # score recomputable from the walked path counts is >= reported?
        # (exact equality: match*M - mismatch*X - gaps)
        gap_cost = 0
        for l, op in a.cigar:
            if op in "ID":
                gap_cost += PARAMS["gap_open"] + (l - 1) * PARAMS["gap_extend"]
        walked = (PARAMS["match"] * a.n_match
                  - PARAMS["mismatch"] * a.n_mismatch - gap_cost)
        assert walked == a.score, (walked, a.score, a.cigar_string)
        # M runs truly match/mismatch the claimed bases
        qi, ti = a.read_begin, a.ref_begin
        n_eq = 0
        for l, op in a.cigar:
            if op == "M":
                n_eq += int(np.sum(read[qi:qi + l] == ref[ti:ti + l]))
                qi += l
                ti += l
            elif op == "I":
                qi += l
            else:
                ti += l
        assert n_eq == a.n_match


def test_empty_and_all_n():
    alns = banded_align_batch(
        [np.zeros(0, np.int8), np.full(60, 4, np.int8)],
        [np.zeros(0, np.int8), random_sequence(np.random.default_rng(0), 200)],
        band=128, **PARAMS)
    assert alns[0].score == 0
    assert alns[1].score == 0
    assert alns[1].cigar == []
