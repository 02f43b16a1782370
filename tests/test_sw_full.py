"""Full-stats device kernel vs native emit traceback.

banded_sw_full carries match/edit/begin companions through the DP with the
same tie rules the native traceback uses (diag >= E >= F, extension wins
ties, earliest F opener), so every reported statistic must equal the
traceback's on the same (read, ref, band) problem.
"""

import numpy as np
import pytest

from megapath_nano_tpu.kernels.sw import banded_sw_full
from megapath_nano_tpu.native.banded import banded_align_batch
from megapath_nano_tpu.utils.dna import mutate, random_sequence

BAND = 128
PARAMS = dict(match=2, mismatch=4, gap_open=4, gap_extend=2)


def _run_pair_batch(reads, refs):
    n = len(reads)
    q_max = max(len(r) for r in reads)
    t_max = max(max(len(t) for t in refs), q_max)
    ra = np.full((n, q_max), 4, np.int8)
    ta = np.full((n, t_max), 5, np.int8)
    rl = np.zeros(n, np.int32)
    tl = np.zeros(n, np.int32)
    for i, (r, t) in enumerate(zip(reads, refs)):
        ra[i, : len(r)] = r
        ta[i, : len(t)] = t
        rl[i] = len(r)
        tl[i] = len(t)
    out = np.asarray(banded_sw_full(ra, rl, ta, tl, band=BAND,
                                    batch_tile=8, backend="jnp", **PARAMS))
    return out


@pytest.mark.parametrize("err", [0.0, 0.05, 0.12])
def test_full_stats_match_native_emit(err):
    rng = np.random.default_rng(42)
    reads, refs = [], []
    for _ in range(24):
        t = random_sequence(rng, int(rng.integers(150, 500)))
        r = mutate(rng, t, sub_rate=err / 2, ins_rate=err / 4,
                   del_rate=err / 4)
        reads.append(r)
        refs.append(t)
    dev = _run_pair_batch(reads, refs)
    host = banded_align_batch(reads, refs, band=BAND, **PARAMS)
    for i, a in enumerate(host):
        s, ei, ej, nm, ne, bi, bj = (int(x) for x in dev[i])
        assert s == a.score, (i, s, a.score)
        if a.score <= 0:
            continue
        assert (ei, ej) == (a.read_end, a.ref_end), (i, ei, ej, a)
        assert (bi, bj) == (a.read_begin, a.ref_begin), (i, bi, bj, a)
        assert nm == a.n_match, (i, nm, a.n_match, a.cigar_string)
        assert ne == a.edit_dist, (i, ne, a.edit_dist, a.cigar_string)


def test_full_stats_partial_overlap():
    # read hangs off both ends of the target: local alignment must trim
    rng = np.random.default_rng(7)
    core = random_sequence(rng, 300)
    read = np.concatenate([random_sequence(rng, 40), core,
                           random_sequence(rng, 40)])
    dev = _run_pair_batch([read], [core])
    host = banded_align_batch([read], [core], band=BAND, **PARAMS)[0]
    s, ei, ej, nm, ne, bi, bj = (int(x) for x in dev[0])
    assert s == host.score and s >= 2 * 290
    assert (bi, ei, bj, ej) == (host.read_begin, host.read_end,
                                host.ref_begin, host.ref_end)
    assert nm == host.n_match and ne == host.edit_dist


def test_full_stats_no_alignment():
    rng = np.random.default_rng(3)
    # disjoint alphabets can't happen, so use score<=0 via tiny sequences
    read = np.zeros(4, np.int8)        # AAAA
    ref = np.full(4, 3, np.int8)       # TTTT
    dev = _run_pair_batch([read], [ref])
    assert int(dev[0][0]) == 0
