"""Chaining DP: jnp scan vs scalar reference; chain recovery on synthetic
colinear anchors."""

import numpy as np

from megapath_nano_tpu.align.chain import (backtrack_chain, chain_scores,
                                           chain_scores_reference)


def _run_batch(qs, ts):
    n = len(qs)
    a = max(len(q) for q in qs)
    q_arr = np.zeros((n, a), np.int32)
    t_arr = np.zeros((n, a), np.int32)
    cnt = np.zeros(n, np.int32)
    for i, (q, t) in enumerate(zip(qs, ts)):
        q_arr[i, : len(q)] = q
        t_arr[i, : len(t)] = t
        cnt[i] = len(q)
    return chain_scores(q_arr, t_arr, cnt), (q_arr, t_arr, cnt)


def test_matches_scalar_reference():
    rng = np.random.default_rng(5)
    qs, ts = [], []
    for _ in range(8):
        n_anchor = int(rng.integers(5, 60))
        # colinear anchors with jitter + noise anchors
        base_q = np.sort(rng.integers(0, 2000, n_anchor))
        t0 = int(rng.integers(0, 10000))
        base_t = base_q + t0 + rng.integers(-20, 20, n_anchor)
        order = np.argsort(base_t, kind="stable")
        qs.append(base_q[order].astype(np.int32))
        ts.append(base_t[order].astype(np.int32))
    (f, parent, best, best_idx), (q_arr, t_arr, cnt) = _run_batch(qs, ts)
    f, parent = np.asarray(f), np.asarray(parent)
    for i, (q, t) in enumerate(zip(qs, ts)):
        f_ref, p_ref = chain_scores_reference(q, t)
        assert f[i, : len(q)].tolist() == f_ref.tolist(), f"row {i} f"
        assert parent[i, : len(q)].tolist() == p_ref.tolist(), f"row {i} parent"


def test_perfect_colinear_chain():
    # anchors every 20bp along a 1000bp match: chain should cover all
    q = np.arange(15, 1000, 20, dtype=np.int32)
    t = q + 5000
    (f, parent, best, best_idx), _ = _run_batch([q], [t])
    best = int(np.asarray(best)[0])
    chain = backtrack_chain(np.asarray(parent)[0], int(np.asarray(best_idx)[0]))
    assert len(chain) == len(q)          # every anchor chained
    assert best >= 15 * len(q) - 20      # ~15 new bases per anchor, low gap cost
    assert chain.tolist() == sorted(chain.tolist())


def test_noise_anchors_not_chained():
    rng = np.random.default_rng(1)
    q = np.sort(rng.integers(0, 1000, 30)).astype(np.int32)
    t = rng.integers(0, 100000, 30).astype(np.int32)  # random diagonals
    order = np.argsort(t, kind="stable")
    (f, parent, best, best_idx), _ = _run_batch([q[order]], [t[order]])
    # no colinear structure → best chain is roughly a single seed
    assert int(np.asarray(best)[0]) <= 45
