"""Anchor chaining DP (minimap2-style), vectorized over candidate groups.

The reference delegates chaining to minimap2's chain stage (reference:
bin/lib/aligner.py:206 spawns `minimap2 -x map-ont`; chaining algorithm is
Li 2018's eq. 1-3). Here the same DP runs on-device, batched: one lane-row per
(read, target) candidate group, lax.scan over anchor index with a sliding
window of the previous W anchors — all candidates advance in lockstep, so the
scan body is pure VPU work.

Scoring (matching minimap2's defaults for map-ont):
  f[i] = max( max_{j in window} f[j] + alpha(j,i) - beta(j,i),  k )
  alpha = min(dq, dt, k)                     # new matching bases
  beta  = 0.01 * k * |dq - dt| + 0.5 * log2(max(|dq - dt|, 1))  # gap cost
  invalid j (dq <= 0, dt <= 0, dq > max_dist, dt > max_dist,
             |dq - dt| > bandwidth) are masked out.

Anchors must be sorted by target position (host side guarantees this; query
position ties broken ascending).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(2 ** 28)


@functools.partial(
    jax.jit,
    static_argnames=("window", "k", "max_dist", "bandwidth", "min_score"),
)
def chain_scores(
    q_pos: jax.Array,   # (N, A) int32 — query end positions of anchors
    t_pos: jax.Array,   # (N, A) int32 — target end positions (sorted per row)
    n_anchors: jax.Array,  # (N,) int32 — valid anchor count per row
    *,
    window: int = 32,
    k: int = 15,
    max_dist: int = 5000,
    bandwidth: int = 500,
    min_score: int = 0,
):
    """Returns (f, parent, best_score, best_idx).

    f: (N, A) chain score per anchor; parent: (N, A) predecessor index
    (-1 = chain start); best_*: per-row optimum.
    """
    q_pos = q_pos.astype(jnp.int32)   # int16 on the wire, int32 in the DP
    t_pos = t_pos.astype(jnp.int32)
    n, a = q_pos.shape
    idx = jnp.arange(a, dtype=jnp.int32)
    valid = idx[None, :] < n_anchors[:, None]

    # window buffers carried through the scan: last W anchors' (f, q, t, idx)
    def body(carry, i):
        f_win, q_win, t_win, i_win = carry  # each (N, W)
        qi = q_pos[:, i][:, None]
        ti = t_pos[:, i][:, None]
        dq = qi - q_win
        dt = ti - t_win
        dd = jnp.abs(dq - dt)
        ok = (dq > 0) & (dt > 0) & (dq <= max_dist) & (dt <= max_dist) \
            & (dd <= bandwidth) & (i_win >= 0)
        alpha = jnp.minimum(jnp.minimum(dq, dt), k)
        log_dd = jnp.where(dd > 0,
                           jnp.log2(jnp.maximum(dd, 1).astype(jnp.float32)),
                           0.0)
        beta = (0.01 * k) * dd.astype(jnp.float32) + 0.5 * log_dd
        cand = jnp.where(ok, f_win + alpha - beta.astype(jnp.int32), NEG)
        best_prev = jnp.max(cand, axis=1)
        best_j = jnp.argmax(cand, axis=1)  # first max → oldest anchor wins ties
        fi = jnp.maximum(best_prev, jnp.int32(k))
        parent_i = jnp.where(
            best_prev >= k,
            jnp.take_along_axis(i_win, best_j[:, None], axis=1)[:, 0],
            jnp.int32(-1),
        )
        # anchors beyond n_anchors stay dead
        row_valid = valid[:, i]
        fi = jnp.where(row_valid, fi, NEG)
        parent_i = jnp.where(row_valid, parent_i, -1)

        # slide the window
        f_win = jnp.concatenate([f_win[:, 1:], fi[:, None]], axis=1)
        q_win = jnp.concatenate([q_win[:, 1:], qi], axis=1)
        t_win = jnp.concatenate([t_win[:, 1:], ti], axis=1)
        i_win = jnp.concatenate(
            [i_win[:, 1:],
             jnp.where(row_valid, i, -1)[:, None] *
             jnp.ones((n, 1), jnp.int32)], axis=1)
        return (f_win, q_win, t_win, i_win), (fi, parent_i)

    init = (
        jnp.full((n, window), NEG, jnp.int32),
        jnp.zeros((n, window), jnp.int32),
        jnp.zeros((n, window), jnp.int32),
        jnp.full((n, window), -1, jnp.int32),
    )
    _, (f_t, parent_t) = jax.lax.scan(body, init,
                                      jnp.arange(a, dtype=jnp.int32),
                                      unroll=4)
    f = jnp.transpose(f_t)          # (N, A)
    parent = jnp.transpose(parent_t)
    f_masked = jnp.where(valid, f, NEG)
    best_score = jnp.max(f_masked, axis=1)
    best_idx = jnp.argmax(f_masked, axis=1)
    best_score = jnp.where(best_score < jnp.maximum(min_score, 1),
                           0, best_score)
    return f, parent, best_score, best_idx


@functools.partial(
    jax.jit,
    static_argnames=("window", "k", "max_dist", "bandwidth"),
)
def chain_and_extents(q_pos, t_pos, n_anchors, *, window: int = 32,
                      k: int = 15, max_dist: int = 5000,
                      bandwidth: int = 500):
    """Single-pass chaining WITH extents: chain start coordinates and length
    propagate through the DP alongside the score (no parent matrix, no
    backtrack pass). Returns (6, N) int32
    [best, q_min, q_max, t_min, t_max, chain_len]."""
    q_pos = q_pos.astype(jnp.int32)   # int16 on the wire, int32 in the DP
    t_pos = t_pos.astype(jnp.int32)
    n, a = q_pos.shape
    idx = jnp.arange(a, dtype=jnp.int32)
    valid = idx[None, :] < n_anchors[:, None]

    def gather(win, j):
        return jnp.take_along_axis(win, j[:, None], axis=1)[:, 0]

    def body(carry, i):
        f_win, q_win, t_win, live_win, qmin_win, tmin_win, cnt_win = carry
        qi = q_pos[:, i][:, None]
        ti = t_pos[:, i][:, None]
        dq = qi - q_win
        dt = ti - t_win
        dd = jnp.abs(dq - dt)
        ok = (dq > 0) & (dt > 0) & (dq <= max_dist) & (dt <= max_dist) \
            & (dd <= bandwidth) & live_win
        alpha = jnp.minimum(jnp.minimum(dq, dt), k)
        log_dd = jnp.where(dd > 0,
                           jnp.log2(jnp.maximum(dd, 1).astype(jnp.float32)),
                           0.0)
        beta = (0.01 * k) * dd.astype(jnp.float32) + 0.5 * log_dd
        cand = jnp.where(ok, f_win + alpha - beta.astype(jnp.int32), NEG)
        best_prev = jnp.max(cand, axis=1)
        best_j = jnp.argmax(cand, axis=1)
        has = best_prev >= k
        fi = jnp.maximum(best_prev, jnp.int32(k))
        qv = q_pos[:, i]
        tv = t_pos[:, i]
        qmin_i = jnp.where(has, gather(qmin_win, best_j), qv)
        tmin_i = jnp.where(has, gather(tmin_win, best_j), tv)
        cnt_i = jnp.where(has, gather(cnt_win, best_j) + 1, 1)
        row_valid = valid[:, i]
        fi = jnp.where(row_valid, fi, NEG)

        def slide(win, new):
            return jnp.concatenate([win[:, 1:], new[:, None]], axis=1)

        carry = (slide(f_win, fi), slide(q_win, qv), slide(t_win, tv),
                 slide(live_win, row_valid), slide(qmin_win, qmin_i),
                 slide(tmin_win, tmin_i), slide(cnt_win, cnt_i))
        return carry, (fi, qmin_i, tmin_i, cnt_i)

    init = (
        jnp.full((n, window), NEG, jnp.int32),
        jnp.zeros((n, window), jnp.int32),
        jnp.zeros((n, window), jnp.int32),
        jnp.zeros((n, window), bool),
        jnp.zeros((n, window), jnp.int32),
        jnp.zeros((n, window), jnp.int32),
        jnp.zeros((n, window), jnp.int32),
    )
    # unroll: each step is ~15 small ops on (N, window) planes — per-step
    # launch overhead, not FLOPs, dominates; unrolling lets XLA fuse runs
    _, (f_t, qmin_t, tmin_t, cnt_t) = jax.lax.scan(
        body, init, jnp.arange(a, dtype=jnp.int32), unroll=4)
    f = jnp.transpose(f_t)
    f_masked = jnp.where(valid, f, NEG)
    best = jnp.max(f_masked, axis=1)
    best_idx = jnp.argmax(f_masked, axis=1)
    bi = best_idx[:, None]
    q_max = jnp.take_along_axis(q_pos, bi, axis=1)[:, 0]
    t_max = jnp.take_along_axis(t_pos, bi, axis=1)[:, 0]
    q_min = jnp.take_along_axis(jnp.transpose(qmin_t), bi, axis=1)[:, 0]
    t_min = jnp.take_along_axis(jnp.transpose(tmin_t), bi, axis=1)[:, 0]
    cnt = jnp.take_along_axis(jnp.transpose(cnt_t), bi, axis=1)[:, 0]
    best = jnp.maximum(best, 0)
    return jnp.stack([best.astype(jnp.int32), q_min, q_max, t_min, t_max,
                      cnt])


@jax.jit
def chain_extents(q_pos, t_pos, parent, best_idx):
    """Device-side chain backtrack: follow parent pointers from best_idx and
    return (q_min, q_max, t_min, t_max, length) per row — avoids shipping the
    whole parent matrix to the host."""
    n, a = q_pos.shape

    def body(carry, _):
        cur, qmin, qmax, tmin, tmax, cnt = carry
        valid = cur >= 0
        cc = jnp.maximum(cur, 0)
        q = jnp.take_along_axis(q_pos, cc[:, None], axis=1)[:, 0]
        t = jnp.take_along_axis(t_pos, cc[:, None], axis=1)[:, 0]
        qmin = jnp.where(valid, jnp.minimum(qmin, q), qmin)
        qmax = jnp.where(valid, jnp.maximum(qmax, q), qmax)
        tmin = jnp.where(valid, jnp.minimum(tmin, t), tmin)
        tmax = jnp.where(valid, jnp.maximum(tmax, t), tmax)
        cnt = cnt + valid.astype(jnp.int32)
        nxt = jnp.take_along_axis(parent, cc[:, None], axis=1)[:, 0]
        cur = jnp.where(valid, nxt, -1)
        return (cur, qmin, qmax, tmin, tmax, cnt), None

    big = jnp.int32(2 ** 30)
    init = (best_idx.astype(jnp.int32), jnp.full((n,), big, jnp.int32),
            jnp.full((n,), -big, jnp.int32), jnp.full((n,), big, jnp.int32),
            jnp.full((n,), -big, jnp.int32), jnp.zeros((n,), jnp.int32))
    (cur, qmin, qmax, tmin, tmax, cnt), _ = jax.lax.scan(
        body, init, None, length=a)
    return qmin, qmax, tmin, tmax, cnt


def backtrack_chain(parent_row: np.ndarray, best_idx: int) -> np.ndarray:
    """Host-side chain extraction: follow parents from the best anchor."""
    chain = []
    i = int(best_idx)
    seen = 0
    while i >= 0 and seen <= len(parent_row):
        chain.append(i)
        i = int(parent_row[i])
        seen += 1
    return np.array(chain[::-1], dtype=np.int32)


def chain_scores_reference(q_pos, t_pos, *, window=32, k=15, max_dist=5000,
                           bandwidth=500):
    """Scalar numpy reference of the same DP (for tests)."""
    a = len(q_pos)
    f = np.zeros(a, np.int64)
    parent = np.full(a, -1, np.int64)
    for i in range(a):
        best_prev = None
        bj = -1
        for j in range(max(0, i - window), i):
            dq = q_pos[i] - q_pos[j]
            dt = t_pos[i] - t_pos[j]
            dd = abs(dq - dt)
            if dq <= 0 or dt <= 0 or dq > max_dist or dt > max_dist \
                    or dd > bandwidth:
                continue
            alpha = min(dq, dt, k)
            beta = int(0.01 * k * dd + 0.5 * (np.log2(dd) if dd > 0 else 0))
            cand = f[j] + alpha - beta
            if best_prev is None or cand > best_prev:
                best_prev = cand
                bj = j
        if best_prev is not None and best_prev >= k:
            f[i] = max(best_prev, k)
            parent[i] = bj
        else:
            f[i] = k
            parent[i] = -1
    return f, parent
