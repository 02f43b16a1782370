"""Pallas TPU kernel: anchor chaining DP with fused extents.

Device-side replacement for the lax.scan implementation in align/chain.py —
same recurrence and outputs as chain_and_extents, but the per-anchor loop
body is pure in-register VPU work on a (BATCH_TILE, A) state:

  - column i extraction and the best-predecessor "gather" are one-hot
    reductions (no dynamic lane slicing, no scan-carry concatenations);
  - chain extents (start coords, length) ride the DP as extra state planes,
    exactly like the jnp version;
  - the whole chunk is one kernel launch: no 2xA sequential scan dispatches.

Scoring (minimap2 map-ont flavor, see align/chain.py):
  f[i] = max(max_{j<i, window}(f[j] + alpha - beta), k)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 28)


def _chain_kernel(q_ref, t_ref, cnt_ref, out_ref, *, a, window, k, max_dist,
                  bandwidth):
    bt = q_ref.shape[0]
    q = q_ref[:].astype(jnp.int32)
    t = t_ref[:].astype(jnp.int32)
    cnt = cnt_ref[:, 0:1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, a), dimension=1)

    def col(x, i):
        """Extract column i as (BT, 1) via one-hot reduction."""
        return jnp.sum(jnp.where(lane == i, x, 0), axis=1, keepdims=True)

    def body(i, state):
        f, qmin, tmin, cln = state
        qi = col(q, i)
        ti = col(t, i)
        dq = qi - q
        dt = ti - t
        dd = jnp.abs(dq - dt)
        ok = (lane < i) & (i - lane <= window) & (dq > 0) & (dt > 0) \
            & (dq <= max_dist) & (dt <= max_dist) & (dd <= bandwidth) \
            & (lane < cnt)
        alpha = jnp.minimum(jnp.minimum(dq, dt), k)
        ddf = jnp.maximum(dd, 1).astype(jnp.float32)
        beta = (0.01 * k) * dd.astype(jnp.float32) \
            + 0.5 * jnp.where(dd > 0, jnp.log2(ddf), 0.0)
        cand = jnp.where(ok, f + alpha - beta.astype(jnp.int32), NEG)
        best_prev = jnp.max(cand, axis=1, keepdims=True)
        has = best_prev >= k
        # first best predecessor as a one-hot mask
        is_best = (cand == best_prev) & ok & has
        jstar = jnp.min(jnp.where(is_best, lane, a), axis=1, keepdims=True)
        onehot = lane == jstar

        def pick(x, default):
            return jnp.where(
                has, jnp.sum(jnp.where(onehot, x, 0), axis=1, keepdims=True),
                default)

        fi = jnp.maximum(best_prev, k)
        qmin_i = pick(qmin, qi)
        tmin_i = pick(tmin, ti)
        cln_i = pick(cln, 0) + 1
        valid_i = i < cnt                              # (BT,1)
        at_i = lane == i
        f = jnp.where(at_i, jnp.where(valid_i, fi, NEG), f)
        qmin = jnp.where(at_i, qmin_i, qmin)
        tmin = jnp.where(at_i, tmin_i, tmin)
        cln = jnp.where(at_i, cln_i, cln)
        return f, qmin, tmin, cln

    init = (jnp.full((bt, a), NEG, jnp.int32), jnp.zeros((bt, a), jnp.int32),
            jnp.zeros((bt, a), jnp.int32), jnp.zeros((bt, a), jnp.int32))
    f, qmin, tmin, cln = jax.lax.fori_loop(0, a, body, init)

    live = lane < cnt
    f_masked = jnp.where(live, f, NEG)
    best = jnp.max(f_masked, axis=1, keepdims=True)
    istar = jnp.min(jnp.where(f_masked == best, lane, a), axis=1,
                    keepdims=True)
    onehot = lane == istar

    def gather(x):
        return jnp.sum(jnp.where(onehot, x, 0), axis=1, keepdims=True)

    out_ref[:, 0:1] = jnp.maximum(best, 0)
    out_ref[:, 1:2] = gather(qmin)
    out_ref[:, 2:3] = gather(q)
    out_ref[:, 3:4] = gather(tmin)
    out_ref[:, 4:5] = gather(t)
    out_ref[:, 5:6] = gather(cln)
    out_ref[:, 6:8] = jnp.zeros((bt, 2), jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("window", "k", "max_dist", "bandwidth", "batch_tile"),
)
def chain_and_extents_pallas(q_pos, t_pos, n_anchors, *, window: int = 32,
                             k: int = 15, max_dist: int = 5000,
                             bandwidth: int = 500, batch_tile: int = 256):
    """Pallas version of chain_and_extents: (6, N) int32
    [best, q_min, q_max, t_min, t_max, chain_len]."""
    n, a = q_pos.shape
    n_pad = (-n) % batch_tile
    if n_pad:
        q_pos = jnp.pad(q_pos, ((0, n_pad), (0, 0)))
        t_pos = jnp.pad(t_pos, ((0, n_pad), (0, 0)))
        n_anchors = jnp.pad(n_anchors, (0, n_pad))
    grid = (q_pos.shape[0] // batch_tile,)
    kernel = functools.partial(_chain_kernel, a=a, window=window, k=k,
                               max_dist=max_dist, bandwidth=bandwidth)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, a), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, a), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch_tile, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pos.shape[0], 8), jnp.int32),
    )(q_pos.astype(jnp.int32), t_pos.astype(jnp.int32),
      n_anchors[:, None].astype(jnp.int32))
    return jnp.transpose(out[:n, :6])
