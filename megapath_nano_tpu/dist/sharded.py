"""Sharded-index alignment step: seed lookup + diagonal voting + banded
extension under shard_map, merged with ICI collectives.

The multi-chip execution model (SURVEY §2.7 "TPU-native equivalent"):

  - the sorted minimizer table is split into S shards; shard s holds keys/
    positions for its slice of target sequences plus those packed sequences
  - read batches (minimizer hashes + packed bases) are REPLICATED across the
    shard axis and data-parallel across the "data" axis
  - each shard: vectorized searchsorted into its local table → hits →
    diagonal voting (seed-count proxy for chain score) → local best
    candidate per read → banded SW extension against its local targets
  - cross-shard merge: per-read argmax over (score, shard) via pmax/pargmax
    collectives — the all-reduce that replaces the reference's single-host
    merge of minimap2 index-batch passes

The whole step is one jit over the mesh; the driver's dryrun_multichip
executes it on an N-virtual-device CPU mesh.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from megapath_nano_tpu.kernels.sw import _row_step_factory  # shared DP math


@dataclass
class ShardedIndex:
    """Host-side container for per-shard index arrays (padded to equal size).

    keys/t_pos/seq_id: (S, K) — sorted minimizer table slices (pad: ~0 keys)
    targets: (S, T) int8 — packed local target bases (pad 5)
    target_len: (S,) int32
    """

    keys: np.ndarray
    t_pos: np.ndarray
    seq_id: np.ndarray
    targets: np.ndarray
    target_len: np.ndarray
    shard_seq_base: np.ndarray   # (S,) first global seq id of each shard

    @staticmethod
    def from_sequences(seqs: list[np.ndarray], n_shards: int, *,
                       k: int = 15, w: int = 10) -> "ShardedIndex":
        """Round-robin target sequences across shards, build per-shard
        sorted tables (host, native builder)."""
        from megapath_nano_tpu.index.minimizer import MinimizerIndex

        assign = [i % n_shards for i in range(len(seqs))]
        per_shard = [[] for _ in range(n_shards)]
        for i, s in enumerate(seqs):
            per_shard[assign[i]].append((i, s))
        tables = []
        for sh in range(n_shards):
            local = per_shard[sh]
            idx = MinimizerIndex.build([s for _, s in local], k=k, w=w)
            seq_id_l, pos_l, _ = idx.unpack(idx.positions)
            # local concatenated coordinates: offset by local seq offsets
            flat_pos = idx.seq_offsets[seq_id_l] + pos_l
            tables.append((idx.keys, flat_pos, seq_id_l,
                           np.concatenate([s for _, s in local])
                           if local else np.zeros(0, np.int8)))
        kmax = max(1, max(len(t[0]) for t in tables))
        tmax = max(1, max(len(t[3]) for t in tables))
        kmax = int(np.ceil(kmax / 128) * 128)
        tmax = int(np.ceil(tmax / 128) * 128)
        keys = np.full((n_shards, kmax), np.uint64(0xFFFFFFFFFFFFFFFF),
                       np.uint64)
        tpos = np.zeros((n_shards, kmax), np.int32)
        sid = np.full((n_shards, kmax), -1, np.int32)
        targets = np.full((n_shards, tmax), 5, np.int8)
        tlen = np.zeros(n_shards, np.int32)
        base = np.zeros(n_shards, np.int32)
        for sh, (kk, pp, ss, tt) in enumerate(tables):
            keys[sh, : len(kk)] = kk
            tpos[sh, : len(pp)] = pp
            sid[sh, : len(ss)] = ss
            targets[sh, : len(tt)] = tt
            tlen[sh] = len(tt)
        return ShardedIndex(keys, tpos, sid, targets, tlen, base)


def make_sharded_align_step(mesh, *, band: int = 128, n_diag_buckets: int = 64,
                            diag_bucket: int = 256, window: int = 1024,
                            match: int = 2, mismatch: int = 4,
                            gap_open: int = 4, gap_extend: int = 2):
    """Build the jitted multi-device alignment step.

    Inputs (global shapes):
      keys (S, K) uint64; t_pos (S, K) int32; targets (S, T) int8 — sharded
      hashes (N, M) uint64; q_pos (N, M) int32; reads (N, Q) int8;
      read_len (N,) int32 — replicated
    Returns per-read (best_score, best_shard) after cross-shard merge.
    """
    S = mesh.shape["shard"]

    def local_step(keys, t_pos, targets, hashes, q_pos, reads, read_len):
        # shapes inside shard_map: keys (1, K) etc. — squeeze shard dim
        keys = keys[0]
        t_pos = t_pos[0]
        targets = targets[0]
        n, m = hashes.shape
        q = reads.shape[1]

        # 1. seed lookup into the local sorted table
        lo = jnp.searchsorted(keys, hashes.ravel()).reshape(n, m)
        lo = jnp.minimum(lo, keys.shape[0] - 1)
        hit = keys[lo] == hashes
        anchor_t = jnp.where(hit, t_pos[lo], 0)

        # 2. diagonal voting: histogram of (t_pos - q_pos) per read
        diag = jnp.where(hit, (anchor_t - q_pos) // diag_bucket, -1)
        bucket = jnp.where(hit, jnp.abs(diag) % n_diag_buckets, 0)
        votes = jnp.zeros((n, n_diag_buckets), jnp.int32)
        votes = votes.at[
            jnp.arange(n)[:, None].repeat(m, 1), bucket
        ].add(hit.astype(jnp.int32))
        best_bucket = jnp.argmax(votes, axis=1)
        n_votes = jnp.max(votes, axis=1)

        # 3. window start: median-free estimate — first hit in best bucket
        in_best = jnp.logical_and(hit, bucket == best_bucket[:, None])
        t_first = jnp.min(jnp.where(in_best, anchor_t - q_pos,
                                    jnp.int32(2 ** 30)), axis=1)
        # window starts AT the diagonal: read pos i ≈ window pos i, centered
        # in the kernel's band (band slot half)
        w_start = jnp.clip(t_first, 0,
                           jnp.maximum(targets.shape[0] - window, 0))

        # 4. banded extension against the local window
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(targets, (s,), (window,))
        )(w_start)
        step = _row_step_factory(band=band, match=match, mismatch=mismatch,
                                 gap_open=gap_open, gap_extend=gap_extend,
                                 use_pltpu=False)
        rlen = read_len[:, None].astype(jnp.int32)
        win_pad = jnp.pad(win, ((0, 0), (band // 2, band // 2)),
                          constant_values=5)

        def scan_body(carry, i):
            ref_slice = jax.lax.dynamic_slice_in_dim(win_pad, i, band, axis=1)
            read_col = jax.lax.dynamic_slice_in_dim(reads, i, 1, axis=1)
            return step(i, carry, read_col, ref_slice, rlen), None

        zeros = jnp.zeros((n, band), jnp.int32)
        init = (zeros, zeros, jnp.zeros((n, 1), jnp.int32),
                jnp.zeros((n, 1), jnp.int32), jnp.zeros((n, 1), jnp.int32))
        (h, e, best, bi, bk), _ = jax.lax.scan(
            scan_body, init, jnp.arange(q, dtype=jnp.int32))
        score = jnp.where(n_votes >= 2, best[:, 0], 0)

        # 5. cross-shard merge: per-read best (score, shard)
        shard_id = jax.lax.axis_index("shard")
        packed = score.astype(jnp.int64) * S + shard_id
        merged = jax.lax.pmax(packed, "shard")
        g_score = (merged // S).astype(jnp.int32)
        g_shard = (merged % S).astype(jnp.int32)
        # also produce the global window start from the winning shard
        sel = (g_shard == shard_id).astype(jnp.int32)
        g_wstart = jax.lax.psum(w_start * sel, "shard")
        return g_score[None], g_shard[None], g_wstart[None]

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("shard", None), P("shard", None), P("shard", None),
                  P(), P(), P(), P()),
        out_specs=(P("shard"), P("shard"), P("shard")),
        check_vma=False,
    )

    @jax.jit
    def step(keys, t_pos, targets, hashes, q_pos, reads, read_len):
        s, sh, ws = sharded(keys, t_pos, targets, hashes, q_pos, reads,
                            read_len)
        # outputs are replicated rows stacked on the shard axis; row 0 holds
        # the merged values
        return s[0], sh[0], ws[0]

    return step
