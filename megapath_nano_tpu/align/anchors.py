"""Seed lookup and anchor grouping (host side, vectorized numpy).

Replaces minimap2's seed-collection phase (the reference shells out to
minimap2, reference: bin/lib/aligner.py:206-217). Lookup against the sorted
minimizer table is a batched np.searchsorted — the same operation the sharded
device path uses (jnp.searchsorted per index shard, megapath_nano_tpu/dist/).

Anchors are (q_end, t_end) k-mer end-position pairs per (sequence, strand)
group, with reverse-strand query coordinates flipped so chains are colinear
ascending in both coordinates — minimap2's coordinate convention.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from megapath_nano_tpu.index.minimizer import MinimizerIndex


@dataclass
class AnchorGroups:
    """Flat anchor arrays partitioned into candidate groups.

    Each group = anchors of one (read, target sequence, strand) candidate,
    sorted by (t_end, q_end). group_offsets has n_groups+1 entries into the
    flat arrays; group_read/seq/strand give each group's identity.
    """

    q_end: np.ndarray      # (total_anchors,) int32 (strand-adjusted)
    t_end: np.ndarray      # (total_anchors,) int64
    group_offsets: np.ndarray  # (n_groups+1,) int64
    group_read: np.ndarray     # (n_groups,) int32
    group_seq: np.ndarray      # (n_groups,) int32
    group_strand: np.ndarray   # (n_groups,) int8

    @property
    def n_groups(self) -> int:
        return len(self.group_read)


def collect_anchors(
    index: MinimizerIndex,
    reads: list[np.ndarray],
    *,
    max_occ: int = 64,
    min_group_anchors: int = 3,
    gap_break: int = 5000,
) -> AnchorGroups:
    """Sketch reads, look up each minimizer, and group hits.

    max_occ: minimizers occurring more than this in the index are skipped
    (repeat masking — minimap2's mid-occurrence filter).
    gap_break: split a (read, seq, strand) group at target gaps larger than
    this — the chain DP can't link across them (max_dist), and smaller
    groups keep the packed anchor arrays dense and int16-safe.
    """
    keys = index.keys
    empty = AnchorGroups(np.zeros(0, np.int32), np.zeros(0, np.int64),
                         np.zeros(1, np.int64), np.zeros(0, np.int32),
                         np.zeros(0, np.int32), np.zeros(0, np.int8))
    if not reads:
        return empty

    # one native call sketches every read; everything after is flat numpy
    from megapath_nano_tpu.index.minimizer import sketch_batch

    hashes, q_pos, q_strand, moff = sketch_batch(reads, k=index.k, w=index.w)
    if len(hashes) == 0:
        return empty
    read_of = np.repeat(np.arange(len(reads), dtype=np.int32),
                        np.diff(moff))
    read_lens = np.array([len(r) for r in reads], np.int64)

    # LUT-bucketed threaded native binary search
    import os

    lo, hi = index.lookup_ranges(hashes,
                                 n_threads=min(os.cpu_count() or 1, 8))
    cnt = hi - lo
    keep = (cnt > 0) & (cnt <= max_occ)
    if not keep.any():
        return empty
    lo = lo[keep]
    n_hits = cnt[keep].astype(np.int64)
    q_pos_k = q_pos[keep]
    q_strand_k = q_strand[keep]
    rid_k = read_of[keep]

    total = int(n_hits.sum())
    starts = np.repeat(lo, n_hits)
    offs = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(n_hits)[:-1]]), n_hits)
    packed = index.positions[starts + offs]
    seq, t, t_strand = index.unpack(packed)
    q_rep = np.repeat(q_pos_k, n_hits).astype(np.int64)
    qs_rep = np.repeat(q_strand_k, n_hits)
    strand = (qs_rep ^ t_strand).astype(np.int8)
    rid = np.repeat(rid_k, n_hits)
    qlen_rep = read_lens[rid]
    # flip query coords for minus-strand anchors (k-mer end in revcomp)
    q = np.where(strand == 1, qlen_rep + index.k - 2 - q_rep,
                 q_rep).astype(np.int32)

    # sort by (read, seq, strand, t, q) then cut into groups
    order = np.lexsort((q, t, strand, seq, rid))
    q, t, rid, seq, strand = (a[order] for a in (q, t, rid, seq, strand))
    new_group = np.empty(len(q), bool)
    new_group[0] = True
    new_group[1:] = (rid[1:] != rid[:-1]) | (seq[1:] != seq[:-1]) \
        | (strand[1:] != strand[:-1]) | (t[1:] - t[:-1] > gap_break)
    group_starts = np.flatnonzero(new_group)
    group_ends = np.append(group_starts[1:], len(q))
    sizes_all = group_ends - group_starts
    keep = sizes_all >= min_group_anchors
    group_starts, group_ends = group_starts[keep], group_ends[keep]

    # compact the kept groups (rows are contiguous per group)
    keep_row = np.repeat(keep, sizes_all)
    idx = np.flatnonzero(keep_row)
    sizes = group_ends - group_starts
    offsets = np.zeros(len(sizes) + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    return AnchorGroups(
        q_end=q[idx], t_end=t[idx],
        group_offsets=offsets,
        group_read=rid[group_starts],
        group_seq=seq[group_starts],
        group_strand=strand[group_starts],
    )


def pack_groups(groups: AnchorGroups, *, max_anchors: int = 256):
    """Pad groups into fixed (n_groups, max_anchors) arrays for the device
    chaining kernel. Oversize groups are subsampled evenly (keeps chain
    structure; exact minimap2 would RMQ-chain all anchors).

    Emits int16 coordinate arrays when every value fits (the common case
    after gap_break splitting) — halves the host→device upload, which is
    the map path's bound on a remote-attached TPU."""
    n = groups.n_groups
    q = np.zeros((n, max_anchors), np.int32)
    t = np.zeros((n, max_anchors), np.int32)
    cnt = np.zeros(n, np.int32)
    t_base = np.zeros(n, np.int64)
    sel_idx = np.full((n, max_anchors), -1, np.int64)  # flat anchor indices
    for g in range(n):
        s, e = groups.group_offsets[g], groups.group_offsets[g + 1]
        size = int(e - s)
        if size > max_anchors:
            pick = np.linspace(s, e - 1, max_anchors).astype(np.int64)
        else:
            pick = np.arange(s, e)
        m = len(pick)
        base = int(groups.t_end[pick[0]])
        q[g, :m] = groups.q_end[pick]
        t[g, :m] = (groups.t_end[pick] - base).astype(np.int32)
        cnt[g] = m
        t_base[g] = base
        sel_idx[g, :m] = pick
    if n and q.max() < 2 ** 15 and t.max() < 2 ** 15 and q.min() >= 0:
        q = q.astype(np.int16)
        t = t.astype(np.int16)
    return q, t, cnt, t_base, sel_idx
