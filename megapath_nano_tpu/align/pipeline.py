"""Seed → chain → extend alignment pipeline.

The framework's replacement for the reference's minimap2 invocation
(reference: bin/lib/aligner.py:93 Align(); `minimap2 -N 50 -p 1 -x map-ont`,
megapath_nano.py:1253 step_placement_to_species). Orchestration is host-side
numpy; all DP (chaining, banded extension) runs on-device in batches; final
base-exact CIGARs for per-(read,sequence) best alignments come from the
native SSW emit path.

Output is an AlignList in the reference's align_list schema, ready for the
taxon module (best-alignment selection, abundance, noise filters).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import numpy as np


@functools.partial(jax.jit, static_argnames=("t_max",))
def _gather_windows(seq4, starts, *, t_max):
    """Gather (n, t_max) reference windows from the 4-BIT-PACKED resident
    reference (2 codes/byte, high nibble first). Halving the resident
    bytes doubles the index size one chip can hold (a 2 Gbp shard's int8
    bases alone were 2 GB of HBM); the unpack is a shift+mask over the
    gathered windows. Odd starts are handled by gathering one extra byte
    and dropping the leading code."""
    import jax.numpy as jnp

    nb = t_max // 2 + 1
    rows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(seq4, (s,), (nb,)))(starts >> 1)
    hi = (rows >> 4) & 0xF
    lo = rows & 0xF
    codes = jnp.stack([hi, lo], axis=-1).reshape(rows.shape[0], 2 * nb)
    out = jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(row, (s,), (t_max,)))(
            codes, (starts & 1).astype(jnp.int32))
    return out.astype(jnp.int8)


def _pack_seq4(data: np.ndarray) -> np.ndarray:
    """Host-side 4-bit packing of reference codes (values 0..5)."""
    if len(data) % 2:
        data = np.concatenate([data, np.full(1, 5, np.int8)])
    u = data.astype(np.uint8)
    return ((u[0::2] << 4) | u[1::2]).astype(np.uint8)


def _goffs_from_cnt(cnt):
    """Device-side exclusive prefix sum of per-group anchor counts — the
    row offsets into the ragged anchor arrays (saves an upload)."""
    import jax.numpy as jnp

    return jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(cnt, dtype=jnp.int32)])


def _unpack_reads(packed2, exc_rid, exc_pos):
    """Device-side unpack of 2-bit read codes to an (n, read_max) int8
    matrix. Rare non-ACGT codes (N) are restored from the exception lists
    (scatter with mode='drop': padding rows carry an out-of-bounds rid)."""
    import jax.numpy as jnp

    n, nb = packed2.shape
    b = packed2[:, :, None]
    shifts = jnp.array([6, 4, 2, 0], jnp.uint8)[None, None, :]
    codes = ((b >> shifts) & 3).reshape(n, nb * 4).astype(jnp.int8)
    return codes.at[exc_rid, exc_pos].set(jnp.int8(4), mode="drop")


@functools.partial(
    jax.jit,
    static_argnames=("q_max", "t_max", "band", "match", "mismatch",
                     "gap_open", "gap_extend", "batch_tile", "backend"))
def _extend_full_dispatch(packed2, exc_rid, exc_pos, qlens, meta, seq_data,
                          *, q_max, t_max, band, match, mismatch, gap_open,
                          gap_extend, batch_tile, backend):
    """One-dispatch PAF extension: gather oriented query windows from the
    packed read matrix and target windows from the resident reference, then
    run the full-stats banded kernel. meta rows: rid, qs, qwlen, strand,
    t_start, t_len — bundled so the remote link sees ONE small upload instead
    of six (each costs a fixed ~30ms RTT on a tunneled TPU)."""
    rid, qs, qwlen, strand, t_start, t_len = (meta[i] for i in range(6))
    codes = _unpack_reads(packed2, exc_rid, exc_pos)
    ra = _gather_queries(codes, rid, qlens, qs, qwlen, strand, q_max=q_max)
    ta = _gather_windows(seq_data, t_start, t_max=t_max)
    return banded_sw_full(ra, qwlen, ta, t_len, band=band, match=match,
                          mismatch=mismatch, gap_open=gap_open,
                          gap_extend=gap_extend, batch_tile=batch_tile,
                          backend=backend)


@functools.partial(jax.jit, static_argnames=("q_max",))
def _gather_queries(codes, rid, qlens, qs, wlen, strand, *, q_max):
    """Build oriented query windows on device from the unpacked (n, read_max)
    code matrix. Row r of the result is
    (revcomp(read) if strand else read)[qs : qs+wlen] padded with 4 — the
    reads cross the host↔device link 2-bit packed, once per slice.

    Structured as row-gather + static flip + per-row dynamic_slice: a general
    2D gather of (G, q_max) elements lowers to scalar loads (~45 ms at
    G=4096 on v5e), while this decomposition is ~5x cheaper — the only
    data-dependent step left is the vmapped aligned slice."""
    import jax.numpy as jnp

    L = codes.shape[1]
    rows = codes[rid]                               # (G, L) row gather
    ql = qlens[rid]
    # reverse-complement rows: read occupies [L - ql, L) after the flip
    rc = jnp.where(rows < 4, 3 - rows, rows)[:, ::-1]
    minus = strand == 1
    base = jnp.where(minus[:, None], rc, rows)
    start = qs + jnp.where(minus, L - ql, 0)
    basep = jnp.pad(base, ((0, 0), (0, q_max)), constant_values=4)
    win = jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(row, (s,), (q_max,)))(
            basep, start.astype(jnp.int32))
    cols = jnp.arange(q_max, dtype=jnp.int32)[None, :]
    valid = (cols < wlen[:, None]) & (cols < (ql - qs)[:, None])
    return jnp.where(valid, win, 4).astype(jnp.int8)


def _pack_reads2(reads: list[np.ndarray], read_max: int,
                 n_rows: int | None = None):
    """Host-side 2-bit packing of a read batch: (n, read_max/4) uint8 plus
    exception lists (rid, pos) for non-ACGT codes. Positions beyond each
    read's length carry arbitrary 2-bit codes — every device consumer masks
    by read length. Exception padding rows use rid = n_rows (dropped by the
    device scatter). n_rows > len(reads) pads the matrix with empty rows so
    every slice of a batch shares one compiled shape."""
    n = n_rows if n_rows is not None else len(reads)
    assert n >= len(reads)
    mat = np.zeros((n, read_max), np.uint8)
    exc_r, exc_p = [], []
    for i, r in enumerate(reads):
        mat[i, : len(r)] = r
        bad = np.flatnonzero(r > 3)
        if len(bad):
            exc_r.append(np.full(len(bad), i, np.int32))
            exc_p.append(bad.astype(np.int32))
            mat[i, bad] = 0
    packed2 = (mat[:, 0::4] << 6) | (mat[:, 1::4] << 4) \
        | (mat[:, 2::4] << 2) | mat[:, 3::4]
    ne = sum(len(a) for a in exc_r)
    ep = 64
    while ep < ne:
        ep *= 2
    exc_rid = np.full(ep, n, np.int32)      # out-of-bounds → dropped
    exc_pos = np.zeros(ep, np.int32)
    if ne:
        exc_rid[:ne] = np.concatenate(exc_r)
        exc_pos[:ne] = np.concatenate(exc_p)
    return packed2, exc_rid, exc_pos


def _fused_tail(codes, qlens, qg, tg, cnt, rid, seqid, strand, t_base,
                seq_data, seq_offsets, seq_lengths, *, k, q_max, t_max, band,
                match, mismatch, gap_open, gap_extend, batch_tile, backend,
                min_chain_score, max_per_read, window_pad,
                ext_cap: int | None = None):
    """Shared device tail of the fused map step: chain DP → per-read top-K
    gate → extension-window algebra → query/target gathers → full-stats
    banded extension. Used by both the host-seeded dispatch (anchors uploaded
    ragged) and the device-seeded dispatch (anchors computed on device).

    Returns ((G, 16) uint16 row matrix, n_keep int32, minrid_out int32 —
    the smallest read id whose kept rows were truncated by ext_cap,
    NO_RID when none or when ext_cap is None). Row layout
    (FUSED_COLS): score, end_i, end_j, match, edit, begin_i, begin_j, keep,
    qs, w_lo_lo16, w_lo_hi16, rid, seq_id, strand, 0, 0. Every value provably
    fits uint16 (the fused gate guarantees read_max + band < 2**15, so
    score <= 2*read_max < 2**16 and every in-window coordinate < 2**15)
    except w_lo (a within-sequence offset), which ships as two uint16 halves.

    Static-shape note: the banded kernel cannot reach target columns beyond
    q_max + band/2, so clamping every window to t_max >= q_max + band loses
    no reachable cell regardless of how long the chain's target span is.
    """
    import jax.numpy as jnp

    from megapath_nano_tpu.align.chain import chain_and_extents

    stacked = chain_and_extents(qg, tg, cnt)
    best = stacked[0]
    q_min, q_maxx, t_min, t_maxx = stacked[1:5]
    G = best.shape[0]

    # per-read rank by chain score (stable → group order breaks ties, same
    # as the host lexsort); groups arrive sorted by read id. int32-safe
    # composite: chain scores are < 2**15 here (score <= query span, and the
    # fused path requires read_max + band < 2**15); rid < 2**16 per slice.
    comp = rid * jnp.int32(1 << 15) \
        + (jnp.int32((1 << 15) - 1) - jnp.minimum(best, (1 << 15) - 1))
    order = jnp.argsort(comp)
    rid_s = rid[order]
    ar = jnp.arange(G, dtype=jnp.int32)
    newrun = jnp.concatenate([jnp.ones(1, bool), rid_s[1:] != rid_s[:-1]])
    run_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(newrun, ar, 0))
    rank = jnp.zeros(G, jnp.int32).at[order].set(ar - run_start)
    keep = (best >= min_chain_score) & (rank < max_per_read) & (cnt > 0)
    n_keep = jnp.sum(keep.astype(jnp.int32))

    from megapath_nano_tpu.align.device_seed import NO_RID
    minrid_out = jnp.int32(NO_RID)
    if ext_cap is not None:
        # rows are read-id-major (device seeding sorts by rid-major key1),
        # so ext_cap truncation drops a rid suffix; record its start for
        # the host's partial redo
        rank_keep = jnp.cumsum(keep.astype(jnp.int32)) - 1
        minrid_out = jnp.min(jnp.where(keep & (rank_keep >= ext_cap),
                                       rid, jnp.int32(NO_RID)))
        # post-chain compaction (device-seeded path): the expensive stages —
        # window gathers + banded extension — run only on the kept rows,
        # compacted to ext_cap (stable, so group order survives). n_keep >
        # ext_cap is reported via the counts row and triggers the exact
        # host-seeded fallback; chain ran at the full padded G above.
        corder = jnp.argsort(~keep, stable=True)[:ext_cap]
        (best, q_min, q_maxx, t_min, t_maxx, rid, seqid, strand, t_base,
         cnt, keep) = (x[corder] for x in
                       (best, q_min, q_maxx, t_min, t_maxx, rid, seqid,
                        strand, t_base, cnt, keep))
        G = ext_cap

    # extension-window algebra (the host recs loop, vectorized).
    # Diagonal back-shift for widened bands: when the window clips at a
    # sequence start, w_lo sits exactly ON the chain diagonal and ref bases
    # BEFORE it are unreachable at any band. Shifting w_lo/w_hi out by
    # band/8 (<= 64 <= band/2) lets the redo-at-wider-band ladder reach
    # optimal starts/ends a few bases beyond the first/last anchor's
    # diagonal without pushing the chain outside the band (the query-side
    # pad stays window_pad = 64, so the chain's band offset stays within
    # +-(window_pad + dshift) < band/2 for every widened band). Zero at
    # the default band 128: production output unchanged.
    pad = window_pad
    dshift = min(band // 8, 64) if band > 128 else 0
    qlen_g = qlens[rid]
    q_lo = q_min - (k - 1)
    q_hi = q_maxx + 1
    t_lo = t_min + t_base - (k - 1)
    t_hi = t_maxx + t_base + 1
    seq_off = seq_offsets[seqid]
    seq_len = seq_lengths[seqid]
    left = jnp.minimum(q_lo, t_lo) + pad
    right = jnp.minimum(qlen_g - q_hi, seq_len - t_hi) + pad
    qs = jnp.maximum(q_lo - left, 0)
    qe = jnp.minimum(q_hi + right, qlen_g)
    w_lo = jnp.maximum(t_lo - (q_lo - qs) - dshift, 0)
    w_hi = jnp.minimum(t_hi + (qe - q_hi) + dshift, seq_len)
    rl = jnp.where(keep, qe - qs, 0).astype(jnp.int32)
    tl = jnp.where(keep, jnp.minimum(w_hi - w_lo, t_max), 0).astype(jnp.int32)
    start = jnp.where(keep, seq_off + w_lo, 0).astype(jnp.int32)

    ra = _gather_queries(codes, rid, qlens, qs.astype(jnp.int32), rl,
                         strand, q_max=q_max)
    ta = _gather_windows(seq_data, start, t_max=t_max)
    full = banded_sw_full(ra, rl, ta, tl, band=band, match=match,
                          mismatch=mismatch, gap_open=gap_open,
                          gap_extend=gap_extend, batch_tile=batch_tile,
                          backend=backend)
    zero = jnp.zeros(G, jnp.int32)
    # col 14 carries the chain score (fits uint16: chain score <= query
    # span < 2**15 under the fused gate) — the sharded mapper re-applies the
    # global per-read top-K gate on it after merging shard rows
    extra = jnp.stack([keep.astype(jnp.int32), qs.astype(jnp.int32),
                       w_lo & 0xFFFF, w_lo >> 16,
                       rid, seqid, strand.astype(jnp.int32),
                       jnp.clip(best, 0, (1 << 15) - 1), zero],
                      axis=1)
    out = jnp.concatenate([full, extra], axis=1).astype(jnp.uint16)
    return out, n_keep, minrid_out


# _fused_tail row layout (uint16 columns)
FUSED_COLS = 16
(F_SCORE, F_END_I, F_END_J, F_MATCH, F_EDIT, F_BEGIN_I, F_BEGIN_J, F_KEEP,
 F_QS, F_WLO_LO, F_WLO_HI, F_RID, F_SEQ, F_STRAND, F_CHAIN) = range(15)


def _pack_counts_row(counts_i32):
    """Pack a (5,) int32 counts vector into one (1, FUSED_COLS) uint16 row
    (lo/hi halves interleaved) — appended to the stats matrix so counts ride
    the same device→host transfer (each separate fetch costs a fixed RTT).
    Layout: [tot_winners, tot_anchors, n_groups_kept, n_keep,
    min_affected_rid]."""
    import jax.numpy as jnp

    row = jnp.zeros(FUSED_COLS, jnp.int32)
    row = row.at[0:10:2].set(counts_i32 & 0xFFFF)
    row = row.at[1:10:2].set((counts_i32 >> 16) & 0xFFFF)
    return row.astype(jnp.uint16)[None, :]


def _unpack_counts_row(row_u16):
    """Host-side inverse of _pack_counts_row: (FUSED_COLS,) uint16 → (5,)."""
    r = row_u16.astype(np.int64)
    return r[0:10:2] | (r[1:10:2] << 16)


@functools.partial(
    jax.jit,
    static_argnames=("k", "a_bucket", "q_max", "t_max", "band", "match",
                     "mismatch", "gap_open", "gap_extend", "batch_tile",
                     "backend", "min_chain_score", "max_per_read",
                     "window_pad"))
def _fused_map_dispatch(packed2, exc_rid, exc_pos, qlens, flat_q, flat_t,
                        gmeta, seq_data, seq_offsets,
                        seq_lengths, *, k, a_bucket, q_max, t_max, band,
                        match, mismatch, gap_open, gap_extend, batch_tile,
                        backend, min_chain_score, max_per_read, window_pad):
    """Host-seeded fused map step: anchors arrive ragged (flat_q/flat_t +
    per-group counts; row offsets are a device-side cumsum) and are padded to
    (n_groups, a_bucket) by an on-device gather; reads arrive 2-bit packed.
    Chain → top-K → windows → extension all run as ONE dispatch (fixed RTT
    per dispatch on a remote-attached TPU).

    gmeta rows (int32): rid, seq_id, strand, t_base, n_anchors.
    Returns (G+1, FUSED_COLS) uint16: G _fused_tail rows + a counts row
    [0, 0, 0, n_keep, NO_RID] (this path has no caps: nothing truncates, so
    no read is ever affected).
    """
    import jax.numpy as jnp

    from megapath_nano_tpu.align.device_seed import NO_RID

    rid, seqid, strand, t_base, cnt = (gmeta[i] for i in range(5))
    # rebuild padded anchor matrices from the ragged upload
    goffs = _goffs_from_cnt(cnt)
    a_cols = jnp.arange(a_bucket, dtype=jnp.int32)[None, :]
    srcs = jnp.clip(goffs[:-1, None] + a_cols, 0, flat_q.shape[0] - 1)
    a_mask = a_cols < cnt[:, None]
    qg = jnp.where(a_mask, flat_q[srcs].astype(jnp.int32), 0)
    tg = jnp.where(a_mask, flat_t[srcs].astype(jnp.int32), 0)
    codes = _unpack_reads(packed2, exc_rid, exc_pos)
    out, n_keep, _minrid = _fused_tail(
        codes, qlens, qg, tg, cnt, rid, seqid, strand, t_base,
        seq_data, seq_offsets, seq_lengths, k=k, q_max=q_max, t_max=t_max,
        band=band, match=match, mismatch=mismatch, gap_open=gap_open,
        gap_extend=gap_extend, batch_tile=batch_tile, backend=backend,
        min_chain_score=min_chain_score, max_per_read=max_per_read,
        window_pad=window_pad)
    zero = jnp.zeros((), jnp.int32)
    counts = jnp.stack([zero, zero, zero, n_keep, jnp.int32(NO_RID)])
    return jnp.concatenate([out, _pack_counts_row(counts)], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("k", "w", "max_occ", "min_group_anchors", "gap_break",
                     "cap", "seq_bits", "lut_bits", "n_bisect", "wtot_max",
                     "a_max", "g_max",
                     "out_cap", "q_max", "t_max", "band", "match", "mismatch",
                     "gap_open", "gap_extend", "batch_tile", "backend",
                     "min_chain_score", "max_per_read", "window_pad"))
def _fused_map_dispatch_devseed(packed2, exc_rid, exc_pos, qlens, keys32,
                                pos_t, ss16, lut2, runcnt, seq_data,
                                seq_offsets,
                                seq_lengths, *, k, w, max_occ,
                                min_group_anchors, gap_break, cap, seq_bits,
                                lut_bits, n_bisect,
                                wtot_max, a_max, g_max, out_cap, q_max,
                                t_max, band, match, mismatch, gap_open,
                                gap_extend, batch_tile, backend,
                                min_chain_score, max_per_read, window_pad):
    """Device-seeded fused map step: ONLY the 2-bit packed reads cross the
    host↔device link. Sketching, hash lookup (device-resident sorted index
    planes + bucket LUT), anchor grouping, chaining, top-K, and extension all
    run in one dispatch (align/device_seed.py does the seed stage). The
    chain's keep set is compacted to out_cap rows BEFORE the banded
    extension (_fused_tail ext_cap), so the expensive stages run at ~1-2
    rows/read instead of one row per candidate group — and the same out_cap
    rows are all that ships back over the link.

    Returns (out_cap+1, FUSED_COLS) uint16: compacted _fused_tail rows + a
    counts row [tot_winners, tot_anchors, n_groups_kept, n_keep,
    min_affected_rid]. Caps are static shapes, so exceeding one silently
    truncates candidates — but every truncation drops a read-id-major
    SUFFIX, and min_affected_rid records where it starts: rows for reads
    below it are bit-exact, and the host re-runs only reads at/above it
    through the exact host-seeded path (partial redo).
    """
    import jax.numpy as jnp

    from megapath_nano_tpu.align.device_seed import build_groups_device

    codes = _unpack_reads(packed2, exc_rid, exc_pos)
    qg, tg, cnt, rid, seqid, strand, t_base, dcounts = build_groups_device(
        codes, qlens, keys32, pos_t, ss16, lut2, runcnt, k=k, w=w,
        max_occ=max_occ,
        min_group_anchors=min_group_anchors, gap_break=gap_break, cap=cap,
        seq_bits=seq_bits, lut_bits=lut_bits, n_bisect=n_bisect,
        wtot_max=wtot_max, a_max=a_max, g_max=g_max)
    out, n_keep, minrid_out = _fused_tail(
        codes, qlens, qg, tg, cnt, rid, seqid, strand, t_base,
        seq_data, seq_offsets, seq_lengths, k=k, q_max=q_max, t_max=t_max,
        band=band, match=match, mismatch=mismatch, gap_open=gap_open,
        gap_extend=gap_extend, batch_tile=batch_tile, backend=backend,
        min_chain_score=min_chain_score, max_per_read=max_per_read,
        window_pad=window_pad, ext_cap=out_cap)
    minrid = jnp.minimum(dcounts[3], minrid_out)
    counts = jnp.concatenate([dcounts[:3], n_keep[None], minrid[None]])
    return jnp.concatenate([out, _pack_counts_row(counts)], axis=0)

from megapath_nano_tpu.align.anchors import (collect_anchors, pack_groups,
                                             pack_groups_flat)
from megapath_nano_tpu.align.chain import chain_and_extents
from megapath_nano_tpu.align.records import ALIGN_DTYPE, AlignList
from megapath_nano_tpu.index.minimizer import MinimizerIndex
from megapath_nano_tpu.kernels.sw import banded_sw_full, banded_sw_scores

from megapath_nano_tpu.utils.dna import revcomp


@dataclass
class AlignParams:
    """map-ont-flavored parameters (minimap2 defaults where applicable)."""

    match: int = 2
    mismatch: int = 4
    gap_open: int = 4
    gap_extend: int = 2
    band: int | None = None    # None = auto by read length (128/256/512)
    max_occ: int = 64
    min_group_anchors: int = 3
    min_chain_score: int = 40
    max_alignments_per_read: int = 50   # reference uses -N 50
    secondary_ratio: float = 1.0   # minimap2 -p: min secondary-to-primary
    #                                score ratio. The reference's placement
    #                                stage runs -N 50 -p 1 (ties only,
    #                                megapath_nano.py:1270); its genome-vs-
    #                                genome stages run -p 0 (keep all)
    mask_level: float = 0.5        # minimap2 --mask-level: query-overlap
    #                                fraction above which a lower-scoring
    #                                alignment is secondary, not primary
    min_alignment_score: int = 0
    window_pad: int = 64
    gap_break: int = 5000   # split candidate groups at target gaps larger
    #                         than this (collect_anchors / device seeding);
    #                         genome-vs-genome stages use a smaller value so
    #                         separated homology blocks emit independently
    max_anchors_per_group: int = 256
    fused_anchor_cap: int = 32   # ragged per-group anchor cap (fused path)
    extend_batch: int = 1024
    backend: str = "pallas"
    tiebreaker_seed: int = 0
    fused: bool = True   # PAF mode: single-dispatch map step
    device_seed: bool = True    # PAF mode: seed on device (only packed reads
    #                             cross the link); falls back per slice when a
    #                             static cap overflows (counts row).
    #                             DEFAULT ON since round 4: beats the
    #                             host-seeded path (10.0k vs 7.3k reads/s on
    #                             the bench shape) after the scatter/LUT seed
    #                             rewrite + post-chain compaction, and leaves
    #                             the host CPU free; see docs/PERF.md.
    devseed_out_per_read: int = 2   # out_cap = next_pow2(this * slice_n)


@dataclass
class SequenceMeta:
    """Per-target-sequence metadata (assembly + taxonomy join columns).

    Mirrors AssemblyMetadata's sequence_summary / assembly_tax_id join
    (reference: bin/lib/assembly_metadata.py:107-222)."""

    assembly_idx: np.ndarray          # (n_seqs,) int32 index into assembly_names
    assembly_names: list[str]
    tax_id: np.ndarray = field(default=None)
    species_tax_id: np.ndarray = field(default=None)
    genus_tax_id: np.ndarray = field(default=None)

    @staticmethod
    def single_assembly_per_sequence(seq_names):
        n = len(seq_names)
        return SequenceMeta(
            assembly_idx=np.arange(n, dtype=np.int32),
            assembly_names=list(seq_names),
            tax_id=np.zeros(n, np.int64),
            species_tax_id=np.zeros(n, np.int64),
            genus_tax_id=np.zeros(n, np.int64),
        )


def _lut_bits_for(n_keys: int, k: int) -> int:
    """LUT sizing policy: ~4 buckets per key (log2(n)+2 bits) so in-bucket
    bisection is 1-2 rounds for small indexes, capped at 2**24 entries
    (128 MB paired) so multi-Gbp indexes bisect O(log avg occupancy)
    instead of O(log n_keys)."""
    return min(2 * k, 24, max(12, int(np.ceil(np.log2(max(n_keys, 2)))) + 2))


def _build_lut(keys: np.ndarray, k: int):
    """Paired bucket LUT for the device hash lookup: row b of lut2 is
    [first index with key-top-bits >= b, same for b+1] — both bucket bounds
    in one device gather."""
    n = len(keys)
    lut_bits = _lut_bits_for(n, k)
    shift = 2 * k - lut_bits
    bounds = (np.arange((1 << lut_bits) + 1, dtype=np.int64) << shift)
    lut = np.searchsorted(keys, bounds).astype(np.int32)
    max_bucket = int(np.diff(lut).max()) if n else 0
    lut2 = np.stack([lut[:-1], lut[1:]], axis=1)
    return lut_bits, np.ascontiguousarray(lut2), \
        max(1, max_bucket.bit_length())


def _run_counts(keys: np.ndarray) -> np.ndarray:
    """uint8 plane: at the FIRST index of each equal-key run, the run length
    clipped to 255 (0 elsewhere). The device lookup reads it at the lower
    bound instead of bisecting the upper bound; max_occ < 255 (devseed gate)
    guarantees a clipped count can only ever be filtered out, identically
    to its true value."""
    n = len(keys)
    out = np.zeros(n, np.uint8)
    if n:
        first = np.concatenate([[True], keys[1:] != keys[:-1]])
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, n))
        out[starts] = np.minimum(counts, 255).astype(np.uint8)
    return out


def _stable_uniform(seed: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic per-row uniform [0,1) from integer keys — the analogue
    of the reference's filename-seeded tiebreaker RNG (lib/aligner.py:160)."""
    x = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
         + b.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
         + np.uint64(seed))
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _cigar_stats(cigar, read, ref, read_start, ref_start):
    """matches / edit distance from a CIGAR walk (M runs compared base-wise)."""
    m = 0
    nm = 0
    qi, ti = read_start, ref_start
    for length, op in cigar:
        if op == "M":
            a = read[qi: qi + length]
            b = ref[ti: ti + length]
            eq = int(np.sum(a == b))
            m += eq
            nm += length - eq
            qi += length
            ti += length
        elif op == "I":
            nm += length
            qi += length
        elif op == "D":
            nm += length
            ti += length
    return m, nm


def select_alignments(rid, score, q_from, q_to, seq, strand, t_from, t_to,
                      *, secondary_ratio: float = 1.0,
                      mask_level: float = 0.5, max_secondary: int = 50):
    """minimap2-style multi-locus selection (mm_set_parent / mm_select_sub
    semantics applied to extension scores). The reference's placement stage
    keeps multiple loci per (read, sequence) — chimeric ONT reads and repeats
    each get their own record (minimap2 -N 50 -p 1, megapath_nano.py:1270,
    lib/aligner.py:206) — and every downstream depth/spike/noise computation
    consumes them.

    Per read, candidates are ranked by score (stable: input order breaks
    ties). A candidate is PRIMARY when its query interval overlaps every
    higher-ranked primary by < mask_level of the shorter interval; otherwise
    it is SECONDARY to the best-overlapping primary and is kept only when
    score >= secondary_ratio * parent_score, up to max_secondary secondaries
    per read (-N). Same-locus duplicates (same seq + strand, query AND target
    intervals both overlapping >= 50% of the shorter) are dropped first.

    mapq: primaries get the minimap2-flavored best-vs-best-secondary ratio
    (f2 = the best score among the candidates it masks, kept or not);
    secondaries get mapq 0, as in minimap2 output.

    Inputs are equal-length 1-D arrays over candidate alignments. Returns
    (keep_idx, mapq, is_secondary): indices into the inputs (grouped by read,
    primaries before their ranking order), with per-kept-row mapq/flag.
    """
    n = len(rid)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z, z.astype(bool)
    order = np.lexsort((np.arange(n), -np.asarray(score),
                        np.asarray(rid)))
    rid_o = np.asarray(rid)[order]
    starts = np.flatnonzero(np.concatenate(
        [[True], rid_o[1:] != rid_o[:-1]]))
    bounds = np.append(starts, n)

    q_from = np.asarray(q_from)
    q_to = np.asarray(q_to)
    t_from = np.asarray(t_from)
    t_to = np.asarray(t_to)
    seq = np.asarray(seq)
    strand = np.asarray(strand)
    score = np.asarray(score)

    def _mapq(f1, f2):
        if f1 <= 0:
            return 0
        return int(min(60, 40.0 * max(0.0, 1.0 - f2 / f1)
                       + 0.01 * min(f1, 2000)))

    # vectorized fast path: a read with exactly ONE candidate is primary
    # with f2 = 0 — the overwhelmingly common case in metagenomic mapping,
    # so the per-read python loop below only visits multi-candidate reads
    run_len = np.diff(bounds)
    if (run_len == 1).all():
        idx = order[starts].astype(np.int64)
        f1 = score[idx].astype(np.float64)
        mq = np.where(f1 <= 0, 0.0,
                      np.minimum(60.0, 40.0 + 0.01 * np.minimum(f1, 2000)))
        return idx, mq.astype(np.int64), np.zeros(len(idx), bool)

    single = run_len == 1
    keep_idx: list[int] = []
    mapqs: list[int] = []
    secondary: list[bool] = []

    for b in range(len(starts)):
        cand = order[bounds[b]: bounds[b + 1]]
        if single[b]:
            i = int(cand[0])
            keep_idx.append(i)
            mapqs.append(_mapq(int(score[i]), 0))
            secondary.append(False)
            continue
        primaries: list[int] = []       # indices into cand-order
        prim_f2: list[int] = []         # best masked/secondary score per prim
        kept: list[tuple[int, bool, int]] = []  # (idx, is_sec, parent_slot)
        n_sec = 0
        seen: list[int] = []            # all kept indices, for dup check
        for i in cand:
            i = int(i)
            ql = q_to[i] - q_from[i]
            tl = t_to[i] - t_from[i]
            # same-locus duplicate?
            dup = False
            for j in seen:
                if seq[j] != seq[i] or strand[j] != strand[i]:
                    continue
                qo = min(q_to[i], q_to[j]) - max(q_from[i], q_from[j])
                to = min(t_to[i], t_to[j]) - max(t_from[i], t_from[j])
                if (qo >= 0.5 * min(ql, q_to[j] - q_from[j])
                        and to >= 0.5 * min(tl, t_to[j] - t_from[j])):
                    dup = True
                    break
            if dup:
                continue
            # primary mask test against selected primaries
            parent = -1
            best_ov = 0.0
            for slot, j in enumerate(primaries):
                qo = min(q_to[i], q_to[j]) - max(q_from[i], q_from[j])
                frac = qo / max(1, min(ql, q_to[j] - q_from[j]))
                if frac > best_ov:
                    best_ov = frac
                    parent = slot
            if best_ov < mask_level:
                primaries.append(i)
                prim_f2.append(0)
                kept.append((i, False, len(primaries) - 1))
                seen.append(i)
            else:
                ps = int(score[primaries[parent]])
                prim_f2[parent] = max(prim_f2[parent], int(score[i]))
                if (score[i] >= secondary_ratio * ps
                        and n_sec < max_secondary):
                    kept.append((i, True, parent))
                    seen.append(i)
                    n_sec += 1
        for i, is_sec, slot in kept:
            keep_idx.append(i)
            mapqs.append(0 if is_sec
                         else _mapq(int(score[i]), prim_f2[slot]))
            secondary.append(is_sec)
    return (np.array(keep_idx, np.int64), np.array(mapqs, np.int64),
            np.array(secondary, bool))


def fused_collect_np(arr_u16, qlens_a, id_base, read_names,
                     params: AlignParams, seq_names: list[str],
                     seq_lengths: np.ndarray, meta: SequenceMeta) -> AlignList:
    """Build align_list rows from downloaded _fused_tail stats rows
    (vectorized numpy). arr_u16: (rows, FUSED_COLS) uint16, counts row
    already stripped. Shared by the single-index MinimizerAligner and the
    multi-chip shard_map mapper (which concatenates per-shard row blocks
    first)."""
    p = params
    n_seqs = len(seq_names)
    seq_lens = seq_lengths
    arr = arr_u16.astype(np.int64)
    w_lo = arr[:, F_WLO_LO] | (arr[:, F_WLO_HI] << 16)

    kept = np.flatnonzero((arr[:, F_KEEP] == 1)
                          & (arr[:, F_SCORE] > p.min_alignment_score))
    if len(kept) == 0:
        return AlignList.empty(seq_names, meta.assembly_names,
                               read_names or [])
    # candidate geometry in original read coordinates (needed by the
    # multi-locus selection's query-overlap masking)
    rid_k = arr[kept, F_RID]
    qlen_k = qlens_a[rid_k].astype(np.int64)
    strand_k = arr[kept, F_STRAND]
    ob_k = arr[kept, F_QS] + arr[kept, F_BEGIN_I]   # oriented frame
    oe_k = arr[kept, F_QS] + arr[kept, F_END_I]
    rf_k = np.where(strand_k == 0, ob_k, qlen_k - (oe_k + 1))
    rt_k = np.where(strand_k == 0, oe_k + 1, qlen_k - ob_k)
    tf_k = w_lo[kept] + arr[kept, F_BEGIN_J]
    tt_k = w_lo[kept] + arr[kept, F_END_J] + 1

    # minimap2-style multi-locus selection (-N/-p semantics): keeps
    # multiple loci per (read, sequence) — chimeric reads and repeats
    sel, mapq, _is_sec = select_alignments(
        rid_k, arr[kept, F_SCORE], rf_k, rt_k, arr[kept, F_SEQ],
        strand_k, tf_k, tt_k, secondary_ratio=p.secondary_ratio,
        mask_level=p.mask_level,
        max_secondary=p.max_alignments_per_read)
    g = kept[sel]

    rid_s = rid_k[sel]
    seq_s = arr[g, F_SEQ]
    sc_s = arr[g, F_SCORE]
    qlen_s = qlen_k[sel]
    strand_s = strand_k[sel]

    out = np.zeros(len(g), ALIGN_DTYPE)
    out["read_id"] = rid_s + id_base
    out["read_length"] = qlen_s
    out["read_from"] = rf_k[sel]
    out["read_to"] = rt_k[sel]
    out["strand"] = strand_s
    out["sequence_id"] = seq_s
    out["sequence_length"] = seq_lens[seq_s]
    out["sequence_from"] = w_lo[g] + arr[g, F_BEGIN_J]
    out["sequence_to"] = w_lo[g] + arr[g, F_END_J] + 1
    out["match"] = arr[g, F_MATCH]
    out["mapq"] = mapq
    out["edit_dist"] = arr[g, F_EDIT]
    out["alignment_score"] = sc_s
    out["assembly_id"] = meta.assembly_idx[seq_s]
    out["tax_id"] = meta.tax_id[seq_s]
    out["species_tax_id"] = meta.species_tax_id[seq_s]
    out["genus_tax_id"] = meta.genus_tax_id[seq_s]
    out["alignment_score_tiebreaker"] = _stable_uniform(
        p.tiebreaker_seed, out["read_id"],
        out["sequence_id"].astype(np.int64) * np.int64(n_seqs + 1)
        + out["sequence_from"])
    order = np.lexsort((out["sequence_from"], out["sequence_id"],
                        out["read_id"]))
    return AlignList(out[order], list(seq_names),
                     list(meta.assembly_names), read_names or [],
                     None)


class MinimizerAligner:
    """End-to-end read mapper against a MinimizerIndex."""

    def __init__(self, index: MinimizerIndex, meta: SequenceMeta | None = None,
                 params: AlignParams | None = None):
        assert index.seq_data is not None, "index must keep target sequences"
        self.index = index
        self.params = params or AlignParams()
        self.meta = meta or SequenceMeta.single_assembly_per_sequence(
            index.seq_names)
        self._seq_data_dev = None   # device-resident target bases (lazy)
        # devseed overflow telemetry (partial-redo rate; logged on overflow)
        self.overflow_stats = {"slices": 0, "overflow_slices": 0,
                               "reads_redone": 0}
        # adaptive static-cap scales, raised by _devseed_cutoff on overflow
        self._cap_scales = {"w": 1.0, "a": 1.0, "g": 1.0, "out": 1.0}

    def _device_refs(self, starts: np.ndarray, t_max: int):
        """Gather (n, t_max) extension windows on device from the resident
        reference (4-bit packed — see _gather_windows) — the reference
        bases never cross the host↔device link after the first call (the
        link, not the DP, is the map-path bottleneck on a remote-attached
        TPU)."""
        import jax
        import jax.numpy as jnp

        if self._seq_data_dev is None:
            pad = np.full(2 ** 15, 5, np.int8)   # sentinel tail: windows
            data = np.concatenate([self.index.seq_data, pad])  # never shift
            self._seq_data_dev = jax.device_put(_pack_seq4(data))

        return _gather_windows(self._seq_data_dev,
                               jnp.asarray(starts, jnp.int32), t_max=t_max)

    def _device_index_meta(self):
        """Device-resident seq_offsets / seq_lengths (int32, lazy)."""
        import jax

        if getattr(self, "_seq_meta_dev", None) is None:
            self._seq_meta_dev = (
                jax.device_put(self.index.seq_offsets.astype(np.int32)),
                jax.device_put(self.index.seq_lengths.astype(np.int32)))
        return self._seq_meta_dev

    def _seq_bits(self) -> int:
        n_seqs = len(self.index.seq_names)
        return max(1, (max(n_seqs - 1, 1)).bit_length())

    def _device_index_planes(self):
        """Device-resident index planes for the device-seeded path:
        keys32 (sorted int32 hash table — valid because k <= 15 masks hashes
        to 30 bits), pos_t ((K,) int32 within-sequence k-mer end position),
        ss16 ((K,) uint16 seq_id << 1 | strand — 6 bytes/entry total instead
        of 8: at Gbp scale the position planes dominate HBM), the paired
        bucket LUT lut2 that replaces whole-table searchsorted on device
        with its static (lut_bits, n_bisect), and runcnt (uint8 equal-key
        run length at each run start, clipped 255 — one gather replaces the
        upper-bound bisection). Uploaded once, reused by every slice
        (lazy)."""
        import jax

        if getattr(self, "_planes_dev", None) is None:
            idx = self.index
            assert idx.k <= 15
            seq_id, pos, strand = idx.unpack(idx.positions)
            keys32 = idx.keys.astype(np.int64)
            assert keys32.size == 0 or keys32.max() < 2 ** 30
            lut_bits, lut2, n_bisect = _build_lut(keys32, idx.k)
            self._planes_dev = (
                jax.device_put(keys32.astype(np.int32)),
                jax.device_put(pos.astype(np.int32)),
                jax.device_put(((seq_id.astype(np.int32) << 1)
                                | strand).astype(np.uint16)),
                jax.device_put(lut2),
                jax.device_put(_run_counts(keys32)),
                lut_bits, n_bisect)
        return self._planes_dev

    def _devseed_ok(self, slice_n: int) -> bool:
        """Gate for the device-seeded fused path (all exactness-critical:
        hash fits 30 bits, identity key fits int32, seq ids fit the uint16
        download, index fits int32 addressing)."""
        p = self.params
        idx = self.index
        n_seqs = len(idx.seq_names)
        return (p.device_seed and idx.k <= 15 and len(idx.keys) > 0
                and 0 < n_seqs < 2 ** 15
                and slice_n < 2 ** 16
                and p.max_occ < 255          # runcnt plane is uint8-clipped
                and slice_n * (1 << (self._seq_bits() + 1)) < 2 ** 31 - 1
                and idx.seq_data.size < 2 ** 31 - 2 ** 16)

    @staticmethod
    def _devseed_caps(slice_n: int, read_max: int, occ: float = 0.0):
        """Static shape caps for the device-seeded dispatch, sized so typical
        ONT batches never overflow: minimizer density is ~2/(w+1) ≈ 0.18 per
        base (w=10), so n*L/4 winner slots leave ~40% headroom; anchor slots
        scale with the index's hash-space occupancy `occ` (positions /
        4^k — the expected SPURIOUS hits per query hash): true-locus hits
        are ~1/winner, spurious hits add ~occ/winner, so a_max covers
        (1 + occ) anchors/winner with 2x headroom, floored at wtot/2 (every
        512Ki-wide op costs ~4 ms on v5e, so the anchor plane width is the
        seed stage's main cost). Overflow falls back exactly via the counts
        row. g_max bounds the CHAIN stage only (the extension runs at
        out_cap after the post-chain compaction), so 2 candidate groups per
        read is the padding, not the budget."""
        def pow2(x, lo=4096):
            b = lo
            while b < x:
                b *= 2
            return b

        wtot_max = pow2(slice_n * read_max // 4)
        # anchors/winner budget: 0.5 on sparse indexes (measured 0.37 on
        # 6%-error ONT reads — mutations kill most true minimizer hits),
        # (1 + occ) once spurious hits matter; rounded to wtot/16 multiples
        # (static shapes stay stable: occ is fixed per index)
        frac = min(0.5 + 2.0 * occ, 4.0)
        gran = max(wtot_max // 16, 4096)
        a_max = -(-int(wtot_max * frac) // gran) * gran
        g_max = pow2(2 * slice_n)
        return wtot_max, a_max, g_max

    def _index_occupancy(self) -> float:
        """Expected spurious table hits per query hash: positions / 4^k."""
        idx = self.index
        return float(idx.positions.size) / float(4 ** idx.k)

    def _finish_fused(self, reads, read_names, id_base, groups, read_max,
                      _bucket, _band_for):
        """PAF-mode tail of the map step: one fused dispatch + one download.
        Device-seeded when eligible (only the 2-bit packed reads cross the
        link), host-seeded otherwise. On a device cap overflow only the
        affected read-id suffix re-runs through the exact host-seeded path
        (partial redo — every cap truncates read-id-major)."""
        slice_n = _bucket(len(reads), lo=256)   # pow2 pad: cache executables
        if self._devseed_ok(slice_n):
            fut, ctx = self._fused_submit_devseed(reads, slice_n,
                                                  read_max, _bucket,
                                                  _band_for)
            blk = np.asarray(fut)
            stats, counts = blk[:-1], _unpack_counts_row(blk[-1])
            cutoff = self._devseed_cutoff(counts, len(reads), ctx[1])
            if cutoff == len(reads):
                return self._fused_collect_np(stats, ctx[0], id_base,
                                              read_names)
            parts = []
            if cutoff > 0:
                kept = stats[stats[:, F_RID].astype(np.int64) < cutoff]
                parts.append(self._fused_collect_np(kept, ctx[0], id_base,
                                                    None))
            parts.append(self._host_seeded_fused(
                reads[cutoff:], id_base + cutoff, read_max, _bucket,
                _band_for))
            return self._concat_parts(parts, read_names)
        return self._host_seeded_fused(reads, id_base, read_max, _bucket,
                                       _band_for, read_names=read_names,
                                       groups=groups)

    def _host_seeded_fused(self, reads, id_base, read_max, _bucket,
                           _band_for, read_names=None, groups=None):
        """Exact host-seeded fused dispatch for a read list (full slice or a
        partial-redo suffix). Read-count shapes are pow2-bucketed so redo
        sets of different sizes reuse compiled executables."""
        if not reads:
            return AlignList.empty(self.index.seq_names,
                                   self.meta.assembly_names, read_names or [])
        if groups is None:
            groups = collect_anchors(self.index, reads,
                                     max_occ=self.params.max_occ,
                                     min_group_anchors=(
                                         self.params.min_group_anchors),
                                     gap_break=self.params.gap_break)
        if groups.n_groups == 0:
            return AlignList.empty(self.index.seq_names,
                                   self.meta.assembly_names, read_names or [])
        fut, ctx = self._fused_submit(reads, groups, read_max, _bucket,
                                      _band_for,
                                      n_rows=_bucket(len(reads), lo=256))
        blk = np.asarray(fut)
        return self._fused_collect_np(blk[:-1], ctx[0], id_base, read_names)

    def _concat_parts(self, parts, read_names):
        datas = [al.data for al in parts if len(al)]
        if not datas:
            return AlignList.empty(self.index.seq_names,
                                   self.meta.assembly_names, read_names or [])
        data = np.concatenate(datas)
        order = np.lexsort((data["sequence_from"], data["sequence_id"],
                            data["read_id"]))
        return AlignList(data[order], list(self.index.seq_names),
                         list(self.meta.assembly_names), read_names or [],
                         None)

    def _devseed_cutoff(self, counts: np.ndarray, n_reads: int,
                        caps=None) -> int:
        """First read id whose device-seeded candidates were truncated by a
        static cap (== n_reads when nothing overflowed). Reads below the
        cutoff are bit-exact; reads at/above it re-run host-seeded. Also
        accumulates the overflow telemetry surfaced by overflow_stats and
        ADAPTS the caps: an overflowed cap raises its scale factor (with
        20% headroom, bounded 8x) so subsequent slices compile one bigger
        executable instead of redoing reads forever — the static density
        model under-sizes a_max on dense indexes, where minimizer-vs-
        minimizer hash collisions are enriched ~(w+1)/2 over uniform."""
        cutoff = min(int(counts[4]), n_reads)
        st = self.overflow_stats
        st["slices"] += 1
        if cutoff < n_reads:
            st["overflow_slices"] += 1
            st["reads_redone"] += n_reads - cutoff
            if caps is not None:
                wtot_max, a_max, g_max, out_cap = caps
                sc = self._cap_scales
                for key, seen, cap in (("w", counts[0], wtot_max),
                                       ("a", counts[1], a_max),
                                       ("g", counts[2], g_max),
                                       ("out", counts[3], out_cap)):
                    if seen > cap:
                        grown = min(8.0, sc[key] * max(
                            1.25, 1.2 * float(seen) / float(cap)))
                        sc[key] = grown
            import logging

            logging.getLogger("megapath_nano_tpu.align").info(
                "devseed cap overflow: redoing %d/%d reads host-seeded "
                "(counts=%s; scales now %s; %d/%d slices overflowed)",
                n_reads - cutoff, n_reads, counts[:4].tolist(),
                self._cap_scales, st["overflow_slices"], st["slices"])
        return cutoff

    def _caps_scaled(self, slice_n: int, read_max: int):
        """Instance cap sizing: the static density model x the adaptively
        learned per-cap scale factors (see _devseed_cutoff)."""
        wtot_max, a_max, g_max = self._devseed_caps(
            slice_n, read_max, self._index_occupancy())
        sc = self._cap_scales

        def pow2up(x, lo):
            b = lo
            while b < x:
                b *= 2
            return b

        if sc["w"] > 1.0:
            wtot_max = pow2up(int(wtot_max * sc["w"]), wtot_max)
        if sc["a"] > 1.0:
            gran = max(wtot_max // 16, 4096)
            a_max = -(-int(a_max * sc["a"]) // gran) * gran
        if sc["g"] > 1.0:
            g_max = pow2up(int(g_max * sc["g"]), g_max)
        return wtot_max, a_max, g_max

    def _fused_submit_devseed(self, reads, slice_n, read_max, _bucket,
                              _band_for):
        """Pack + async device-seeded dispatch for one slice (padded to
        slice_n rows so every slice of a batch shares one executable).
        Returns (future, ctx) with ctx = (qlens, caps)."""
        p = self.params
        idx = self.index
        if self._seq_data_dev is None:
            self._device_refs(np.zeros(1, np.int32), 256)
        seq_off_dev, seq_len_dev = self._device_index_meta()
        keys32, pos_t, ss16, lut2, runcnt, lut_bits, n_bisect = \
            self._device_index_planes()

        packed2, exc_rid, exc_pos = _pack_reads2(reads, read_max,
                                                 n_rows=slice_n)
        qlens_a = np.zeros(slice_n, np.int32)
        qlens_a[:len(reads)] = [len(r) for r in reads]

        wtot_max, a_max, g_max = self._caps_scaled(slice_n, read_max)
        out_cap = 2048
        while out_cap < (p.devseed_out_per_read * self._cap_scales["out"]
                         * slice_n):
            out_cap *= 2
        out_cap = min(out_cap, g_max)
        q_max = read_max
        band = _band_for(q_max)
        # multiple-of-256 (not pow2): the kernel never reaches past
        # q_max + band/2, and pow2 rounding both wasted up to ~2x window
        # gather/VMEM and could blow the kernel's 32k packing limit
        t_max = -(-(q_max + band) // 256) * 256
        fut = _fused_map_dispatch_devseed(
            packed2, exc_rid, exc_pos, qlens_a, keys32, pos_t, ss16, lut2,
            runcnt, self._seq_data_dev, seq_off_dev, seq_len_dev,
            k=idx.k, w=idx.w, max_occ=p.max_occ,
            min_group_anchors=p.min_group_anchors, gap_break=p.gap_break,
            cap=p.fused_anchor_cap, seq_bits=self._seq_bits(),
            lut_bits=lut_bits, n_bisect=n_bisect,
            wtot_max=wtot_max, a_max=a_max, g_max=g_max, out_cap=out_cap,
            q_max=q_max, t_max=t_max, band=band, match=p.match,
            mismatch=p.mismatch, gap_open=p.gap_open,
            gap_extend=p.gap_extend, batch_tile=128, backend=p.backend,
            min_chain_score=p.min_chain_score,
            max_per_read=p.max_alignments_per_read,
            window_pad=p.window_pad)
        return fut, (qlens_a, (wtot_max, a_max, g_max, out_cap))

    def _fused_submit(self, reads, groups, read_max, _bucket, _band_for,
                      n_rows: int | None = None):
        """Host pack + async device dispatch for one slice (host-seeded).
        Returns (future, ctx) with ctx = (qlens, None); the device computes
        while the host prepares the next slice. n_rows pads the read matrix
        (shape bucketing for variable-size partial-redo sets)."""
        p = self.params
        idx = self.index
        if self._seq_data_dev is None:
            self._device_refs(np.zeros(1, np.int32), 256)
        seq_off_dev, seq_len_dev = self._device_index_meta()

        cap = p.fused_anchor_cap
        flat_q, flat_t, cnt, t_base = pack_groups_flat(groups, cap=cap)
        ng = len(cnt)
        gp = ((ng + 4095) // 4096) * 4096
        gmeta = np.zeros((5, gp), np.int32)
        gmeta[0, :ng] = groups.group_read
        gmeta[1, :ng] = groups.group_seq
        gmeta[2, :ng] = groups.group_strand
        gmeta[3, :ng] = t_base
        gmeta[4, :ng] = cnt
        na = len(flat_q)
        ap = 4096
        while ap < na:
            ap *= 2
        fq = np.zeros(ap, flat_q.dtype)
        ft = np.zeros(ap, flat_t.dtype)
        fq[:na] = flat_q
        ft[:na] = flat_t
        packed2, exc_rid, exc_pos = _pack_reads2(reads, read_max,
                                                 n_rows=n_rows)
        qlens_a = np.zeros(n_rows or len(reads), np.int32)
        qlens_a[:len(reads)] = [len(r) for r in reads]

        q_max = read_max
        band = _band_for(q_max)
        # multiple-of-256 (not pow2): the kernel never reaches past
        # q_max + band/2, and pow2 rounding both wasted up to ~2x window
        # gather/VMEM and could blow the kernel's 32k packing limit
        t_max = -(-(q_max + band) // 256) * 256
        fut = _fused_map_dispatch(
            packed2, exc_rid, exc_pos, qlens_a, fq, ft, gmeta,
            self._seq_data_dev, seq_off_dev, seq_len_dev, k=idx.k,
            a_bucket=cap, q_max=q_max, t_max=t_max,
            band=band, match=p.match, mismatch=p.mismatch,
            gap_open=p.gap_open, gap_extend=p.gap_extend, batch_tile=128,
            backend=p.backend, min_chain_score=p.min_chain_score,
            max_per_read=p.max_alignments_per_read,
            window_pad=p.window_pad)
        return fut, (qlens_a, None)

    def _fused_collect_np(self, arr_u16, qlens_a, id_base, read_names):
        return fused_collect_np(
            arr_u16, qlens_a, id_base, read_names, self.params,
            list(self.index.seq_names), self.index.seq_lengths, self.meta)

    # -- helpers ----------------------------------------------------------
    def _target_window(self, seq_id: int, start: int, end: int) -> np.ndarray:
        off = self.index.seq_offsets
        s0, s1 = int(off[seq_id]), int(off[seq_id + 1])
        start = max(s0 + start, s0)
        end = min(s0 + end, s1)
        return self.index.seq_data[start:end]

    def map_reads(self, reads: list[np.ndarray],
                  read_names: list[str] | None = None,
                  slice_size: int | None = None,
                  emit_cigars: bool = True) -> AlignList:
        """Map reads. With slice_size set and enough reads, slices run on two
        worker threads so one slice's host-side work (anchor collection, C++
        emit — GIL-releasing) overlaps the other's device DP.

        emit_cigars=False skips the host traceback: all alignment fields
        (begin/end/match/edit/score) come from the full-stats device kernel
        and cigar_map is None — the PAF-level mode (minimap2 without -a).
        Consumers that need base-level CIGARs (SAM output, AMR consensus,
        variant candidates) must map with emit_cigars=True."""
        if not emit_cigars and self._seq_data_dev is None:
            self._device_refs(np.zeros(1, np.int32), 256)  # pre-thread init
        if slice_size and len(reads) > slice_size:
            return self._map_reads_pipelined(reads, read_names, slice_size,
                                             emit_cigars)
        return self._map_reads_single(reads, read_names,
                                      emit_cigars=emit_cigars)

    def _map_reads_pipelined(self, reads, read_names, slice_size,
                             emit_cigars=True):
        p = self.params

        def _bucket(x, lo=256):
            b = lo
            while b < x:
                b *= 2
            return b

        def _band_for(qm):
            if p.band is not None:
                return p.band
            return 128 if qm <= 2048 else (256 if qm <= 8192 else 512)

        read_max = _bucket(max(len(r) for r in reads))
        # exactness gates: rid/seq_id ride uint16 result columns and the
        # per-read rank key is rid*2**15 + score in int32, so both the slice
        # read count and the sequence count must stay below 2**16 (the
        # non-fused path below is exact for larger problems)
        fused_ok = (not emit_cigars and p.fused
                    and read_max + _band_for(read_max) < 2 ** 15
                    and slice_size < 2 ** 16
                    and len(self.index.seq_names) < 2 ** 16
                    and self.index.seq_data.size < 2 ** 31 - 2 ** 16)
        if fused_ok:
            parts = self._map_slices_async(reads, slice_size, read_max,
                                           _bucket, _band_for)
        else:
            from concurrent.futures import ThreadPoolExecutor

            slices = [(s, reads[s: s + slice_size])
                      for s in range(0, len(reads), slice_size)]
            with ThreadPoolExecutor(max_workers=2) as ex:
                parts = list(ex.map(
                    lambda sv: self._map_reads_single(
                        sv[1], None, id_base=sv[0],
                        emit_cigars=emit_cigars),
                    slices))
        datas = []
        cigar_map: dict = {}
        for al in parts:
            if len(al) == 0:
                continue
            datas.append(al.data)
            cigar_map.update(al.cigar_map or {})
        if not datas:
            return AlignList.empty(self.index.seq_names,
                                   self.meta.assembly_names, read_names or [])
        data = np.concatenate(datas)
        order = np.lexsort((data["sequence_from"], data["sequence_id"],
                            data["read_id"]))
        return AlignList(data[order], list(self.index.seq_names),
                         list(self.meta.assembly_names), read_names or [],
                         cigar_map if emit_cigars else None)

    def _map_slices_async(self, reads, slice_size, read_max, _bucket,
                          _band_for):
        """Async pipeline over slices (fused PAF mode), in waves: every
        slice's fused dispatch is submitted back to back (jax dispatch is
        asynchronous — the host packs slice i+1 while the device runs
        slice i), then all of a wave's result matrices are concatenated ON
        DEVICE and fetched in ONE transfer. Each device→host fetch costs a
        fixed ~30 ms on this link regardless of size, so per-slice fetches —
        not DP, not upload — would bound the map path.

        Device-seeded when eligible; a slice whose counts row shows a cap
        overflow re-runs ONLY the affected read-id suffix through the exact
        host-seeded path (partial redo), deferred to trailing waves so the
        main wave never stalls."""
        import jax.numpy as jnp

        p = self.params
        if self._seq_data_dev is None:
            self._device_refs(np.zeros(1, np.int32), 256)
        use_dev = self._devseed_ok(slice_size)
        slices = [(s, reads[s: s + slice_size])
                  for s in range(0, len(reads), slice_size)]
        parts = []
        overflowed = []   # (id_base, reads) partial-redo suffixes
        WAVE = 16
        for w0 in range(0, len(slices), WAVE):
            wave = slices[w0: w0 + WAVE]
            subs = []
            for s, sl in wave:
                if use_dev:
                    fut, ctx = self._fused_submit_devseed(
                        sl, slice_size, read_max, _bucket, _band_for)
                else:
                    groups = collect_anchors(
                        self.index, sl, max_occ=p.max_occ,
                        min_group_anchors=p.min_group_anchors,
                        gap_break=p.gap_break)
                    if groups.n_groups == 0:
                        subs.append((s, sl, None, None))
                        continue
                    fut, ctx = self._fused_submit(sl, groups, read_max,
                                                  _bucket, _band_for)
                subs.append((s, sl, fut, ctx))
            futs = [f for _, _, f, _ in subs if f is not None]
            if not futs:
                continue
            big = np.asarray(futs[0] if len(futs) == 1
                             else jnp.concatenate(futs, axis=0))
            off = 0
            for s, sl, fut, ctx in subs:
                if fut is None:
                    continue
                rows = fut.shape[0]
                blk = big[off: off + rows]
                off += rows
                stats, counts = blk[:-1], _unpack_counts_row(blk[-1])
                if use_dev:
                    cutoff = self._devseed_cutoff(counts, len(sl), ctx[1])
                    if cutoff < len(sl):
                        # defer the affected suffix: inline re-runs would
                        # stall the whole wave
                        overflowed.append((s + cutoff, sl[cutoff:]))
                        if cutoff == 0:
                            continue
                        stats = stats[
                            stats[:, F_RID].astype(np.int64) < cutoff]
                parts.append(self._fused_collect_np(stats, ctx[0], s, None))
        # trailing host-seeded waves for devseed partial redos (exact path)
        for w0 in range(0, len(overflowed), WAVE):
            wave = overflowed[w0: w0 + WAVE]
            subs = []
            for s, sl in wave:
                groups = collect_anchors(
                    self.index, sl, max_occ=p.max_occ,
                    min_group_anchors=p.min_group_anchors,
                    gap_break=p.gap_break)
                if groups.n_groups == 0:
                    continue
                fut, ctx = self._fused_submit(sl, groups, read_max,
                                              _bucket, _band_for,
                                              n_rows=_bucket(len(sl)))
                subs.append((s, fut, ctx))
            if not subs:
                continue
            futs = [f for _, f, _ in subs]
            big = np.asarray(futs[0] if len(futs) == 1
                             else jnp.concatenate(futs, axis=0))
            off = 0
            for s, fut, ctx in subs:
                rows = fut.shape[0]
                blk = big[off: off + rows]
                off += rows
                parts.append(self._fused_collect_np(blk[:-1], ctx[0], s,
                                                    None))
        return parts

    def _map_reads_single(self, reads: list[np.ndarray],
                          read_names: list[str] | None = None,
                          id_base: int = 0,
                          emit_cigars: bool = True) -> AlignList:
        p = self.params
        idx = self.index
        n_seqs = len(idx.seq_names)
        seq_lens = idx.seq_lengths

        def _bucket(x, lo=256):
            b = lo
            while b < x:
                b *= 2
            return b

        def _band_for(qm):
            if self.params.band is not None:
                return self.params.band
            return 128 if qm <= 2048 else (256 if qm <= 8192 else 512)

        # PAF mode on in-range problems: the whole map step (chain → top-K →
        # windows → extension) runs as a single device dispatch with ragged
        # anchors and 2-bit packed reads on the wire
        read_max = _bucket(max(len(r) for r in reads))
        if (not emit_cigars and p.fused
                and read_max + _band_for(read_max) < 2 ** 15
                and len(reads) < 2 ** 16 and n_seqs < 2 ** 16
                and idx.seq_data.size < 2 ** 31 - 2 ** 16):
            # device-seeded when eligible: no host anchor collection at all
            return self._finish_fused(reads, read_names, id_base, None,
                                      read_max, _bucket, _band_for)

        groups = collect_anchors(idx, reads, max_occ=p.max_occ,
                                 min_group_anchors=p.min_group_anchors,
                                 gap_break=p.gap_break)
        if groups.n_groups == 0:
            return AlignList.empty(idx.seq_names, self.meta.assembly_names,
                                   read_names or [])

        # bucket the anchor dimension: scan length = smallest power of two
        # covering the largest group (capped) — typical reads need 32-64,
        # not the 256 worst case
        sizes = np.diff(groups.group_offsets)
        a_bucket = 32
        while a_bucket < min(int(sizes.max()), p.max_anchors_per_group):
            a_bucket *= 2
        qg, tg, cnt, t_base, _sel = pack_groups(groups, max_anchors=a_bucket)

        # chain in fixed-size chunks: exactly one compiled shape, and all
        # chunk outputs are stacked on device and fetched in one transfer
        ng = len(cnt)
        CHUNK = 4096
        import jax.numpy as jnp

        chunk_outs = []
        for c0 in range(0, ng, CHUNK):
            c1 = min(c0 + CHUNK, ng)
            m = c1 - c0
            qg_c = np.zeros((CHUNK, qg.shape[1]), qg.dtype)
            tg_c = np.zeros((CHUNK, tg.shape[1]), tg.dtype)
            cnt_c = np.zeros(CHUNK, np.int32)
            qg_c[:m] = qg[c0:c1]
            tg_c[:m] = tg[c0:c1]
            cnt_c[:m] = cnt[c0:c1]
            chunk_outs.append(chain_and_extents(qg_c, tg_c, cnt_c))
        stacked = np.asarray(jnp.concatenate(chunk_outs, axis=1)
                             if len(chunk_outs) > 1 else chunk_outs[0]
                             )[:, :ng]
        best = stacked[0].astype(np.int64)
        q_min, q_max_, t_min, t_max_ = stacked[1:5]

        keep = best >= p.min_chain_score
        g_ids = np.flatnonzero(keep)
        if len(g_ids) == 0:
            return AlignList.empty(idx.seq_names, self.meta.assembly_names,
                                   read_names or [])

        # top-K candidate groups per read by chain score
        order = np.lexsort((-best[g_ids], groups.group_read[g_ids]))
        g_sorted = g_ids[order]
        rids = groups.group_read[g_sorted]
        rank = np.zeros(len(g_sorted), np.int64)
        same = np.flatnonzero(np.append(False, rids[1:] == rids[:-1]))
        for s in same:  # cumulative rank within read runs
            rank[s] = rank[s - 1] + 1
        g_final = g_sorted[rank < p.max_alignments_per_read]

        # extension windows from device-computed chain extents
        recs = []
        ext_qlens, ext_starts, ext_wlens = [], [], []
        for g in g_final:
            rid = int(groups.group_read[g])
            seq_id = int(groups.group_seq[g])
            strand = int(groups.group_strand[g])
            qlen = len(reads[rid])
            q_lo = int(q_min[g]) - (idx.k - 1)
            q_hi = int(q_max_[g]) + 1
            t_lo = int(t_min[g]) + int(t_base[g]) - (idx.k - 1)
            t_hi = int(t_max_[g]) + int(t_base[g]) + 1
            # extension problem: slice BOTH query and target around the
            # chain so the alignment diagonal starts at ~(0, 0) — required
            # by the diagonal-banded kernel, and correct for partial matches
            # (e.g. a long query containing a short gene mid-way).
            # Diagonal back-shift for widened bands (see _fused_tail).
            wband = p.band if p.band is not None else 0
            wpad = p.window_pad
            dshift = min(wband // 8, 64) if wband > 128 else 0
            seq_off = int(idx.seq_offsets[seq_id])
            seq_len = int(seq_lens[seq_id])
            left = min(q_lo, t_lo) + wpad
            right = min(qlen - q_hi, seq_len - t_hi) + wpad
            qs = max(q_lo - left, 0)
            qe = min(q_hi + right, qlen)
            w_lo = max(t_lo - (q_lo - qs) - dshift, 0)
            w_hi = min(t_hi + (qe - q_hi) + dshift, seq_len)
            recs.append(dict(rid=rid, seq_id=seq_id, strand=strand,
                             qlen=qlen, w_lo=w_lo, w_hi=w_hi, qs=qs, qe=qe,
                             chain_score=int(best[g]),
                             # un-padded chain extents (oriented q frame /
                             # absolute t) — the coordinates minimap2 uses
                             # for primary/secondary marking (mm_set_parent
                             # runs on chains, before base-level extension)
                             cq_lo=max(q_lo, 0), cq_hi=min(q_hi, qlen),
                             ct_lo=max(t_lo, 0), ct_hi=min(t_hi, seq_len)))
            ext_qlens.append(qe - qs)
            ext_starts.append(seq_off + w_lo)
            ext_wlens.append(w_hi - w_lo)

        # batched banded extension on device. Shapes are bucketed to powers
        # of two so XLA executables cache across calls (a fresh shape means a
        # 20-40s remote compile on the TPU tunnel).
        n_ext = len(recs)

        def _bucket(x, lo=256):
            b = lo
            while b < x:
                b *= 2
            return b

        q_max = _bucket(max(ext_qlens))
        t_max = _bucket(max(max(ext_wlens), q_max))
        # band: indel drift grows ~sqrt(len); 128 covers reads to ~2 kb
        if p.band is not None:
            band = p.band
        elif q_max <= 2048:
            band = 128
        elif q_max <= 8192:
            band = 256
        else:
            band = 512
        bt = 128
        # full-stats device kernel (PAF mode) needs windows < 32k for its
        # packed companions; fall back to host emit beyond that
        full_ok = (not emit_cigars) and q_max + band < 2 ** 15 \
            and max(t_max, q_max) + band < 2 ** 15
        import jax.numpy as _jnp

        if full_ok:
            # single extension dispatch: the packed read batch crosses the
            # link once; query windows (with strand flip) and target windows
            # are both gathered on device (the remote link, not the DP,
            # bounds this path)
            if self._seq_data_dev is None:   # also set by map_reads pre-init
                self._device_refs(np.zeros(1, np.int32), 256)
            mp = ((n_ext + 1023) // 1024) * 1024
            read_max = _bucket(max(len(r) for r in reads))
            packed2, exc_rid, exc_pos = _pack_reads2(reads, read_max)
            meta_a = np.zeros((6, mp), np.int32)
            meta_a[0, :n_ext] = [r["rid"] for r in recs]
            meta_a[1, :n_ext] = [r["qs"] for r in recs]
            meta_a[2, :n_ext] = ext_qlens
            meta_a[3, :n_ext] = [r["strand"] for r in recs]
            meta_a[4, :n_ext] = ext_starts
            meta_a[5, :n_ext] = ext_wlens
            qlens_a = np.array([len(r) for r in reads], np.int32)
            full = np.asarray(_extend_full_dispatch(
                packed2, exc_rid, exc_pos, qlens_a, meta_a,
                self._seq_data_dev,
                q_max=q_max, t_max=t_max, band=band, match=p.match,
                mismatch=p.mismatch, gap_open=p.gap_open,
                gap_extend=p.gap_extend, batch_tile=bt,
                backend=p.backend)[:n_ext]).astype(np.int64)
            scores = full[:, 0]
        else:
            ext_reads = [
                (reads[r["rid"]] if r["strand"] == 0
                 else revcomp(reads[r["rid"]]))[r["qs"]: r["qe"]]
                for r in recs]
            ext_refs = [idx.seq_data[s: s + L]
                        for s, L in zip(ext_starts, ext_wlens)]
            score_parts = []
            for s0 in range(0, n_ext, p.extend_batch):
                s1 = min(s0 + p.extend_batch, n_ext)
                m = s1 - s0
                mp = ((m + bt - 1) // bt) * bt  # pad so (mp, bt) is stable
                ra = np.full((mp, q_max), 4, np.int8)
                ta = np.full((mp, t_max), 5, np.int8)
                rl = np.zeros(mp, np.int32)
                tl = np.zeros(mp, np.int32)
                for i in range(m):
                    rr, tt = ext_reads[s0 + i], ext_refs[s0 + i]
                    ra[i, : len(rr)] = rr
                    ta[i, : len(tt)] = tt
                    rl[i] = len(rr)
                    tl[i] = len(tt)
                sc, _, _ = banded_sw_scores(
                    ra, rl, ta, tl, band=band, match=p.match,
                    mismatch=p.mismatch, gap_open=p.gap_open,
                    gap_extend=p.gap_extend, batch_tile=bt,
                    backend=p.backend)
                score_parts.append(sc[:m])
            # one device->host transfer for all extension scores
            scores = np.asarray(_jnp.concatenate(score_parts)
                                if len(score_parts) > 1 else score_parts[0]
                                ).astype(np.int64)

        # minimap2-style multi-locus selection (-N/-p semantics) on the
        # un-padded chain extents + device extension scores; exact emit
        # (begin/end/CIGAR) then runs only on the kept set
        ok = np.flatnonzero(scores > p.min_alignment_score)
        if len(ok) == 0:
            return AlignList.empty(idx.seq_names, self.meta.assembly_names,
                                   read_names or [])
        rid_c = np.array([recs[i]["rid"] for i in ok], np.int64)
        seq_c = np.array([recs[i]["seq_id"] for i in ok], np.int64)
        strand_c = np.array([recs[i]["strand"] for i in ok], np.int64)
        qlen_c = np.array([recs[i]["qlen"] for i in ok], np.int64)
        cq_lo = np.array([recs[i]["cq_lo"] for i in ok], np.int64)
        cq_hi = np.array([recs[i]["cq_hi"] for i in ok], np.int64)
        qf_c = np.where(strand_c == 0, cq_lo, qlen_c - cq_hi)
        qt_c = np.where(strand_c == 0, cq_hi, qlen_c - cq_lo)
        tf_c = np.array([recs[i]["ct_lo"] for i in ok], np.int64)
        tt_c = np.array([recs[i]["ct_hi"] for i in ok], np.int64)
        sel, mapq_sel, _is_sec = select_alignments(
            rid_c, scores[ok], qf_c, qt_c, seq_c, strand_c, tf_c, tt_c,
            secondary_ratio=p.secondary_ratio, mask_level=p.mask_level,
            max_secondary=p.max_alignments_per_read)
        emit_idx = [int(i) for i in ok[sel]]

        if full_ok:
            # PAF mode: every field comes from the device kernel's carried
            # path statistics; no host DP, no CIGARs
            stats = [(int(full[i, 5]), int(full[i, 1]), int(full[i, 6]),
                      int(full[i, 2]), int(full[i, 3]), int(full[i, 4]),
                      int(full[i, 0])) for i in emit_idx]
        else:
            # exact emit (begin/end/CIGAR/match/NM) via the native threaded
            # banded aligner — O(band*len) per kept alignment
            from megapath_nano_tpu.native.banded import banded_align_batch

            # narrow-band first (2x cheaper); any pair whose score misses the
            # device banded score gets redone at the full band — exactness
            # guaranteed by the cross-check, speed by the common case
            emit_band = max(64, band // 2)
            emit_alns = banded_align_batch(
                [ext_reads[i] for i in emit_idx],
                [ext_refs[i] for i in emit_idx],
                band=emit_band, match=p.match, mismatch=p.mismatch,
                gap_open=p.gap_open, gap_extend=p.gap_extend)
            redo = [r for r, i in enumerate(emit_idx)
                    if emit_alns[r].score != scores[i]]
            if redo:
                fixed = banded_align_batch(
                    [ext_reads[emit_idx[r]] for r in redo],
                    [ext_refs[emit_idx[r]] for r in redo],
                    band=band, match=p.match, mismatch=p.mismatch,
                    gap_open=p.gap_open, gap_extend=p.gap_extend)
                for r, a in zip(redo, fixed):
                    emit_alns[r] = a
            stats = [(a.read_begin, a.read_end, a.ref_begin, a.ref_end,
                      a.n_match, a.edit_dist, int(a.score))
                     for a in emit_alns]

        out = np.zeros(len(emit_idx), ALIGN_DTYPE)
        cigar_map: dict | None = {} if emit_cigars else None
        best_for_pair: dict[tuple, int] = {}  # (rid, sid) -> best score seen
        for row, (i, st) in enumerate(zip(emit_idx, stats)):
            rb, re_, tb, te, n_match, edit_dist, score = st
            r = recs[i]
            rid = r["rid"]
            seq_id = r["seq_id"]
            qlen = r["qlen"]
            ob = r["qs"] + rb                 # oriented-frame begin/end
            oe = r["qs"] + re_
            if r["strand"] == 0:
                read_from, read_to = ob, oe + 1
            else:  # flip back to original read coordinates
                read_from = qlen - (oe + 1)
                read_to = qlen - ob
            seq_from = r["w_lo"] + tb
            seq_to = r["w_lo"] + te + 1
            out[row] = (
                rid + id_base, qlen, read_from, read_to, r["strand"], seq_id,
                int(seq_lens[seq_id]), seq_from, seq_to, n_match,
                int(mapq_sel[row]), edit_dist, score,
                int(self.meta.assembly_idx[seq_id]),
                int(self.meta.tax_id[seq_id]),
                int(self.meta.species_tax_id[seq_id]),
                int(self.meta.genus_tax_id[seq_id]),
                0.0,
            )
            if cigar_map is not None:
                entry = (emit_alns[row].cigar, r["qs"] + rb, r["strand"])
                # every locus is addressable by (rid, sid, seq_from); the
                # best locus per (rid, sid) also owns the legacy 2-key used
                # by per-(read, seq) consumers (variant/, amr/consensus)
                cigar_map[(rid + id_base, seq_id, seq_from)] = entry
                pk = (rid + id_base, seq_id)
                if score > best_for_pair.get(pk, -1):
                    best_for_pair[pk] = score
                    cigar_map[pk] = entry
        out["alignment_score_tiebreaker"] = _stable_uniform(
            p.tiebreaker_seed, out["read_id"],
            out["sequence_id"].astype(np.int64) * np.int64(n_seqs + 1)
            + out["sequence_from"])
        order = np.lexsort((out["sequence_from"], out["sequence_id"],
                            out["read_id"]))
        return AlignList(out[order], list(idx.seq_names),
                         list(self.meta.assembly_names), read_names or [],
                         cigar_map)
