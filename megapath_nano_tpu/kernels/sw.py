"""Pallas TPU kernel: batched banded affine-gap Smith-Waterman scoring.

This is the device-side scoring engine replacing the role of the reference's
SIMD Smith-Waterman (reference: bin/realignment/realign/ssw.c:123 — Farrar
striped SSE2) with a TPU-idiomatic formulation:

- Batch of (read, ref) pairs; each lane-row of state holds one pair's DP band.
- State layout (BATCH_TILE, BAND): batch on sublanes, band on lanes — every
  DP step is a full-width VPU op.
- Row-wise recurrence over read positions. The band is diagonal: at read row
  i, band slot k covers ref position j = i + k - BAND/2, so the diagonal
  predecessor stays at slot k and the vertical predecessor at slot k+1.
- The within-row horizontal dependency (gap-in-ref chain F[k] =
  max(H[k-1]-gapO, F[k-1]-gapE)) — the part Farrar solves with the sequential
  "lazy-F" loop — is closed-form here: F = shifted-prefix-max of
  (Hnod[k] - gapO + k*gapE) minus k*gapE, computed with log2(BAND) shift+max
  steps. Exact, branch-free, fully vectorized.

Semantics: textbook local SW (clamp at 0) over the band; affine gap cost
gapO + (L-1)*gapE for a length-L gap, identical to ssw.c's recurrence. Scores
match the reference exactly whenever the optimal path stays within the band
(tests/test_sw_kernel.py asserts this against the native parity core).

The kernel only scores (score + end positions, plus optional start positions
via a reversed second pass at the call site). Base-exact CIGARs for the
winning alignments are produced by the native emit path (cpp/mpn_ssw.cc),
mirroring how minimap2 only tracebacks primary alignments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 29)  # plain int: closed over as a compile-time constant


def _shift_lanes_right(x, s, fill, use_pltpu):
    """Shift along the last (lane) axis: out[..., k] = x[..., k-s]."""
    if use_pltpu:
        rolled = pltpu.roll(x, s, axis=1)
    else:
        rolled = jnp.roll(x, s, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane < s, fill, rolled)


def _shift_lanes_left(x, s, fill, use_pltpu):
    """out[..., k] = x[..., k+s]."""
    if use_pltpu:
        rolled = pltpu.roll(x, x.shape[1] - s, axis=1)  # negative, wrapped
    else:
        rolled = jnp.roll(x, -s, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane >= x.shape[1] - s, fill, rolled)


def _prefix_max_exclusive(x, band, use_pltpu):
    """out[..., k] = max(x[..., :k]) (exclusive), NEG when k == 0."""
    y = _shift_lanes_right(x, 1, NEG, use_pltpu)
    s = 1
    while s < band:
        y = jnp.maximum(y, _shift_lanes_right(y, s, NEG, use_pltpu))
        s *= 2
    return y


def _row_step_factory(*, band, match, mismatch, gap_open, gap_extend,
                      use_pltpu):
    """The shared DP row update, used by both the Pallas kernel (use_pltpu)
    and the pure-jnp fallback/testing backend."""

    def row_step(i, carry, read_col, ref_slice, rlen):
        h_prev, e_prev, best_v, best_i_v = carry
        bt = h_prev.shape[0]

        is_ambig = jnp.logical_or(read_col == 4, ref_slice >= 4)
        sub = jnp.where(
            is_ambig,
            jnp.int32(0),
            jnp.where(read_col == ref_slice, jnp.int32(match),
                      jnp.int32(-mismatch)),
        )
        # out-of-sequence ref slots (sentinel 5) kill the cell entirely
        dead = ref_slice == 5

        m = h_prev + sub                                          # diagonal
        e_up_h = _shift_lanes_left(h_prev, 1, NEG, use_pltpu)     # (i-1, j)
        e_up_e = _shift_lanes_left(e_prev, 1, NEG, use_pltpu)
        e = jnp.maximum(e_up_h - gap_open, e_up_e - gap_extend)
        h_nod = jnp.maximum(m, e)
        h_nod = jnp.where(dead, NEG, h_nod)

        # F closed form: F[k] = max_{m<k}(Hnod[m] - gapO - (k-1-m)*gapE)
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, band), dimension=1)
        g = h_nod - gap_open + lane * gap_extend
        f = _prefix_max_exclusive(g, band, use_pltpu) \
            - (lane - 1) * gap_extend
        h = jnp.maximum(jnp.maximum(h_nod, f), 0)
        h = jnp.where(dead, 0, h)
        # rows beyond the read's real length contribute nothing
        active = i < rlen                                         # (BT,1)
        h = jnp.where(active, h, h_prev)
        e = jnp.where(active, jnp.maximum(e, 0), e_prev)

        # per-lane running best (no cross-lane reduction inside the loop;
        # _reduce_best recovers the global (max score, min i, min k) rule)
        improved = jnp.logical_and(h > best_v, active)
        best_v = jnp.where(improved, h, best_v)
        best_i_v = jnp.where(improved, i, best_i_v)
        return h, e, best_v, best_i_v

    return row_step


def _reduce_best(best_v, best_i_v, band, extra=()):
    """Final cross-lane reduction of per-lane running bests: global best =
    max score, ties → smallest read row i, ties → smallest lane k (the same
    (earliest row, smallest ref position) rule the per-step reduction
    enforced; per-lane tracking keeps, for each lane, the earliest row
    achieving that lane's max, so the lexicographic reduction is exact).
    Returns (best, best_i, best_k, *extra_at_best) as (BT, 1) columns."""
    bt = best_v.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, band), dimension=1)
    big = jnp.int32(2 ** 30)
    best = jnp.max(best_v, axis=1, keepdims=True)
    at_s = best_v == best
    best_i = jnp.min(jnp.where(at_s, best_i_v, big), axis=1, keepdims=True)
    at_si = jnp.logical_and(at_s, best_i_v == best_i)
    best_k = jnp.min(jnp.where(at_si, lane, band), axis=1, keepdims=True)
    at_k = lane == best_k
    outs = tuple(jnp.sum(jnp.where(at_k, x, 0), axis=1, keepdims=True)
                 for x in extra)
    # all-zero state (no positive cell): report (0, 0, 0)
    none = best <= 0
    best = jnp.where(none, 0, best)
    best_i = jnp.where(none, 0, best_i)
    best_k = jnp.where(none, 0, best_k)
    return (best, best_i, best_k) + outs


def _row_step_full_factory(*, band, match, mismatch, gap_open, gap_extend,
                           use_pltpu):
    """DP row update carrying per-path statistics alongside the scores.

    Each DP state (H, E) carries two packed int32 companions describing the
    best path ending in that state:
      P = n_match << 16 | n_edit      (edit = mismatches + ins + del)
      B = (begin_read + band) << 15 | (begin_ref_in_band_frame + band)
    Tie rules mirror the native emit traceback exactly (cpp/mpn_banded.cc):
    diagonal >= E >= F at H-selection, gap-extension wins ties inside E/F
    chains, and F prefers the earliest opener. The forward-carried stats
    therefore describe the SAME path the host traceback would walk, so
    match/edit/begin/end are exact — the taxon pipeline needs no host DP.

    Range limits (asserted by the caller): q_max + band < 2**15 for the B
    packing and path length < 2**16 for the P packing.
    """

    def row_step(i, carry, read_col, ref_slice, rlen):
        (h_prev, e_prev, p_h, b_h, p_e, b_e,
         best_v, best_i_v, best_p_v, best_b_v) = carry
        bt = h_prev.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, band), dimension=1)

        is_ambig = jnp.logical_or(read_col == 4, ref_slice >= 4)
        sub = jnp.where(
            is_ambig, jnp.int32(0),
            jnp.where(read_col == ref_slice, jnp.int32(match),
                      jnp.int32(-mismatch)))
        dead = ref_slice == 5
        is_match = jnp.logical_and(read_col == ref_slice,
                                   jnp.logical_not(is_ambig))

        cur_j = i + lane - band // 2
        cur_b = (i + band) * 32768 + (cur_j + band)

        # diagonal: fresh start when the predecessor H is 0 (local stop)
        m = h_prev + sub
        fresh = h_prev == 0
        inc = jnp.where(is_match, jnp.int32(1 << 16), jnp.int32(1))
        p_m = jnp.where(fresh, 0, p_h) + inc
        b_m = jnp.where(fresh, cur_b, b_h)

        sh = lambda x, fill: _shift_lanes_left(x, 1, fill, use_pltpu)  # noqa
        e_up_h, e_up_e = sh(h_prev, NEG), sh(e_prev, NEG)
        p_h_up, b_h_up = sh(p_h, 0), sh(b_h, 0)
        p_e_up, b_e_up = sh(p_e, 0), sh(b_e, 0)
        eo = e_up_h - gap_open
        ee = e_up_e - gap_extend
        e = jnp.maximum(eo, ee)
        take_ext = ee >= eo                       # extension wins ties
        p_e_new = jnp.where(take_ext, p_e_up, p_h_up) + 1
        b_e_new = jnp.where(take_ext, b_e_up, b_h_up)

        take_m = m >= e                           # diagonal wins ties
        h_nod = jnp.maximum(m, e)
        p_nod = jnp.where(take_m, p_m, p_e_new)
        b_nod = jnp.where(take_m, b_m, b_e_new)
        h_nod = jnp.where(dead, NEG, h_nod)

        # F closed form with companions: tuple prefix-max, earliest opener
        # wins ties (== the emit chain's ext >= open rule)
        g = h_nod - gap_open + lane * gap_extend
        gp = p_nod + (band - lane)   # NM gets +(k - k') after the scan
        gb = b_nod
        y = _shift_lanes_right(g, 1, NEG, use_pltpu)
        yp = _shift_lanes_right(gp, 1, 0, use_pltpu)
        yb = _shift_lanes_right(gb, 1, 0, use_pltpu)
        s = 1
        while s < band:
            ys = _shift_lanes_right(y, s, NEG, use_pltpu)
            yps = _shift_lanes_right(yp, s, 0, use_pltpu)
            ybs = _shift_lanes_right(yb, s, 0, use_pltpu)
            take = ys >= y                        # earlier lane wins ties
            y = jnp.where(take, ys, y)
            yp = jnp.where(take, yps, yp)
            yb = jnp.where(take, ybs, yb)
            s *= 2
        f = y - (lane - 1) * gap_extend
        p_f = yp + lane - band
        b_f = yb

        take_nod = h_nod >= f                     # diag/E win ties over F
        h = jnp.maximum(h_nod, f)
        p_hx = jnp.where(take_nod, p_nod, p_f)
        b_hx = jnp.where(take_nod, b_nod, b_f)
        h = jnp.maximum(h, 0)
        h = jnp.where(dead, 0, h)
        pos = h > 0
        p_h_new = jnp.where(pos, p_hx, 0)
        b_h_new = jnp.where(pos, b_hx, cur_b)
        e_row = jnp.where(dead, 0, jnp.maximum(e, 0))

        active = i < rlen                         # (BT,1)
        h = jnp.where(active, h, h_prev)
        e_row = jnp.where(active, e_row, e_prev)
        p_h_new = jnp.where(active, p_h_new, p_h)
        b_h_new = jnp.where(active, b_h_new, b_h)
        p_e_new = jnp.where(active, p_e_new, p_e)
        b_e_new = jnp.where(active, b_e_new, b_e)

        # per-lane running best (one final cross-lane reduction recovers the
        # (max score, min i, min k) rule — see _reduce_best)
        improved = jnp.logical_and(h > best_v, active)
        best_v = jnp.where(improved, h, best_v)
        best_i_v = jnp.where(improved, i, best_i_v)
        best_p_v = jnp.where(improved, p_h_new, best_p_v)
        best_b_v = jnp.where(improved, b_h_new, best_b_v)
        return (h, e_row, p_h_new, b_h_new, p_e_new, b_e_new,
                best_v, best_i_v, best_p_v, best_b_v)

    return row_step


def _full_init(bt, band):
    zeros = jnp.zeros((bt, band), jnp.int32)
    return (zeros, zeros, zeros, zeros, zeros, zeros,
            zeros, zeros, zeros, zeros)


def _full_outputs(best, best_i, best_k, best_p, best_b, band):
    half = band // 2
    end_j = best_i + best_k - half
    n_match = best_p // 65536
    n_edit = best_p - n_match * 65536
    beg_i = best_b // 32768 - band
    beg_j = best_b - (best_b // 32768) * 32768 - band
    return best, best_i, end_j, n_match, n_edit, beg_i, beg_j


def _sw_kernel_full(reads_ref, rlens_ref, refs_ref, tlens_ref, out_ref,
                    *, band, q_max, match, mismatch, gap_open, gap_extend):
    """Full-stats variant of _sw_kernel: out (BT, 8) int32 =
    [score, end_read, end_ref, n_match, n_edit, begin_read, begin_ref, 0]."""
    bt = reads_ref.shape[0]
    rlen = rlens_ref[:, 0:1]
    step = _row_step_full_factory(band=band, match=match, mismatch=mismatch,
                                  gap_open=gap_open, gap_extend=gap_extend,
                                  use_pltpu=True)

    def row_step(i, carry):
        base = pl.multiple_of((i // 128) * 128, 128)
        off = i - base
        ref_win = refs_ref[:, pl.ds(base, band + 128)].astype(jnp.int32)
        ref_slice = pltpu.roll(ref_win, band + 128 - off, axis=1)[:, 0:band]
        read_win = reads_ref[:, pl.ds(base, 128)].astype(jnp.int32)
        read_col = pltpu.roll(read_win, 128 - off, axis=1)[:, 0:1]
        return step(i, carry, read_col, ref_slice, rlen)

    # dynamic trip count: rows past every read's length are pure no-ops
    # (active mask), so loop only to the tile's longest read — an all-padding
    # tile (compacted-out rows, rl = 0) costs ~zero DP time
    q_hi = jnp.minimum(jnp.int32(q_max), jnp.max(rlens_ref[:, 0]))
    carry = jax.lax.fori_loop(0, q_hi, row_step, _full_init(bt, band))
    best_v, best_i_v, best_p_v, best_b_v = carry[6:]
    best, best_i, best_k, best_p, best_b = _reduce_best(
        best_v, best_i_v, band, extra=(best_p_v, best_b_v))
    s, ei, ej, nm_, ne_, bi, bj = _full_outputs(best, best_i, best_k,
                                                best_p, best_b, band)
    out_ref[:, 0:1] = s
    out_ref[:, 1:2] = ei
    out_ref[:, 2:3] = ej
    out_ref[:, 3:4] = nm_
    out_ref[:, 4:5] = ne_
    out_ref[:, 5:6] = bi
    out_ref[:, 6:7] = bj
    out_ref[:, 7:8] = jnp.zeros((bt, 1), jnp.int32)


def _sw_jnp_full(reads, read_lens, refs_padded, *, band, q_max,
                 match, mismatch, gap_open, gap_extend):
    step = _row_step_full_factory(band=band, match=match, mismatch=mismatch,
                                  gap_open=gap_open, gap_extend=gap_extend,
                                  use_pltpu=False)
    n = reads.shape[0]
    rlen = read_lens[:, None].astype(jnp.int32)

    def scan_body(carry, i):
        ref_slice = jax.lax.dynamic_slice_in_dim(refs_padded, i, band, axis=1)
        read_col = jax.lax.dynamic_slice_in_dim(reads, i, 1, axis=1)
        return step(i, carry, read_col, ref_slice, rlen), None

    carry, _ = jax.lax.scan(scan_body, _full_init(n, band),
                            jnp.arange(q_max, dtype=jnp.int32))
    best_v, best_i_v, best_p_v, best_b_v = carry[6:]
    best, best_i, best_k, best_p, best_b = _reduce_best(
        best_v, best_i_v, band, extra=(best_p_v, best_b_v))
    outs = _full_outputs(best, best_i, best_k, best_p, best_b, band)
    return jnp.concatenate([o for o in outs], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("band", "match", "mismatch", "gap_open", "gap_extend",
                     "batch_tile", "backend"),
)
def banded_sw_full(
    reads: jax.Array,      # (N, q_max) int8, padded with 4/5
    read_lens: jax.Array,  # (N,) int32
    refs: jax.Array,       # (N, t_max) int8, padded with 5
    ref_lens: jax.Array,   # (N,) int32
    *,
    band: int = 128,
    match: int = 2,
    mismatch: int = 4,
    gap_open: int = 4,
    gap_extend: int = 2,
    batch_tile: int = 64,
    backend: str = "pallas",
):
    """Batched banded local SW with full per-alignment statistics.

    Returns (N, 7) int32 columns: score, end_read, end_ref, n_match, n_edit,
    begin_read, begin_ref (begin/end inclusive, window-local coordinates).
    This is the taxon pipeline's alignment engine: exact PAF-level records
    with no host-side DP (CIGARs, when requested, still come from the native
    emit — reference: minimap2 computes CIGARs only with -a, the PAF default
    carries match/block counts only).
    """
    n, q_max = reads.shape
    t_max = refs.shape[1]
    half = band // 2
    assert band % 128 == 0, "band must be a multiple of 128 lanes"
    assert q_max + band < 2 ** 15 and t_max + band < 2 ** 15, \
        "full-stats kernel packing needs windows < 32k (use host emit)"

    q_pad = (-q_max) % 128
    if q_pad:
        reads = jnp.pad(reads, ((0, 0), (0, q_pad)), constant_values=4)
        q_max += q_pad
    t_need = max(t_max, q_max)
    t_pad = (-t_need) % 128 + (t_need - t_max)
    if t_pad:
        refs = jnp.pad(refs, ((0, 0), (0, t_pad)), constant_values=5)
        t_max += t_pad
    n_pad = (-n) % batch_tile
    if n_pad:
        reads = jnp.pad(reads, ((0, n_pad), (0, 0)), constant_values=4)
        refs = jnp.pad(refs, ((0, n_pad), (0, 0)), constant_values=5)
        read_lens = jnp.pad(read_lens, (0, n_pad))
        ref_lens = jnp.pad(ref_lens, (0, n_pad))
    refs_padded = jnp.pad(refs, ((0, 0), (half, half)), constant_values=5)
    col = jnp.arange(t_max + band, dtype=jnp.int32)[None, :]
    refs_padded = jnp.where(col >= ref_lens[:, None] + half, 5,
                            refs_padded).astype(jnp.int8)

    if backend == "jnp":
        out = _sw_jnp_full(reads, read_lens, refs_padded, band=band,
                           q_max=q_max, match=match, mismatch=mismatch,
                           gap_open=gap_open, gap_extend=gap_extend)
        return out[:n]

    n_t = reads.shape[0] // batch_tile
    kernel = functools.partial(
        _sw_kernel_full, band=band, q_max=q_max, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_extend=gap_extend)
    out = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec((batch_tile, q_max), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, t_max + band), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch_tile, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((reads.shape[0], 8), jnp.int32),
    )(reads, read_lens[:, None].astype(jnp.int32), refs_padded,
      ref_lens[:, None].astype(jnp.int32))
    return out[:n, :7]


def _sw_kernel(reads_ref, rlens_ref, refs_ref, tlens_ref, out_ref,
               *, band, q_max, match, mismatch, gap_open, gap_extend):
    """One batch tile: full banded DP over q_max read rows.

    reads_ref: (BT, q_max) int8 — read codes, 0..4
    refs_ref:  (BT, t_max + band) int8 — target codes padded LEFT by band/2
               and RIGHT by band/2 with sentinel 5 (host side does padding)
    rlens/tlens: (BT, 1) int32 actual lengths
    out_ref:   (BT, 4) int32 — [best_score, end_read, end_ref, zero]
    """
    bt = reads_ref.shape[0]
    half = band // 2
    rlen = rlens_ref[:, 0:1]  # (BT,1)
    step = _row_step_factory(band=band, match=match, mismatch=mismatch,
                             gap_open=gap_open, gap_extend=gap_extend,
                             use_pltpu=True)

    def row_step(i, carry):
        # Mosaic requires lane-dim dynamic slices to be 128-aligned: take an
        # aligned window then rotate the residual offset in-register.
        base = pl.multiple_of((i // 128) * 128, 128)
        off = i - base
        # ref codes for band slots: j = i + k - half → padded index i + k
        # (rotate is 32-bit only on TPU — widen the small windows first)
        ref_win = refs_ref[:, pl.ds(base, band + 128)].astype(jnp.int32)
        ref_slice = pltpu.roll(ref_win, band + 128 - off, axis=1)[:, 0:band]
        read_win = reads_ref[:, pl.ds(base, 128)].astype(jnp.int32)
        read_col = pltpu.roll(read_win, 128 - off, axis=1)[:, 0:1]
        return step(i, carry, read_col, ref_slice, rlen)

    zeros = jnp.zeros((bt, band), jnp.int32)
    init = (zeros, zeros, zeros, zeros)
    # dynamic trip count (see _sw_kernel_full): all-padding tiles are free
    q_hi = jnp.minimum(jnp.int32(q_max), jnp.max(rlens_ref[:, 0]))
    h, e, best_v, best_i_v = jax.lax.fori_loop(0, q_hi, row_step, init)
    best, best_i, best_k = _reduce_best(best_v, best_i_v, band)

    end_ref = best_i + best_k - half
    out_ref[:, 0:1] = best
    out_ref[:, 1:2] = best_i
    out_ref[:, 2:3] = end_ref
    out_ref[:, 3:4] = jnp.zeros((bt, 1), jnp.int32)


def _sw_jnp(reads, read_lens, refs_padded, ref_lens, *, band, q_max,
            match, mismatch, gap_open, gap_extend):
    """Pure-jnp backend: same DP math via lax.scan (CPU tests / fallback)."""
    step = _row_step_factory(band=band, match=match, mismatch=mismatch,
                             gap_open=gap_open, gap_extend=gap_extend,
                             use_pltpu=False)
    n = reads.shape[0]
    rlen = read_lens[:, None].astype(jnp.int32)

    def scan_body(carry, i):
        ref_slice = jax.lax.dynamic_slice_in_dim(refs_padded, i, band, axis=1)
        read_col = jax.lax.dynamic_slice_in_dim(reads, i, 1, axis=1)
        return step(i, carry, read_col, ref_slice, rlen), None

    zeros = jnp.zeros((n, band), jnp.int32)
    init = (zeros, zeros, zeros, zeros)
    (h, e, best_v, best_i_v), _ = jax.lax.scan(
        scan_body, init, jnp.arange(q_max, dtype=jnp.int32))
    best, best_i, best_k = _reduce_best(best_v, best_i_v, band)
    return best[:, 0], best_i[:, 0], (best_i + best_k - band // 2)[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("band", "match", "mismatch", "gap_open", "gap_extend",
                     "batch_tile", "backend"),
)
def banded_sw_scores(
    reads: jax.Array,      # (N, q_max) int8, padded with 4/5
    read_lens: jax.Array,  # (N,) int32
    refs: jax.Array,       # (N, t_max) int8, padded with 5
    ref_lens: jax.Array,   # (N,) int32
    *,
    band: int = 128,
    match: int = 2,
    mismatch: int = 4,
    gap_open: int = 4,
    gap_extend: int = 2,
    batch_tile: int = 64,
    backend: str = "pallas",
):
    """Batched banded local SW. Returns (scores, end_read, end_ref) int32.

    The band is centered on the main diagonal: at read position i it covers
    ref positions [i - band/2, i + band/2). Callers align seeds to the
    diagonal by slicing the target window so the anchor sits near the center.

    backend: "pallas" (TPU Mosaic kernel) or "jnp" (identical math via
    lax.scan — runs on any platform; used for CPU tests and as fallback).
    """
    n, q_max = reads.shape
    t_max = refs.shape[1]
    half = band // 2
    assert band % 128 == 0, "band must be a multiple of 128 lanes"

    # lane-dim windows in the kernel need 128-aligned dims and t_max >= q_max
    q_pad = (-q_max) % 128
    if q_pad:
        reads = jnp.pad(reads, ((0, 0), (0, q_pad)), constant_values=4)
        q_max += q_pad
    t_need = max(t_max, q_max)
    t_pad = (-t_need) % 128 + (t_need - t_max)
    if t_pad:
        refs = jnp.pad(refs, ((0, 0), (0, t_pad)), constant_values=5)
        t_max += t_pad

    # pad: batch to tile multiple, refs by band (half sentinel each side)
    n_pad = (-n) % batch_tile
    if n_pad:
        reads = jnp.pad(reads, ((0, n_pad), (0, 0)), constant_values=4)
        refs = jnp.pad(refs, ((0, n_pad), (0, 0)), constant_values=5)
        read_lens = jnp.pad(read_lens, (0, n_pad))
        ref_lens = jnp.pad(ref_lens, (0, n_pad))
    refs_padded = jnp.pad(refs, ((0, 0), (half, half)), constant_values=5)
    # mask beyond each ref's true length with sentinel 5
    col = jnp.arange(t_max + band, dtype=jnp.int32)[None, :]
    refs_padded = jnp.where(col >= ref_lens[:, None] + half, 5,
                            refs_padded).astype(jnp.int8)

    if backend == "jnp":
        s, ei, ej = _sw_jnp(reads, read_lens, refs_padded, ref_lens,
                            band=band, q_max=q_max, match=match,
                            mismatch=mismatch, gap_open=gap_open,
                            gap_extend=gap_extend)
        return s[:n], ei[:n], ej[:n]

    n_t = reads.shape[0] // batch_tile
    grid = (n_t,)
    kernel = functools.partial(
        _sw_kernel, band=band, q_max=q_max, match=match, mismatch=mismatch,
        gap_open=gap_open, gap_extend=gap_extend)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, q_max), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, t_max + band), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch_tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((reads.shape[0], 4), jnp.int32),
    )(reads, read_lens[:, None].astype(jnp.int32), refs_padded,
      ref_lens[:, None].astype(jnp.int32))

    out = out[:n]
    return out[:, 0], out[:, 1], out[:, 2]


def banded_sw_reference(read, ref, *, band=128, match=2, mismatch=4,
                        gap_open=4, gap_extend=2):
    """Numpy reference with identical band semantics (for tests).

    The F (gap-in-ref) chain is computed with the textbook sequential
    recurrence — independent of the kernel's closed-form prefix-max — so the
    test cross-checks that transformation.
    """
    import numpy as np

    half = band // 2
    q, t = len(read), len(ref)
    neg = -(2 ** 29)
    h_prev = np.zeros(band, np.int64)
    e_prev = np.zeros(band, np.int64)
    best = 0
    best_i = best_j = 0
    ks = np.arange(band)
    for i in range(q):
        j = i + ks - half
        in_ref = (j >= 0) & (j < t)
        jc = np.clip(j, 0, max(t - 1, 0))
        refb = np.asarray(ref)[jc]
        ambig = (read[i] >= 4) | (refb >= 4)
        sub = np.where(ambig, 0, np.where(refb == read[i], match, -mismatch))
        m = np.where(in_ref, h_prev + sub, neg)
        up_h = np.concatenate([h_prev[1:], [neg]])
        up_e = np.concatenate([e_prev[1:], [neg]])
        e = np.maximum(up_h - gap_open, up_e - gap_extend)
        h_nod = np.where(in_ref, np.maximum(m, e), neg)
        # sequential F chain (the part the kernel replaces with a scan)
        h = np.zeros(band, np.int64)
        f = neg
        for k in range(band):
            val = max(int(h_nod[k]), f, 0) if in_ref[k] else 0
            h[k] = val
            f = max(val - gap_open, f - gap_extend)
        e_row = np.where(in_ref, np.maximum(e, 0), 0)
        row_best = int(h.max())
        if row_best > best:
            best = row_best
            best_i = i
            best_j = i + int(np.argmax(h)) - half
        h_prev, e_prev = h, e_row
    return int(best), best_i, best_j
