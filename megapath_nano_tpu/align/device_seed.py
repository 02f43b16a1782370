"""Device-side seed collection: sketch → lookup → anchors → groups, in XLA.

The host path (align/anchors.py + the native mpn_anchors_build) computes
anchors on CPU and uploads them per slice; on a remote-attached TPU that
upload (~340 KB/2048 reads) plus the ~120 ms host stage bound the map path.
This module reproduces the exact same seeding — minimap2's published
minimizer scheme (reference shells out to `minimap2 -x map-ont`,
reference: bin/lib/aligner.py:206) with the identical Wang hash, window rule,
tie handling, max_occ masking, gap-break grouping, and per-group even
subsampling — entirely on device, so only the 2-bit packed reads cross the
link.

Key trick: for k <= 15 the canonical k-mer hash is masked to 2k <= 30 bits
(cpp/mpn_minimizer.cc hash64), so hash values fit int32 and the sorted key
table can live device-resident as int32 planes. All arithmetic in the Wang
mixer is exact in uint32 for masks <= 2**30: every masked step only needs the
low 30 bits of sums/shifts, which mod-2**32 arithmetic preserves.

Everything here is shape-static (caps passed as static ints) and runs inside
the fused map dispatch; overflow counts are returned so the host can fall
back to the host-seeded path for a slice that exceeds a cap (correctness is
never silently lost).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Plain Python int (not a jnp scalar): importing this module must not force
# JAX backend initialization; jnp weak-types it in expressions.
I32_MAX = 2 ** 31 - 1


def hash32(key, kbits: int):
    """Thomas Wang 64-bit invertible hash masked to kbits <= 30, computed in
    uint32 (exact: see module docstring). Matches cpp/mpn_minimizer.cc
    hash64() bit for bit on the low kbits."""
    mask = jnp.uint32((1 << kbits) - 1)
    key = key.astype(jnp.uint32)
    key = (~key + (key << jnp.uint32(21))) & mask
    key = key ^ (key >> jnp.uint32(24))
    key = (key + (key << jnp.uint32(3)) + (key << jnp.uint32(8))) & mask
    key = key ^ (key >> jnp.uint32(14))
    key = (key + (key << jnp.uint32(2)) + (key << jnp.uint32(4))) & mask
    key = key ^ (key >> jnp.uint32(28))
    key = (key + (key << jnp.uint32(31))) & mask
    return key


def sketch_device(codes, qlens, *, k: int, w: int):
    """(k,w) minimizers of every read in a (n, L) code matrix.

    Returns flat (n*L,) arrays indexed by absolute position j = rid*L + pos:
    win (int32 0/1 — position j's k-mer is an emitted minimizer), H (uint32
    hash, garbage where win=0), strand (int32 0/1). Semantics identical to
    cpp/mpn_minimizer.cc sketch_sequence: canonical min(fwd, rc), strand-tie
    windows skipped, window minimum with earliest-position tie rule, one emit
    per distinct winner (the consecutive-window dedupe falls out of marking
    distinct argmin positions: a winner holds a contiguous run of windows).
    """
    assert 1 <= k <= 15, (
        f"device sketch requires k <= 15 (hash fits 30 bits); got k={k}")
    n, L = codes.shape
    pos_i = jnp.arange(L, dtype=jnp.int32)[None, :]
    inread = pos_i < qlens[:, None]
    good = (codes >= 0) & (codes < 4) & inread
    c32 = jnp.where(good, codes, 0).astype(jnp.uint32)

    kf = jnp.zeros((n, L), jnp.uint32)
    kr = jnp.zeros((n, L), jnp.uint32)
    for d in range(k):   # kmer ending at i uses bases i-k+1..i
        shifted = jnp.pad(c32, ((0, 0), (d, 0)))[:, :L] if d else c32
        kf = kf | (shifted << jnp.uint32(2 * d))
        kr = kr | ((jnp.uint32(3) - shifted) << jnp.uint32(2 * (k - 1 - d)))

    cs = jnp.cumsum(good.astype(jnp.int32), axis=1)
    cs_lag = jnp.pad(cs, ((0, 0), (k, 0)))[:, :L]
    validk = (cs - cs_lag == k) & (pos_i >= k - 1)

    tie = kf == kr
    strand = (kr < kf).astype(jnp.int32)
    canon = jnp.minimum(kf, kr)
    H = hash32(canon, 2 * k)
    INF = jnp.uint32(0xFFFFFFFF)
    H = jnp.where(validk & ~tie, H, INF)
    packed = (pos_i << 1) | strand   # query packed: pos:...:strand (seq_id 0)

    # window lex-min over candidates j in [i-w+1, i] by (hash, packed):
    # earliest position wins ties — the monotonic-deque semantics.
    Hm, Pm, Jm = H, packed, jnp.broadcast_to(pos_i, (n, L))
    for s in range(1, w):
        Hs = jnp.pad(H, ((0, 0), (s, 0)), constant_values=INF)[:, :L]
        Ps = jnp.pad(packed, ((0, 0), (s, 0)))[:, :L]
        Js = jnp.pad(jnp.broadcast_to(pos_i, (n, L)), ((0, 0), (s, 0)))[:, :L]
        better = (Hs < Hm) | ((Hs == Hm) & (Ps < Pm))
        Hm = jnp.where(better, Hs, Hm)
        Pm = jnp.where(better, Ps, Pm)
        Jm = jnp.where(better, Js, Jm)

    emit = (pos_i >= k + w - 2) & inread & (Hm != INF)
    rows = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None] * L, (n, L))
    win = jnp.zeros(n * L, jnp.int32).at[
        (rows + Jm).ravel()].max(emit.ravel().astype(jnp.int32))
    return win, H.ravel(), strand.ravel()


def _bounded_lower_bound(keys, q, lo, hi, steps: int):
    """First index in sorted `keys` restricted to [lo, hi) whose value is
    >= q (returns hi when none), via `steps` unrolled bisection rounds —
    exact whenever hi - lo <= 2**steps - ... precisely: steps >=
    (max_range).bit_length(). Replaces jnp.searchsorted over the whole
    table (O(log N) serial gathers) with O(log max_bucket) gathers after a
    direct-addressed bucket LUT narrows the range."""
    K = keys.shape[0]
    for _ in range(steps):
        cont = lo < hi
        mid = (lo + hi) >> 1
        v = keys[jnp.clip(mid, 0, K - 1)]
        go_right = v < q
        lo = jnp.where(cont & go_right, mid + 1, lo)
        hi = jnp.where(cont & ~go_right, mid, hi)
    return lo


def build_groups_device(codes, qlens, keys32, pos_t, pos_ss, lut, *, k: int,
                        w: int, max_occ: int, min_group_anchors: int,
                        gap_break: int, cap: int, seq_bits: int,
                        lut_bits: int, n_bisect: int,
                        wtot_max: int, a_max: int, g_max: int):
    """Full device seed stage: sketch → bucket-LUT hash lookup → anchor
    expansion → (read, seq, strand, gap)-grouping → capped even subsample.

    keys32: sorted int32 hash table (values < 2**30); pos_t / pos_ss: per-hit
    target position and (seq_id << 1 | strand) planes, index order. lut:
    (2**lut_bits + 1,) int32 — lut[b] = first table index whose key's top
    lut_bits bits are >= b (built host-side once per index); n_bisect =
    max_bucket_size.bit_length() refinement rounds inside a bucket.

    Compaction/expansion use scatters + an associative scan rather than
    searchsorted: XLA lowers searchsorted to ~log2(table) serial gather
    rounds, ~40x slower on TPU than one scatter at these sizes (measured:
    290 ms for 512Ki probes into a 2M table vs ~5 ms for the scatter).

    Returns (qg, tg, cnt, rid, seqid, strand, t_base, counts) where the first
    seven mirror align/anchors.py pack_groups_flat + group identities
    (shapes (g_max, cap) / (g_max,)), and counts = int32 [n_winners,
    n_anchors, n_groups_kept] for host-side overflow detection against
    (wtot_max, a_max, g_max).
    """
    n, L = codes.shape
    # int32 identity-key safety (trace-time; all operands are static):
    # a maximal valid key (rid = n-1, seq = 2**seq_bits - 1, strand = 1) must
    # stay strictly below the I32_MAX invalid sentinel, or sorting order (and
    # the sentinel itself) silently corrupts. Index seq_ids must fit
    # seq_bits — the caller derives seq_bits from the index's n_seqs.
    assert n * (1 << (seq_bits + 1)) < I32_MAX, (
        f"identity key overflow: n_reads={n} seq_bits={seq_bits}")
    assert 2 * n * L < I32_MAX, f"packed winner slot overflow: {n}x{L}"
    win, Hflat, strand_flat = sketch_device(codes, qlens, k=k, w=w)

    # compact winners into wtot_max slots (slot s -> flat position index):
    # winner j goes to slot cumsum(win)[j] - 1 — one scatter, no search.
    # The scatter value packs (flat position << 1 | strand) so the strand
    # needs no second gather (512Ki-probe gathers cost ~4 ms each here);
    # 2 * n * L < 2**31 is implied by the identity-key assert above.
    woff = jnp.cumsum(win)
    tot_w = woff[-1]
    slots = jnp.arange(wtot_max, dtype=jnp.int32)
    flatpos = jnp.arange(n * L, dtype=jnp.int32)
    dst = jnp.where(win == 1, woff - 1, wtot_max)   # out-of-range -> dropped
    msrc2 = jnp.zeros(wtot_max, jnp.int32).at[dst].set(
        (flatpos << 1) | strand_flat, mode="drop")
    msrc = msrc2 >> 1
    wvalid = slots < jnp.minimum(tot_w, wtot_max)
    mH = jnp.where(wvalid, Hflat[msrc], jnp.uint32(0xFFFFFFFF))

    # lookup: int32 view is order-preserving (valid hashes < 2**30; the
    # 0xFFFFFFFF sentinel becomes -1 -> clipped bucket, masked by wvalid).
    # hi = lower_bound(h + 1): equal keys share a bucket, so both bounds lie
    # inside [lut[b], lut[b+1]].
    mHs = mH.astype(jnp.int32)
    shift = 2 * k - lut_bits
    b = jnp.clip(jnp.where(mHs >= 0, mHs >> shift, 0), 0,
                 (1 << lut_bits) - 1)
    lo0 = lut[b]
    hi0 = lut[b + 1]
    lo = _bounded_lower_bound(keys32, mHs, lo0, hi0, n_bisect)
    hi = _bounded_lower_bound(keys32, mHs + 1, lo0, hi0, n_bisect)
    cnt0 = hi - lo
    mcnt = jnp.where(wvalid & (cnt0 > 0) & (cnt0 <= max_occ), cnt0, 0)

    # expand hits into a_max anchor slots: scatter each winner's slot id at
    # its exclusive offset, forward-fill with a running max (winner slots are
    # increasing), then within-winner rank by subtraction
    aoff = jnp.cumsum(mcnt)
    tot_a = aoff[-1]
    aoff_exc = aoff - mcnt
    aslots = jnp.arange(a_max, dtype=jnp.int32)
    dst_a = jnp.where(mcnt > 0, aoff_exc, a_max)    # out-of-range -> dropped
    am0 = jnp.zeros(a_max, jnp.int32).at[dst_a].max(slots, mode="drop")
    am = jax.lax.associative_scan(jnp.maximum, am0)
    avalid = aslots < jnp.minimum(tot_a, a_max)
    within = aslots - aoff_exc[am]
    pidx = jnp.clip(lo[am] + within, 0, pos_t.shape[0] - 1)
    a_t = pos_t[pidx]
    ss = pos_ss[pidx]
    a_seq = ss >> 1
    w2 = msrc2[am]          # one gather recovers (rid, qpos, strand)
    wsrc = w2 >> 1
    a_rid = wsrc // L
    qp = wsrc % L
    a_strand = (ss & 1) ^ (w2 & 1)
    a_q = jnp.where(a_strand == 1, qlens[a_rid] + (k - 2) - qp, qp)

    # sort by (rid, seq, strand, t, q): identity packs into one int32 key
    key1 = jnp.where(
        avalid,
        (a_rid << (seq_bits + 1)) | (a_seq << 1) | a_strand,
        I32_MAX)
    k1s, st, sq = jax.lax.sort((key1, a_t, a_q), num_keys=3)
    svalid = k1s != I32_MAX
    srid = k1s >> (seq_bits + 1)
    sseq = (k1s >> 1) & jnp.int32((1 << seq_bits) - 1)
    sstrand = k1s & 1

    # group boundaries: identity change or target gap > gap_break
    newg = jnp.concatenate([
        svalid[:1],
        svalid[1:] & ((k1s[1:] != k1s[:-1]) | (st[1:] - st[:-1] > gap_break)),
    ])
    gid = jnp.cumsum(newg.astype(jnp.int32)) - 1
    sizes = jnp.zeros(a_max, jnp.int32).at[
        jnp.where(svalid, gid, a_max)].add(1, mode="drop")
    asize = sizes[jnp.clip(gid, 0, a_max - 1)]
    kept = svalid & (asize >= min_group_anchors)

    kg_start = newg & kept
    kgid = jnp.cumsum(kg_start.astype(jnp.int32)) - 1
    n_groups_kept = kgid[-1] + 1
    ar = jnp.arange(a_max, dtype=jnp.int32)

    tgt = jnp.where(kg_start, kgid, g_max)   # out-of-range rows dropped
    def scat(x):
        return jnp.zeros(g_max, jnp.int32).at[tgt].set(x, mode="drop")

    g_start = scat(ar)
    g_size = scat(asize)
    g_rid = scat(srid)
    g_seq = scat(sseq)
    g_strand = scat(sstrand)
    g_tbase = scat(st)
    g_m = jnp.minimum(g_size, cap)

    # even subsample (pack_groups_flat's pick: c*(size-1)//(m-1), endpoints
    # kept exactly)
    c = jnp.arange(cap, dtype=jnp.int32)[None, :]
    denom = jnp.maximum(g_m - 1, 1)[:, None]
    src_rank = jnp.where(g_m[:, None] > 1,
                         c * (g_size[:, None] - 1) // denom, 0)
    src = jnp.clip(g_start[:, None] + src_rank, 0, a_max - 1)
    amask = c < g_m[:, None]
    qg = jnp.where(amask, sq[src], 0)
    tg = jnp.where(amask, st[src] - g_tbase[:, None], 0)

    counts = jnp.stack([tot_w, tot_a, n_groups_kept])
    return qg, tg, g_m, g_rid, g_seq, g_strand, g_tbase, counts
