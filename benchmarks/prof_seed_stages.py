#!/usr/bin/env python3
"""Sub-stage timing of the device seed stage (cumulative-prefix method).

Each jit returns a SCALAR (sums of stage outputs) so the device→host fetch
is constant; stage cost = difference of successive cumulative prefixes.
Scratch profiling support for the round-5 perf work; numbers land in
benchmarks/decompose.json via decompose.py.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def timeit(fn, n=5, warmup=2):
    for _ in range(warmup):
        np.asarray(fn())
    t0 = time.time()
    for _ in range(n):
        np.asarray(fn())
    return (time.time() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from megapath_nano_tpu.align import device_seed as ds
    from megapath_nano_tpu.align.pipeline import (AlignParams,
                                                  MinimizerAligner,
                                                  _pack_reads2, _unpack_reads)
    from megapath_nano_tpu.index.minimizer import MinimizerIndex
    from megapath_nano_tpu.utils.dna import mutate, random_sequence, revcomp

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    L = 1024
    rng = np.random.default_rng(2026)
    genomes = [random_sequence(rng, 300_000) for _ in range(10)]
    index = MinimizerIndex.build(genomes, [f"g{i}" for i in range(10)])
    aligner = MinimizerAligner(index, params=AlignParams())
    p = aligner.params
    aligner._device_refs(np.zeros(1, np.int32), 256)
    keys32, pos_t_p, ss16_p, lut2, runcnt, lut_bits, n_bisect = \
        aligner._device_index_planes()
    occ = aligner._index_occupancy()
    wtot_max, a_max, g_max = aligner._devseed_caps(N, L, occ)
    print(f"caps: wtot={wtot_max} a_max={a_max} g_max={g_max} "
          f"n_bisect={n_bisect}", flush=True)

    reads = []
    r = np.random.default_rng(1)
    for _ in range(N):
        g = int(r.integers(0, 10))
        s = int(r.integers(0, 300_000 - 1000))
        read = mutate(r, genomes[g][s: s + 1000], 0.03, 0.015, 0.015)
        if r.integers(0, 2):
            read = revcomp(read)
        reads.append(read)
    packed2, exc_rid, exc_pos = _pack_reads2(reads, L, n_rows=N)
    qlens = np.zeros(N, np.int32)
    qlens[:len(reads)] = [len(x) for x in reads]
    codes = jax.device_put(np.asarray(jax.jit(_unpack_reads)(
        jax.device_put(packed2), jax.device_put(exc_rid),
        jax.device_put(exc_pos))))
    qlens_d = jax.device_put(qlens)

    k, w = index.k, index.w
    seq_bits = aligner._seq_bits()
    max_occ, mga, gap_break, cap = (p.max_occ, p.min_group_anchors,
                                    p.gap_break, p.fused_anchor_cap)

    def prefix(stage):
        """Run build_groups stages up to `stage`, return scalar sum."""
        def f(codes, qlens, keys32, pos_t_p, ss16_p, lut2, runcnt):
            n, L = codes.shape
            neww, Hm, Pm, H = ds.sketch_winners(codes, qlens, k=k, w=w)
            if stage == "sketch":
                return neww.sum() + (Hm // 7).sum().astype(jnp.int32)
            rid_plane = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[:, None], (n, L))
            nf = neww.ravel()
            woff = jnp.cumsum(nf.astype(jnp.int32))
            tot_w = woff[-1]
            slots = jnp.arange(wtot_max, dtype=jnp.int32)
            dst = jnp.where(nf, woff - 1, wtot_max)
            flatwin = (rid_plane * L).ravel() + (Pm.ravel() >> 1)
            msrc2 = jnp.zeros(wtot_max, jnp.int32).at[dst].set(
                (flatwin << 1) | (Pm.ravel() & 1), mode="drop")
            msrc = msrc2 >> 1
            wvalid = slots < jnp.minimum(tot_w, wtot_max)
            mH = jnp.where(wvalid, H.ravel()[msrc], jnp.uint32(0xFFFFFFFF))
            if stage == "compact":
                return (mH // 9).sum().astype(jnp.int32) + msrc2.sum()
            mHs = mH.astype(jnp.int32)
            shift = 2 * k - lut_bits
            b = jnp.clip(jnp.where(mHs >= 0, mHs >> shift, 0), 0,
                         (1 << lut_bits) - 1)
            bounds = lut2[b]
            lo = ds._bounded_lower_bound(keys32, mHs, bounds[:, 0],
                                         bounds[:, 1], n_bisect)
            loc = jnp.clip(lo, 0, keys32.shape[0] - 1)
            present = (keys32[loc] == mHs) & (lo < keys32.shape[0])
            cnt0 = jnp.where(present, runcnt[loc].astype(jnp.int32), 0)
            mcnt = jnp.where(wvalid & (cnt0 > 0) & (cnt0 <= max_occ), cnt0, 0)
            if stage == "lookup":
                return mcnt.sum() + lo.sum()
            aoff = jnp.cumsum(mcnt)
            tot_a = aoff[-1]
            aoff_exc = aoff - mcnt
            aslots = jnp.arange(a_max, dtype=jnp.int32)
            dst_a = jnp.where(mcnt > 0, aoff_exc, a_max)
            am0 = jnp.zeros(a_max, jnp.int32).at[dst_a].max(slots,
                                                            mode="drop")
            am = ds._blocked_cummax(am0)
            avalid = aslots < jnp.minimum(tot_a, a_max)
            wtrip = jnp.stack([msrc2, aoff_exc, lo], axis=1)
            wp = wtrip[am]
            w2 = wp[:, 0]
            within = aslots - wp[:, 1]
            pidx = jnp.clip(wp[:, 2] + within, 0, pos_t_p.shape[0] - 1)
            a_t = pos_t_p[pidx]
            ss = ss16_p[pidx].astype(jnp.int32)
            a_seq = ss >> 1
            wsrc = w2 >> 1
            a_rid = wsrc // L
            qp = wsrc % L
            a_strand = (ss & 1) ^ (w2 & 1)
            a_q = jnp.where(a_strand == 1, qlens[a_rid] + (k - 2) - qp, qp)
            if stage == "expand":
                return a_t.sum() + a_q.sum() + a_seq.sum()
            key1 = jnp.where(
                avalid,
                (a_rid << (seq_bits + 1)) | (a_seq << 1) | a_strand,
                ds.I32_MAX)
            k1s, st, sq = jax.lax.sort((key1, a_t, a_q), num_keys=3)
            if stage == "sort":
                return k1s.sum() + st.sum() + sq.sum()
            out = ds.build_groups_device(
                codes, qlens, keys32, pos_t_p, ss16_p, lut2, runcnt, k=k, w=w,
                max_occ=max_occ, min_group_anchors=mga, gap_break=gap_break,
                cap=cap, seq_bits=seq_bits, lut_bits=lut_bits,
                n_bisect=n_bisect, wtot_max=wtot_max, a_max=a_max,
                g_max=g_max)
            return sum(x.sum().astype(jnp.int32) for x in out)
        return jax.jit(f)

    stages = ["sketch", "compact", "lookup", "expand", "sort", "full"]
    prev = 0.0
    for s in stages:
        f = prefix(s)
        ms = timeit(lambda: f(codes, qlens_d, keys32, pos_t_p, ss16_p, lut2,
                              runcnt))
        print(f"{s:8s} cum {ms:7.1f} ms   delta {ms - prev:7.1f} ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
