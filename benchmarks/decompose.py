#!/usr/bin/env python3
"""Wall-vs-device decomposition of the fused map path on real hardware.

Times each stage of the device-seeded fused dispatch in isolation (forced
with np.asarray; the ~RTT dispatch floor is measured and reported
separately) and the end-to-end bench wall time, so the tunnel-vs-compute
split is committed evidence rather than prose (VERDICT r4 item 1).

  python benchmarks/decompose.py [--slice 2048] [--out benchmarks/decompose.json]
"""

from __future__ import annotations

import argparse
import functools
import json
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
        r = np.asarray(fn())
    dt = (time.time() - t0) / n * 1000.0
    del r
    return round(dt, 1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--slice", type=int, default=2048)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "decompose.json"))
    ap.add_argument("--genomes", type=int, default=10)
    ap.add_argument("--glen", type=int, default=300_000)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from megapath_nano_tpu.align.device_seed import (build_groups_device,
                                                     sketch_device)
    from megapath_nano_tpu.align.pipeline import (AlignParams,
                                                  MinimizerAligner,
                                                  _pack_reads2)
    from megapath_nano_tpu.align.chain import chain_and_extents
    from megapath_nano_tpu.index.minimizer import MinimizerIndex
    from megapath_nano_tpu.kernels.sw import banded_sw_full
    from megapath_nano_tpu.utils.dna import mutate, random_sequence, revcomp

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    rng = np.random.default_rng(2026)
    genomes = [random_sequence(rng, args.glen) for _ in range(args.genomes)]
    index = MinimizerIndex.build(genomes,
                                 [f"g{i}" for i in range(args.genomes)])
    aligner = MinimizerAligner(index, params=AlignParams(backend=backend))

    N = args.slice
    L = 1024
    reads = []
    r = np.random.default_rng(1)
    for _ in range(N):
        g = int(r.integers(0, args.genomes))
        s = int(r.integers(0, args.glen - 1000))
        read = mutate(r, genomes[g][s: s + 1000], 0.03, 0.015, 0.015)
        if r.integers(0, 2):
            read = revcomp(read)
        reads.append(read)

    rec = {"backend": backend, "slice_n": N, "read_max": L}

    # --- RTT floor: trivial dispatch + fetch
    tiny = jax.device_put(np.zeros(8, np.int32))
    f_tiny = jax.jit(lambda x: x + 1)
    rec["rtt_ms"] = timeit(lambda: f_tiny(tiny), n=10)

    # --- stage shapes (mirror _fused_submit_devseed)
    p = aligner.params
    aligner._device_refs(np.zeros(1, np.int32), 256)
    seq_off_dev, seq_len_dev = aligner._device_index_meta()
    keys32, pos_t, ss16, lut2, runcnt, lut_bits, n_bisect = \
        aligner._device_index_planes()
    occ = aligner._index_occupancy()
    wtot_max, a_max, g_max = aligner._devseed_caps(N, L, occ)
    out_cap = 2048
    while out_cap < p.devseed_out_per_read * N:
        out_cap *= 2
    out_cap = min(out_cap, g_max)
    rec["caps"] = dict(wtot_max=wtot_max, a_max=a_max, g_max=g_max,
                       out_cap=out_cap, occ=round(occ, 4),
                       n_bisect=n_bisect, lut_bits=lut_bits)

    packed2, exc_rid, exc_pos = _pack_reads2(reads, L, n_rows=N)
    qlens_a = np.zeros(N, np.int32)
    qlens_a[:len(reads)] = [len(x) for x in reads]
    packed2 = jax.device_put(packed2)
    exc_rid = jax.device_put(exc_rid)
    exc_pos = jax.device_put(exc_pos)
    qlens_d = jax.device_put(qlens_a)

    from megapath_nano_tpu.align.pipeline import _unpack_reads
    codes_d = jax.jit(_unpack_reads)(packed2, exc_rid, exc_pos)
    np.asarray(codes_d)

    # --- sketch only
    sk = jax.jit(functools.partial(sketch_device, k=index.k, w=index.w))
    rec["sketch_ms"] = timeit(lambda: sk(codes_d, qlens_d)[0])

    # --- full seed stage (sketch + lookup + expand + sort + group)
    bg = jax.jit(functools.partial(
        build_groups_device, k=index.k, w=index.w, max_occ=p.max_occ,
        min_group_anchors=p.min_group_anchors, gap_break=p.gap_break,
        cap=p.fused_anchor_cap, seq_bits=aligner._seq_bits(),
        lut_bits=lut_bits, n_bisect=n_bisect,
        wtot_max=wtot_max, a_max=a_max, g_max=g_max))
    rec["seed_ms"] = timeit(
        lambda: bg(codes_d, qlens_d, keys32, pos_t, ss16, lut2, runcnt)[7])

    groups = jax.block_until_ready(
        bg(codes_d, qlens_d, keys32, pos_t, ss16, lut2, runcnt))
    qg, tg, cnt = groups[0], groups[1], groups[2]

    # --- chain only (at g_max x cap)
    ch = jax.jit(chain_and_extents)
    rec["chain_ms"] = timeit(lambda: ch(qg, tg, cnt))

    # --- extension only (at out_cap x q_max, band)
    band = 128
    t_max = -(-(L + band) // 256) * 256
    er = np.random.default_rng(2)
    ra = er.integers(0, 4, (out_cap, L)).astype(np.int8)
    ta = np.zeros((out_cap, t_max), np.int8)
    ta[:, :L] = ra  # perfect-match diagonals: representative row work
    rl = np.full(out_cap, 1000, np.int32)
    tl = np.full(out_cap, 1000, np.int32)
    ra, ta, rl, tl = (jax.device_put(x) for x in (ra, ta, rl, tl))
    ext = jax.jit(functools.partial(
        banded_sw_full, band=band, match=p.match, mismatch=p.mismatch,
        gap_open=p.gap_open, gap_extend=p.gap_extend, batch_tile=128,
        backend=backend))
    rec["extend_ms"] = timeit(lambda: ext(ra, rl, ta, tl))

    # --- whole fused devseed dispatch (same code path as production)
    fut, ctx = aligner._fused_submit_devseed(
        reads, N, L, lambda x, lo=256: max(lo, 1 << (x - 1).bit_length()),
        lambda qm: 128)
    np.asarray(fut)
    def full():
        f, _ = aligner._fused_submit_devseed(
            reads, N, L,
            lambda x, lo=256: max(lo, 1 << (x - 1).bit_length()),
            lambda qm: 128)
        return f
    rec["fused_dispatch_ms"] = timeit(full)

    # --- end-to-end wall (map_reads, incl. host collect)
    t0 = time.time()
    n_iter = 3
    for _ in range(n_iter):
        aligner.map_reads(reads, slice_size=N, emit_cigars=False)
    wall = (time.time() - t0) / n_iter * 1000.0
    rec["map_reads_wall_ms"] = round(wall, 1)
    rec["wall_reads_per_s"] = round(N / (wall / 1000.0), 1)
    dev_ms = rec["fused_dispatch_ms"]
    rec["device_reads_per_s"] = round(N / (dev_ms / 1000.0), 1)

    print(json.dumps(rec, indent=1))
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
