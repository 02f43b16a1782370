#!/usr/bin/env python3
"""Large-index benchmark: build + map against a >= 1 Gbp reference index.

Exercises the realistic-scale path the unit suite cannot: index build
throughput, device residency of the packed reference + seed planes
(HBM-resident after the first dispatch), which dispatch path the size
gates select (device-seeded vs host-seeded vs non-fused), and steady-state
mapping throughput. The reference's corresponding axis is minimap2's -I
index batching over the 80 GB RefSeq (reference: bin/megapath_nano.py:
4017-4022).

  python benchmarks/large_index.py [--gbp 1.0] [--reads 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbp", type=float, default=1.0)
    ap.add_argument("--reads", type=int, default=4096)
    ap.add_argument("--read_len", type=int, default=1000)
    ap.add_argument("--n_genomes", type=int, default=32)
    ap.add_argument("--err", type=float, default=0.06)
    args = ap.parse_args(argv)

    import jax

    from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner
    from megapath_nano_tpu.index.minimizer import MinimizerIndex
    from megapath_nano_tpu.utils.dna import mutate, revcomp

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    total_bp = int(args.gbp * 1e9)
    glen = total_bp // args.n_genomes
    rng = np.random.default_rng(7)

    records = []

    def emit(rec):
        records.append(rec)
        print(json.dumps(rec), flush=True)

    t0 = time.time()
    genomes = [rng.integers(0, 4, glen, dtype=np.int8)
               for _ in range(args.n_genomes)]
    t_gen = time.time() - t0
    del t_gen
    t0 = time.time()
    index = MinimizerIndex.build(genomes,
                                 [f"g{i}" for i in range(args.n_genomes)])
    t_build = time.time() - t0
    n_entries = len(index.keys)
    emit({
        "metric": "index build", "total_bp": total_bp,
        "seconds": round(t_build, 1),
        "bp_per_s": round(total_bp / t_build, 0),
        "minimizer_entries": int(n_entries),
        "host_bytes": int(index.seq_data.nbytes + index.keys.nbytes
                          + index.positions.nbytes)})

    aligner = MinimizerAligner(index, params=AlignParams(backend=backend))
    devseed_ok = aligner._devseed_ok(4096)
    fused_gate = (index.seq_data.size < 2 ** 31 - 2 ** 16
                  and len(index.seq_names) < 2 ** 16)
    emit({"metric": "dispatch gates",
          "devseed_eligible": bool(devseed_ok),
          "fused_eligible": bool(fused_gate),
          "seq_data_size": int(index.seq_data.size)})
    if not fused_gate:
        # beyond int32 device addressing (~2.1 Gbp) a monolithic index
        # cannot be device-resident: shard it (dist/sharded_aligner — the
        # host-loop tier; each shard runs the device-seeded fused dispatch
        # in turn, so single-chip throughput divides by the shard count;
        # on a multi-chip mesh ShardMapAligner runs the shards in parallel)
        from megapath_nano_tpu.dist.sharded_aligner import ShardedAligner

        n_shards = -(-total_bp // (2 * 10 ** 9))
        emit({"metric": "sharding", "n_shards": int(n_shards)})
        aligner = ShardedAligner.build(
            genomes, [f"g{i}" for i in range(args.n_genomes)],
            np.arange(args.n_genomes, dtype=np.int64),
            [f"g{i}" for i in range(args.n_genomes)], int(n_shards),
            params=AlignParams(backend=backend))

    def make_reads(seed):
        r = np.random.default_rng(seed)
        out = []
        for _ in range(args.reads):
            g = int(r.integers(0, args.n_genomes))
            s = int(r.integers(0, glen - args.read_len))
            read = mutate(r, genomes[g][s: s + args.read_len],
                          sub_rate=args.err / 2, ins_rate=args.err / 4,
                          del_rate=args.err / 4)
            if r.integers(0, 2):
                read = revcomp(read)
            out.append(read)
        return out

    batches = [make_reads(i) for i in range(4)]
    # TWO warmup batches: the first may overflow the adaptive caps (dense
    # indexes), the second compiles the bumped shapes — so the timed window
    # holds no one-time recompiles
    t0 = time.time()
    res = aligner.map_reads(batches[0], slice_size=2048, emit_cigars=False)
    aligner.map_reads(batches[1], slice_size=2048, emit_cigars=False)
    t_warm = time.time() - t0
    n_aligned = len(np.unique(res.data["read_id"]))
    t0 = time.time()
    for b in batches[2:]:
        aligner.map_reads(b, slice_size=2048, emit_cigars=False)
    dt = time.time() - t0
    rps = 2 * args.reads / dt
    overflow = getattr(aligner, "overflow_stats", None)
    shard_stats = None
    if hasattr(aligner, "shards"):
        shard_stats = [dict(a.overflow_stats) for a in aligner.shards if a]
        scales = [{k: round(v, 2) for k, v in a._cap_scales.items()}
                  for a in aligner.shards if a]
    else:
        scales = {k: round(v, 2) for k, v in aligner._cap_scales.items()}
    emit({
        "metric": f"ONT reads/s/chip vs {args.gbp:.1f} Gbp index",
        "value": round(rps, 1), "unit": "reads/s/chip",
        "warmup_s": round(t_warm, 1),
        "aligned_fraction": round(n_aligned / args.reads, 3),
        "overflow": shard_stats or (dict(overflow) if overflow else None),
        "cap_scales": scales,
        "backend": backend})
    base = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(base, f"large_index_{args.gbp:g}gbp.json")
    with open(out, "w") as f:
        json.dump(records, f, indent=1)
    # legacy single-file name: latest run
    with open(os.path.join(base, "large_index.json"), "w") as f:
        json.dump(records, f, indent=1)
    print(f"written {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
