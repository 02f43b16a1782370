#!/usr/bin/env python3
"""Scaling evidence for the sharded map path (BASELINE: >= 80% efficiency
at 2+ hosts), measured on the hardware actually available.

Multi-chip hardware is not reachable from this environment (one tunneled
v5e chip), so the claim is decomposed into quantities that CAN be measured
honestly, plus a cost model for the one quantity that cannot:

  A. (virtual CPU mesh) collective STRUCTURE: ShardMapAligner runs the
     full fused map step under shard_map over (data x shard) meshes and
     its output is field-identical to the single-index mapper — the
     correctness half of scaling (also asserted every round by
     __graft_entry__.dryrun_multichip).
  B. (real chip) per-shard device time vs shard size: weak scaling holds
     exactly when per-device dispatch time is flat as each device's index
     shard stays fixed while total capacity grows with N. Measured by
     running the single-chip devseed dispatch against increasing index
     sizes.
  C. (arithmetic) all_gather payload: each (data-row, shard) contributes
     (out_cap+1) x 16 x 2 bytes of compacted uint16 rows; the collective
     moves S x that per device per slice. Against ICI (~45 GB/s/link on
     v5e) and DCN (~25 GB/s/host) this is microseconds vs a
     ~100-250 ms/slice compute step.

  efficiency(N) ~ T_compute / (T_compute + T_collective(N) + T_host_merge)

Writes benchmarks/scaling.json. Run with JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=8 for phase A, on the TPU for B.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scaling.json")

ICI_BYTES_PER_S = 45e9      # v5e ICI per link per direction (public spec)
DCN_BYTES_PER_S = 25e9      # conservative per-host DCN
SLICE_N = 2048
OUT_CAP = 4096
FUSED_BYTES = (OUT_CAP + 1) * 16 * 2


def phase_a_structure(rec):
    from megapath_nano_tpu.dist.scaling import measure_scaling

    pts = measure_scaling(genome_per_shard=60_000, n_reads=256, iters=1)
    rec["virtual_mesh_structure"] = [
        {"n_shards": p.n_shards, "n_data": p.n_data,
         "reads_per_s_cpu_virtual": round(p.reads_per_s, 1)}
        for p in pts]
    rec["virtual_mesh_note"] = (
        "CPU virtual devices validate the shard_map collective structure "
        "and output equality only; wall times on virtual devices are not "
        "throughput evidence")


def phase_b_pershard(rec):
    import jax

    from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner
    from megapath_nano_tpu.index.minimizer import MinimizerIndex
    from megapath_nano_tpu.utils.dna import mutate, revcomp

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    rng = np.random.default_rng(2026)
    points = []
    for gbp in (0.125, 0.25, 0.5, 1.0):
        total = int(gbp * 1e9)
        ng = 8
        glen = total // ng
        genomes = [rng.integers(0, 4, glen, dtype=np.int8)
                   for _ in range(ng)]
        t0 = time.time()
        index = MinimizerIndex.build(genomes, [f"g{i}" for i in range(ng)])
        t_build = time.time() - t0
        al = MinimizerAligner(index, params=AlignParams(backend=backend))

        def mk(seed):
            r = np.random.default_rng(seed)
            out = []
            for _ in range(SLICE_N):
                g = int(r.integers(0, ng))
                s = int(r.integers(0, glen - 1000))
                read = mutate(r, genomes[g][s: s + 1000], 0.03, 0.015, 0.015)
                if r.integers(0, 2):
                    read = revcomp(read)
                out.append(read)
            return out

        batches = [mk(i) for i in range(4)]
        al.map_reads(batches[0], slice_size=SLICE_N, emit_cigars=False)
        al.map_reads(batches[1], slice_size=SLICE_N, emit_cigars=False)
        t0 = time.time()
        for b in batches[2:]:
            al.map_reads(b, slice_size=SLICE_N, emit_cigars=False)
        ms = (time.time() - t0) / 2 * 1000
        points.append({
            "shard_gbp": gbp, "build_s": round(t_build, 1),
            "ms_per_slice": round(ms, 1),
            "reads_per_s": round(SLICE_N / (ms / 1000), 1),
            "overflow": dict(al.overflow_stats),
            "cap_scales": {k: round(v, 2)
                           for k, v in al._cap_scales.items()}})
        print(points[-1], flush=True)
        del al, index, genomes
    rec["per_shard_device_time"] = points
    base = points[0]["ms_per_slice"]
    top = points[-1]["ms_per_slice"]
    rec["weak_scaling_shardtime_ratio"] = round(top / base, 3)


def cost_model(rec):
    pts = rec.get("per_shard_device_time")
    t_compute_ms = pts[-1]["ms_per_slice"] if pts else 240.0
    model = {"slice_n": SLICE_N, "out_cap": OUT_CAP,
             "allgather_bytes_per_shard_row": FUSED_BYTES,
             "t_compute_ms_per_slice": t_compute_ms}
    proj = []
    for hosts, shards in ((1, 8), (2, 16), (4, 32)):
        payload = FUSED_BYTES * shards           # per device, full gather
        # ring all_gather: (S-1)/S of payload crosses the slowest fabric;
        # with >1 host a 1/hosts fraction of ring steps traverse DCN
        t_ici_ms = payload * (shards - 1) / shards / ICI_BYTES_PER_S * 1e3
        t_dcn_ms = (payload / hosts) / DCN_BYTES_PER_S * 1e3 \
            if hosts > 1 else 0.0
        t_coll = t_ici_ms + t_dcn_ms
        # host merge: numpy top-K over shards x kept rows, measured ~2 ms
        # per 4k rows single-shard (fused_collect_np) — scale linearly
        t_host = 2.0 * shards
        eff = t_compute_ms / (t_compute_ms + t_coll + t_host)
        proj.append({"hosts": hosts, "shards": shards,
                     "allgather_payload_mb": round(payload / 1e6, 3),
                     "t_collective_ms": round(t_coll, 4),
                     "t_host_merge_ms": round(t_host, 1),
                     "projected_efficiency": round(eff, 4)})
    model["projection"] = proj
    model["note"] = (
        "index capacity scales with N (weak scaling): each added device "
        "carries its own <= 2 Gbp shard; per-device compute time is the "
        "measured single-chip dispatch at that shard size, the collective "
        "is the measured-payload all_gather, host merge is the measured "
        "collect cost. Efficiency >= 0.8 holds with wide margin because "
        "the all_gather payload (~0.5 MB) is ~4 orders below the compute "
        "time at any realistic shard size.")
    rec["dcn_cost_model"] = model


def main() -> int:
    import jax

    rec = {"backend": jax.default_backend()}
    if jax.default_backend() == "tpu":
        phase_b_pershard(rec)
    else:
        phase_a_structure(rec)
    cost_model(rec)
    old = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            old = json.load(f)
    old.update(rec)
    with open(OUT, "w") as f:
        json.dump(old, f, indent=1)
    print(f"written {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
