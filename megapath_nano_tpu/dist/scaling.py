"""Scaling-efficiency harness for the production sharded map path.

Measures ShardMapAligner (dist/fused_sharded.py — the full fused map step
per index shard under shard_map with an all_gather merge) at increasing
shard counts and reports throughput + efficiency — the BASELINE's
"reads/s/chip at 1 chip / 1 host / N hosts" measurement. Weak scaling:
each added shard brings its own slice of reference (genome_per_shard bp),
so perfect scaling holds throughput constant while index capacity grows
with N. On CPU the mesh uses virtual devices
(--xla_force_host_platform_device_count), which validates the collective
structure; wall-clock efficiency numbers are only meaningful on real
chips.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import numpy as np

from megapath_nano_tpu.align.pipeline import AlignParams
from megapath_nano_tpu.dist.fused_sharded import (ShardedIndexPlanes,
                                                  ShardMapAligner)
from megapath_nano_tpu.dist.mesh import make_mesh
from megapath_nano_tpu.utils.dna import mutate, random_sequence


@dataclass
class ScalePoint:
    n_shards: int
    reads_per_s: float
    efficiency: float       # vs 1-shard throughput (weak scaling: 1.0 =
    #                         constant throughput as index grows with N)
    n_data: int = 1


def measure_scaling(
    shard_counts: list[int] | None = None,
    *,
    genome_per_shard: int = 100_000,
    n_reads: int = 512,
    read_len: int = 800,
    iters: int = 3,
    seed: int = 0,
    backend: str | None = None,
    n_data: int = 1,
) -> list[ScalePoint]:
    """Weak scaling over the "shard" axis at a fixed "data" width: each
    mesh point uses n_data × n_shards devices; reads are data-parallel over
    the n_data rows and the index is sharded across n_shards columns."""
    devs = jax.devices()
    if shard_counts is None:
        shard_counts = [n for n in (1, 2, 4, 8)
                        if n * n_data <= len(devs)]
    if backend is None:
        backend = "pallas" if devs[0].platform == "tpu" else "jnp"
    rng = np.random.default_rng(seed)
    max_shards = max(shard_counts)
    genomes = [random_sequence(rng, genome_per_shard)
               for _ in range(max_shards)]
    names = [f"g{i}" for i in range(max_shards)]
    reads = []
    for i in range(n_reads):
        src = genomes[i % max_shards]
        s = int(rng.integers(0, genome_per_shard - read_len))
        reads.append(mutate(rng, src[s: s + read_len], 0.03, 0.015, 0.015))

    params = AlignParams(backend=backend)
    points = []
    base = None
    for n_shards in shard_counts:
        mesh = make_mesh(n_shards=n_shards, n_data=n_data)
        # weak scaling: N shards index the first N genomes (reads from
        # genomes beyond the indexed set simply don't align)
        planes = ShardedIndexPlanes.build(
            genomes[:n_shards], names[:n_shards], n_shards)
        aligner = ShardMapAligner(planes, mesh, params=params)
        aligner.map_reads(reads)            # warmup/compile
        t0 = time.time()
        for _ in range(iters):
            aligner.map_reads(reads)
        dt = (time.time() - t0) / iters
        rps = n_reads / dt
        if base is None:
            base = rps
        points.append(ScalePoint(n_shards, rps, rps / base, n_data))
    return points


if __name__ == "__main__":
    import sys

    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    for pt in measure_scaling(n_data=nd):
        print(f"mesh (data={pt.n_data}, shard={pt.n_shards:2d})  "
              f"{pt.reads_per_s:9.1f} reads/s  "
              f"efficiency {pt.efficiency:.2f}")
