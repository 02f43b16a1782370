"""Scaling-efficiency harness for the sharded alignment step.

Measures the sharded seed-lookup + extension step (dist/sharded.py) at
increasing shard counts and reports throughput + efficiency relative to
1 shard — the BASELINE's "reads/s/chip at 1 chip / 1 host / N hosts"
measurement. On CPU the mesh uses virtual devices
(--xla_force_host_platform_device_count), which validates the collective
structure; wall-clock efficiency numbers are only meaningful on real chips.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import numpy as np

from megapath_nano_tpu.dist.mesh import make_mesh
from megapath_nano_tpu.dist.sharded import (ShardedIndex,
                                            make_sharded_align_step)
from megapath_nano_tpu.index.minimizer import sketch_batch
from megapath_nano_tpu.utils.dna import mutate, random_sequence


@dataclass
class ScalePoint:
    n_shards: int
    reads_per_s: float
    efficiency: float       # vs 1-shard throughput * n


def measure_scaling(
    shard_counts: list[int] | None = None,
    *,
    genome_per_shard: int = 100_000,
    n_reads: int = 512,
    read_len: int = 800,
    m_max: int = 128,
    window: int = 1024,
    iters: int = 3,
    seed: int = 0,
) -> list[ScalePoint]:
    devs = jax.devices()
    if shard_counts is None:
        shard_counts = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    rng = np.random.default_rng(seed)
    max_shards = max(shard_counts)
    genomes = [random_sequence(rng, genome_per_shard)
               for _ in range(max_shards)]

    q_max = int(np.ceil(read_len * 1.3 / 128) * 128)
    reads_np = np.full((n_reads, q_max), 4, np.int8)
    hashes = np.zeros((n_reads, m_max), np.uint64)
    q_pos = np.zeros((n_reads, m_max), np.int32)
    read_len_arr = np.zeros(n_reads, np.int32)
    raw = []
    for i in range(n_reads):
        src = genomes[i % max_shards]
        s = int(rng.integers(0, genome_per_shard - read_len))
        read = mutate(rng, src[s: s + read_len], 0.03, 0.015, 0.015)
        raw.append(read)
        reads_np[i, : len(read)] = read
        read_len_arr[i] = len(read)
    h, p, st, off = sketch_batch(raw)
    for i in range(n_reads):
        m = min(int(off[i + 1] - off[i]), m_max)
        hashes[i, :m] = h[off[i]: off[i] + m]
        q_pos[i, :m] = p[off[i]: off[i] + m]

    points = []
    base = None
    for n_shards in shard_counts:
        mesh = make_mesh(n_shards=n_shards, n_data=1)
        sidx = ShardedIndex.from_sequences(genomes, n_shards)
        step = make_sharded_align_step(mesh, band=128, window=window)
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard_spec = NamedSharding(mesh, P("shard", None))
        rep = NamedSharding(mesh, P())
        keys = jax.device_put(sidx.keys, shard_spec)
        t_pos = jax.device_put(sidx.t_pos, shard_spec)
        targets = jax.device_put(sidx.targets, shard_spec)
        args = [jax.device_put(x, rep)
                for x in (hashes, q_pos, reads_np, read_len_arr)]
        # warmup/compile
        s, sh, ws = step(keys, t_pos, targets, *args)
        s.block_until_ready()
        t0 = time.time()
        for _ in range(iters):
            s, sh, ws = step(keys, t_pos, targets, *args)
        s.block_until_ready()
        dt = (time.time() - t0) / iters
        rps = n_reads / dt
        if base is None:
            base = rps
        eff = rps / (base * n_shards / shard_counts[0])
        points.append(ScalePoint(n_shards, rps, eff))
    return points
