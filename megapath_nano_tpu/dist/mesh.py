"""Device mesh helpers.

The scale-out model (SURVEY §2.7): the RefSeq minimizer index is sharded
across chips along a "shard" axis (each chip holds a slice of the sorted
table + the packed target sequences it refers to); read batches are
replicated (or data-parallel over a second "data" axis); per-read candidate
merges ride ICI collectives (pmax/all_gather/psum). This replaces the
reference's single-node minimap2 `-I` index batching (reference:
bin/megapath_nano.py:4017-4022 sizes index batches to RAM/64GB — the CPU
ancestor of index sharding).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_shards: int | None = None, n_data: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_shards is None:
        n_shards = len(devices) // n_data
    assert n_shards * n_data <= len(devices), (
        f"need {n_shards * n_data} devices, have {len(devices)}")
    dev = np.array(devices[: n_shards * n_data]).reshape(n_data, n_shards)
    return Mesh(dev, ("data", "shard"))
