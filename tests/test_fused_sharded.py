"""Production shard_map map path == single-index MinimizerAligner, field for
field (PAF mode). Runs on the 8-virtual-device CPU mesh from conftest."""

import numpy as np
import pytest

from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner
from megapath_nano_tpu.dist.fused_sharded import (ShardedIndexPlanes,
                                                  ShardMapAligner)
from megapath_nano_tpu.dist.mesh import make_mesh
from megapath_nano_tpu.index.minimizer import MinimizerIndex
from megapath_nano_tpu.utils.dna import mutate, random_sequence, revcomp


def _world(seed=0, n_genomes=6, glen=20000, n_reads=64):
    rng = np.random.default_rng(seed)
    genomes = [random_sequence(rng, glen) for _ in range(n_genomes)]
    names = [f"g{i}" for i in range(n_genomes)]
    reads = []
    for _ in range(n_reads):
        g = int(rng.integers(0, n_genomes))
        s = int(rng.integers(0, glen - 900))
        r = mutate(rng, genomes[g][s: s + 900], sub_rate=0.03,
                   ins_rate=0.015, del_rate=0.015)
        if rng.integers(0, 2):
            r = revcomp(r)
        reads.append(r)
    return genomes, names, reads


@pytest.mark.parametrize(
    "n_shards", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_shard_map_matches_single_index(n_shards):
    genomes, names, reads = _world()
    params = AlignParams(backend="jnp")
    single = MinimizerAligner(MinimizerIndex.build(genomes, names),
                              params=params)
    a = single.map_reads(reads, emit_cigars=False)

    mesh = make_mesh(n_shards=n_shards, n_data=1)
    planes = ShardedIndexPlanes.build(genomes, names, n_shards)
    sharded = ShardMapAligner(planes, mesh, params=params)
    b = sharded.map_reads(reads)
    assert len(a) == len(b) > 0
    for col in a.data.dtype.names:
        np.testing.assert_array_equal(a.data[col], b.data[col], err_msg=col)


@pytest.mark.parametrize("n_data,n_shards", [(2, 2), (2, 4), (4, 2)])
@pytest.mark.slow
def test_shard_map_data_axis_matches_single_index(n_data, n_shards):
    """Reads data-parallel over the "data" axis × index sharded over
    "shard": output must stay field-identical to the single-index mapper,
    including when the read count does not divide evenly into data blocks."""
    genomes, names, reads = _world(seed=3, n_reads=50)   # 50 % n_data != 0
    params = AlignParams(backend="jnp")
    single = MinimizerAligner(MinimizerIndex.build(genomes, names),
                              params=params)
    a = single.map_reads(reads, emit_cigars=False)

    mesh = make_mesh(n_shards=n_shards, n_data=n_data)
    planes = ShardedIndexPlanes.build(genomes, names, n_shards)
    sharded = ShardMapAligner(planes, mesh, params=params)
    b = sharded.map_reads(reads)
    assert len(a) == len(b) > 0
    for col in a.data.dtype.names:
        np.testing.assert_array_equal(a.data[col], b.data[col], err_msg=col)


@pytest.mark.slow
def test_shard_map_empty_shard_and_slicing():
    genomes, names, reads = _world(seed=5, n_genomes=2, n_reads=40)
    params = AlignParams(backend="jnp")
    mesh = make_mesh(n_shards=4, n_data=1)
    planes = ShardedIndexPlanes.build(genomes, names, 4)   # 2 empty shards
    sharded = ShardMapAligner(planes, mesh, params=params)
    b = sharded.map_reads(reads, slice_size=16)            # multi-slice
    single = MinimizerAligner(MinimizerIndex.build(genomes, names),
                              params=params)
    a = single.map_reads(reads, emit_cigars=False)
    assert len(a) == len(b) > 0
    for col in a.data.dtype.names:
        np.testing.assert_array_equal(a.data[col], b.data[col], err_msg=col)


@pytest.mark.slow
def test_shard_map_overflow_falls_back_exactly():
    genomes, names, reads = _world(seed=9, n_genomes=4, n_reads=24)
    params = AlignParams(backend="jnp", devseed_out_per_read=2)
    mesh = make_mesh(n_shards=2, n_data=1)
    planes = ShardedIndexPlanes.build(genomes, names, 2)
    sharded = ShardMapAligner(planes, mesh, params=params)
    # force tiny caps: monkey-patch the cap sizing so every shard overflows
    orig = sharded._caps

    def tiny(slice_n, read_max):
        w, a, g, o = orig(slice_n, read_max)
        return w, a, g, 4           # out_cap 4 << rows -> overflow path
    sharded._caps = tiny
    b = sharded.map_reads(reads)
    single = MinimizerAligner(MinimizerIndex.build(genomes, names),
                              params=params)
    a = single.map_reads(reads, emit_cigars=False)
    assert len(a) == len(b) > 0
    for col in a.data.dtype.names:
        np.testing.assert_array_equal(a.data[col], b.data[col], err_msg=col)


def test_shard_map_multilocus_repeat():
    """Repeat cassette on one shard's genome: the sharded path must keep
    both loci (multi-locus selection happens on the merged union)."""
    rng = np.random.default_rng(11)
    cass = random_sequence(rng, 3000)
    g0 = np.concatenate([random_sequence(rng, 4000), cass,
                         random_sequence(rng, 5000), cass,
                         random_sequence(rng, 4000)])
    g1 = random_sequence(rng, 15000)
    read = mutate(rng, cass[100:2700], sub_rate=0.02, ins_rate=0.01,
                  del_rate=0.01)
    params = AlignParams(backend="jnp")
    mesh = make_mesh(n_shards=2, n_data=1)
    planes = ShardedIndexPlanes.build([g0, g1], ["rep", "other"], 2)
    sharded = ShardMapAligner(planes, mesh, params=params)
    out = sharded.map_reads([read])
    d = out.data
    assert len(d) == 2
    assert set(int(s) for s in d["sequence_id"]) == {0}
    froms = sorted(int(x) for x in d["sequence_from"])
    assert abs(froms[0] - 4100) < 150 and abs(froms[1] - 12100) < 150


@pytest.mark.slow
def test_planes_save_load_roundtrip(tmp_path):
    genomes, names, reads = _world(seed=21, n_genomes=4, n_reads=24)
    params = AlignParams(backend="jnp")
    mesh = make_mesh(n_shards=2, n_data=1)
    planes = ShardedIndexPlanes.build(genomes, names, 2)
    planes.save(str(tmp_path / "planes"))
    loaded = ShardedIndexPlanes.load(str(tmp_path / "planes"))
    np.testing.assert_array_equal(planes.keys32, loaded.keys32)
    np.testing.assert_array_equal(planes.seq_data, loaded.seq_data)
    assert loaded.global_seq_names == names
    a = ShardMapAligner(planes, mesh, params=params).map_reads(reads)
    b = ShardMapAligner(loaded, mesh, params=params).map_reads(reads)
    for col in a.data.dtype.names:
        np.testing.assert_array_equal(a.data[col], b.data[col], err_msg=col)
    # the exact fallback path works on a loaded object (local indexes are
    # rebuilt lazily from the shard planes)
    li = loaded.local_index(0)
    assert len(li.seq_names) >= 1
