"""ShardedAligner == single-index MinimizerAligner, field for field."""

import numpy as np
import pytest

from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner
from megapath_nano_tpu.dist.sharded_aligner import ShardedAligner
from megapath_nano_tpu.index.minimizer import MinimizerIndex
from megapath_nano_tpu.utils.dna import mutate, random_sequence, revcomp


def _world(seed=0, n_genomes=6, glen=20000):
    rng = np.random.default_rng(seed)
    genomes = [random_sequence(rng, glen) for _ in range(n_genomes)]
    names = [f"g{i}" for i in range(n_genomes)]
    reads = []
    for _ in range(96):
        g = int(rng.integers(0, n_genomes))
        s = int(rng.integers(0, glen - 900))
        r = mutate(rng, genomes[g][s: s + 900], sub_rate=0.03,
                   ins_rate=0.015, del_rate=0.015)
        if rng.integers(0, 2):
            r = revcomp(r)
        reads.append(r)
    return genomes, names, reads


@pytest.mark.slow
def test_sharded_matches_single_index():
    genomes, names, reads = _world()
    params = AlignParams(backend="jnp")
    single = MinimizerAligner(MinimizerIndex.build(genomes, names),
                              params=params)
    sharded = ShardedAligner.build(genomes, names,
                                   list(range(len(genomes))), names,
                                   n_shards=3, params=params)
    a = single.map_reads(reads, emit_cigars=False)
    b = sharded.map_reads(reads, emit_cigars=False)
    assert len(a) == len(b) > 0
    for col in a.data.dtype.names:
        np.testing.assert_array_equal(a.data[col], b.data[col], err_msg=col)


def test_sharded_cigar_mode_and_empty_shard():
    genomes, names, reads = _world(seed=3, n_genomes=2)
    params = AlignParams(backend="jnp")
    # 5 shards for 2 assemblies: 3 shards are empty
    sharded = ShardedAligner.build(genomes, names, [0, 1], names,
                                   n_shards=5, params=params)
    out = sharded.map_reads(reads, emit_cigars=True)
    assert len(out) > 0
    assert out.cigar_map
    rid = int(out.data["read_id"][0])
    sid = int(out.data["sequence_id"][0])
    assert (rid, sid) in out.cigar_map
    single = MinimizerAligner(MinimizerIndex.build(genomes, names),
                              params=params)
    a = single.map_reads(reads, emit_cigars=True)
    np.testing.assert_array_equal(a.data, out.data)
