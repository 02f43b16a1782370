"""Genome-pair BED caching (the reference's .asmNN.bed / .var.bed resume
mechanism, megapath_nano.py:1627-1632, 2087-2092)."""

import numpy as np

from megapath_nano_tpu.align.pipeline import AlignParams
from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.index.minimizer import MinimizerIndex
from megapath_nano_tpu.taxon.bed_cache import BedCache
from megapath_nano_tpu.taxon.genome_filters import microbe_repetitive_beds
from megapath_nano_tpu.taxon.intervals import BED_DTYPE, make_bed
from megapath_nano_tpu.taxon.profiler import ProfileOptions, TaxonProfiler
from megapath_nano_tpu.utils.dna import mutate, random_sequence


def test_bed_cache_roundtrip(tmp_path):
    cache = BedCache(str(tmp_path))
    bed = make_bed([0, 1], [0, 3], [10, 20], [100, 220])
    cache.put("k1", bed)
    back = cache.get("k1")
    np.testing.assert_array_equal(back, bed)
    assert cache.get("other") is None
    empty = np.zeros(0, BED_DTYPE)
    cache.put("empty", empty)
    assert len(cache.get("empty")) == 0


def test_microbe_pair_beds_cached_and_reused(tmp_path):
    rng = np.random.default_rng(3)
    shared = random_sequence(rng, 8000)      # repeated across both genomes
    hi = np.concatenate([random_sequence(rng, 5000), shared])
    lo = np.concatenate([shared, random_sequence(rng, 5000)])
    assemblies = {0: [hi], 1: [lo]}
    abundances = {0: 1_000_000.0, 1: 1_000.0}   # ratio 1000 -> 80% preset
    genus_of = {0: 1, 1: 1}
    idx_of = {a: MinimizerIndex.build(assemblies[a], [f"s{a}"])
              for a in (0, 1)}
    sa_of = {a: np.zeros(1, np.int32) + a for a in (0, 1)}
    cache = BedCache(str(tmp_path))
    names = {0: "asmHI", 1: "asmLO"}
    bed1 = microbe_repetitive_beds(assemblies, abundances, genus_of, idx_of,
                                   sa_of, backend="jnp", cache=cache,
                                   name_of=names)
    assert len(bed1), "shared region must be flagged"
    # second run must hit the cache: poison the aligner path to prove it
    import megapath_nano_tpu.taxon.genome_filters as gf
    orig = gf.align_genome_to_index
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise AssertionError("cache miss: aligner invoked")
    gf.align_genome_to_index = boom
    try:
        bed2 = microbe_repetitive_beds(assemblies, abundances, genus_of,
                                       idx_of, sa_of, backend="jnp",
                                       cache=cache, name_of=names)
    finally:
        gf.align_genome_to_index = orig
    np.testing.assert_array_equal(bed1, bed2)
    assert calls["n"] == 0


def test_profiler_cache_dir_smoke(tmp_path):
    rng = np.random.default_rng(9)
    shared = random_sequence(rng, 6000)
    g0 = np.concatenate([random_sequence(rng, 4000), shared])
    g1 = np.concatenate([shared, random_sequence(rng, 4000)])
    db = RefDB.build([g0, g1], ["sA", "sB"], [0, 1], ["asmA", "asmB"],
                     [(1, 901, 90), (2, 902, 90)])
    # high-abundance reads from asmA's UNSHARED region (shared-region reads
    # would count for both assemblies and cancel the abundance ratio)
    reads = [mutate(rng, g0[int(rng.integers(0, 2200)):][:900],
                    sub_rate=0.02, ins_rate=0.01, del_rate=0.01)
             for _ in range(60)]
    # a few reads on the unshared part of the low-abundance genome so the
    # abundance ratio ladder fires (>= 6.4x) with asmB present
    reads += [mutate(rng, g1[int(rng.integers(6500, 8500)):][:900],
                     sub_rate=0.02, ins_rate=0.01, del_rate=0.01)
              for _ in range(4)]
    opts = ProfileOptions(emit_cigars=False, microbe_repetitive_filter=True,
                          align=AlignParams(backend="jnp"),
                          genome_pair_cache_dir=str(tmp_path / "cache"))
    res1 = TaxonProfiler(db, opts).profile(reads)
    import os
    cached = os.listdir(str(tmp_path / "cache"))
    assert cached, "pair bed must be cached on disk"
    res2 = TaxonProfiler(db, opts).profile(reads)
    np.testing.assert_array_equal(res1.best.data, res2.best.data)
