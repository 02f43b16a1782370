"""RefDB subset (genome sets), integrity check, noise projection wiring."""

import numpy as np

from megapath_nano_tpu.align.pipeline import AlignParams
from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.taxon.profiler import ProfileOptions, TaxonProfiler
from megapath_nano_tpu.utils.dna import mutate, random_sequence


def _db(seed=0):
    rng = np.random.default_rng(seed)
    genomes = [random_sequence(rng, 15000) for _ in range(3)]
    db = RefDB.build(genomes, ["c0", "c1", "c2"], [0, 1, 2],
                     ["asmA", "asmB", "asmC"],
                     [(1, 10, 5), (2, 20, 5), (3, 30, 6)],
                     {10: "A", 20: "B", 30: "C"})
    return rng, genomes, db


def test_subset_genome_set():
    rng, genomes, db = _db()
    sub = db.subset(["asmA", "asmC"])
    assert sub.assembly_names == ["asmA", "asmC"]
    assert sub.data_integrity_check() == []
    reads = [mutate(rng, genomes[1][2000:2800], 0.02, 0.01, 0.01)
             for _ in range(5)]
    prof = TaxonProfiler(sub, ProfileOptions(align=AlignParams(backend="jnp")))
    res = prof.profile(reads)
    # asmB is excluded: its reads cannot be assigned to it
    assert all(int(r["assembly_id"]) != 1 or True for r in res.best.data)
    assert "asmB" not in [sub.assembly_names[int(r["assembly_id"])]
                          for r in res.best.data]


def test_integrity_check_detects_corruption():
    _, _, db = _db()
    assert db.data_integrity_check() == []
    db.assembly_lengths[0] += 7
    problems = db.data_integrity_check()
    assert any("asmA" in p for p in problems)


def test_noise_projection_wired(tmp_path):
    rng = np.random.default_rng(1)
    shared = random_sequence(rng, 6000)
    a1 = np.concatenate([shared, random_sequence(rng, 6000)])
    a2 = np.concatenate([random_sequence(rng, 6000), shared])
    db = RefDB.build([a1, a2], ["c1", "c2"], [0, 1], ["asmA", "asmB"],
                     [(1, 10, 5), (2, 20, 5)])   # same genus
    reads = [mutate(rng, a1[int(rng.integers(0, 11000)):][:700],
                    0.02, 0.01, 0.01) for _ in range(30)]
    prof = TaxonProfiler(db, ProfileOptions(
        align=AlignParams(backend="jnp"), noise_projection=True,
        noise_projection_reads=60))
    res = prof.profile(reads)
    assert res.noise_projections
    pr = res.noise_projections[0]
    assert pr.projected_noise_reads > 0    # shared half cross-maps
    paths = prof.write_reports(res, str(tmp_path), "np")
    content = open(paths["noise_projection"]).read()
    assert "asmA\tasmB" in content
