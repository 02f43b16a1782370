"""Profiler optional steps: human/decoy filter, combine, unique alignment."""

import numpy as np

from megapath_nano_tpu.align.pipeline import AlignParams
from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.taxon.profiler import ProfileOptions, TaxonProfiler
from megapath_nano_tpu.utils.dna import mutate, random_sequence


def _db(seqs, names, tax0=100):
    return RefDB.build(
        seqs, [f"c{i}" for i in range(len(seqs))],
        list(range(len(seqs))), names,
        [(tax0 + i, tax0 + i, 1) for i in range(len(seqs))],
    )


def test_human_filter_removes_human_reads():
    rng = np.random.default_rng(0)
    human = random_sequence(rng, 20000)
    microbe = random_sequence(rng, 20000)
    db = _db([microbe], ["microbe"])
    hdb = _db([human], ["GRCh38"], tax0=9606)

    reads = []
    for _ in range(10):   # human reads
        s = int(rng.integers(0, 19000))
        reads.append(mutate(rng, human[s:s + 900], 0.02, 0.01, 0.01))
    for _ in range(15):   # microbe reads
        s = int(rng.integers(0, 19000))
        reads.append(mutate(rng, microbe[s:s + 900], 0.02, 0.01, 0.01))

    prof = TaxonProfiler(
        db,
        ProfileOptions(align=AlignParams(backend="jnp"), human_filter=True),
        human_db=hdb)
    res = prof.profile(reads)
    assert set(res.human_read_ids.tolist()) == set(range(10))
    assigned = set(int(r) for r in res.best.data["read_id"])
    assert assigned.isdisjoint(set(range(10)))
    assert len(assigned) == 15


def test_unique_alignment_separates_shared_reads():
    rng = np.random.default_rng(1)
    core = random_sequence(rng, 10000)
    # two near-identical assemblies sharing a core + unique arms
    a1 = np.concatenate([core, random_sequence(rng, 8000)])
    a2 = np.concatenate([core, random_sequence(rng, 8000)])
    db = _db([a1, a2], ["asmA", "asmB"])

    reads = []
    for _ in range(10):   # reads from the shared core -> ambiguous
        s = int(rng.integers(0, 9000))
        reads.append(mutate(rng, core[s:s + 800], 0.02, 0.01, 0.01))
    for _ in range(10):   # reads from asmA's unique arm
        s = int(rng.integers(10500, 17000))
        reads.append(mutate(rng, a1[s:s + 800], 0.02, 0.01, 0.01))

    prof = TaxonProfiler(db, ProfileOptions(
        align=AlignParams(backend="jnp"), unique_alignment=True))
    res = prof.profile(reads)
    uniq = set(res.unique_read_ids.tolist())
    # unique-arm reads are unique; shared-core reads are not
    assert set(range(10, 20)) <= uniq
    assert uniq.isdisjoint(set(range(10)))


def test_timing_log_collected():
    rng = np.random.default_rng(2)
    g = random_sequence(rng, 10000)
    db = _db([g], ["a"])
    reads = [mutate(rng, g[100:900], 0.02, 0.01, 0.01)]
    prof = TaxonProfiler(db, ProfileOptions(align=AlignParams(backend="jnp")))
    prof.log.enabled = False
    prof.profile(reads)
    names = [n for n, _ in prof.log.timings]
    assert "placement_to_species" in names
    assert "best_alignment" in names
