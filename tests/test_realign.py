"""Local realignment: alt support at true SNVs survives realignment; error
positions collapse toward the reference."""

import numpy as np

from megapath_nano_tpu.align.pipeline import AlignParams
from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.taxon.profiler import ProfileOptions, TaxonProfiler
from megapath_nano_tpu.utils.dna import mutate, random_sequence
from megapath_nano_tpu.variant.realign import realign_candidates


def test_realignment_counts():
    rng = np.random.default_rng(0)
    ref = random_sequence(rng, 6000)
    donor = ref.copy()
    snv = 3000
    donor[snv] = (donor[snv] + 1) % 4
    db = RefDB.build([ref], ["chr1"], [0], ["r"], [(1, 1, 1)])
    reads = [mutate(rng, donor[int(rng.integers(0, 5200)):][:800],
                    0.01, 0.005, 0.005) for _ in range(80)]
    res = TaxonProfiler(db, ProfileOptions(
        align=AlignParams(backend="jnp"))).profile(reads)

    clean_pos = 2000     # no variant here
    rc = realign_candidates(res.best, reads, 0, ref, [snv, clean_pos])
    at_snv = rc[0]
    at_clean = rc[1]
    assert at_snv.depth >= 5
    # nearly all realigned reads support the donor base at the SNV
    assert at_snv.alt_support >= 0.8 * at_snv.depth
    assert at_snv.base_counts[int(donor[snv])] == at_snv.alt_support
    # clean position: reference base dominates
    assert at_clean.depth >= 5
    assert at_clean.ref_support >= 0.9 * at_clean.depth
