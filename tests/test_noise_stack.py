"""Integrated noise stack: repetitive filters inside the profiler."""

import numpy as np

from megapath_nano_tpu.align.pipeline import AlignParams
from megapath_nano_tpu.db.refdb import RefDB
from megapath_nano_tpu.taxon.profiler import ProfileOptions, TaxonProfiler
from megapath_nano_tpu.utils.dna import mutate, random_sequence


def test_microbe_repetitive_filter_rescues_low_abundance_false_calls():
    rng = np.random.default_rng(0)
    shared = random_sequence(rng, 6000)
    hi_genome = np.concatenate([random_sequence(rng, 12000), shared])
    lo_genome = np.concatenate([shared, random_sequence(rng, 12000)])
    # same genus: the reference's >= 98%-similarity ladder tiers only fire
    # for same-genus pairs (megapath_nano.py:2040-2055), and this world's
    # ~12x abundance ratio lands on the 99% tier
    db = RefDB.build([hi_genome, lo_genome], ["cH", "cL"], [0, 1],
                     ["asmHigh", "asmLow"],
                     [(1, 10, 5), (2, 20, 5)],
                     {10: "High bug", 20: "Low bug"})
    # many reads from the HIGH genome, including its shared segment; NO real
    # low-genome reads — every asmLow hit is cross-mapping noise
    reads = []
    for _ in range(80):
        s = int(rng.integers(0, len(hi_genome) - 800))
        reads.append(mutate(rng, hi_genome[s:s + 800], 0.02, 0.01, 0.01))

    opts_off = ProfileOptions(align=AlignParams(backend="jnp"))
    res_off = TaxonProfiler(db, opts_off).profile(reads)
    lo_aligns_off = int((res_off.align_list.data["assembly_id"] == 1).sum())

    opts_on = ProfileOptions(align=AlignParams(backend="jnp"),
                             microbe_repetitive_filter=True)
    res_on = TaxonProfiler(db, opts_on).profile(reads)
    lo_aligns_on = int((res_on.align_list.data["assembly_id"] == 1).sum())

    # without the filter, shared-segment reads cross-map onto the low
    # assembly; the repetitive mask removes those alignments entirely
    assert lo_aligns_off > 10
    assert lo_aligns_on < lo_aligns_off * 0.15, (lo_aligns_off, lo_aligns_on)
    assert "microbe_repetitive" in res_on.noise_sources
    bed = res_on.noise_sources["microbe_repetitive"]
    assert (bed["assembly_id"] == 1).all()
    assert bed["end"].max() <= 6600     # mask confined to the shared prefix
    # the upper-bound (pre-noise) table still reflects the raw signal
    assert res_on.max_stat is not None
    assert (res_on.max_stat["assembly_id"] == 1).sum() + \
        (res_on.max_stat["assembly_id"] == 0).sum() == len(res_on.max_stat)


def test_similar_species_marker_in_profiler(tmp_path):
    rng = np.random.default_rng(1)
    top = random_sequence(rng, 12000)
    sib = mutate(rng, top, 0.01, 0.005, 0.005)
    db = RefDB.build([top, sib], ["cT", "cS"], [0, 1],
                     ["asmTop", "asmSib"],
                     [(1, 10, 5), (2, 20, 5)],     # same genus 5
                     {10: "Top bug", 20: "Sib bug"})
    reads = []
    for _ in range(40):
        s = int(rng.integers(0, 11000))
        reads.append(mutate(rng, top[s:s + 800], 0.02, 0.01, 0.01))
    opts = ProfileOptions(align=AlignParams(backend="jnp"),
                          similar_species_marker=True)
    prof = TaxonProfiler(db, opts)
    res = prof.profile(reads)
    assert res.similar_marks.get(1) is True
    paths = prof.write_reports(res, str(tmp_path), "t")
    content = open(paths["similar_species"]).read()
    assert "asmSib\t1" in content
