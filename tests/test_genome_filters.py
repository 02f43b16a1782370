"""Genome-vs-genome filters: repetitive-region detection, variable regions,
similar-species marking on synthetic genomes with engineered shared segments."""

import numpy as np

from megapath_nano_tpu.index.minimizer import MinimizerIndex
from megapath_nano_tpu.taxon.genome_filters import (align_genome_to_index,
                                                    covered_bed,
                                                    human_repetitive_bed,
                                                    microbe_repetitive_beds,
                                                    similar_species_marker,
                                                    variable_region_bed)
from megapath_nano_tpu.utils.dna import mutate, random_sequence


def test_align_genome_finds_shared_segment():
    rng = np.random.default_rng(0)
    shared = random_sequence(rng, 8000)
    a = np.concatenate([random_sequence(rng, 5000), shared,
                        random_sequence(rng, 5000)])
    b = np.concatenate([random_sequence(rng, 3000), shared,
                        random_sequence(rng, 7000)])
    idx = MinimizerIndex.build([b], ["b"])
    al = align_genome_to_index(a, idx, min_identity=0.95)
    bed = covered_bed(al, np.zeros(1, np.int32))
    assert len(bed) >= 1
    cov = int((bed["end"] - bed["start"]).sum())
    assert 7000 < cov < 9500
    assert bed["start"].min() >= 2800 and bed["end"].max() <= 11300


def test_human_repetitive_bed():
    rng = np.random.default_rng(1)
    alu_like = random_sequence(rng, 2000)
    human = np.concatenate([random_sequence(rng, 10000), alu_like,
                            random_sequence(rng, 10000)])
    microbe = np.concatenate([random_sequence(rng, 6000), alu_like,
                              random_sequence(rng, 6000)])
    idx = MinimizerIndex.build([microbe], ["m"])
    bed = human_repetitive_bed([human], idx, np.zeros(1, np.int32))
    assert len(bed) >= 1
    assert ((bed["start"] < 8100) & (bed["end"] > 5900)).any()
    cov = int((bed["end"] - bed["start"]).sum())
    assert cov < 4000   # only the shared element, not the whole genome


def test_microbe_repetitive_ladder():
    rng = np.random.default_rng(2)
    shared = random_sequence(rng, 5000)
    hi = np.concatenate([random_sequence(rng, 4000), shared])
    lo = np.concatenate([shared, random_sequence(rng, 4000)])
    asm = {0: [hi], 1: [lo]}
    idx_of = {0: MinimizerIndex.build([hi]), 1: MinimizerIndex.build([lo])}
    sa = {0: np.zeros(1, np.int32), 1: np.zeros(1, np.int32)}
    # ratio 200x -> ladder active at 80% similarity
    bed = microbe_repetitive_beds(asm, {0: 2_000_000, 1: 10_000},
                                  {0: 1, 1: 2}, idx_of, sa)
    assert len(bed) >= 1
    assert (bed["assembly_id"] == 1).all()   # noise lands on the LOW assembly
    assert bed["end"].max() <= 5600          # within the shared prefix
    # ratio 2x -> below every rung: nothing flagged
    bed2 = microbe_repetitive_beds(asm, {0: 20_000, 1: 10_000},
                                   {0: 1, 1: 2}, idx_of, sa)
    assert len(bed2) == 0


def test_variable_region_detection():
    rng = np.random.default_rng(3)
    core = random_sequence(rng, 12000)
    chosen = np.concatenate([core, random_sequence(rng, 5000)])  # unique tail
    strains = {
        0: [chosen],
        1: [mutate(rng, core, 0.01, 0.005, 0.005)],
        2: [mutate(rng, core, 0.01, 0.005, 0.005)],
    }
    idx = MinimizerIndex.build([chosen])
    bed = variable_region_bed(strains, idx, np.zeros(1, np.int32), 0)
    assert len(bed) >= 1
    var_bp = int((bed["end"] - bed["start"]).sum())
    # the 5kb unique tail is variable; the core is not
    assert 4000 < var_bp < 7000
    assert bed["end"].max() >= 16500


def test_similar_species_marker():
    rng = np.random.default_rng(4)
    top = random_sequence(rng, 10000)
    similar_sib = mutate(rng, top, 0.01, 0.005, 0.005)      # ~98% identical
    distant_sib = random_sequence(rng, 10000)
    idx = MinimizerIndex.build([similar_sib, distant_sib], ["s1", "s2"])
    sa = np.array([0, 1], np.int32)
    marks = similar_species_marker(
        [top], idx, sa, {0: len(similar_sib), 1: len(distant_sib)})
    assert marks.get(0) is True
    assert 1 not in marks
