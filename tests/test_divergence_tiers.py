"""Step-12 divergence-tier property test vs a planted-segment oracle.

A synthetic two-strain pair: the LOW genome is a mosaic of segments copied
from the HIGH genome at controlled divergences (0.4%, 4%, 8%, 18%) plus
unrelated random segments. For each abundance-ratio tier
(megapath_nano.py:5090-5095 ladder), the microbe-repetitive noise bed on the
low assembly must cover exactly the segments whose identity clears the
tier's similarity cutoff — including the 80%/90% tiers, which only work
with divergence-matched seeding (tier_seed_params; the reference's
per-divergence minimap2 presets, megapath_nano.py:221-241). Also verifies
the escalate/drop rule (:2153-2165): a near-identical pair escalates to the
top tier and is dropped once > allowed_max_span of the genome would be
marked as noise.
"""

import numpy as np

from megapath_nano_tpu.index.minimizer import MinimizerIndex
from megapath_nano_tpu.taxon.genome_filters import (RATIO_LADDER,
                                                    microbe_repetitive_beds,
                                                    tier_seed_params)
from megapath_nano_tpu.utils.dna import random_sequence

SEG = 6000


def _sub_mutate(rng, seq, rate):
    out = seq.copy()
    n = int(len(seq) * rate)
    pos = rng.choice(len(seq), n, replace=False)
    out[pos] = (out[pos] + 1 + rng.integers(0, 3, n)) % 4
    return out


def _world():
    rng = np.random.default_rng(5)
    high = random_sequence(rng, 40_000)
    # low = mosaic of high-derived segments + unrelated filler
    segs = [
        ("s996", _sub_mutate(rng, high[0:SEG], 0.004)),          # id ~99.6%
        ("rand1", random_sequence(rng, SEG)),
        ("s96", _sub_mutate(rng, high[8000:8000 + SEG], 0.04)),  # id ~96%
        ("s92", _sub_mutate(rng, high[16000:16000 + SEG], 0.08)),  # id ~92%
        ("rand2", random_sequence(rng, SEG)),
        ("s82", _sub_mutate(rng, high[24000:24000 + SEG], 0.18)),  # id ~82%
    ]
    low = np.concatenate([s for _, s in segs])
    spans = {}
    off = 0
    for name, s in segs:
        spans[name] = (off, off + len(s))
        off += len(s)
    return high, low, spans


def _noise_bed(high, low, ratio):
    index_low = MinimizerIndex.build([low], ["low"])
    return microbe_repetitive_beds(
        {0: [high], 1: [low]},
        {0: ratio, 1: 1.0},
        {0: 7, 1: 7},                      # same genus (98+% tiers gated)
        {1: index_low, 0: MinimizerIndex.build([high], ["high"])},
        {1: np.zeros(1, np.int32), 0: np.zeros(1, np.int32)},
        backend="jnp")


def _coverage(bed, span):
    lo, hi = span
    cov = 0
    for row in bed:
        cov += max(0, min(int(row["end"]), hi) - max(int(row["start"]), lo))
    return cov / (hi - lo)


def test_tier_seed_params_ladder():
    assert tier_seed_params(0.992) == (15, 10)
    assert tier_seed_params(0.98) == (15, 10)
    assert tier_seed_params(0.95) == (13, 8)
    assert tier_seed_params(0.90) == (11, 6)
    assert tier_seed_params(0.80) == (9, 4)
    # >= 98% similarity tiers all require a shared genus (reference
    # :2040-2055 checks genus for similarity_index 4, 5 AND 6)
    assert [g for _, s, g in RATIO_LADDER if s >= 0.98] == [True] * 3


def test_tiers_match_planted_segments():
    high, low, spans = _world()
    # (abundance ratio -> tier similarity, segments the oracle expects)
    cases = [
        (8.0, ["s996"]),                              # 99% tier
        (16.0, ["s996"]),                             # 98% tier
        (40.0, ["s996", "s96"]),                      # 95% tier
        (80.0, ["s996", "s96", "s92"]),               # 90% tier
        (160.0, ["s996", "s96", "s92", "s82"]),       # 80% tier
    ]
    for ratio, expected in cases:
        bed = _noise_bed(high, low, ratio)
        for name, span in spans.items():
            cov = _coverage(bed, span)
            if name in expected:
                # floor 0.80: chunk-boundary edge effects cost up to ~1/6
                # of a segment; the discrimination margin vs the <= 0.20
                # negative bound stays wide
                assert cov >= 0.80, (ratio, name, cov)
            else:
                assert cov <= 0.20, (ratio, name, cov)


def test_escalate_drop_same_organism():
    """A pair that is ~the same genome escalates to the 99.2% tier and is
    then dropped entirely (covering > allowed_max_span would erase a real
    species, reference :2157-2162)."""
    rng = np.random.default_rng(9)
    high = random_sequence(rng, 30_000)
    low = _sub_mutate(rng, high, 0.002)        # ~99.8% identical everywhere
    bed = microbe_repetitive_beds(
        {0: [high], 1: [low]},
        {0: 160.0, 1: 1.0},
        {0: 7, 1: 7},
        {1: MinimizerIndex.build([low], ["low"]),
         0: MinimizerIndex.build([high], ["high"])},
        {1: np.zeros(1, np.int32), 0: np.zeros(1, np.int32)},
        backend="jnp")
    assert len(bed) == 0
