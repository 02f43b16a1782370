"""Shipped default variant-model ensemble (reference parity:
bin/Clair-ensemble/model/model-0000xx checkpoints consumed by
runClair-ensemble.sh --chkpnt_fn).

The artifacts in megapath_nano_tpu/variant/models/ are produced by
tools/train_default_variant_models.py; the manifest records the held-out
precision/recall/F1 measured at training time. These tests assert the
artifacts load, the manifest's accuracy bar holds, and the loaded ensemble
actually calls variants on fresh simulated data.
"""

import numpy as np

from megapath_nano_tpu.variant.pretrained import (default_ensemble,
                                                  manifest)

F1_FLOOR = 0.90


def test_manifest_shipped_with_accuracy_bar():
    man = manifest()
    assert man is not None, "no shipped manifest.json — run " \
        "tools/train_default_variant_models.py"
    # >=3 models ensembled like runClair-ensemble.sh:132-168
    assert len(man["models"]) >= 3
    ev = man["heldout_eval"]
    assert ev["f1"] >= F1_FLOOR, ev
    assert ev["precision"] >= F1_FLOOR, ev
    assert ev["recall"] >= F1_FLOOR, ev


def test_ensemble_loads_and_calls():
    models = default_ensemble()
    assert len(models) >= 3
    # fresh world, unseen by training (seeds 11/12/99 used there)
    from megapath_nano_tpu.align.pipeline import (AlignParams,
                                                  MinimizerAligner)
    from megapath_nano_tpu.index.minimizer import MinimizerIndex
    from megapath_nano_tpu.utils.dna import mutate, random_sequence
    from megapath_nano_tpu.variant.caller import call_variants

    rng = np.random.default_rng(7)
    glen = 20_000
    ref = random_sequence(rng, glen)
    truth = {}
    donor = ref.copy()
    for p in rng.choice(np.arange(200, glen - 200), 20, replace=False):
        alt = (int(ref[p]) + 1 + int(rng.integers(0, 3))) % 4
        donor[int(p)] = alt
        truth[int(p)] = alt
    reads = []
    for _ in range(50 * glen // 1000):
        s = int(rng.integers(0, glen - 1000))
        r = mutate(rng, donor[s: s + 1000], 0.025, 0.0125, 0.0125)
        reads.append(r)

    index = MinimizerIndex.build([ref], ["chr"])
    aligner = MinimizerAligner(index, params=AlignParams(backend="jnp"))
    al = aligner.map_reads(reads, emit_cigars=True)
    calls = call_variants(al, reads, 0, ref, models, min_af=0.125,
                          min_depth=4)
    called = {c.position: c for c in calls}
    tp = sum(1 for p, alt in truth.items()
             if p in called and called[p].alt == "ACGT"[alt])
    # a call at a true position with the WRONG alt is a false positive too
    fp = sum(1 for p, c in called.items()
             if p not in truth or c.alt != "ACGT"[truth[p]])
    fn = len(truth) - tp
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    assert f1 >= 0.85, (tp, fp, fn)
    # hom genotypes on a haploid-style donor: every true call is 1/1
    gt_ok = sum(1 for p in truth if p in called
                and called[p].genotype == "1/1")
    assert gt_ok >= 0.9 * tp
