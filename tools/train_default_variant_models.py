#!/usr/bin/env python3
"""Train and ship the default variant-model ensemble.

The reference ships seven pretrained Clair checkpoints
(/root/reference/bin/Clair-ensemble/model/model-0000*) consumed by
runClair-ensemble.sh. This script produces the analogous in-repo artifacts:
three ClairNet models trained on simulated ONT reads over a synthetic
diploid sample, evaluated as an ensemble on a HELD-OUT world (different
genome, different variants, different reads), with the measured
precision/recall/F1 recorded in the shipped manifest.

  JAX_PLATFORMS=cpu python tools/train_default_variant_models.py \
      [--steps 1500] [--out megapath_nano_tpu/variant/models]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

HIDDEN = 96
ERR = 0.05
READ_LEN = 1000
COVERAGE = 50


def make_world(seed, glen=60_000, n_het=60, n_hom=60):
    """Reference genome + diploid sample (het on hap1 only, hom on both) +
    truth dict {pos: (alt_code, 'het'|'hom')}."""
    from megapath_nano_tpu.utils.dna import random_sequence

    rng = np.random.default_rng(seed)
    ref = random_sequence(rng, glen)
    pos = rng.choice(np.arange(100, glen - 100), n_het + n_hom,
                     replace=False)
    pos.sort()
    truth = {}
    hap1 = ref.copy()
    hap2 = ref.copy()
    for i, p in enumerate(pos):
        alt = (int(ref[p]) + 1 + int(rng.integers(0, 3))) % 4
        if i % 2 == 0 and len([k for k, v in truth.items()
                               if v[1] == "het"]) < n_het:
            hap1[p] = alt
            truth[int(p)] = (alt, "het")
        else:
            hap1[p] = alt
            hap2[p] = alt
            truth[int(p)] = (alt, "hom")
    return rng, ref, hap1, hap2, truth


def simulate_reads(rng, hap1, hap2, n_reads):
    from megapath_nano_tpu.utils.dna import mutate, revcomp

    reads = []
    glen = len(hap1)
    for i in range(n_reads):
        hap = hap1 if i % 2 == 0 else hap2
        s = int(rng.integers(0, glen - READ_LEN))
        r = mutate(rng, hap[s: s + READ_LEN], sub_rate=ERR * 0.5,
                   ins_rate=ERR * 0.25, del_rate=ERR * 0.25)
        if rng.integers(0, 2):
            r = revcomp(r)
        reads.append(r)
    return reads


def _backend():
    import jax
    try:
        return "pallas" if jax.default_backend() == "tpu" else "jnp"
    except RuntimeError:
        return "jnp"


def map_and_tensors(ref, reads, *, min_af, min_depth):
    from megapath_nano_tpu.align.pipeline import AlignParams, MinimizerAligner
    from megapath_nano_tpu.index.minimizer import MinimizerIndex
    from megapath_nano_tpu.variant.candidates import (candidate_tensor,
                                                      extract_candidates)

    index = MinimizerIndex.build([ref], ["chr"])
    aligner = MinimizerAligner(index,
                               params=AlignParams(backend=_backend()))
    al = aligner.map_reads(reads, emit_cigars=True)
    cands = extract_candidates(al, reads, 0, ref, min_af=min_af,
                               min_depth=min_depth)
    tensors = (np.stack([candidate_tensor(c, ref) for c in cands])
               .astype(np.float32) if cands else
               np.zeros((0, 33, 8, 4), np.float32))
    return al, cands, tensors


def labels_for(cands, truth):
    from megapath_nano_tpu.variant.model import gt21_label_for_snv

    gt, zyg = [], []
    for c in cands:
        tv = truth.get(int(c.position))
        if tv is None:
            zyg.append(0)
            gt.append(gt21_label_for_snv(c.ref_base, c.ref_base, False))
        else:
            alt, kind = tv
            zyg.append(1 if kind == "het" else 2)
            gt.append(gt21_label_for_snv(c.ref_base, alt, kind == "het"))
    return {"gt21": np.asarray(gt, np.int64),
            "zygosity": np.asarray(zyg, np.int64),
            "var_len_1": np.zeros(len(cands), np.int64),
            "var_len_2": np.zeros(len(cands), np.int64)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "megapath_nano_tpu", "variant", "models"))
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    args = ap.parse_args(argv)

    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from megapath_nano_tpu.variant.caller import call_variants
    from megapath_nano_tpu.variant.model import VariantModel

    # ---- train worlds (two, pooled — varied error contexts) -------------
    xs, ys = [], []
    for wseed in (11, 12):
        rng, ref, h1, h2, truth = make_world(wseed)
        n_reads = COVERAGE * len(ref) // READ_LEN
        reads = simulate_reads(rng, h1, h2, n_reads)
        _, cands, tensors = map_and_tensors(ref, reads, min_af=0.08,
                                            min_depth=4)
        lab = labels_for(cands, truth)
        print(f"world {wseed}: {len(cands)} candidates, "
              f"{int((lab['zygosity'] > 0).sum())} variant-labeled")
        xs.append(tensors)
        ys.append(lab)
    x = np.concatenate(xs)
    labels = {k: np.concatenate([y[k] for y in ys]) for k in ys[0]}

    os.makedirs(args.out, exist_ok=True)
    models = []
    for seed in args.seeds:
        m = VariantModel(seed=seed, hidden=HIDDEN)
        done = 0
        while done < args.steps:
            n = min(300, args.steps - done)
            loss = m.train_steps(x, labels, n)
            done += n
            print(f"model seed {seed}: step {done}/{args.steps} "
                  f"loss {loss:.4f}")
        path = os.path.join(args.out, f"model-{seed:03d}.pkl")
        m.save(path)
        models.append(m)
        print(f"saved {path} ({os.path.getsize(path) // 1024} KiB)")

    # ---- held-out evaluation (new genome, variants, reads) --------------
    rng, ref, h1, h2, truth = make_world(99, glen=40_000, n_het=40,
                                         n_hom=40)
    reads = simulate_reads(rng, h1, h2, COVERAGE * len(ref) // READ_LEN)
    al, cands, _ = map_and_tensors(ref, reads, min_af=0.125, min_depth=4)
    calls = call_variants(al, reads, 0, ref, models, min_af=0.125,
                          min_depth=4)
    called = {c.position: c for c in calls}
    tp = sum(1 for p, (alt, kind) in truth.items()
             if p in called and called[p].alt == "ACGT"[alt])
    # wrong-alt calls at true positions count as FP (not silently dropped)
    fp = sum(1 for p, c in called.items()
             if p not in truth or c.alt != "ACGT"[truth[p][0]])
    fn = len(truth) - tp
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    gt_ok = sum(1 for p, (alt, kind) in truth.items()
                if p in called and called[p].genotype
                == ("0/1" if kind == "het" else "1/1"))
    print(f"held-out: TP {tp} FP {fp} FN {fn} -> precision "
          f"{precision:.3f} recall {recall:.3f} F1 {f1:.3f}; "
          f"genotype accuracy {gt_ok}/{tp}")
    manifest = {
        "models": [f"model-{s:03d}.pkl" for s in args.seeds],
        "hidden": HIDDEN,
        "train": {"worlds": [11, 12], "coverage": COVERAGE, "err": ERR,
                  "steps": args.steps, "n_tensors": int(len(x))},
        "heldout_eval": {"world": 99, "tp": tp, "fp": fp, "fn": fn,
                         "precision": round(precision, 4),
                         "recall": round(recall, 4), "f1": round(f1, 4),
                         "genotype_acc": round(gt_ok / max(tp, 1), 4)},
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"manifest written to {args.out}/manifest.json")
    return 0 if f1 >= 0.9 else 1


if __name__ == "__main__":
    sys.exit(main())
