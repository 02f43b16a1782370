"""Train a variant-calling model from reads + reference + truth VCF.

The Clair training-path equivalent (reference: bin/Clair-ensemble/
Clair.beta.ensemble.cpu/clair/train.py — tensors from labeled positions,
FocalLoss/Adam). Labels derive from a truth VCF: candidate positions matching
a truth variant get its genotype class; the rest are hom-ref.

  python -m megapath_nano_tpu.cli.train_variant \
      --query reads.fastq --ref_db refdb/ --truth_vcf truth.vcf \
      --out model.pkl [--steps 2000] [--hidden 128]
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_vcf(path: str) -> dict[tuple[str, int], tuple[str, str]]:
    """{(chrom, pos0): (alt, genotype)} from a VCF."""
    out = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            cols = line.split("\t")
            chrom, pos, _, ref, alt = cols[:5]
            gt = "1/1"
            if len(cols) >= 10 and ":" in cols[8]:
                pass
            if len(cols) >= 10:
                gt = cols[9].split(":")[0].replace("|", "/")
            out[(chrom, int(pos) - 1)] = (alt.split(",")[0], gt)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mpn-tpu-train-variant")
    p.add_argument("--query", required=True)
    p.add_argument("--ref_db", required=True)
    p.add_argument("--truth_vcf", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--min_af", type=float, default=0.08)
    p.add_argument("--min_depth", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backend", choices=["pallas", "jnp"], default=None)
    args = p.parse_args(argv)

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import numpy as np

    from megapath_nano_tpu.align.pipeline import AlignParams
    from megapath_nano_tpu.db.refdb import RefDB
    from megapath_nano_tpu.io.fastq import read_fastq
    from megapath_nano_tpu.taxon.profiler import (ProfileOptions,
                                                  TaxonProfiler)
    from megapath_nano_tpu.utils.log import Log
    from megapath_nano_tpu.variant.candidates import (candidate_tensor,
                                                      extract_candidates)
    from megapath_nano_tpu.variant.model import (VariantModel,
                                                 gt21_label_for_snv)

    log = Log("mpn-tpu-train")
    if args.backend is None:
        import jax
        try:
            args.backend = ("pallas" if jax.default_backend() == "tpu"
                            else "jnp")
        except RuntimeError:
            args.backend = "jnp"

    db = RefDB.load(args.ref_db)
    truth = parse_vcf(args.truth_vcf)
    batch = read_fastq(args.query, min_quality=7.0)
    reads = [batch.read(i) for i in range(batch.num_reads)]
    log.message(f"{len(reads)} reads, {len(truth)} truth variants")

    prof = TaxonProfiler(db, ProfileOptions(
        align=AlignParams(backend=args.backend)), log=log)
    res = prof.profile(reads, batch.ids)

    xs, labels_gt, labels_zyg = [], [], []
    base_code = {"A": 0, "C": 1, "G": 2, "T": 3}
    idx = db.index
    for sid, chrom in enumerate(idx.seq_names):
        s0, s1 = int(idx.seq_offsets[sid]), int(idx.seq_offsets[sid + 1])
        ref_seq = idx.seq_data[s0:s1]
        cands = extract_candidates(res.best, reads, sid, ref_seq,
                                   min_af=args.min_af,
                                   min_depth=args.min_depth)
        for c in cands:
            xs.append(candidate_tensor(c, ref_seq))
            tv = truth.get((chrom, c.position))
            if tv is None:
                labels_zyg.append(0)
                labels_gt.append(
                    gt21_label_for_snv(c.ref_base, c.ref_base, False))
            else:
                alt, gt = tv
                alt_code = base_code.get(alt[0].upper(), c.ref_base)
                het = gt in ("0/1", "1/0")
                labels_zyg.append(1 if het else 2)
                labels_gt.append(
                    gt21_label_for_snv(c.ref_base, alt_code, het))
    if not xs:
        print("no training candidates found", file=sys.stderr)
        return 1
    x = np.stack(xs).astype(np.float32)
    labels = {
        "gt21": np.asarray(labels_gt, np.int64),
        "zygosity": np.asarray(labels_zyg, np.int64),
        "var_len_1": np.zeros(len(xs), np.int64),
        "var_len_2": np.zeros(len(xs), np.int64),
    }
    n_var = int((labels["zygosity"] > 0).sum())
    log.message(f"{len(xs)} training tensors ({n_var} variant-labeled)")

    model = VariantModel(seed=args.seed, hidden=args.hidden,
                         learning_rate=args.learning_rate)
    with log.step("train"):
        chunk = 200
        done = 0
        while done < args.steps:
            n = min(chunk, args.steps - done)
            loss = model.train_steps(x, labels, n)
            done += n
            log.message(f"step {done}/{args.steps} loss {loss:.4f}")
    model.save(args.out)
    probs = model.predict(x)
    acc = float((np.argmax(probs["zygosity"], axis=1)
                 == labels["zygosity"]).mean())
    log.message(f"final training zygosity accuracy: {acc:.3f}")
    print(f"model saved to {args.out} (train zyg acc {acc:.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
