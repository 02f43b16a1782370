"""Shipped default variant-model ensemble.

The reference ships pretrained Clair checkpoints
(bin/Clair-ensemble/model/model-0000xx) that runClair-ensemble.sh loads via
--chkpnt_fn; the amplicon pipeline works out of the box. The analogous
artifacts here live in megapath_nano_tpu/variant/models/ (trained by
tools/train_default_variant_models.py on simulated ONT reads; held-out
precision/recall/F1 recorded in manifest.json).
"""

from __future__ import annotations

import json
import os

_MODEL_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "models")


def default_model_dir() -> str:
    return _MODEL_DIR


def manifest() -> dict | None:
    path = os.path.join(_MODEL_DIR, "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def default_ensemble():
    """Load the shipped models (>= 3, majority-vote ensemble like
    runClair-ensemble.sh:132-168). Returns [] when no artifacts are
    shipped (callers fall back to the AF-threshold caller)."""
    from megapath_nano_tpu.variant.model import VariantModel

    man = manifest()
    if man is None:
        return []
    models = []
    for name in man["models"]:
        path = os.path.join(_MODEL_DIR, name)
        if not os.path.exists(path):
            continue
        m = VariantModel(hidden=man.get("hidden", 128))
        m.load(path)
        models.append(m)
    return models
