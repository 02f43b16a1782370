"""Per-position ensemble merge across models.

Reimplements the reference's ensemble.cpp (reference:
bin/Clair-ensemble/.../clair/ensemble.cpp:51-123): probability rows keyed by
(sequence, position) are summed across models and emitted as the mean when
the position was called by at least `min_votes` models.
"""

from __future__ import annotations

import numpy as np


def ensemble_merge(
    per_model: list[dict[tuple, dict[str, np.ndarray]]],
    *,
    min_votes: int | None = None,
) -> dict[tuple, dict[str, np.ndarray]]:
    """per_model: one dict per model mapping (seq_id, pos) -> task probs."""
    n_models = len(per_model)
    if min_votes is None:
        min_votes = n_models // 2 + 1
    sums: dict[tuple, dict[str, np.ndarray]] = {}
    counts: dict[tuple, int] = {}
    for model_out in per_model:
        for key, probs in model_out.items():
            if key not in sums:
                sums[key] = {k: v.copy() for k, v in probs.items()}
                counts[key] = 1
            else:
                for k, v in probs.items():
                    sums[key][k] += v
                counts[key] += 1
    return {
        key: {k: v / counts[key] for k, v in s.items()}
        for key, s in sums.items() if counts[key] >= min_votes
    }
