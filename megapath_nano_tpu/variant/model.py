"""Clair-style neural variant caller in flax.

Architecture mirrors the reference's Clair model family (reference:
bin/Clair-ensemble/Clair.beta.ensemble.cpu/clair/model.py:24,226,266 —
per-position ("slice") dense layers feeding a bidirectional LSTM, multi-task
heads; FocalLoss + Adam, shared/param.py) rebuilt TPU-natively: flax linen
modules, lax-scanned LSTM (static shapes, MXU matmuls in bf16-friendly
sizes), optax Adam, jit-compiled train/predict steps.

Task heads (Clair's task decomposition, clair/task/):
  gt21      — 21-way genotype-pair class (AA, AC, ..., plus ins/del classes)
  zygosity  — hom-ref / het / hom-alt
  var_len   — two length heads for indel calls (0..4 classes each)
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from megapath_nano_tpu.variant.candidates import CHANNELS, POSITIONS, ROWS

GT21_CLASSES = 21
ZYGOSITY_CLASSES = 3
VARLEN_CLASSES = 5


class ClairNet(nn.Module):
    """slice-dense -> BiLSTM -> shared dense -> 4 heads."""

    hidden: int = 128
    slice_dim: int = 64

    @nn.compact
    def __call__(self, x):                    # (B, 33, 8, 4)
        b = x.shape[0]
        h = x.reshape(b, POSITIONS, ROWS * CHANNELS)
        h = nn.Dense(self.slice_dim)(h)       # per-position dense
        h = nn.relu(h)
        fwd = nn.RNN(nn.LSTMCell(self.hidden))(h)
        bwd = nn.RNN(nn.LSTMCell(self.hidden), reverse=True,
                     keep_order=True)(h)
        h = jnp.concatenate([fwd, bwd], axis=-1)   # (B, 33, 2H)
        center = h[:, POSITIONS // 2]
        pooled = jnp.max(h, axis=1)
        h = jnp.concatenate([center, pooled], axis=-1)
        h = nn.relu(nn.Dense(256)(h))
        h = nn.relu(nn.Dense(128)(h))
        return {
            "gt21": nn.Dense(GT21_CLASSES)(h),
            "zygosity": nn.Dense(ZYGOSITY_CLASSES)(h),
            "var_len_1": nn.Dense(VARLEN_CLASSES)(h),
            "var_len_2": nn.Dense(VARLEN_CLASSES)(h),
        }


def focal_loss(logits, labels, gamma: float = 2.0):
    """Focal loss as in Clair (clair/model.py FocalLoss)."""
    logp = jax.nn.log_softmax(logits)
    p = jnp.exp(logp)
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    return -jnp.sum(onehot * ((1 - p) ** gamma) * logp, axis=-1)


def multitask_loss(outputs, labels):
    loss = 0.0
    for task in ("gt21", "zygosity", "var_len_1", "var_len_2"):
        loss = loss + jnp.mean(focal_loss(outputs[task], labels[task]))
    return loss


class VariantModel:
    """Train/predict wrapper with jitted steps."""

    def __init__(self, seed: int = 0, hidden: int = 128,
                 learning_rate: float = 1e-3):
        self.net = ClairNet(hidden=hidden)
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, POSITIONS, ROWS, CHANNELS), jnp.float32)
        self.params = self.net.init(rng, dummy)
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(self.params)

        @jax.jit
        def _train_step(params, opt_state, batch, labels):
            def loss_fn(p):
                out = self.net.apply(p, batch)
                return multitask_loss(out, labels)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def _predict(params, batch):
            out = self.net.apply(params, batch)
            return {k: jax.nn.softmax(v, axis=-1) for k, v in out.items()}

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def _train_epochs(params, opt_state, batch, labels, n_steps):
            def body(_, carry):
                params, opt_state, _ = carry
                return _train_step(params, opt_state, batch, labels)

            return jax.lax.fori_loop(0, n_steps, body,
                                     (params, opt_state, jnp.float32(0)))

        self._train_step = _train_step
        self._train_epochs = _train_epochs
        self._predict = _predict

    def train_step(self, batch: np.ndarray, labels: dict) -> float:
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, jnp.asarray(batch),
            {k: jnp.asarray(v) for k, v in labels.items()})
        return float(loss)

    def train_steps(self, batch: np.ndarray, labels: dict,
                    n_steps: int) -> float:
        """Run n_steps full-batch updates in ONE device dispatch (avoids
        per-step host round-trips — essential over a remote-TPU tunnel)."""
        self.params, self.opt_state, loss = self._train_epochs(
            self.params, self.opt_state, jnp.asarray(batch),
            {k: jnp.asarray(v) for k, v in labels.items()}, n_steps)
        return float(loss)

    def predict(self, batch: np.ndarray) -> dict:
        probs = self._predict(self.params, jnp.asarray(batch))
        return {k: np.asarray(v) for k, v in probs.items()}

    def save(self, path: str) -> None:
        import pickle

        with open(path, "wb") as f:
            pickle.dump({"hidden": self.net.hidden,
                         "slice_dim": self.net.slice_dim,
                         "params": jax.device_get(self.params)}, f)

    def load(self, path: str) -> None:
        import pickle

        with open(path, "rb") as f:
            blob = pickle.load(f)
        if isinstance(blob, dict) and "params" in blob:
            if blob["hidden"] != self.net.hidden \
                    or blob.get("slice_dim", 64) != self.net.slice_dim:
                # rebuild jitted closures for the stored architecture
                self.__init__(hidden=blob["hidden"])
            self.params = blob["params"]
        else:
            self.params = blob


# gt21 class construction: 10 SNP genotype pairs + indel classes, matching
# Clair's class inventory (clair/task/gt21.py)
GT21_LABELS = [
    "AA", "AC", "AG", "AT", "CC", "CG", "CT", "GG", "GT", "TT",
    "DelDel", "InsIns", "InsDel",
    "ADel", "CDel", "GDel", "TDel",
    "AIns", "CIns", "GIns", "TIns",
]


def gt21_label_for_snv(ref_base: int, alt_base: int, het: bool) -> int:
    """gt21 class index for a SNV (ref/alt numeric bases)."""
    a, b = (ref_base, alt_base) if het else (alt_base, alt_base)
    a, b = min(a, b), max(a, b)
    pair = "ACGT"[a] + "ACGT"[b]
    return GT21_LABELS.index(pair)
