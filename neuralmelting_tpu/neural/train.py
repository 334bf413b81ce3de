"""Classifier training with the reference's extreme-temperature labeling.

Scheme (SURVEY.md §2.5, [HIGH]): samples from the lowest-temperature band of
each pressure are labeled solid (0), the highest-temperature band liquid (1);
the classifier trains on those bands only and then predicts P(liquid) for
every sample in the grid. Training is a jitted optax adam loop; everything
stays on device.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class TrainResult:
    params: dict
    losses: jnp.ndarray      # (epochs,)
    probs: jnp.ndarray       # P(liquid) for ALL samples, shape of labels_in


def extreme_t_labels(ntemp: int, band: int):
    """Per-pressure label template: first `band` slots 0, last `band` 1.

    Returns (train_mask (ntemp,), labels (ntemp,)) to be tiled over pressures.
    """
    idx = jnp.arange(ntemp)
    train_mask = (idx < band) | (idx >= ntemp - band)
    labels = (idx >= ntemp - band).astype(jnp.float32)
    return train_mask, labels


def train_classifier(model, features, train_mask, labels, key,
                     epochs: int = 300, lr: float = 1e-3,
                     weight_decay: float = 1e-4) -> TrainResult:
    """Train on masked samples, predict on all.

    features: (nsamples, nbins); train_mask: (nsamples,) bool;
    labels: (nsamples,) float 0/1 (only masked entries used).
    """
    params = model.init(key, features[:1])
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)
    w = train_mask.astype(jnp.float32)
    wsum = jnp.maximum(w.sum(), 1.0)

    def loss_fn(p):
        logits = model.apply(p, features)
        per = optax.sigmoid_binary_cross_entropy(logits, labels)
        return jnp.sum(per * w) / wsum

    @jax.jit
    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), None, length=epochs)
    probs = jax.nn.sigmoid(model.apply(params, features))
    return TrainResult(params=params, losses=losses, probs=probs)
