"""Solid/liquid phase classifiers (reference: Keras 1D-CNN / MLP on g(r);
SURVEY.md §2 row 7) as flax.linen modules emitting a single logit."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class PhaseCNN(nn.Module):
    """1-D CNN over radial-distribution bins."""
    features: Sequence[int] = (32, 64)
    kernel: int = 5
    dense: int = 64

    @nn.compact
    def __call__(self, x):
        # x: (batch, nbins) -> (batch, nbins, 1)
        h = x[..., None]
        for f in self.features:
            h = nn.Conv(f, kernel_size=(self.kernel,), padding="SAME")(h)
            h = nn.relu(h)
            h = nn.max_pool(h, window_shape=(2,), strides=(2,))
        h = h.reshape((h.shape[0], -1))
        h = nn.relu(nn.Dense(self.dense)(h))
        return nn.Dense(1)(h)[..., 0]  # logit


class PhaseMLP(nn.Module):
    widths: Sequence[int] = (128, 64)

    @nn.compact
    def __call__(self, x):
        h = x
        for w in self.widths:
            h = nn.relu(nn.Dense(w)(h))
        return nn.Dense(1)(h)[..., 0]
