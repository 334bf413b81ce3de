"""Feature scalers (reference: sklearn minmax/standard/robust + TanhScaler.py).

All sklearn-style (fit / transform / fit_transform) but computed with jnp so
they run on device inside the fused featurize->classify pipeline
(SURVEY.md §2 rows 7-8). The tanh scaler reproduces the reference's custom
TanhScaler: 0.5 * (tanh(k * (x - mu) / sigma) + 1).
"""

from __future__ import annotations

import jax.numpy as jnp


class _Scaler:
    def fit_transform(self, x):
        self.fit(x)
        return self.transform(x)


class MinMaxScaler(_Scaler):
    def fit(self, x):
        self.lo = jnp.min(x, axis=0)
        self.hi = jnp.max(x, axis=0)
        return self

    def transform(self, x):
        return (x - self.lo) / jnp.maximum(self.hi - self.lo, 1e-12)


class StandardScaler(_Scaler):
    def fit(self, x):
        self.mu = jnp.mean(x, axis=0)
        self.sigma = jnp.maximum(jnp.std(x, axis=0), 1e-12)
        return self

    def transform(self, x):
        return (x - self.mu) / self.sigma


class RobustScaler(_Scaler):
    def fit(self, x):
        q25, q50, q75 = jnp.percentile(x, jnp.array([25.0, 50.0, 75.0]),
                                       axis=0)
        self.med = q50
        self.iqr = jnp.maximum(q75 - q25, 1e-12)
        return self

    def transform(self, x):
        return (x - self.med) / self.iqr


class TanhScaler(_Scaler):
    """0.5*(tanh(k*(x-mu)/sigma)+1): bounded, outlier-insensitive."""

    def __init__(self, k: float = 0.01):
        self.k = k

    def fit(self, x):
        self.mu = jnp.mean(x, axis=0)
        self.sigma = jnp.maximum(jnp.std(x, axis=0), 1e-12)
        return self

    def transform(self, x):
        return 0.5 * (jnp.tanh(self.k * (x - self.mu) / self.sigma) + 1.0)


_SCALERS = {
    "minmax": MinMaxScaler,
    "standard": StandardScaler,
    "robust": RobustScaler,
    "tanh": TanhScaler,
}


def get_scaler(name: str):
    try:
        return _SCALERS[name]()
    except KeyError:
        raise ValueError(f"unknown scaler {name!r}; choose from {sorted(_SCALERS)}")
