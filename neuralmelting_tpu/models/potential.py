"""Potential API.

The reference delegated all energetics to LAMMPS ``pair_style lj/cut`` and
``pair_style eam/alloy`` (SURVEY.md §2.1). Here a potential is a small pytree
(flax.struct dataclass) whose parameters are traced arrays, so one compiled
sampler serves any element parameterization without recompilation.

Two families:

* Pair potentials expose ``pair_e_w(r2) -> (e, w)`` giving per-pair energy and
  pair virial ``w = r * f(r) = -r * de/dr`` as a function of squared distance
  (no sqrt on the hot path). Cutoff masking is applied by the caller.
* Many-body potentials (EAM) additionally provide their own total-energy and
  incremental-move routines; see ``neuralmelting_tpu.models.eam``.
"""

from __future__ import annotations

from typing import Protocol, Tuple

import jax.numpy as jnp


class PairPotential(Protocol):
    rc: jnp.ndarray  # cutoff radius

    def pair_e_w(self, r2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-pair energy and virial (r*f) from squared distance."""
        ...
