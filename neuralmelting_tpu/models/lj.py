"""Lennard-Jones 12-6 pair potential, truncated at rc.

TPU-native equivalent of the reference's LAMMPS ``pair_style lj/cut <rc>``
(SURVEY.md §2.1). Energy is truncated and *unshifted* (LAMMPS lj/cut
default): e(r) = 4*eps*((sigma/r)^12 - (sigma/r)^6) for r < rc, else 0.

All math is in terms of r^2 so the hot path never takes a sqrt.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LJCut:
    eps: jnp.ndarray
    sigma: jnp.ndarray
    rc: jnp.ndarray
    # static host-side copy of rc: host math must NEVER read back the
    # device scalar (docs/tpu_notes.md §0)
    rc_host: float = struct.field(pytree_node=False, default=2.5)

    @property
    def kind(self) -> str:
        return "pair"

    @classmethod
    def create(cls, eps: float = 1.0, sigma: float = 1.0, rc: float = 2.5,
               dtype=jnp.float32) -> "LJCut":
        return cls(
            eps=jnp.asarray(eps, dtype),
            sigma=jnp.asarray(sigma, dtype),
            rc=jnp.asarray(rc, dtype),
            rc_host=float(rc),
        )

    def pair_e_w(self, r2):
        """Pair energy and virial w = r*f = 24*eps*(2*sr12 - sr6).

        Caller masks r2 >= rc^2; inputs must be > 0 (mask with a dummy 1.0).
        """
        sr2 = (self.sigma * self.sigma) / r2
        sr6 = sr2 * sr2 * sr2
        sr12 = sr6 * sr6
        e = 4.0 * self.eps * (sr12 - sr6)
        w = 24.0 * self.eps * (2.0 * sr12 - sr6)
        return e, w
