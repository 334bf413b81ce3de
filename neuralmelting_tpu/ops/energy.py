"""Total and incremental pair energies (pure JAX, brute-force O(N^2)).

These replace the reference's per-move LAMMPS round trip
(``scatter_atoms -> run 0 -> extract pe/virial``; SURVEY.md §3.1) with
on-device evaluation. The brute-force forms here are the correctness
baseline for small N and for validating the neighbor-list / Pallas paths
(SURVEY.md §4.1); the production sampler uses the cell-list variants in
``neuralmelting_tpu.ops.neighbors``.

Conventions:
  * positions are wrapped or unwrapped; minimum-image convention is applied
    to every displacement, which is exact for rc < min(box)/2.
  * ``virial`` is the scalar pair virial W = sum_{pairs} r*f; the pressure is
    P = (N*kb*T + W/3) / V.
"""

from __future__ import annotations

import jax.numpy as jnp


def min_image(disp, box):
    """Minimum-image displacement for an orthorhombic box (3,)."""
    return disp - box * jnp.round(disp / box)


def pair_energy_virial(pot, pos, box):
    """Total pair energy and virial, brute-force over all pairs.

    Args:
      pot: PairPotential pytree.
      pos: (N, 3) positions.
      box: (3,) box edges.
    Returns:
      (pe, virial) scalars.
    """
    n = pos.shape[0]
    disp = min_image(pos[None, :, :] - pos[:, None, :], box)
    r2 = jnp.sum(disp * disp, axis=-1)
    mask = (r2 < pot.rc * pot.rc) & ~jnp.eye(n, dtype=bool)
    e, w = pot.pair_e_w(jnp.where(mask, r2, 1.0))
    pe = 0.5 * jnp.sum(jnp.where(mask, e, 0.0))
    vir = 0.5 * jnp.sum(jnp.where(mask, w, 0.0))
    return pe, vir


def forces(pot, pos, box):
    """Brute-force pair forces, (N, 3). f_i = sum_j (w(r)/r^2) * (r_i - r_j)."""
    n = pos.shape[0]
    disp = min_image(pos[:, None, :] - pos[None, :, :], box)  # r_i - r_j
    r2 = jnp.sum(disp * disp, axis=-1)
    mask = (r2 < pot.rc * pot.rc) & ~jnp.eye(n, dtype=bool)
    r2s = jnp.where(mask, r2, 1.0)
    _, w = pot.pair_e_w(r2s)
    coef = jnp.where(mask, w / r2s, 0.0)
    return jnp.sum(coef[:, :, None] * disp, axis=1)


def delta_move_brute(pot, pos, box, i, new_ri):
    """(dE, dW) for moving particle ``i`` to ``new_ri``, brute force.

    Evaluates only the 2N pair terms that involve particle i — the on-device
    analogue of an incremental energy, O(N) instead of O(N^2).
    """
    n = pos.shape[0]
    rc2 = pot.rc * pot.rc
    idx = jnp.arange(n)
    notself = idx != i

    def side(ri):
        disp = min_image(pos - ri, box)
        r2 = jnp.sum(disp * disp, axis=-1)
        mask = (r2 < rc2) & notself
        e, w = pot.pair_e_w(jnp.where(mask, r2, 1.0))
        return (jnp.sum(jnp.where(mask, e, 0.0)),
                jnp.sum(jnp.where(mask, w, 0.0)))

    e_old, w_old = side(pos[i])
    e_new, w_new = side(new_ri)
    return e_new - e_old, w_new - w_old
