"""Gather-free trial-move energies via batched MXU matmuls.

The hot object is r^2 between A movers and ALL extended positions:

    r2[m, j] = |r_m|^2 - 2 r_m . p_j + |p_j|^2
             = [x_m, y_m, z_m, 1] @ [-2 p_j ; |p_j|^2]  + |r_m|^2

one (A, 4) @ (4, Next) matmul per side, with the LJ evaluation and the
row-sum fused into the epilogue — zero gathers, MXU + VPU only (the only
fast units on this stack; docs/tpu_notes.md). Ghost images make the
unwrapped distances exact (ops/ghosts.py). LJ-specific for now; EAM keeps
the gather-based incremental path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU MXU f32 matmuls default to ONE bf16 pass; with |p|^2 ~ O(100) that
# injects O(1) absolute error into r^2 = |r|^2 - 2 r.p + |p|^2 and destroys
# the physics (caught by end-to-end verification: pe/N +9 instead of -6.9).
# HIGHEST forces the 6-pass f32-equivalent MXU mode; the matmul is a small
# fraction of the substep so the cost is negligible.
_PREC = jax.lax.Precision.HIGHEST


def _q_matrix(pos_ext):
    """(4, Next): rows [-2x; -2y; -2z; |p|^2]."""
    p2 = jnp.sum(pos_ext * pos_ext, axis=-1)
    return jnp.concatenate([-2.0 * pos_ext.T, p2[None, :]], axis=0)


def _lj_rowsum(pot, r2, interact, with_virial=True):
    sr2 = (pot.sigma * pot.sigma) / jnp.maximum(r2, 1e-4)
    sr6 = sr2 * sr2 * sr2
    sr12 = sr6 * sr6
    valid = interact & (r2 < pot.rc * pot.rc)
    e = jnp.where(valid, 4.0 * pot.eps * (sr12 - sr6), 0.0)
    if not with_virial:
        return jnp.sum(e, axis=-1), None
    w = jnp.where(valid, 24.0 * pot.eps * (2.0 * sr12 - sr6), 0.0)
    return jnp.sum(e, axis=-1), jnp.sum(w, axis=-1)


def delta_moves_dense(pot, gm, ids, old_r, new_r, with_virial=False):
    """(dE, dW) for A movers against the full extended position set.

    ids (A,) real indices; old_r/new_r (A, 3) unwrapped coordinates.
    Exact when movers are pairwise >= rc + 2*dpos apart (checkerboard).
    By default dW is 0 (the ensemble refreshes the virial from a full
    recompute at every record point; skipping w trims the VPU epilogue,
    the bottleneck on this stack).
    """
    q = _q_matrix(gm.pos_ext)                      # (4, Next)
    not_self = gm.parent_ext[None, :] != ids[:, None]  # (A, Next)

    def side(r):
        a = jnp.concatenate([r, jnp.ones_like(r[:, :1])], axis=1)  # (A,4)
        r2 = (jnp.dot(a, q, precision=_PREC)
              + jnp.sum(r * r, axis=1)[:, None])                   # (A,Next)
        return _lj_rowsum(pot, r2, not_self, with_virial=with_virial)

    e_old, w_old = side(old_r)
    e_new, w_new = side(new_r)
    if not with_virial:
        return e_new - e_old, jnp.zeros_like(e_new)
    return e_new - e_old, w_new - w_old


def total_energy_virial_dense(pot, gm, natoms: int, row_block: int = 512):
    """Total pe/virial over real atoms vs the extended set, blocked rows.

    Each (real, real) pair appears twice, each (real, ghost) pair once from
    the real side; with E = 0.5 * sum over real rows of row-energies where
    ghost partners are double-... — careful: pair (i, ghost-of-j) has a
    mirror (j, ghost-of-i), so EVERY interacting pair appears exactly twice
    across real rows. Hence the global 0.5 factor is exact.
    """
    n = natoms
    q = _q_matrix(gm.pos_ext)
    nblocks = -(-n // row_block)
    npad = nblocks * row_block
    pos = gm.pos_ext[:n]
    if npad != n:
        # pad rows so dynamic_slice never clamps; padded rows are masked
        pos = jnp.concatenate(
            [pos, jnp.full((npad - n, 3), 1e30, pos.dtype)], axis=0)

    def block_fn(start):
        r = jax.lax.dynamic_slice(pos, (start, 0), (row_block, 3))
        bid = start + jnp.arange(row_block, dtype=jnp.int32)
        a = jnp.concatenate([r, jnp.ones_like(r[:, :1])], axis=1)
        r2 = (jnp.dot(a, q, precision=_PREC)
              + jnp.sum(r * r, axis=1)[:, None])
        not_self = gm.parent_ext[None, :] != bid[:, None]
        # padded rows (start+k >= n) read clamped data; mask them out
        in_range = (bid < n)[:, None]
        e, w = _lj_rowsum(pot, r2, not_self & in_range)
        return jnp.sum(e), jnp.sum(w)

    starts = jnp.arange(nblocks) * row_block
    # dynamic_slice clamps at the end; guard via in_range mask above
    e_b, w_b = jax.lax.map(block_fn, starts)
    return 0.5 * jnp.sum(e_b), 0.5 * jnp.sum(w_b)
