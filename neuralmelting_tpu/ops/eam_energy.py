"""EAM energies over neighbor lists (SURVEY.md §7 Phase 4).

Incremental-move scheme: the ensemble state carries a per-atom density
cache rho (N,). Moving atom i changes
    dE = sum_j [phi(r'_ij) - phi(r_ij)]            (pair part)
        + F(rho'_i) - F(rho_i)                      (own embedding)
        + sum_j [F(rho_j + drho_j) - F(rho_j)],     (neighbors' embedding)
with drho_j = rho(r'_ij) - rho(r_ij). Exactness for batched checkerboard
movers requires movers >= 2*rc apart (EAM's effective interaction range;
models/eam.py docstring) so their neighbor sets are disjoint.

The incremental virial for EAM would need O(K^2) terms per move (F'_j
changes couple j to its own neighbors), so moves carry dW = 0 and the
pressure is refreshed from the full recompute done at every record point
(parallel/ensemble.py block_core) — documented deviation, thermo rows are
exact at record time.
"""

from __future__ import annotations

import jax.numpy as jnp

from neuralmelting_tpu.models.eam import spline_eval
from neuralmelting_tpu.ops.neighbors import _mi


def _row_r(pos, box, idx, count, ri_x, ri_y, ri_z, rc):
    """Distances r (..., K) + validity over neighbor rows."""
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    gx = px.at[idx].get(mode="promise_in_bounds")
    gy = py.at[idx].get(mode="promise_in_bounds")
    gz = pz.at[idx].get(mode="promise_in_bounds")
    dx = _mi(ri_x[..., None] - gx, box[0])
    dy = _mi(ri_y[..., None] - gy, box[1])
    dz = _mi(ri_z[..., None] - gz, box[2])
    r2 = dx * dx + dy * dy + dz * dz
    k = idx.shape[-1]
    slot = jnp.arange(k, dtype=jnp.int32)
    valid = (slot < count[..., None]) & (r2 < rc * rc)
    r = jnp.sqrt(jnp.where(valid, r2, 1.0))
    return r, valid


def rho_sums(eam, pos, box, nl):
    """Per-atom densities rho_i (N,)."""
    r, valid = _row_r(pos, box, nl.idx, nl.count,
                      pos[:, 0], pos[:, 1], pos[:, 2], eam.rc)
    rho_val, _ = spline_eval(eam.rho_coef, eam.dr, r)
    return jnp.sum(jnp.where(valid, rho_val, 0.0), axis=-1)


def total_energy_virial(eam, pos, box, nl):
    """Self-contained (pe, virial): recomputes densities internally."""
    r, valid = _row_r(pos, box, nl.idx, nl.count,
                      pos[:, 0], pos[:, 1], pos[:, 2], eam.rc)
    rho_val, rho_der = spline_eval(eam.rho_coef, eam.dr, r)
    rphi, rphi_der = spline_eval(eam.rphi_coef, eam.dr, r)
    phi = jnp.where(valid, rphi / r, 0.0)
    rho_i = jnp.sum(jnp.where(valid, rho_val, 0.0), axis=-1)
    f_i, fp_i = spline_eval(eam.f_coef, eam.drho, rho_i)
    pe = jnp.sum(f_i) + 0.5 * jnp.sum(phi)
    # virial: w_ij = -r * [phi'(r) + (F'_i + F'_j) rho'(r)]
    phi_der = jnp.where(valid, (rphi_der - phi) / r, 0.0)
    fp_j = fp_i.at[nl.idx].get(mode="promise_in_bounds")
    w = -r * (phi_der + jnp.where(valid, (fp_i[:, None] + fp_j) * rho_der,
                                  0.0))
    vir = 0.5 * jnp.sum(jnp.where(valid, w, 0.0))
    return pe, vir


def forces(eam, pos, box, nl):
    """(N, 3) forces; densities recomputed internally."""
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    idx = nl.idx
    gx = px.at[idx].get(mode="promise_in_bounds")
    gy = py.at[idx].get(mode="promise_in_bounds")
    gz = pz.at[idx].get(mode="promise_in_bounds")
    dx = _mi(px[:, None] - gx, box[0])
    dy = _mi(py[:, None] - gy, box[1])
    dz = _mi(pz[:, None] - gz, box[2])
    r2 = dx * dx + dy * dy + dz * dz
    k = idx.shape[-1]
    slot = jnp.arange(k, dtype=jnp.int32)
    valid = (slot < nl.count[..., None]) & (r2 < eam.rc * eam.rc)
    r = jnp.sqrt(jnp.where(valid, r2, 1.0))
    rho_val, rho_der = spline_eval(eam.rho_coef, eam.dr, r)
    rphi, rphi_der = spline_eval(eam.rphi_coef, eam.dr, r)
    phi = jnp.where(valid, rphi / r, 0.0)
    rho_i = jnp.sum(jnp.where(valid, rho_val, 0.0), axis=-1)
    _, fp_i = spline_eval(eam.f_coef, eam.drho, rho_i)
    fp_j = fp_i.at[idx].get(mode="promise_in_bounds")
    phi_der = jnp.where(valid, (rphi_der - phi) / r, 0.0)
    # f_i = sum_j [phi' + (F'_i + F'_j) rho'] * (-r_hat) ... with d = r_i - r_j
    coef = jnp.where(valid,
                     -(phi_der + (fp_i[:, None] + fp_j) * rho_der) / r, 0.0)
    fx = jnp.sum(coef * dx, axis=-1)
    fy = jnp.sum(coef * dy, axis=-1)
    fz = jnp.sum(coef * dz, axis=-1)
    return jnp.stack([fx, fy, fz], axis=-1)


def delta_moves(eam, pos, box, nl, rho, ids, new_r):
    """Batched incremental (dE, dW=0, payload) for movers >= 2*rc apart.

    payload = (drho_rows (M,K), rho_i_new (M,), rows (M,K), row_valid (M,K))
    for apply_accept.
    """
    rows = nl.idx.at[ids].get(mode="promise_in_bounds")    # (M, K)
    cnt = nl.count.at[ids].get(mode="promise_in_bounds")
    old = pos.at[ids].get(mode="promise_in_bounds")

    def side(rx, ry, rz):
        r, valid = _row_r(pos, box, rows, cnt, rx, ry, rz, eam.rc)
        rho_val, _ = spline_eval(eam.rho_coef, eam.dr, r)
        rphi, _ = spline_eval(eam.rphi_coef, eam.dr, r)
        phi = jnp.where(valid, rphi / r, 0.0)
        rho_c = jnp.where(valid, rho_val, 0.0)
        return phi, rho_c

    phi_o, rho_o = side(old[:, 0], old[:, 1], old[:, 2])
    phi_n, rho_n = side(new_r[:, 0], new_r[:, 1], new_r[:, 2])

    de_pair = jnp.sum(phi_n - phi_o, axis=-1)
    drho_rows = rho_n - rho_o                               # (M, K)
    rho_i_old = rho.at[ids].get(mode="promise_in_bounds")
    rho_i_new = jnp.sum(rho_n, axis=-1)
    f_new, _ = spline_eval(eam.f_coef, eam.drho, rho_i_new)
    f_old, _ = spline_eval(eam.f_coef, eam.drho, rho_i_old)

    rho_j = rho.at[rows].get(mode="promise_in_bounds")      # (M, K)
    fj_new, _ = spline_eval(eam.f_coef, eam.drho, rho_j + drho_rows)
    fj_old, _ = spline_eval(eam.f_coef, eam.drho, rho_j)
    k = rows.shape[-1]
    in_row = jnp.arange(k, dtype=jnp.int32) < cnt[:, None]
    de_emb_j = jnp.sum(jnp.where(in_row, fj_new - fj_old, 0.0), axis=-1)

    de = de_pair + (f_new - f_old) + de_emb_j
    dw = jnp.zeros_like(de)  # virial refreshed at record points
    payload = (drho_rows, rho_i_new, rows, in_row)
    return de, dw, payload


def apply_accept(rho, ids, acc, payload):
    """Update the density cache for accepted movers (movers >= 2rc apart)."""
    drho_rows, rho_i_new, rows, in_row = payload
    upd = jnp.where(in_row & acc[:, None], drho_rows, 0.0)
    rho = rho.at[rows.reshape(-1)].add(upd.reshape(-1),
                                       mode="promise_in_bounds")
    old_i = rho.at[ids].get(mode="promise_in_bounds")
    rho = rho.at[ids].set(jnp.where(acc, rho_i_new, old_i),
                          mode="promise_in_bounds")
    return rho
