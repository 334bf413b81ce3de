"""EAM cell-MC kernels: Chebyshev fits and physics oracles.

Interpret mode on CPU (conftest). The brute reference evaluates the SAME
Chebyshev series over all O(N^2) min-image pairs, so the kernels must
match it to f32 roundoff — fit accuracy vs the spline tables is asserted
separately (the kernels sample the Chebyshev potential by design).
"""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralmelting_tpu.models import eam as E
from neuralmelting_tpu.models import eam_cheb as EC
from neuralmelting_tpu.models import eam_gen
from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.ops.pallas import cellmc as CM
from neuralmelting_tpu.ops.pallas import cellmc_eam as CE


@pytest.fixture(scope="module")
def cheb():
    path = os.path.join(tempfile.gettempdir(), "nm_synthetic_Al.eam.alloy")
    if not os.path.exists(path):
        eam_gen.write_setfl(path)
    # tol=1e-5 explicitly: this file's fit-accuracy test pins the
    # max-fidelity refit capability; the production default is 2e-4
    # (eam_cheb.from_spline docstring, tpu_notes.md section 7)
    return E.load(path), EC.from_spline(E.load(path), tol=1e-5)


def brute_cheb(ch, pos, box):
    """O(N^2) min-image EAM energy from the same Chebyshev series."""
    d = pos[:, None, :] - pos[None, :, :]
    d -= box * jnp.round(d / box)
    u = (d ** 2).sum(-1)
    n = pos.shape[0]
    mask = (u < ch.rc * ch.rc) & ~jnp.eye(n, dtype=bool)
    phi = jnp.where(mask, EC.cheb_eval(ch.c_phi, ch.u_lo, ch.u_hi, u), 0.0)
    fr = jnp.where(mask, EC.cheb_eval(ch.c_rho, ch.u_lo, ch.u_hi, u), 0.0)
    rho = fr.sum(-1)
    q = jnp.sqrt(jnp.clip(rho, 0.0, ch.rho_hi))
    femb = EC.cheb_eval(ch.c_f, ch.q_lo, jnp.sqrt(ch.rho_hi), q)
    return 0.5 * phi.sum() + femb.sum(), rho


def test_cheb_fit_accuracy(cheb):
    """The Chebyshev refit tracks the spline tables to ~1e-4 eV."""
    pot, ch = cheb
    e_phi, e_rho, e_f = ch.fit_err
    assert e_phi < 2e-4 and e_rho < 2e-5 and e_f < 2e-5
    # spot check F in rho space on the fit range
    rhox = np.linspace(0.02 * float(ch.rho_hi), float(ch.rho_hi), 400)
    q = jnp.sqrt(jnp.asarray(rhox))
    f_c = EC.cheb_eval(ch.c_f, ch.q_lo, jnp.sqrt(ch.rho_hi), q)
    f_s, _ = E.spline_eval(pot.f_coef, pot.drho, jnp.asarray(rhox))
    assert float(jnp.max(jnp.abs(f_c - f_s))) < 5e-5


def _setup(cheb, jitter=0.08, seed=3):
    pot, ch = cheb
    pos, box = make_supercell("fcc", 4.05, (5, 5, 5))
    n = pos.shape[0]
    # kcap=32 keeps interpret-mode cost down (mean occupancy ~18.5)
    geom = CM.make_geom(box, ch.rc_host, n, nsub=1, stride=3, kcap=32)
    key = jax.random.key(seed)
    pos = (jnp.asarray(pos) + jitter * jax.random.normal(key, pos.shape)) \
        % jnp.asarray(box)
    shift = jnp.asarray([0.3, 0.65, 0.11], jnp.float32)
    return ch, geom, pos, jnp.asarray(box, jnp.float32), shift


def _pack(ch):
    scal = jnp.stack([ch.rc * ch.rc, ch.u_lo, ch.u_hi, ch.q_lo,
                      jnp.sqrt(ch.rho_hi), ch.rho_hi,
                      0.0 * ch.rc, 0.0 * ch.rc])
    series = (ch.c_phi, ch.c_phid, ch.c_rho, ch.c_rhod, ch.c_f, ch.c_fd)
    nser = (ch.c_phi.shape[0], ch.c_rho.shape[0], ch.c_f.shape[0])
    return scal, series, nser


def _params(box, geom, temps, dpos=0.15):
    r = len(temps)
    kb = 8.617333e-5
    w = np.asarray(box) / np.asarray(geom.ncell)
    return jnp.stack([
        jnp.asarray(1.0 / (kb * np.asarray(temps, np.float32))),
        jnp.full((r,), dpos),
        jnp.full((r,), w[0]), jnp.full((r,), w[1]), jnp.full((r,), w[2]),
        jnp.full((r,), box[0]), jnp.full((r,), box[1]),
        jnp.full((r,), box[2])])


@pytest.mark.slow
def test_eam_total_energy_virial(cheb):
    ch, geom, pos, box, shift = _setup(cheb)
    x, y, z, ids, count, over = CM.bin_initial(geom, pos, box, shift)
    assert not bool(over)
    r = 2
    t = lambda s: jnp.transpose(jnp.broadcast_to(s[None], (r,) + s.shape))
    scal, series, nser = _pack(ch)
    params = _params(box, geom, [300.0, 1200.0])
    total = CE.make_eam_total_fn(geom, nser, with_virial=True,
                                 interpret=True, rt=r)
    total_e0 = CE.make_eam_total_fn(geom, nser, with_virial=False,
                                    interpret=True, rt=r)
    st, rho_slab = total((t(x), t(y), t(z)), params, scal, series,
                         jnp.ones((1, r), jnp.float32))
    eb, rho_b = brute_cheb(ch, pos, box)
    assert abs(float(st[0, 0] - eb)) / abs(float(eb)) < 1e-5
    ids_np, ok = np.asarray(ids), np.asarray(ids) >= 0
    err = np.abs(np.asarray(rho_slab[:, 0])[ok]
                 - np.asarray(rho_b)[ids_np[ok]])
    assert err.max() < 1e-3
    # scaled energy matches brute at scaled coordinates
    st2, _ = total_e0((t(x), t(y), t(z)), params, scal, series,
                      jnp.full((1, r), 0.995, jnp.float32))
    eb2, _ = brute_cheb(ch, pos * 0.995, box * 0.995)
    assert abs(float(st2[0, 0] - eb2)) / abs(float(eb2)) < 1e-5
    # virial == dE/d ln s (finite difference; E-only passes)
    h = 1e-3
    stp, _ = total_e0((t(x), t(y), t(z)), params, scal, series,
                     jnp.full((1, r), 1.0 + h, jnp.float32))
    stm, _ = total_e0((t(x), t(y), t(z)), params, scal, series,
                     jnp.full((1, r), 1.0 - h, jnp.float32))
    w_fd = float((stp[0, 0] - stm[0, 0]) / (2 * h))
    # repo convention: W = sum r*f = -dE/dlns (ops/eam_energy.py:62)
    assert abs(float(st[1, 0]) + w_fd) / max(1.0, abs(w_fd)) < 1e-3


@pytest.mark.slow
def test_eam_sweep_pe_and_rho_tracking(cheb):
    """Incremental dE and the density cache match brute recomputation."""
    ch, geom, pos, box, shift = _setup(cheb)
    x, y, z, ids, count, over = CM.bin_initial(geom, pos, box, shift)
    r = 2
    t = lambda s: jnp.transpose(jnp.broadcast_to(s[None], (r,) + s.shape))
    scal, series, nser = _pack(ch)
    params = _params(box, geom, [300.0, 1200.0])
    total = CE.make_eam_total_fn(geom, nser, with_virial=False,
                                 interpret=True, rt=r)
    _, rho_slab = total((t(x), t(y), t(z)), params, scal, series,
                        jnp.ones((1, r), jnp.float32))
    sweep = CE.make_eam_sweep_fn(geom, ncyc=1, nser=nser,
                                 interpret=True, rt=r)
    seeds = jnp.asarray([[21, 22]], jnp.int32)
    (ox, oy, oz, orho), stats = sweep(
        (t(x), t(y), t(z), rho_slab), t(count), params, scal,
        (ch.c_phi, ch.c_rho, ch.c_f), seeds)
    eb, _ = brute_cheb(ch, pos, box)
    ids_np, ok = np.asarray(ids), np.asarray(ids) >= 0
    for ri in range(r):
        pos_r = CM.unbin(geom, (ox[:, ri], oy[:, ri], oz[:, ri], ids),
                         box, shift)
        e1, rho1 = brute_cheb(ch, pos_r, box)
        tracked, true = float(stats[0][ri]), float(e1 - eb)
        assert abs(tracked - true) < 2e-3 + 1e-4 * abs(true)
        assert 0.0 < float(stats[1][ri]) <= float(stats[2][ri])
        err = np.abs(np.asarray(orho[:, ri])[ok]
                     - np.asarray(rho1)[ids_np[ok]])
        assert err.max() < 1e-3


def test_eam_rebin_carries_rho(cheb):
    ch, geom, pos, box, shift = _setup(cheb)
    x, y, z, ids, count, over = CM.bin_initial(geom, pos, box, shift)
    r = 2
    t = lambda s: jnp.broadcast_to(s[None], (r,) + s.shape)
    rho = jnp.where(ids >= 0, jnp.arange(geom.rows, dtype=jnp.float32),
                    0.0)
    tab = jnp.asarray(CM.geom_tables(geom)[0])
    (slabs2, count2, over2, (rho2,)) = CM.rebin_axis(
        geom, (t(x), t(y), t(z), t(ids)), t(count),
        jnp.broadcast_to(box[None], (r, 3)), 0.2 / geom.ncell[0], 0,
        cell_tab=tab, extras=(t(rho),))
    assert not bool(over2)
    # rho values still travel with their atom ids
    ids1, rho1 = np.asarray(slabs2[3][0]), np.asarray(rho2[0])
    ids0, rho0 = np.asarray(ids), np.asarray(rho)
    m0 = {i: v for i, v in zip(ids0, rho0) if i >= 0}
    for i, v in zip(ids1, rho1):
        if i >= 0:
            assert m0[i] == v
