"""Slow, loop-based CPU reference NPT Metropolis MC.

Plays the role of the reference's LAMMPS-backed CPU run for golden-file
tests (BASELINE config 1; SURVEY.md §4.3): an independent implementation of
the physics (numpy energies, explicit Python loops) that shares only the RNG
stream contract with the production sampler
(neuralmelting_tpu.sampler.serial docstring), so trajectories are
comparable move by move under a fixed seed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class RefState:
    pos: np.ndarray
    box: np.ndarray
    key: object
    pe: float
    virial: float
    temp: float
    press: float
    dpos: float
    dvol: float
    dt: float
    nap: int = 0
    ntp: int = 0
    nav: int = 0
    ntv: int = 0
    nah: int = 0
    nth: int = 0
    sweep: int = 0


def _pair_terms(pos, box, eps, sigma, rc):
    d = pos[None, :, :] - pos[:, None, :]
    d -= box * np.round(d / box)
    r2 = (d ** 2).sum(-1)
    np.fill_diagonal(r2, np.inf)
    mask = r2 < rc * rc
    sr6 = np.where(mask, (sigma * sigma / np.where(mask, r2, 1.0)) ** 3, 0.0)
    e = 4 * eps * (sr6 * sr6 - sr6)
    w = 24 * eps * (2 * sr6 * sr6 - sr6)
    return e, w


def total_energy(pos, box, eps, sigma, rc):
    e, w = _pair_terms(pos, box, eps, sigma, rc)
    return 0.5 * e.sum(), 0.5 * w.sum()


def _one_particle(pos, box, i, ri, eps, sigma, rc):
    d = pos - ri
    d -= box * np.round(d / box)
    r2 = (d ** 2).sum(-1)
    r2[i] = np.inf
    mask = r2 < rc * rc
    sr6 = np.where(mask, (sigma * sigma / np.where(mask, r2, 1.0)) ** 3, 0.0)
    e = 4 * eps * (sr6 * sr6 - sr6)
    w = 24 * eps * (2 * sr6 * sr6 - sr6)
    return e.sum(), w.sum()


def init_ref_state(pos, box, seed_key, temp, press, dpos0, dvol_frac0, dt0,
                   eps=1.0, sigma=1.0, rc=2.5) -> RefState:
    pos = np.asarray(pos, np.float64)
    box = np.asarray(box, np.float64)
    pe, vir = total_energy(pos, box, eps, sigma, rc)
    return RefState(pos=pos.copy(), box=box.copy(), key=seed_key,
                    pe=pe, virial=vir, temp=float(temp), press=float(press),
                    dpos=float(dpos0), dvol=float(dvol_frac0) * float(np.prod(box)),
                    dt=float(dt0))


def _uniform(key, shape=(), lo=0.0, hi=1.0):
    return np.asarray(jax.random.uniform(key, shape, jnp.float32,
                                         minval=lo, maxval=hi), np.float64)


def sweep(st: RefState, kb, p2e, ppos, pvol, eps, sigma, rc):
    """One sweep of N attempts; mirrors sampler.serial exactly (no HMC)."""
    n = len(st.pos)
    keys = jax.random.split(st.key, n + 1)
    st.key = keys[0]
    beta = 1.0 / (kb * st.temp)
    for a in range(n):
        kt, km = jax.random.split(keys[1 + a])
        # branch in float32 to match the production sampler's comparison bits
        u = np.float32(_uniform(kt))
        if u < np.float32(ppos):
            ki, kd, ka = jax.random.split(km, 3)
            i = int(jax.random.randint(ki, (), 0, n))
            disp = _uniform(kd, (3,), -st.dpos, st.dpos)
            new_ri = st.pos[i] + disp
            e_old, w_old = _one_particle(st.pos, st.box, i, st.pos[i],
                                         eps, sigma, rc)
            e_new, w_new = _one_particle(st.pos, st.box, i, new_ri,
                                         eps, sigma, rc)
            de, dw = e_new - e_old, w_new - w_old
            ln_u = np.log(_uniform(ka, (), 1e-38, 1.0))
            st.ntp += 1
            if ln_u < -beta * de:
                st.pos[i] = new_ri - st.box * np.floor(new_ri / st.box)
                st.pe += de
                st.virial += dw
                st.nap += 1
        elif u < np.float32(ppos + pvol):  # f64 sum then f32 cast, as in jnp
            kd, ka = jax.random.split(km, 2)
            uu = float(_uniform(kd))
            vol = float(np.prod(st.box))
            dv = st.dvol * (2.0 * uu - 1.0)
            vol_new = vol + dv
            st.ntv += 1
            ln_u = np.log(_uniform(ka, (), 1e-38, 1.0))
            if vol_new > 0:
                s = (vol_new / vol) ** (1.0 / 3.0)
                pos_new = st.pos * s
                box_new = st.box * s
                pe_new, vir_new = total_energy(pos_new, box_new, eps, sigma, rc)
                ln_acc = (-beta * ((pe_new - st.pe) + st.press * p2e * dv)
                          + n * np.log(vol_new / vol))
                if ln_u < ln_acc:
                    st.pos, st.box = pos_new, box_new
                    st.pe, st.virial = pe_new, vir_new
                    st.nav += 1
        else:
            raise NotImplementedError("HMC not in the CPU golden reference")
    st.sweep += 1
    return st


def adapt(st: RefState, targets=(0.5, 0.5, 0.5), factor=1.0625):
    """Mirror of sampler.adapt.adapt_step_sizes."""
    boxmin = float(np.min(st.box))
    vol = float(np.prod(st.box))

    def one(d, na, nt, target, lo, hi):
        if nt > 0:
            d = d * factor if (na / max(nt, 1)) > target else d / factor
        return float(np.clip(d, lo, hi))

    st.dpos = one(st.dpos, st.nap, st.ntp, targets[0], 1e-5 * boxmin,
                  0.25 * boxmin)
    st.dvol = one(st.dvol, st.nav, st.ntv, targets[1], 1e-8 * vol, 0.5 * vol)
    st.nap = st.ntp = st.nav = st.ntv = st.nah = st.nth = 0
    return st
