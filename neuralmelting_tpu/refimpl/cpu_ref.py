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


def forces(pos, box, eps, sigma, rc):
    """Pair forces, f_i = sum_j (w(r)/r^2)(r_i - r_j) (ops/energy.forces)."""
    d = pos[:, None, :] - pos[None, :, :]
    d -= box * np.round(d / box)
    r2 = (d ** 2).sum(-1)
    np.fill_diagonal(r2, np.inf)
    mask = r2 < rc * rc
    r2s = np.where(mask, r2, 1.0)
    sr6 = (sigma * sigma / r2s) ** 3
    w = 24 * eps * (2 * sr6 * sr6 - sr6)
    coef = np.where(mask, w / r2s, 0.0)
    return (coef[:, :, None] * d).sum(axis=1)


def sweep(st: RefState, kb, p2e, ppos, pvol, eps, sigma, rc,
          nstps=8, mass=1.0):
    """One sweep of N attempts; mirrors sampler.serial move for move
    (position, volume AND HMC — SURVEY.md §2.4's three move types)."""
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
            # HMC: mirror of sampler.moves.hmc_move (velocity-Verlet).
            # The leapfrog runs in float32 like the production kernel:
            # the dynamics are chaotic, so float64 here would diverge from
            # the jitted chain within a few trajectories.
            kv, ka = jax.random.split(km, 2)
            f32 = np.float32
            sigma_v = f32(np.sqrt(kb * st.temp / mass))
            vel = sigma_v * np.asarray(
                jax.random.normal(kv, (n, 3), jnp.float32), np.float32)
            ke0 = 0.5 * mass * (vel.astype(np.float64) ** 2).sum()
            dt = f32(st.dt)
            box32 = st.box.astype(f32)
            f = forces(st.pos.astype(f32), box32, eps, sigma, rc)\
                .astype(f32)
            pos = st.pos.astype(f32)
            half = f32(0.5 * dt / mass)
            for _ in range(nstps):
                vel_half = vel + half * f
                pos = pos + dt * vel_half
                f = forces(pos, box32, eps, sigma, rc).astype(f32)
                vel = vel_half + half * f
            pos = pos.astype(np.float64)
            pe_new, vir_new = total_energy(pos, st.box, eps, sigma, rc)
            ke1 = 0.5 * mass * (vel.astype(np.float64) ** 2).sum()
            dh = (pe_new - st.pe) + (ke1 - ke0)
            ln_u = np.log(_uniform(ka, (), 1e-38, 1.0))
            st.nth += 1
            if ln_u < -beta * dh:
                st.pos = pos - st.box * np.floor(pos / st.box)
                st.pe, st.virial = pe_new, vir_new
                st.nah += 1
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
