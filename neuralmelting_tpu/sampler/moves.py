"""The three NPT Monte Carlo move kernels (SURVEY.md §2.4).

Each move is a pure function ``(state, key) -> state`` built from an
``EnergyBackend`` — a triple of total/incremental/force evaluators, so the
same move logic runs against brute-force O(N^2) energies (golden path),
cell-list energies, or Pallas kernels without change.

Acceptance rules (beta = 1/(kb*T)):
  position:  min(1, exp(-beta*dE))
  volume:    min(1, exp(-beta*(dE + P*p2e*dV) + N*ln(V'/V)))   [NPT weight]
  HMC:       min(1, exp(-beta*dH)), dH = dPE + dKE
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EnergyBackend:
    """total(pot,pos,box)->(pe,vir); delta_move(pot,pos,box,i,ri)->(dE,dW);
    forces(pot,pos,box)->(N,3)."""
    total: Callable
    delta_move: Callable
    forces: Callable


def brute_backend() -> EnergyBackend:
    from neuralmelting_tpu.ops import energy as E
    return EnergyBackend(total=E.pair_energy_virial,
                         delta_move=E.delta_move_brute,
                         forces=E.forces)


def wrap_pos(pos, box):
    return pos - box * jnp.floor(pos / box)


def position_move(pot, kb, backend, state, key):
    """Single-particle displacement trial (reference 'PMC')."""
    n = state.pos.shape[0]
    ki, kd, ka = jax.random.split(key, 3)
    i = jax.random.randint(ki, (), 0, n)
    disp = jax.random.uniform(kd, (3,), jnp.float32,
                              minval=-state.dpos, maxval=state.dpos)
    new_ri = state.pos[i] + disp
    de, dw = backend.delta_move(pot, state.pos, state.box, i, new_ri)
    beta = 1.0 / (kb * state.temp)
    ln_u = jnp.log(jax.random.uniform(ka, (), jnp.float32, 1e-38, 1.0))
    acc = ln_u < -beta * de
    new_ri = wrap_pos(new_ri, state.box)
    pos = state.pos.at[i].set(jnp.where(acc, new_ri, state.pos[i]))
    return state.replace(
        pos=pos,
        pe=state.pe + jnp.where(acc, de, 0.0),
        virial=state.virial + jnp.where(acc, dw, 0.0),
        nap=state.nap + acc.astype(jnp.int32),
        ntp=state.ntp + 1,
    )


def volume_move(pot, kb, p2e, backend, state, key):
    """Isotropic volume trial V' = V + dV*(2u-1), box and coords rescaled."""
    n = state.pos.shape[0]
    kd, ka = jax.random.split(key, 2)
    u = jax.random.uniform(kd, (), jnp.float32)
    vol = jnp.prod(state.box)
    dv = state.dvol * (2.0 * u - 1.0)
    vol_new = vol + dv
    valid = vol_new > 0.0
    s = jnp.where(valid, jnp.cbrt(vol_new / vol), 1.0)
    pos_new = state.pos * s
    box_new = state.box * s
    pe_new, vir_new = backend.total(pot, pos_new, box_new)
    beta = 1.0 / (kb * state.temp)
    ln_acc = (-beta * ((pe_new - state.pe) + state.press * p2e * dv)
              + n * jnp.log(jnp.where(valid, vol_new / vol, 1.0)))
    ln_u = jnp.log(jax.random.uniform(ka, (), jnp.float32, 1e-38, 1.0))
    acc = valid & (ln_u < ln_acc)
    return state.replace(
        pos=jnp.where(acc, pos_new, state.pos),
        box=jnp.where(acc, box_new, state.box),
        pe=jnp.where(acc, pe_new, state.pe),
        virial=jnp.where(acc, vir_new, state.virial),
        nav=state.nav + acc.astype(jnp.int32),
        ntv=state.ntv + 1,
    )


def hmc_move(pot, kb, backend, state, key, nstps: int, mass: float):
    """Hybrid MC: fresh Maxwell-Boltzmann velocities + velocity-Verlet run.

    Replaces the reference's LAMMPS `velocity all create T` + `run n_md`
    (SURVEY.md §2.1) with a jitted leapfrog in lax.scan.
    """
    n = state.pos.shape[0]
    kv, ka = jax.random.split(key, 2)
    sigma_v = jnp.sqrt(kb * state.temp / mass)
    vel = sigma_v * jax.random.normal(kv, state.pos.shape, jnp.float32)
    ke0 = 0.5 * mass * jnp.sum(vel * vel)

    dt = state.dt
    f0 = backend.forces(pot, state.pos, state.box)

    def step(carry, _):
        pos, vel, f = carry
        vel_half = vel + (0.5 * dt / mass) * f
        pos = pos + dt * vel_half
        f = backend.forces(pot, pos, state.box)
        vel = vel_half + (0.5 * dt / mass) * f
        return (pos, vel, f), None

    (pos_new, vel_new, _), _ = jax.lax.scan(
        step, (state.pos, vel, f0), None, length=nstps)
    pe_new, vir_new = backend.total(pot, pos_new, state.box)
    ke1 = 0.5 * mass * jnp.sum(vel_new * vel_new)
    dh = (pe_new - state.pe) + (ke1 - ke0)
    beta = 1.0 / (kb * state.temp)
    ln_u = jnp.log(jax.random.uniform(ka, (), jnp.float32, 1e-38, 1.0))
    acc = ln_u < -beta * dh
    pos_new = wrap_pos(pos_new, state.box)
    return state.replace(
        pos=jnp.where(acc, pos_new, state.pos),
        pe=jnp.where(acc, pe_new, state.pe),
        virial=jnp.where(acc, vir_new, state.virial),
        nah=state.nah + acc.astype(jnp.int32),
        nth=state.nth + 1,
    )
