"""Replica-ensemble execution: the (P,T) grid as one vmapped program.

The reference ran one dask worker + LAMMPS instance per (P,T) sample with a
driver-side gather each cycle (SURVEY.md §2.2, §3.1). Here the ensemble is a
single MCState pytree with a leading replica axis, advanced by a vmapped
checkerboard sweep inside one jitted scan; neighbor-list rebuilds are decided
globally (any replica stale -> rebuild all) so the branch stays outside vmap
and executes only when taken. Mesh sharding of the replica axis is layered
on top in neuralmelting_tpu.parallel.mesh / tempering.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from neuralmelting_tpu.ops import neighbors as NB
from neuralmelting_tpu.sampler import checkerboard as CB
from neuralmelting_tpu.sampler.adapt import adapt_step_sizes
from neuralmelting_tpu.sampler.driver import make_record


def _or_reduce_flags(d):
    """Bitwise-OR a (R,) int32 flag array into a scalar (2 known bits)."""
    return (jnp.where(jnp.any(d & CB.DIAG_NL_OVERFLOW), CB.DIAG_NL_OVERFLOW, 0)
            | jnp.where(jnp.any(d & CB.DIAG_CB_INVALID), CB.DIAG_CB_INVALID, 0)
            ).astype(jnp.int32)


def make_ensemble_run_fn(pot, kb, p2e, cellcfg, skin: float, capacity: int,
                         mod: int, nrecords: int, npasses: int = 0,
                         nvol: int = 1,
                         nhmc: int = 0, nstps: int = 16, mass: float = 1.0,
                         targets=(0.5, 0.5, 0.5), factor: float = 1.0625,
                         natoms: int = 0,
                         write_traj: bool = True, jit: bool = True):
    """Build ``run(states, nls) -> (states, nls, recs, frames, diag)``.

    ``states`` is an MCState with leading replica axis R; ``nls`` the matching
    NeighborList (see ``build_ensemble_nl``). recs fields are (nrecords, R).
    ``npasses=0`` auto-selects ~N attempts per sweep (needs ``natoms``).
    """
    if npasses <= 0:
        if natoms <= 0:
            raise ValueError("pass npasses or natoms")
        npasses = CB.default_npasses(natoms, cellcfg)
    sweep = CB.make_cb_sweep_fn(pot, kb, p2e, cellcfg, npasses=npasses,
                                nvol=nvol, nhmc=nhmc,
                                nstps=nstps, mass=mass)
    vsweep = jax.vmap(sweep)
    rlist = pot.rc + skin

    def _vbuild(pos, box):
        return jax.vmap(lambda p, b: NB.build(p, b, rlist, capacity))(pos, box)

    vstale = jax.vmap(lambda nl, p, b: NB.needs_rebuild(nl, p, b, pot.rc))
    vtotal = jax.vmap(lambda p, b, nl: NB.pair_energy_virial(pot, p, b, nl))

    def sweep_step(carry, _):
        states, nls, diag = carry
        states, d = vsweep(states, nls)
        diag = diag | _or_reduce_flags(d)
        stale = vstale(nls, states.pos, states.box)
        nls = jax.lax.cond(jnp.any(stale),
                           lambda: _vbuild(states.pos, states.box),
                           lambda: nls)
        return (states, nls, diag), None

    def record_block(carry, _):
        carry, _ = jax.lax.scan(sweep_step, carry, None, length=mod)
        states, nls, diag = carry
        # kill f32 drift of the incremental accumulators at every record
        pe, vir = vtotal(states.pos, states.box, nls)
        states = states.replace(pe=pe, virial=vir)
        rec = jax.vmap(lambda s: make_record(s, kb))(states)
        states = jax.vmap(
            lambda s: adapt_step_sizes(s, targets=targets, factor=factor)
        )(states)
        frame = (states.pos, states.box) if write_traj else ()
        return (states, nls, diag), (rec, frame)

    def run(states, nls):
        diag0 = jnp.zeros((), jnp.int32)
        (states, nls, diag), (recs, frames) = jax.lax.scan(
            record_block, (states, nls, diag0), None, length=nrecords)
        return states, nls, recs, (frames if write_traj else None), diag

    if jit:
        run = jax.jit(run, donate_argnums=(0, 1))
    return run


def build_ensemble_nl(pot, states, skin: float,
                      capacity: Optional[int] = None):
    """Build per-replica neighbor lists for a batched MCState.

    NOTE: a run fn compiled by make_ensemble_run_fn is specialized to one
    static capacity. When rebuilding lists for an existing run fn, pass the
    capacity it was compiled with — auto-suggestion depends on the current
    density and may differ.
    """
    if capacity is None:
        capacity = NB.suggest_capacity(states.pos.shape[-2],
                                       states.box[0], float(pot.rc) + skin)
    rlist = pot.rc + skin
    return jax.vmap(lambda p, b: NB.build(p, b, rlist, capacity))(
        states.pos, states.box), capacity
