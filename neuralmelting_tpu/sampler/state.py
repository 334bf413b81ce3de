"""Per-replica Monte Carlo state.

Preserves the reference's per-sample bookkeeping (SURVEY.md §2.4: natoms,
positions, box edge, temp, pe, virial, vol, per-move accept/try counters,
dx/dV/dt, RNG seed) as one flat pytree. A replica ensemble is simply this
pytree with a leading replica axis (vmap / shard_map), so the whole (P,T)
grid lives in HBM for the lifetime of the run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MCState:
    # configuration
    pos: jnp.ndarray        # (N, 3)
    box: jnp.ndarray        # (3,) edge lengths
    key: jnp.ndarray        # jax PRNG key (uint32[2] old-style or typed key)
    # cached energetics (kept incrementally current).  CONTRACT: `pe` and
    # `virial` are exact at every RECORD point (all engines refresh them
    # with a drift-free total pass before emitting a record); BETWEEN
    # records they may be stale or approximate — in particular the cellmc
    # engines carry f32-accumulated pe and pin `virial` to its last
    # record/pre-rescale value through mid-block volume moves
    # (sampler/cellmc.py). Consumers must read thermodynamics from
    # records, not from mid-block state.
    pe: jnp.ndarray         # () potential energy
    virial: jnp.ndarray     # () scalar pair virial sum r*f
    # thermodynamic target of the slot this replica currently owns
    temp: jnp.ndarray       # ()
    press: jnp.ndarray      # ()
    # adaptive step sizes
    dpos: jnp.ndarray       # () max displacement per axis
    dvol: jnp.ndarray       # () max absolute volume change
    dt: jnp.ndarray         # () HMC timestep
    # accept/try counters for the current adaptation window
    nap: jnp.ndarray        # () i32 accepted position moves
    ntp: jnp.ndarray        # () i32 tried position moves
    nav: jnp.ndarray        # () i32 accepted volume moves
    ntv: jnp.ndarray        # () i32 tried volume moves
    nah: jnp.ndarray        # () i32 accepted HMC moves
    nth: jnp.ndarray        # () i32 tried HMC moves
    sweep: jnp.ndarray      # () i32 sweeps completed

    @property
    def natoms(self) -> int:
        return self.pos.shape[-2]

    @property
    def vol(self) -> jnp.ndarray:
        return jnp.prod(self.box, axis=-1)


def init_state(pot, pos, box, key, temp, press, dpos0, dvol_frac0, dt0,
               energy_fn=None) -> MCState:
    """Build an MCState and populate its cached energy/virial.

    ``dvol_frac0`` is the initial max volume step as a fraction of V0 (the
    stored ``dvol`` is absolute, matching the reference's V' = V + dV*(2u-1)
    semantics; SURVEY.md §2.4).
    """
    from neuralmelting_tpu.ops import energy as energy_ops

    pos = jnp.asarray(pos, jnp.float32)
    box = jnp.asarray(box, jnp.float32)
    if energy_fn is None:
        energy_fn = energy_ops.pair_energy_virial
    pe, vir = energy_fn(pot, pos, box)
    vol0 = jnp.prod(box)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    # distinct buffers per counter: sharing one zeros() array would alias
    # donated buffers under jit(donate_argnums=0)
    i0 = lambda: jnp.zeros((), jnp.int32)
    return MCState(
        pos=pos, box=box, key=key,
        pe=pe, virial=vir,
        temp=f32(temp), press=f32(press),
        dpos=f32(dpos0), dvol=f32(dvol_frac0) * vol0, dt=f32(dt0),
        nap=i0(), ntp=i0(), nav=i0(), ntv=i0(), nah=i0(), nth=i0(),
        sweep=i0(),
    )


def ensemble_init(pot, pos, box, seed, temps, presses, dpos0, dvol_frac0, dt0,
                  energy_fn=None) -> MCState:
    """Init a replica ensemble: same lattice, vmapped over (temp, press) pairs.

    ``temps`` and ``presses`` are flat (R,) arrays (e.g. a raveled P x T grid).
    Every replica gets an independently folded PRNG key.
    """
    # copies: never alias caller buffers into (donatable) state
    temps = jnp.array(temps, jnp.float32, copy=True)
    presses = jnp.array(presses, jnp.float32, copy=True)
    r = temps.shape[0]
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.key(seed), jnp.arange(r))

    def one(key, t, p):
        return init_state(pot, pos, box, key, t, p, dpos0, dvol_frac0, dt0,
                          energy_fn=energy_fn)

    return jax.vmap(one)(keys, temps, presses)
