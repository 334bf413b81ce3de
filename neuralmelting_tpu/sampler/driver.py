"""Sampling driver: record blocks as one jitted lax.scan.

The reference's outer loop (SURVEY.md §3.1) gathered dask futures every
cycle and wrote thermo/traj lines from workers. Here a "record block" =
``mod`` sweeps + one ThermoRecord + step-size adaptation, and a run chunk is
``lax.scan`` over blocks — device-resident end to end; stacked records and
trajectory frames come back to the host once per chunk for text IO.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from neuralmelting_tpu.sampler.adapt import adapt_step_sizes


@struct.dataclass
class ThermoRecord:
    """One thermo line (reference .thrm row; SURVEY.md §2.5)."""
    sweep: jnp.ndarray
    temp: jnp.ndarray
    press: jnp.ndarray
    pe: jnp.ndarray
    ke: jnp.ndarray
    virial: jnp.ndarray
    vol: jnp.ndarray
    acc_pos: jnp.ndarray
    acc_vol: jnp.ndarray
    acc_hmc: jnp.ndarray
    dpos: jnp.ndarray
    dvol: jnp.ndarray
    dt: jnp.ndarray


def _ratio(nacc, ntry):
    return jnp.where(ntry > 0,
                     nacc.astype(jnp.float32) / jnp.maximum(ntry, 1),
                     0.0)


def make_record(state, kb) -> ThermoRecord:
    n = state.pos.shape[0]
    return ThermoRecord(
        sweep=state.sweep,
        temp=state.temp,
        press=state.press,
        pe=state.pe,
        ke=1.5 * n * kb * state.temp,
        virial=state.virial,
        vol=jnp.prod(state.box),
        acc_pos=_ratio(state.nap, state.ntp),
        acc_vol=_ratio(state.nav, state.ntv),
        acc_hmc=_ratio(state.nah, state.nth),
        dpos=state.dpos,
        dvol=state.dvol,
        dt=state.dt,
    )


def make_run_fn(sweep_fn: Callable, kb: float, mod: int, nrecords: int,
                targets=(0.5, 0.5, 0.5), factor: float = 1.0625,
                write_traj: bool = True, jit: bool = True):
    """Build ``run(pot, state) -> (state, records, frames)``.

    ``pot`` is a traced argument (docs/tpu_notes.md §1); ``sweep_fn`` has
    signature ``sweep(pot, state)`` (see sampler.serial.make_sweep_fn).
    records: ThermoRecord with leading axis nrecords.
    frames:  (positions, boxes) with leading axis nrecords, or None.
    """

    def run(pot, state):
        def record_block(state, _):
            def one_sweep(st, _):
                return sweep_fn(pot, st), None

            state, _ = jax.lax.scan(one_sweep, state, None, length=mod)
            rec = make_record(state, kb)
            state = adapt_step_sizes(state, targets=targets, factor=factor)
            frame = (state.pos, state.box) if write_traj else ()
            return state, (rec, frame)

        state, (recs, frames) = jax.lax.scan(
            record_block, state, None, length=nrecords)
        return state, recs, (frames if write_traj else None)

    if jit:
        run = jax.jit(run, donate_argnums=1)
    return run
