"""Multi-chip production cellmc: the Pallas sweep engines under shard_map.

The replica (P,T) grid is this workload's scaling axis (SURVEY.md §2.2).
The gather engine shards transparently (parallel/ensemble.py: GSPMD
partitions plain XLA ops), but ``pallas_call`` is a black box to the
partitioner — left to GSPMD it would be replicated or force all-gathers.
This module is the explicit-SPMD mapping for the production engines
(LJ whole-sweep kernel AND the Chebyshev EAM twin):

  * each device runs the whole-sweep kernel + total kernel on its replica
    SHARD (lane tile = R_local), via ``shard_map`` over a 1-D
    ``replica`` mesh — zero inter-chip traffic during sweep blocks;
  * per-shard randomness is decorrelated by folding the shard index into
    the kernel seed words and volume-trial keys
    (sampler/cellmc.py::make_cellmc_run_fn / make_eam_run_fn
    ``axis_name``), while the grid-shift rebin draw stays shared so the
    (3,) ``shift`` bookkeeping remains replicated — enforced with a
    cross-shard ``pmax`` on exit (a shard-folded rebin key would
    otherwise desynchronize shift silently under check_vma=False);
  * parallel-tempering exchange runs OUTSIDE the shard_map on the global
    sharded arrays: it is O(R) scalar traffic, and the GSPMD partitioner
    lowers the slot permutation to ICI collectives exactly as in the
    gather engine (sampler/tempering.py unchanged).

Reference parity: replaces the dask driver's gather -> swap -> scatter
cycle (SURVEY.md §2.3) with on-device collectives around a kernel-resident
hot loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from neuralmelting_tpu.sampler import cellmc as SC
from neuralmelting_tpu.sampler import tempering

AXIS = "replica"


def make_sharded_cellmc_run_fn(mesh, kb, p2e, geom, mod: int,
                               nrecords: int, npress: int, ntemp: int,
                               ncyc: int = 4, nvol: int = 1,
                               vol_every: int = 1, rebin_every: int = 1,
                               targets=(0.5, 0.5, 0.5),
                               factor: float = 1.0625,
                               interpret=None, adapt: bool = True,
                               rt: int = 0, style: str = "pair",
                               nser=None, fast_recip: bool = False,
                               write_traj: bool = False):
    """Build the jitted multi-device chunk runner.

    style="pair" (LJ kernel):
      ``run(states, slabs, count, shift, slot_of, xkey, pot, cell_tabs,
        t_grid, p_grid, seed0)``
    style="eam" (Chebyshev EAM kernel; requires ``nser``; slabs carry
    the (x, y, z, ids, rho) density cache):
      ``run(states, slabs5, count, shift, slot_of, xkey, scal, series6,
        cell_tabs, t_grid, p_grid, seed0)``

    Both return ``(states, slabs, count, shift, slot_of, recs, frames,
    hist, xacc, diag)`` — the exact signature of the single-device
    exchange runners, so runner.run_sampling swaps factories under
    ``jax.process_count() > 1`` with no other changes.

    All leading-R arrays must be placed with ``NamedSharding(mesh,
    P("replica"))`` (parallel/mesh.py::shard_ensemble / to_global); R
    must divide by the mesh size. Each record block = ``mod`` sweeps
    on-shard, then one tempering exchange event across the mesh.
    """
    if style == "eam":
        assert nser is not None, "EAM sharded runner needs nser"
        inner = SC.make_eam_run_fn(
            kb, p2e, geom, nser, mod=mod, nrecords=1, ncyc=ncyc,
            nvol=nvol, targets=targets, factor=factor, exchange=False,
            interpret=interpret, adapt=adapt, jit=False,
            vol_every=vol_every, rebin_every=rebin_every,
            axis_name=AXIS, rt=rt, write_traj=write_traj)
    else:
        inner = SC.make_cellmc_run_fn(
            kb, p2e, geom, mod=mod, nrecords=1, ncyc=ncyc, nvol=nvol,
            targets=targets, factor=factor, exchange=False,
            interpret=interpret, adapt=adapt, jit=False,
            vol_every=vol_every, rebin_every=rebin_every,
            axis_name=AXIS, rt=rt, fast_recip=fast_recip,
            write_traj=write_traj)

    def shard_block(states, slabs, count, shift, potp, cell_tabs, seed0):
        out = inner(states, slabs, count, shift, *potp, cell_tabs, seed0)
        states, slabs, count, shift, recs, frames, diag = out
        diag = jax.lax.pmax(diag, AXIS)
        # shift is replicated by construction (shared rebin draw), but
        # check_vma=False would let a future shard-folded rebin key
        # desynchronize it silently — detect and flag (ADVICE r3 low #3)
        smax = jax.lax.pmax(shift, AXIS)
        smin = jax.lax.pmin(shift, AXIS)
        diag = diag | jnp.where(jnp.any(smax != smin),
                                SC.DIAG_SHIFT_DESYNC,
                                0).astype(jnp.int32)
        shift = smax
        rec = jax.tree.map(lambda a: a[0], recs)   # squeeze nrecords=1
        frame = jax.tree.map(lambda a: a[0], frames) if write_traj else ()
        return states, slabs, count, shift, rec, frame, diag

    rep = P(AXIS)
    block = jax.shard_map(
        shard_block, mesh=mesh,
        in_specs=(rep, rep, rep, P(), P(), P(), P()),
        out_specs=(rep, rep, rep, P(), rep, rep, P()),
        check_vma=False)

    def _run(states, slabs, count, shift, slot_of, xkey, potp, cell_tabs,
             t_grid, p_grid, seed0):
        def record_block(carry, event_idx):
            states, slabs, count, shift, slot_of, diag = carry
            states, slabs, count, shift, rec, frame, d = block(
                states, slabs, count, shift, potp, cell_tabs, seed0)
            diag = diag | d
            slots_at_record = slot_of
            ekey = jax.random.fold_in(
                jax.random.fold_in(xkey, event_idx), states.sweep[0])
            states, slot_of, n_acc = tempering.exchange_event(
                states, slot_of, ekey, event_idx, npress, ntemp,
                t_grid, p_grid, kb, p2e)
            return (states, slabs, count, shift, slot_of, diag), \
                (rec, frame, slots_at_record, n_acc)

        diag0 = jnp.zeros((), jnp.int32)
        carry = (states, slabs, count, shift, slot_of, diag0)
        carry, (recs, frames, hist, xacc) = jax.lax.scan(
            record_block, carry, jnp.arange(nrecords), length=nrecords)
        states, slabs, count, shift, slot_of, diag = carry
        return (states, slabs, count, shift, slot_of, recs,
                (frames if write_traj else None), hist, xacc, diag)

    if style == "eam":
        def run(states, slabs, count, shift, slot_of, xkey, scal, series,
                cell_tabs, t_grid, p_grid, seed0):
            return _run(states, slabs, count, shift, slot_of, xkey,
                        (scal, series), cell_tabs, t_grid, p_grid, seed0)
    else:
        def run(states, slabs, count, shift, slot_of, xkey, pot,
                cell_tabs, t_grid, p_grid, seed0):
            return _run(states, slabs, count, shift, slot_of, xkey,
                        (pot,), cell_tabs, t_grid, p_grid, seed0)

    return jax.jit(run, donate_argnums=(0, 1, 2))
