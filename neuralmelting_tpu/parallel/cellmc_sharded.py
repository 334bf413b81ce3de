"""Multi-chip production cellmc: the Pallas sweep engine under shard_map.

The replica (P,T) grid is this workload's scaling axis (SURVEY.md §2.2).
The gather engine shards transparently (parallel/ensemble.py: GSPMD
partitions plain XLA ops), but ``pallas_call`` is a black box to the
partitioner — left to GSPMD it would be replicated or force all-gathers.
This module is the explicit-SPMD mapping for the production engine:

  * each device runs the whole-sweep kernel + total kernel on its replica
    SHARD (lane tile = R_local), via ``shard_map`` over a 1-D
    ``replica`` mesh — zero inter-chip traffic during sweep blocks;
  * per-shard randomness is decorrelated by folding the shard index into
    the kernel seed words and volume-trial keys
    (sampler/cellmc.py::make_cellmc_run_fn ``axis_name``), while the
    grid-shift rebin draw stays shared so the (3,) ``shift`` bookkeeping
    remains replicated;
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
                               rt: int = 0):
    """Build the jitted multi-device chunk runner.

    ``run(states, slabs, count, shift, slot_of, xkey, pot, cell_tabs,
      t_grid, p_grid, seed0) -> (states, slabs, count, shift, slot_of,
      recs, hist, xacc, diag)``

    All leading-R arrays must be placed with ``NamedSharding(mesh,
    P("replica"))`` (parallel/mesh.py::shard_ensemble); R must divide by
    the mesh size. Each record block = ``mod`` sweeps on-shard, then one
    tempering exchange event across the mesh.
    """
    inner = SC.make_cellmc_run_fn(
        kb, p2e, geom, mod=mod, nrecords=1, ncyc=ncyc, nvol=nvol,
        targets=targets, factor=factor, exchange=False, interpret=interpret,
        adapt=adapt, jit=False, vol_every=vol_every,
        rebin_every=rebin_every, axis_name=AXIS, rt=rt)

    def shard_block(states, slabs, count, shift, pot, cell_tabs, seed0):
        out = inner(states, slabs, count, shift, pot, cell_tabs, seed0)
        states, slabs, count, shift, recs, _frames, diag = out
        diag = jax.lax.pmax(diag, AXIS)
        rec = jax.tree.map(lambda a: a[0], recs)   # squeeze nrecords=1
        return states, slabs, count, shift, rec, diag

    rep = P(AXIS)
    block = jax.shard_map(
        shard_block, mesh=mesh,
        in_specs=(rep, rep, rep, P(), P(), P(), P()),
        out_specs=(rep, rep, rep, P(), rep, P()),
        check_vma=False)

    def run(states, slabs, count, shift, slot_of, xkey, pot, cell_tabs,
            t_grid, p_grid, seed0):
        def record_block(carry, event_idx):
            states, slabs, count, shift, slot_of, diag = carry
            states, slabs, count, shift, rec, d = block(
                states, slabs, count, shift, pot, cell_tabs, seed0)
            diag = diag | d
            slots_at_record = slot_of
            ekey = jax.random.fold_in(
                jax.random.fold_in(xkey, event_idx), states.sweep[0])
            states, slot_of, n_acc = tempering.exchange_event(
                states, slot_of, ekey, event_idx, npress, ntemp,
                t_grid, p_grid, kb, p2e)
            return (states, slabs, count, shift, slot_of, diag), \
                (rec, slots_at_record, n_acc)

        diag0 = jnp.zeros((), jnp.int32)
        carry = (states, slabs, count, shift, slot_of, diag0)
        carry, (recs, hist, xacc) = jax.lax.scan(
            record_block, carry, jnp.arange(nrecords), length=nrecords)
        states, slabs, count, shift, slot_of, diag = carry
        return (states, slabs, count, shift, slot_of, recs, hist, xacc,
                diag)

    return jax.jit(run, donate_argnums=(0, 1, 2))
