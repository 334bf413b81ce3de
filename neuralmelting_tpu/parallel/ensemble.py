"""Replica-ensemble execution: the (P,T) grid as one vmapped program.

The reference ran one dask worker + LAMMPS instance per (P,T) sample with a
driver-side gather each cycle (SURVEY.md §2.2, §3.1). Here the ensemble is a
single MCState pytree with a leading replica axis, advanced by a vmapped
checkerboard sweep inside one jitted scan, with parallel-tempering exchange
events between record blocks (sampler/tempering.py). Neighbor-list rebuilds
are decided globally (any replica stale -> rebuild all) so the branch stays
outside vmap and executes only when taken.

All array inputs — the potential pytree, the checkerboard color table, the
(T,P) grids — are jit ARGUMENTS, never baked constants (docs/tpu_notes.md
§1: baked constants cost ~0.5 ms per scan iteration on this stack).

Scaling: replicas are embarrassingly parallel between exchanges, so placing
the leading axis on a device mesh via NamedSharding (parallel/mesh.py) lets
GSPMD partition the whole scan; exchange math is O(R) scalars and runs from
an all-gather the partitioner inserts automatically.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu.ops import neighbors as NB
from neuralmelting_tpu.ops import potential_ops as PO
from neuralmelting_tpu.sampler import checkerboard as CB
from neuralmelting_tpu.sampler import tempering
from neuralmelting_tpu.sampler.adapt import adapt_step_sizes
from neuralmelting_tpu.sampler.driver import make_record


def or_reduce(d):
    """Bitwise-OR a (R,) int32 flag array into a scalar."""
    return jax.lax.reduce(d.astype(jnp.int32), np.int32(0),
                          jnp.bitwise_or, (0,))


def make_ensemble_run_fn(kb, p2e, cellcfg, skin: float, capacity: int,
                         mod: int, nrecords: int, npasses: int = 0,
                         nvol: int = 1,
                         nhmc: int = 0, nstps: int = 16, mass: float = 1.0,
                         targets=(0.5, 0.5, 0.5), factor: float = 1.0625,
                         natoms: int = 0,
                         exchange: bool = False, npress: int = 0,
                         ntemp: int = 0, style: str = "pair",
                         write_traj: bool = True, jit: bool = True):
    """Build the ensemble run function.

    Without exchange:
      ``run(states, nls, aux, pot, table) ->
        (states, nls, aux, recs, frames, diag)``
    With exchange:
      ``run(states, nls, aux, slot_of, xkey, pot, table, t_grid, p_grid) ->
        (states, nls, aux, slot_of, recs, frames, slots_hist, xacc, diag)``

    ``aux`` is per-replica potential cache (see build_ensemble_aux).

    ``states``: MCState with leading replica axis R; ``nls`` the matching
    NeighborList; ``table`` = jnp.asarray(cellcfg.active_table). recs fields
    are (nrecords, R) in *replica* order; ``slots_hist`` (nrecords, R) gives
    each replica's grid slot at record time, ``xacc`` (nrecords,) counts
    accepted swaps. ``npasses=0`` auto-selects ~N attempts per sweep (needs
    ``natoms``).
    """
    if npasses <= 0:
        if natoms <= 0:
            raise ValueError("pass npasses or natoms")
        npasses = CB.default_npasses(natoms, cellcfg)
    pops = PO.ops_for_style(style)
    one_pass = CB.make_cb_pass_fn(kb, cellcfg, style)
    tail = CB.make_cb_tail_fn(kb, p2e, nvol, nhmc, nstps, mass, style)
    vpass = jax.vmap(one_pass, in_axes=(None, None, 0, 0, 0, 0, 0))
    vtail = jax.vmap(tail, in_axes=(None, 0, 0, 0, 0, 0))
    sq3 = 3.0 ** 0.5

    def _vbuild(pot, pos, box):
        rlist = pot.rc + skin
        return jax.vmap(lambda p, b: NB.build(p, b, rlist, capacity))(pos, box)

    def _maybe_rebuild(pot, states, nls, budget, shrink):
        """Global rebuild when ANY replica's skin invariant would not
        survive the upcoming stage (budget = displacement still to be
        consumed before the next check; shrink = pending worst box
        rescale). The cond stays outside vmap so only the taken branch
        runs (ADVICE.md r1: the old trigger fired exactly at violation,
        after stale energies were already used)."""
        stale = jax.vmap(
            lambda nl, p, b, bu: NB.needs_rebuild(nl, p, b, pot.rc,
                                                  budget=bu, shrink=shrink)
        )(nls, states.pos, states.box,
          jnp.broadcast_to(budget, states.temp.shape))
        return jax.lax.cond(jnp.any(stale),
                            lambda: _vbuild(pot, states.pos, states.box),
                            lambda: nls)

    def sweep_step(pot, table, carry):
        states, nls, aux, diag = carry
        ks = jax.vmap(lambda k: jax.random.split(k, 4))(states.key)
        states = states.replace(key=ks[:, 0])
        kpass, kvol, khmc = ks[:, 1], ks[:, 2], ks[:, 3]

        # per-replica dpos clamp: checkerboard independence AND enough
        # skin headroom that one pass per fresh rebuild is always legal
        margin_cb = CB.cb_dpos_margin(pops, pot, cellcfg, states.box)
        s_min = jnp.min(states.box / nls.ref_box, axis=-1)
        room = jnp.maximum(nls.rlist * s_min - pot.rc, 0.0)
        dpos_eff = jnp.minimum(states.dpos,
                               jnp.minimum(0.5 * margin_cb,
                                           room / (2.0 * sq3)))
        dpos_eff = jnp.maximum(dpos_eff, 0.0)
        diag = diag | jnp.where(jnp.any(margin_cb <= 0.0),
                                CB.DIAG_CB_INVALID, 0).astype(jnp.int32)
        budget = sq3 * dpos_eff        # one move per particle per pass

        def pass_body(carry, p):
            states, nls, aux = carry
            nls = _maybe_rebuild(pot, states, nls, budget, 1.0)
            pkeys = jax.vmap(jax.random.fold_in, (0, None))(kpass, p)
            states, aux = vpass(pot, table, states, nls, aux,
                                dpos_eff, pkeys)
            return (states, nls, aux), None

        (states, nls, aux), _ = jax.lax.scan(
            pass_body, (states, nls, aux), jnp.arange(npasses))

        if nvol or nhmc:
            # tail budget: worst isotropic shrink over nvol volume trials
            # + a 4-sigma bound on HMC leapfrog drift
            vol = jnp.prod(states.box, axis=-1)
            shrink = jnp.min(jnp.cbrt(
                jnp.maximum(vol - nvol * states.dvol, 0.01 * vol) / vol))
            b_hmc = 0.0
            if nhmc:
                b_hmc = (nstps * states.dt
                         * 4.0 * jnp.sqrt(kb * states.temp / mass))
            nls = _maybe_rebuild(pot, states, nls, b_hmc, shrink)
            states, aux = vtail(pot, states, nls, aux, kvol, khmc)
            if nhmc:
                # retroactive exactness check: flag if the trajectory
                # drifted past the budget (final eval may have been stale)
                viol = jax.vmap(
                    lambda nl, p, b: NB.needs_rebuild(nl, p, b, pot.rc)
                )(nls, states.pos, states.box)
                diag = diag | jnp.where(jnp.any(viol), CB.DIAG_NL_STALE,
                                        0).astype(jnp.int32)

        diag = diag | jnp.where(jnp.any(nls.overflow), CB.DIAG_NL_OVERFLOW,
                                0).astype(jnp.int32)
        states = states.replace(sweep=states.sweep + 1)
        return states, nls, aux, diag

    def block_core(pot, table, states, nls, aux, diag):
        (states, nls, aux, diag), _ = jax.lax.scan(
            lambda c, _: (sweep_step(pot, table, c), None),
            (states, nls, aux, diag), None, length=mod)
        # kill f32 drift of the incremental accumulators at every record;
        # also refresh the potential cache (EAM rho) from scratch
        pe, vir = jax.vmap(
            lambda p, b, nl: pops.total(pot, p, b, nl)
        )(states.pos, states.box, nls)
        states = states.replace(pe=pe, virial=vir)
        if pops.kind != "pair":
            aux = jax.vmap(
                lambda p, b, nl: pops.init_aux(pot, p, b, nl)
            )(states.pos, states.box, nls)
        rec = jax.vmap(lambda s: make_record(s, kb))(states)
        states = jax.vmap(
            lambda s: adapt_step_sizes(s, targets=targets, factor=factor)
        )(states)
        frame = (states.pos, states.box) if write_traj else ()
        return states, nls, aux, diag, rec, frame

    if not exchange:
        def run(states, nls, aux, pot, table):
            def record_block(carry, _):
                states, nls, aux, diag = carry
                states, nls, aux, diag, rec, frame = block_core(
                    pot, table, states, nls, aux, diag)
                return (states, nls, aux, diag), (rec, frame)

            diag0 = jnp.zeros((), jnp.int32)
            (states, nls, aux, diag), (recs, frames) = jax.lax.scan(
                record_block, (states, nls, aux, diag0), None,
                length=nrecords)
            return (states, nls, aux, recs,
                    (frames if write_traj else None), diag)

        if jit:
            run = jax.jit(run, donate_argnums=(0, 1, 2))
        return run

    assert npress * ntemp > 0

    def run_x(states, nls, aux, slot_of, xkey, pot, table, t_grid, p_grid):
        def record_block_x(carry, event_idx):
            states, nls, aux, slot_of, diag = carry
            states, nls, aux, diag, rec, frame = block_core(
                pot, table, states, nls, aux, diag)
            slots_at_record = slot_of  # attribution BEFORE the exchange
            # fold the global sweep counter in so chained chunks/restarts
            # never replay the same exchange-uniform sequence (ADVICE.md r1)
            ekey = jax.random.fold_in(jax.random.fold_in(xkey, event_idx),
                                      states.sweep[0])
            states, slot_of, n_acc = tempering.exchange_event(
                states, slot_of, ekey, event_idx, npress, ntemp,
                t_grid, p_grid, kb, p2e)
            return (states, nls, aux, slot_of, diag), (rec, frame,
                                                       slots_at_record,
                                                       n_acc)

        diag0 = jnp.zeros((), jnp.int32)
        carry = (states, nls, aux, slot_of, diag0)
        (states, nls, aux, slot_of, diag), (recs, frames, hist, xacc) = \
            jax.lax.scan(record_block_x, carry,
                         jnp.arange(nrecords), length=nrecords)
        return (states, nls, aux, slot_of, recs,
                (frames if write_traj else None), hist, xacc, diag)

    if jit:
        run_x = jax.jit(run_x, donate_argnums=(0, 1, 2))
    return run_x


def build_ensemble_nl(pot, states, skin: float,
                      capacity: Optional[int] = None, box_host=None):
    """Build per-replica neighbor lists for a batched MCState.

    NOTE: a run fn compiled by make_ensemble_run_fn is specialized to one
    static capacity. When rebuilding lists for an existing run fn, pass the
    capacity it was compiled with — auto-suggestion depends on the current
    density and may differ. Auto-suggestion needs ``box_host`` (a HOST-side
    numpy box) when states live on a TPU: reading states.box back would
    poison the process (docs/tpu_notes.md §0).
    """
    if capacity is None:
        if box_host is None:
            box_host = np.asarray(states.box)[0]  # CPU-resident states only
        capacity = NB.suggest_capacity(states.pos.shape[-2],
                                       box_host, pot.rc_host + skin)
    rlist = pot.rc + skin
    return jax.vmap(lambda p, b: NB.build(p, b, rlist, capacity))(
        states.pos, states.box), capacity


def build_ensemble_aux(pot, states, nls):
    """Per-replica potential cache: EAM density (R,N); empty for pair."""
    pops = PO.ops_for(pot)
    return jax.vmap(lambda p, b, nl: pops.init_aux(pot, p, b, nl))(
        states.pos, states.box, nls)
