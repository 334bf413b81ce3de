"""Gather-free (dense/MXU) checkerboard NPT sampler for pair potentials.

Same Markov chain as sampler/checkerboard.py, different compute mapping:
trial energies come from batched (A,4)@(4,Next) matmuls against a
ghost-extended position set (ops/dense_delta.py, ops/ghosts.py) instead of
neighbor-list gathers. On this TPU stack gathers run ~0.06 G elem/s while
the MXU sustains tens of TFLOP/s (docs/tpu_notes.md), which makes brute
candidates cheaper than indexed neighbors by >10x.

Ghost-coverage discipline (ADVICE.md r1): the run fn checks staleness
BETWEEN passes with a one-move budget (rc + 2*(maxdisp + sqrt(3)*dpos) <=
shell) and before volume trials with the worst-shrink budget, and clamps
dpos so a fresh rebuild always buys at least one legal pass. The composed
make_dense_sweep_fn keeps the old per-sweep granularity for compile checks.

LJ/pair-only (EAM rides the gather path); used by bench.py and selectable
for production LJ runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neuralmelting_tpu.ops import cells as cells_ops
from neuralmelting_tpu.ops import dense_delta as DD
from neuralmelting_tpu.ops import ghosts as GH
from neuralmelting_tpu.sampler import tempering
from neuralmelting_tpu.sampler.adapt import adapt_step_sizes
from neuralmelting_tpu.sampler.checkerboard import DIAG_CB_INVALID
from neuralmelting_tpu.sampler.driver import make_record

DIAG_GHOST_OVERFLOW = 4

_SQ3 = 3.0 ** 0.5


def dense_dpos_margin(pot, cellcfg, box):
    """Checkerboard-independence margin (pair range only)."""
    n0, n1, n2 = (int(c) for c in cellcfg.ncell)
    w_min = jnp.minimum(box[..., 0] / n0,
                        jnp.minimum(box[..., 1] / n1, box[..., 2] / n2))
    return (cellcfg.stride - 1) * w_min - pot.rc


def make_dense_pass_fn(kb, cellcfg):
    """Build ``pass_fn(pot, table, state, gm, dpos_eff, pkey) ->
    (state, gm)`` — one checkerboard pass on the ghost-extended set.

    ``state.pos`` is NOT maintained during passes — gm.pos_ext[:N]
    (unwrapped) is authoritative; sync happens in the run fn's record step.
    On entry the ghosts must satisfy rc + 2*(maxdisp + sqrt(3)*dpos_eff)
    <= gm.shell so every in-pass trial energy is exact.
    """
    ncolors = cellcfg.ncolors
    ncell = cellcfg.ncell

    def one_pass(pot, table, state, gm, dpos_eff, pkey):
        n = state.pos.shape[0]
        ksh, kcol = jax.random.split(pkey, 2)
        shift = jax.random.uniform(ksh, (3,), jnp.float32)
        subkeys = jax.random.split(kcol, ncolors)
        pos = gm.pos_ext[:n]
        posw = pos - state.box * jnp.floor(pos / state.box)
        sorted_ids, start, count = cells_ops.bin_particles(
            posw, state.box, ncell, shift)
        beta = 1.0 / (kb * state.temp)

        def substep(carry, inputs):
            st, gm = carry
            color, skey = inputs
            cells = table.at[color].get(mode="promise_in_bounds")
            cnt = count.at[cells].get(mode="promise_in_bounds")
            st0 = start.at[cells].get(mode="promise_in_bounds")
            kpick, kdisp, kacc = jax.random.split(skey, 3)
            m = cells.shape[0]
            u = jax.random.uniform(kpick, (m,), jnp.float32)
            pick = jnp.minimum((u * cnt).astype(jnp.int32),
                               jnp.maximum(cnt - 1, 0))
            pid = sorted_ids.at[jnp.clip(st0 + pick, 0, n - 1)].get(
                mode="promise_in_bounds")
            valid = cnt > 0

            disp = jax.random.uniform(kdisp, (m, 3), jnp.float32,
                                      minval=-dpos_eff, maxval=dpos_eff)
            old_r = gm.pos_ext.at[pid].get(mode="promise_in_bounds")
            new_r = old_r + disp
            de, dw = DD.delta_moves_dense(pot, gm, pid, old_r, new_r)
            ln_u = jnp.log(jax.random.uniform(kacc, (m,), jnp.float32,
                                              1e-38, 1.0))
            acc = valid & (ln_u < -beta * de)
            delta = jnp.where(acc[:, None], disp, 0.0)
            gm = GH.apply_moves(gm, st.box, pid, delta)
            st = st.replace(
                pe=st.pe + jnp.sum(jnp.where(acc, de, 0.0)),
                virial=st.virial + jnp.sum(jnp.where(acc, dw, 0.0)),
                nap=st.nap + jnp.sum(acc).astype(jnp.int32),
                ntp=st.ntp + jnp.sum(valid).astype(jnp.int32),
            )
            return (st, gm), None

        (state, gm), _ = jax.lax.scan(substep, (state, gm),
                                      (jnp.arange(ncolors), subkeys))
        return state, gm

    return one_pass


def make_dense_vol_fn(kb, p2e):
    """Build ``vol(pot, state, gm, key) -> (state, gm)`` — one isotropic
    NPT volume trial on the ghost-extended set. Caller must pre-check
    coverage for the worst shrink (GH.needs_rebuild(..., shrink=...))."""

    def volume_move(pot, state, gm, key):
        n = state.pos.shape[0]
        kd, ka = jax.random.split(key, 2)
        u = jax.random.uniform(kd, (), jnp.float32)
        vol = jnp.prod(state.box)
        dv = state.dvol * (2.0 * u - 1.0)
        vol_new = vol + dv
        ok = vol_new > 0.0
        s = jnp.where(ok, jnp.cbrt(vol_new / vol), 1.0)
        gm_s = GH.scaled(gm, s)
        pe_new, vir_new = DD.total_energy_virial_dense(pot, gm_s, n)
        beta = 1.0 / (kb * state.temp)
        ln_acc = (-beta * ((pe_new - state.pe) + state.press * p2e * dv)
                  + n * jnp.log(jnp.where(ok, vol_new / vol, 1.0)))
        ln_u = jnp.log(jax.random.uniform(ka, (), jnp.float32, 1e-38, 1.0))
        acc = ok & (ln_u < ln_acc)
        gm = jax.tree.map(lambda a, b: jnp.where(acc, a, b), gm_s, gm)
        return state.replace(
            box=jnp.where(acc, state.box * s, state.box),
            pe=jnp.where(acc, pe_new, state.pe),
            virial=jnp.where(acc, vir_new, state.virial),
            nav=state.nav + acc.astype(jnp.int32),
            ntv=state.ntv + 1,
        ), gm

    return volume_move


def make_dense_sweep_fn(kb, p2e, cellcfg, npasses: int = 1, nvol: int = 1):
    """Build ``sweep(pot, table, state, gm) -> (state, gm, diag)``.

    Legacy per-sweep composition (no staleness checks between passes) —
    kept for compile checks; production runs go through make_dense_run_fn,
    which owns the per-pass coverage discipline.
    """
    one_pass = make_dense_pass_fn(kb, cellcfg)
    volume_move = make_dense_vol_fn(kb, p2e)

    def sweep(pot, table, state, gm):
        key, kpass, kvol = jax.random.split(state.key, 3)
        state = state.replace(key=key)
        margin = dense_dpos_margin(pot, cellcfg, state.box)
        room = jnp.maximum(gm.shell - pot.rc, 0.0)
        dpos_eff = jnp.minimum(state.dpos,
                               jnp.minimum(0.5 * margin,
                                           room / (2.0 * _SQ3)))
        diag = jnp.where(margin <= 0.0, DIAG_CB_INVALID, 0).astype(jnp.int32)

        def pass_body(carry, pk):
            st, gm = carry
            return one_pass(pot, table, st, gm, dpos_eff, pk), None

        (state, gm), _ = jax.lax.scan(pass_body, (state, gm),
                                      jax.random.split(kpass, npasses))
        for v in range(nvol):
            state, gm = volume_move(pot, state, gm,
                                    jax.random.fold_in(kvol, v))
        diag = diag | jnp.where(gm.overflow, DIAG_GHOST_OVERFLOW,
                                0).astype(jnp.int32)
        return state.replace(sweep=state.sweep + 1), gm, diag

    return sweep


def make_dense_run_fn(kb, p2e, cellcfg, shell: float, gcap: int,
                      mod: int, nrecords: int, npasses: int = 1,
                      nvol: int = 1, targets=(0.5, 0.5, 0.5),
                      factor: float = 1.0625, write_traj: bool = False,
                      exchange: bool = False, npress: int = 0,
                      ntemp: int = 0, jit: bool = True):
    """Vmapped dense-ensemble runner (bench + production LJ).

    Without exchange:
      ``run(states, gms, pot, table) -> (states, gms, recs, frames, diag)``
    With exchange (parallel tempering; configurations stay put, slot
    identities move — sampler/tempering.py works unchanged because all
    slot-attached fields live in MCState):
      ``run(states, gms, slot_of, xkey, pot, table, t_grid, p_grid) ->
        (states, gms, slot_of, recs, frames, hist, xacc, diag)``
    """
    one_pass = make_dense_pass_fn(kb, cellcfg)
    volume_move = make_dense_vol_fn(kb, p2e)
    vpass = jax.vmap(one_pass, in_axes=(None, None, 0, 0, 0, 0))
    vvol = jax.vmap(volume_move, in_axes=(None, 0, 0, 0))

    def _rebuild_if(pot, states, gms, budget, shrink):
        stale = jax.vmap(
            lambda g, bu: GH.needs_rebuild(g, pot.rc, budget=bu,
                                           shrink=shrink)
        )(gms, jnp.broadcast_to(budget, states.temp.shape))
        return jax.lax.cond(
            jnp.any(stale),
            lambda: jax.vmap(
                lambda g, b: GH.rewrap_rebuild(g, b, shell, gcap)
            )(gms, states.box),
            lambda: gms)

    def sweep_step(pot, table, carry):
        states, gms, diag = carry
        ks = jax.vmap(lambda k: jax.random.split(k, 3))(states.key)
        states = states.replace(key=ks[:, 0])
        kpass, kvol = ks[:, 1], ks[:, 2]

        margin_cb = dense_dpos_margin(pot, cellcfg, states.box)
        room = jnp.maximum(gms.shell - pot.rc, 0.0)
        dpos_eff = jnp.minimum(states.dpos,
                               jnp.minimum(0.5 * margin_cb,
                                           room / (2.0 * _SQ3)))
        dpos_eff = jnp.maximum(dpos_eff, 0.0)
        diag = diag | jnp.where(jnp.any(margin_cb <= 0.0),
                                DIAG_CB_INVALID, 0).astype(jnp.int32)
        budget = _SQ3 * dpos_eff

        def pass_body(carry, p):
            states, gms = carry
            gms = _rebuild_if(pot, states, gms, budget, 1.0)
            pkeys = jax.vmap(jax.random.fold_in, (0, None))(kpass, p)
            states, gms = vpass(pot, table, states, gms, dpos_eff, pkeys)
            return (states, gms), None

        (states, gms), _ = jax.lax.scan(pass_body, (states, gms),
                                        jnp.arange(npasses))

        if nvol:
            vol = jnp.prod(states.box, axis=-1)
            shrink = jnp.min(jnp.cbrt(
                jnp.maximum(vol - nvol * states.dvol, 0.01 * vol) / vol))
            gms = _rebuild_if(pot, states, gms, 0.0, shrink)
            for v in range(nvol):
                kv = jax.vmap(jax.random.fold_in, (0, None))(kvol, v)
                states, gms = vvol(pot, states, gms, kv)

        diag = diag | jnp.where(jnp.any(gms.overflow), DIAG_GHOST_OVERFLOW,
                                0).astype(jnp.int32)
        states = states.replace(sweep=states.sweep + 1)
        return states, gms, diag

    def block_core(pot, table, states, gms, diag):
        n = states.pos.shape[-2]
        (states, gms, diag), _ = jax.lax.scan(
            lambda c, _: (sweep_step(pot, table, c), None),
            (states, gms, diag), None, length=mod)
        # sync positions + drift-free energies at record points
        pe, vir = jax.vmap(
            lambda g: DD.total_energy_virial_dense(pot, g, n))(gms)
        posw = jax.vmap(
            lambda g, b: (lambda p: p - b * jnp.floor(p / b))(
                g.pos_ext[:n]))(gms, states.box)
        states = states.replace(pe=pe, virial=vir, pos=posw)
        rec = jax.vmap(lambda s: make_record(s, kb))(states)
        states = jax.vmap(
            lambda s: adapt_step_sizes(s, targets=targets,
                                       factor=factor))(states)
        frame = (states.pos, states.box) if write_traj else ()
        return states, gms, diag, rec, frame

    if not exchange:
        def run(states, gms, pot, table):
            def record_block(carry, _):
                states, gms, diag = carry
                states, gms, diag, rec, frame = block_core(
                    pot, table, states, gms, diag)
                return (states, gms, diag), (rec, frame)

            diag0 = jnp.zeros((), jnp.int32)
            (states, gms, diag), (recs, frames) = jax.lax.scan(
                record_block, (states, gms, diag0), None, length=nrecords)
            return states, gms, recs, (frames if write_traj else None), diag

        if jit:
            run = jax.jit(run, donate_argnums=(0, 1))
        return run

    assert npress * ntemp > 0

    def run_x(states, gms, slot_of, xkey, pot, table, t_grid, p_grid):
        def record_block_x(carry, event_idx):
            states, gms, slot_of, diag = carry
            states, gms, diag, rec, frame = block_core(
                pot, table, states, gms, diag)
            slots_at_record = slot_of
            # fold the global sweep counter in so chained chunks/restarts
            # never replay the same exchange randomness (ADVICE.md r1)
            ekey = jax.random.fold_in(jax.random.fold_in(xkey, event_idx),
                                      states.sweep[0])
            states, slot_of, n_acc = tempering.exchange_event(
                states, slot_of, ekey, event_idx, npress, ntemp,
                t_grid, p_grid, kb, p2e)
            return (states, gms, slot_of, diag), (rec, frame,
                                                  slots_at_record, n_acc)

        diag0 = jnp.zeros((), jnp.int32)
        (states, gms, slot_of, diag), (recs, frames, hist, xacc) = \
            jax.lax.scan(record_block_x, (states, gms, slot_of, diag0),
                         jnp.arange(nrecords), length=nrecords)
        return (states, gms, slot_of, recs,
                (frames if write_traj else None), hist, xacc, diag)

    if jit:
        run_x = jax.jit(run_x, donate_argnums=(0, 1))
    return run_x


def build_ensemble_ghosts(states, shell: float, gcap: int):
    return jax.vmap(lambda p, b: GH.build(p, b, shell, gcap))(
        states.pos, states.box)
