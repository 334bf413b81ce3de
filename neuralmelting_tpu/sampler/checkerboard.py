# cache-bust v2
"""High-throughput checkerboard NPT sweep (SURVEY.md §7 Phase 3).

One sweep = ``npasses`` passes + ``nvol`` volume trials (+ optional HMC).
Each pass:
  1. random fractional grid shift + random color order (ergodicity),
  2. bin particles into cells (one XLA sort),
  3. for each of the stride^3 colors, in order: pick one random particle per
     occupied active cell, propose displacements, evaluate batched dE from
     the neighbor list, accept/reject in parallel (exact — see ops/cells.py).

A particle moves at most once per *pass* (binning is frozen within a pass
and refreshed between passes), so the stride-separation independence
argument holds for every substep. ``npasses ~= ceil(N / ncells)`` restores
the serial meaning of a sweep (~N attempts). Same stationary distribution
as the serial path — validated statistically in tests/test_checkerboard.py —
but ~cells-per-color-way batched per kernel instead of one trial per device
round trip (the reference's per-move LAMMPS round trip, SURVEY.md §3.1).

Neighbor lists are rebuilt *globally* (all replicas) when any replica's
staleness invariant trips; the decision lives outside vmap so `lax.cond`
executes only the taken branch (see parallel/ensemble.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from neuralmelting_tpu.ops import cells as cells_ops
from neuralmelting_tpu.ops import neighbors as NB
from neuralmelting_tpu.ops import potential_ops as PO
from neuralmelting_tpu.sampler import moves

# diagnostic bit flags
DIAG_NL_OVERFLOW = 1
DIAG_CB_INVALID = 2
DIAG_NL_STALE = 8  # an energy was evaluated while the skin invariant held
                   # no longer (only HMC trajectories can do this now)

_SQ3 = 3.0 ** 0.5  # max |displacement| per move = sqrt(3) * dpos


def nl_backend(pops: "PO.PotentialOps", nl: NB.NeighborList
               ) -> moves.EnergyBackend:
    return moves.EnergyBackend(
        total=lambda pot, pos, box: pops.total(pot, pos, box, nl),
        delta_move=lambda pot, pos, box, i, ri: NB.delta_move_single(
            pot, pos, box, nl, i, ri),
        forces=lambda pot, pos, box: pops.forces(pot, pos, box, nl),
    )


def default_npasses(natoms: int, cellcfg: cells_ops.CellConfig) -> int:
    """Passes per sweep so one sweep attempts ~N moves."""
    return max(1, int(np.ceil(natoms / cellcfg.ncells_total)))


def cb_dpos_margin(pops, pot, cellcfg: cells_ops.CellConfig, box):
    """Checkerboard-independence margin: dpos may be at most half of
    (stride-1)*min(cell width) - interaction range. <=0 means the grid no
    longer supports exact parallel acceptance (DIAG_CB_INVALID)."""
    n0, n1, n2 = (int(c) for c in cellcfg.ncell)
    w_min = jnp.minimum(box[..., 0] / n0,
                        jnp.minimum(box[..., 1] / n1, box[..., 2] / n2))
    return (cellcfg.stride - 1) * w_min - pops.range_factor * pot.rc


def make_cb_pass_fn(kb, cellcfg: cells_ops.CellConfig, style: str = "pair"):
    """Build ``pass_fn(pot, active_table, state, nl, aux, dpos_eff, pkey) ->
    (state, aux)`` — ONE checkerboard pass (each particle trialed at most
    once). The caller owns the neighbor-list staleness discipline: the list
    must satisfy rc + 2*(maxdisp + sqrt(3)*dpos_eff) <= rlist*min(s) on
    entry so every in-pass trial energy is exact (parallel/ensemble.py
    checks this between passes; ADVICE.md r1).

    ``pot`` and ``active_table`` ((ncolors, M) i32 from cellcfg) must be
    traced arguments, never baked constants (docs/tpu_notes.md §1); the
    factory closes over Python statics only. ``aux`` is potential-specific
    cached state (EAM density cache; empty array for pair potentials);
    ``style`` selects the PotentialOps at build time.
    """
    pops = PO.ops_for_style(style)
    ncolors = cellcfg.ncolors
    ncell = cellcfg.ncell

    def one_pass(pot, active_table, state, nl, aux, dpos_eff, pkey):
        n = state.pos.shape[0]
        ksh, kperm, kcol = jax.random.split(pkey, 3)
        shift = jax.random.uniform(ksh, (3,), jnp.float32)
        order = jax.random.permutation(kperm, ncolors)
        subkeys = jax.random.split(kcol, ncolors)
        sorted_ids, start, count = cells_ops.bin_particles(
            state.pos, state.box, ncell, shift)
        beta = 1.0 / (kb * state.temp)

        def substep(carry, inputs):
            st, aux = carry
            color, skey = inputs
            # promise_in_bounds on every hot gather: see docs/tpu_notes.md §5
            cells = active_table.at[color].get(mode="promise_in_bounds")
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
            old_r = st.pos.at[pid].get(mode="promise_in_bounds")
            new_r = old_r + disp
            de, dw, payload = pops.delta(pot, st.pos, st.box, nl, aux,
                                         pid, new_r)
            ln_u = jnp.log(jax.random.uniform(kacc, (m,), jnp.float32,
                                              1e-38, 1.0))
            acc = valid & (ln_u < -beta * de)

            new_wr = moves.wrap_pos(new_r, st.box)
            delta = jnp.where(acc[:, None], new_wr - old_r, 0.0)
            # duplicate pids only occur for empty cells (delta == 0): add is
            # scatter-safe where set would race
            pos = st.pos.at[pid].add(delta, mode="promise_in_bounds")
            aux2 = pops.apply_accept(aux, pid, acc, payload)
            return (st.replace(
                pos=pos,
                pe=st.pe + jnp.sum(jnp.where(acc, de, 0.0)),
                virial=st.virial + jnp.sum(jnp.where(acc, dw, 0.0)),
                nap=st.nap + jnp.sum(acc).astype(jnp.int32),
                ntp=st.ntp + jnp.sum(valid).astype(jnp.int32),
            ), aux2), None

        (state, aux), _ = jax.lax.scan(substep, (state, aux),
                                       (order, subkeys))
        return state, aux

    return one_pass


def make_cb_tail_fn(kb, p2e, nvol: int = 1, nhmc: int = 0,
                    nstps: int = 16, mass: float = 1.0,
                    style: str = "pair"):
    """Build ``tail(pot, state, nl, aux, kvol, khmc) -> (state, aux)`` —
    the whole-configuration moves ending a sweep (volume trials + HMC).
    Caller must ensure the list covers the worst volume shrink and the HMC
    drift budget (see parallel/ensemble.py)."""
    pops = PO.ops_for_style(style)

    def tail(pot, state, nl, aux, kvol, khmc):
        backend = nl_backend(pops, nl)
        for v in range(nvol):
            state = moves.volume_move(pot, kb, p2e, backend, state,
                                      jax.random.fold_in(kvol, v))
        for h in range(nhmc):
            state = moves.hmc_move(pot, kb, backend, state,
                                   jax.random.fold_in(khmc, h), nstps, mass)
        if (nvol or nhmc) and pops.kind != "pair":
            # whole-configuration moves invalidate the density cache
            aux = pops.init_aux(pot, state.pos, state.box, nl)
        return state, aux

    return tail


def make_cb_sweep_fn(kb, p2e, cellcfg: cells_ops.CellConfig,
                     npasses: int = 1, nvol: int = 1, nhmc: int = 0,
                     nstps: int = 16, mass: float = 1.0,
                     style: str = "pair"):
    """Build ``sweep(pot, active_table, state, nl, aux) ->
    (state, aux, diag)`` — npasses passes + the tail as one unit.

    NOTE: this composition checks nothing between passes; the production
    ensemble runner (parallel/ensemble.py) drives pass/tail separately with
    per-pass staleness checks and rebuilds. Use this form only where the
    skin is known to cover a full sweep's accumulation (small dpos) or for
    compile checks.
    """
    pops = PO.ops_for_style(style)
    one_pass = make_cb_pass_fn(kb, cellcfg, style)
    tail = make_cb_tail_fn(kb, p2e, nvol, nhmc, nstps, mass, style)

    def sweep(pot, active_table, state, nl, aux):
        key, kpass, kvol, khmc = jax.random.split(state.key, 4)
        state = state.replace(key=key)

        margin = cb_dpos_margin(pops, pot, cellcfg, state.box)
        dpos_eff = jnp.minimum(state.dpos, 0.5 * margin)
        diag = jnp.where(margin <= 0.0, DIAG_CB_INVALID, 0).astype(jnp.int32)

        def pass_body(carry, pk):
            st, aux = carry
            return one_pass(pot, active_table, st, nl, aux, dpos_eff,
                            pk), None

        (state, aux), _ = jax.lax.scan(pass_body, (state, aux),
                                       jax.random.split(kpass, npasses))
        state, aux = tail(pot, state, nl, aux, kvol, khmc)
        diag = diag | jnp.where(nl.overflow, DIAG_NL_OVERFLOW,
                                0).astype(jnp.int32)
        return state.replace(sweep=state.sweep + 1), aux, diag

    return sweep
