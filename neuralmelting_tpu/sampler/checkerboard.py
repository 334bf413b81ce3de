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
from neuralmelting_tpu.sampler import moves

# diagnostic bit flags
DIAG_NL_OVERFLOW = 1
DIAG_CB_INVALID = 2


def nl_backend(nl: NB.NeighborList) -> moves.EnergyBackend:
    return moves.EnergyBackend(
        total=lambda pot, pos, box: NB.pair_energy_virial(pot, pos, box, nl),
        delta_move=lambda pot, pos, box, i, ri: NB.delta_move_single(
            pot, pos, box, nl, i, ri),
        forces=lambda pot, pos, box: NB.forces(pot, pos, box, nl),
    )


def default_npasses(natoms: int, cellcfg: cells_ops.CellConfig) -> int:
    """Passes per sweep so one sweep attempts ~N moves."""
    return max(1, int(np.ceil(natoms / cellcfg.ncells_total)))


def make_cb_sweep_fn(pot, kb, p2e, cellcfg: cells_ops.CellConfig,
                     npasses: int = 1, nvol: int = 1, nhmc: int = 0,
                     nstps: int = 16, mass: float = 1.0):
    """Build ``sweep(state, nl) -> (state, diag)`` for one checkerboard sweep."""
    active_table = jnp.asarray(cellcfg.active_table)      # (ncolors, M)
    ncolors = cellcfg.ncolors
    ncell = cellcfg.ncell
    stride = cellcfg.stride

    def one_pass(state, nl, dpos_eff, pkey):
        n = state.pos.shape[0]
        ksh, kperm, kcol = jax.random.split(pkey, 3)
        shift = jax.random.uniform(ksh, (3,), jnp.float32)
        order = jax.random.permutation(kperm, ncolors)
        subkeys = jax.random.split(kcol, ncolors)
        sorted_ids, start, count = cells_ops.bin_particles(
            state.pos, state.box, ncell, shift)
        beta = 1.0 / (kb * state.temp)

        def substep(st, inputs):
            color, skey = inputs
            cells = active_table[color]                    # (M,)
            cnt = count[cells]
            st0 = start[cells]
            kpick, kdisp, kacc = jax.random.split(skey, 3)
            m = cells.shape[0]
            u = jax.random.uniform(kpick, (m,), jnp.float32)
            pick = jnp.minimum((u * cnt).astype(jnp.int32),
                               jnp.maximum(cnt - 1, 0))
            pid = sorted_ids[jnp.clip(st0 + pick, 0, n - 1)]
            valid = cnt > 0

            disp = jax.random.uniform(kdisp, (m, 3), jnp.float32,
                                      minval=-dpos_eff, maxval=dpos_eff)
            old_r = st.pos[pid]
            new_r = old_r + disp
            de, dw = NB.delta_moves(pot, st.pos, st.box, nl, pid, new_r)
            ln_u = jnp.log(jax.random.uniform(kacc, (m,), jnp.float32,
                                              1e-38, 1.0))
            acc = valid & (ln_u < -beta * de)

            new_wr = moves.wrap_pos(new_r, st.box)
            delta = jnp.where(acc[:, None], new_wr - old_r, 0.0)
            # duplicate pids only occur for empty cells (delta == 0): add is
            # scatter-safe where set would race
            pos = st.pos.at[pid].add(delta)
            return st.replace(
                pos=pos,
                pe=st.pe + jnp.sum(jnp.where(acc, de, 0.0)),
                virial=st.virial + jnp.sum(jnp.where(acc, dw, 0.0)),
                nap=st.nap + jnp.sum(acc).astype(jnp.int32),
                ntp=st.ntp + jnp.sum(valid).astype(jnp.int32),
            ), None

        state, _ = jax.lax.scan(substep, state, (order, subkeys))
        return state

    def sweep(state, nl):
        key, kpass, kvol, khmc = jax.random.split(state.key, 4)
        state = state.replace(key=key)

        # dynamic safety clamp: (stride-1)*w >= rc + 2*dpos
        w_min = jnp.min(state.box / jnp.asarray(ncell, jnp.float32))
        margin = (stride - 1) * w_min - pot.rc
        dpos_eff = jnp.minimum(state.dpos, 0.5 * margin)
        diag = jnp.where(margin <= 0.0, DIAG_CB_INVALID, 0).astype(jnp.int32)

        def pass_body(st, pk):
            return one_pass(st, nl, dpos_eff, pk), None

        state, _ = jax.lax.scan(pass_body, state,
                                jax.random.split(kpass, npasses))

        backend = nl_backend(nl)
        for v in range(nvol):
            state = moves.volume_move(pot, kb, p2e, backend, state,
                                      jax.random.fold_in(kvol, v))
        for h in range(nhmc):
            state = moves.hmc_move(pot, kb, backend, state,
                                   jax.random.fold_in(khmc, h), nstps, mass)

        diag = diag | jnp.where(nl.overflow, DIAG_NL_OVERFLOW, 0).astype(jnp.int32)
        return state.replace(sweep=state.sweep + 1), diag

    return sweep
