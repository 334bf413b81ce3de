"""Production LJ engine on the whole-sweep Pallas cell-MC kernel.

Same Markov chain family as sampler/dense.py (NPT Metropolis: position
sweeps + volume trials + parallel tempering), third compute mapping: the
position hot loop runs entirely inside ops/pallas/cellmc.py's kernel
(cell-confined checkerboard moves, VMEM-resident state), and volume
trials / record thermodynamics come from the half-stencil pair-sum kernel
(make_total_fn) — E(s*x) is exact from the same pass via LJ's homogeneous
scaling, so no ghost images and no second energy pass are ever built.

State between records lives in SLABS (binned positions, shifted frame);
``states.pos`` is synced and energies/virials refreshed drift-free at
every record point, exactly the dense engine's contract. MID-BLOCK
``states.virial`` is intentionally stale (VERDICT r2 weak #4): the volume
trial pins it to the pre-rescale total (LJ) or leaves it at the last
record value (EAM, where dW would cost a derivative pass) — exact values
exist only at record points, which is all the thermo writers consume (see
the MCState contract in sampler/state.py). Tempering swaps
slot identities (temp/press/step sizes) between replicas while
configurations stay put, so sampler/tempering.py works unchanged.

Known deviations from the serial chain (same stationary distribution):
  * per-atom trial counts within a sweep depend on cell occupancy (one
    trial per occupied slot-group per color step);
  * in-cell confinement rejects proposals that leave the mover's cell
    (Anderson et al. arXiv:1509.04692 — balance holds exactly);
  * grid-shift rebinning advances one axis per sweep.

Reference parity: replaces lammps_remcmc.py's gen_sample hot loop
(SURVEY.md §3.1). LJ/pair-only; EAM rides the gather engine.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from neuralmelting_tpu.ops.pallas import cellmc as CM
from neuralmelting_tpu.sampler import tempering
from neuralmelting_tpu.sampler.adapt import adapt_step_sizes
from neuralmelting_tpu.sampler.driver import make_record

DIAG_CB_INVALID = 2          # cell width fell below rc (box shrank)
DIAG_SLAB_OVERFLOW = 4       # a cell exceeded its K slot capacity
DIAG_SHIFT_DESYNC = 16       # sharded runner: grid shift diverged across
                             # shards (rebin draw was shard-folded)


def default_ncyc(geom) -> int:
    """Checkerboard cycles per sweep so attempted moves ~= natoms.

    Attempts per cycle ~ ncells * min(nsub, mean occupancy): the
    consecutive-pick mover selection trials min(cnt, J) distinct movers
    per cell per color step. Mean occupancy natoms/ncells is ~30 at
    every (P,T) — NPT volume moves rescale the cell WIDTH, not the
    per-cell population — so the clamp only bites configs whose J
    exceeds occupancy (tiny test systems), where ncells*nsub would
    overstate attempts and under-provision cycles per sweep."""
    occ = max(1, geom.natoms // geom.ncells)
    per_cycle = geom.ncells * min(geom.nsub, occ)
    return max(1, int(round(geom.natoms / per_cycle)))


def pick_rt(r: int) -> int:
    """Lane-tile width for R replicas (kernel grid = ceil(R/rt) programs;
    a non-multiple R — e.g. a 12x12 grid, R=144 — runs with the last tile
    lane-padded by the kernel wrappers: dead lanes carry INVALID coords
    and zero counts, so they trial nothing)."""
    return r if r <= 128 else 128


def build_slabs(geom, states, shift):
    """Bin an ensemble's positions -> (x, y, z, ids, count, overflow),
    all leading-R. Off the hot path (chunk start / restart)."""
    def one(pos, box):
        return CM.bin_initial(geom, pos, box, shift)
    x, y, z, ids, count, over = jax.vmap(one)(states.pos, states.box)
    return (x, y, z, ids), count, jnp.any(over)


def make_cellmc_run_fn(kb, p2e, geom, mod: int, nrecords: int,
                       ncyc: int = 4, nvol: int = 1,
                       targets=(0.5, 0.5, 0.5), factor: float = 1.0625,
                       write_traj: bool = False, exchange: bool = False,
                       npress: int = 0, ntemp: int = 0, rt: int = 0,
                       interpret=None, adapt: bool = True,
                       jit: bool = True, vol_every: int = 1,
                       rebin_every: int = 1, axis_name=None,
                       fast_recip: bool = False):
    """Build the jitted chunk runner.

    Without exchange:
      ``run(states, slabs, count, shift, pot, cell_tabs, seed0) ->
        (states, slabs, count, shift, recs, frames, diag)``
    With exchange:
      ``run(states, slabs, count, shift, slot_of, xkey, pot, cell_tabs,
        t_grid, p_grid, seed0) -> (..., slot_of, recs, frames, hist,
        xacc, diag)``

    ``slabs`` = (x, y, z, ids) leading-R; ``count`` (R, C); ``shift`` (3,)
    fractional grid shift; ``cell_tabs`` (3, C*K) static per-row cell
    coords (CM.geom_tables — passed in, never baked); ``seed0`` (2,) i32
    base key for the in-kernel threefry stream (fold chunk index in so
    chained chunks never replay randomness).

    ``vol_every``/``rebin_every``: run the ``nvol`` volume trials (a full
    half-stencil total pass each) only on sweeps where
    ``sweep % vol_every == 0``, and the grid-shift rebin sort only where
    ``sweep % rebin_every == 0``. Both are valid Markov-chain schedules
    (the move mix is a deterministic, state-independent function of the
    sweep counter, so each composed sweep kernel leaves the NPT
    distribution invariant); the reference's stochastic per-move mix at
    pvol ~ 0.02-0.03 attempts FEWER volume trials per position trial than
    even vol_every=4 does at N=4096 (SURVEY.md §2.4). Amortizes the two
    dominant non-sweep costs the round-2 profile identified.

    ``axis_name``: set when the run fn executes INSIDE ``shard_map`` over
    a replica mesh axis (parallel/cellmc_sharded.py). Decorrelates the
    per-shard random streams (kernel seeds and volume-trial draws get the
    shard index folded in) while keeping the grid-shift rebin draw shared
    so the (3,) ``shift`` bookkeeping stays replicated across shards.
    """
    if interpret is None:      # compiled Pallas exists only on TPU
        interpret = jax.default_backend() != "tpu"
    nxf, nyf, nzf = (float(n) for n in geom.ncell)   # Python scalars:
    # never bake array constants into traced code (docs/tpu_notes.md §1)
    deltas = [0.9 / n for n in geom.ncell]

    def get_kernels(r):
        rtt = rt or pick_rt(r)
        return (CM.make_sweep_fn(geom, ncyc=ncyc, interpret=interpret,
                                 rt=rtt, fast_recip=fast_recip),
                CM.make_total_fn(geom, interpret=interpret, rt=rtt),
                -(-r // rtt))   # ceil: last tile lane-padded

    def params_of(states):
        wvec = jnp.stack([states.box[:, 0] / nxf, states.box[:, 1] / nyf,
                          states.box[:, 2] / nzf], axis=1)   # (R, 3)
        wmin = jnp.min(wvec, axis=-1)
        dpos_eff = jnp.minimum(states.dpos, 0.45 * wmin)
        return jnp.stack([
            1.0 / (kb * states.temp), dpos_eff,
            wvec[:, 0], wvec[:, 1], wvec[:, 2],
            states.box[:, 0], states.box[:, 1], states.box[:, 2]])

    def totals(total, slabs, params, pot, scale):
        x, y, z, _ = slabs
        sums = total((x.T, y.T, z.T), params, _pot3(pot), scale[None, :])
        return CM.combine_sums(sums, pot.eps, scale)      # e, w, e_scaled

    def _pot3(pot):
        return jnp.stack([pot.eps, pot.sigma, pot.rc,
                          jnp.zeros_like(pot.eps)])

    def sweep_step(carry, pot, cell_tabs, seed0, kernels):
        sweep_k, total_k, ntiles = kernels
        states, slabs, count, shift, key, diag = carry
        x, y, z, ids = slabs
        r = x.shape[0]

        # geometry validity: every cell must still cover rc
        wmin = jnp.min(jnp.stack([states.box[:, 0] / nxf,
                                  states.box[:, 1] / nyf,
                                  states.box[:, 2] / nzf]))
        diag = diag | jnp.where(wmin < pot.rc, DIAG_CB_INVALID,
                                0).astype(jnp.int32)

        # --- position sweep (in-kernel) ------------------------------
        sweep_id = states.sweep[0]
        if axis_name is not None:   # decorrelate shards (see docstring)
            shard_ix = jax.lax.axis_index(axis_name).astype(jnp.int32)
        else:
            shard_ix = np.int32(0)
        seeds = jnp.stack([
            seed0[0] + sweep_id * np.int32(ntiles)
            + jnp.arange(ntiles, dtype=jnp.int32),
            jnp.broadcast_to(seed0[1] + shard_ix, (ntiles,))], axis=1)
        params = params_of(states)
        (xt, yt, zt), st = sweep_k((x.T, y.T, z.T), count.T, params,
                                   _pot3(pot), seeds)
        x, y, z = xt.T, yt.T, zt.T
        states = states.replace(
            pe=states.pe + st[0],
            nap=states.nap + st[1].astype(jnp.int32),
            ntp=states.ntp + st[2].astype(jnp.int32))

        # --- volume trials (total kernel; E(s x) exact) --------------
        key, kvol, kreb = jax.random.split(key, 3)
        if axis_name is not None:   # per-shard volume draws; shared kreb
            kvol = jax.random.fold_in(kvol, jax.lax.axis_index(axis_name))

        def vol_block(x, y, z, states):
            for v in range(nvol):
                kv = jax.random.fold_in(kvol, v)
                ku, ka = jax.random.split(kv)
                u = jax.random.uniform(ku, (r,), jnp.float32)
                vol = jnp.prod(states.box, axis=-1)
                dv = states.dvol * (2.0 * u - 1.0)
                ok = (vol + dv) > 0.0
                s = jnp.where(ok,
                              jnp.cbrt(jnp.maximum(vol + dv, 1e-6) / vol),
                              1.0)
                # params must track the box accepted by an earlier trial
                # in this loop (stale Lx/Ly/Lz would corrupt the periodic
                # wrap correction in the stencil — ADVICE.md r2)
                params = params_of(states)
                e_old, w_old, e_new = totals(total_k, (x, y, z, ids),
                                             params, pot, s)
                beta = 1.0 / (kb * states.temp)
                n = geom.natoms
                ln_acc = (-beta * ((e_new - e_old)
                                   + states.press * p2e * dv)
                          + n * jnp.log(jnp.where(ok, (vol + dv) / vol,
                                                  1.0)))
                ln_u = jnp.log(jax.random.uniform(ka, (r,), jnp.float32,
                                                  1e-38, 1.0))
                acc = ok & (ln_u < ln_acc)
                sca = jnp.where(acc, s, 1.0)[:, None]
                x = jnp.where(x < 0.1 * CM.INVALID, x * sca, x)
                y = jnp.where(y < 0.1 * CM.INVALID, y * sca, y)
                z = jnp.where(z < 0.1 * CM.INVALID, z * sca, z)
                states = states.replace(
                    box=states.box * sca,
                    pe=jnp.where(acc, e_new, e_old),  # drift-free both
                    virial=w_old,
                    nav=states.nav + acc.astype(jnp.int32),
                    ntv=states.ntv + 1)
            return x, y, z, states

        if nvol > 0 and vol_every > 1:
            x, y, z, states = jax.lax.cond(
                jax.lax.rem(sweep_id, np.int32(vol_every)) == 0,
                vol_block, lambda x, y, z, s_: (x, y, z, s_),
                x, y, z, states)
        elif nvol > 0:
            x, y, z, states = vol_block(x, y, z, states)

        # --- grid-shift rebinning (one axis per rebin event) ---------
        du = jax.random.uniform(kreb, (), jnp.float32)

        def rebin_block(x, y, z, ids, count, shift):
            # axis rotates per EVENT (sweep // rebin_every), not per
            # sweep — a per-sweep axis with rebin_every % 3 == 0 would
            # pin one axis forever
            axis_t = jax.lax.rem(
                jax.lax.div(sweep_id, np.int32(rebin_every)), 3)

            def do_axis(a):
                def f():
                    delta = du * deltas[a]
                    slabs2, count2, over = CM.rebin_axis(
                        geom, (x, y, z, ids), count, states.box, delta, a,
                        cell_tab=cell_tabs[a])
                    return slabs2, count2, over, shift.at[a].add(delta)
                return f

            return jax.lax.switch(axis_t,
                                  [do_axis(0), do_axis(1), do_axis(2)])

        if rebin_every > 1:
            (x, y, z, ids), count, over, shift = jax.lax.cond(
                jax.lax.rem(sweep_id, np.int32(rebin_every)) == 0,
                rebin_block,
                lambda x, y, z, ids, count, shift:
                    ((x, y, z, ids), count, jnp.zeros((), jnp.bool_),
                     shift),
                x, y, z, ids, count, shift)
        else:
            (x, y, z, ids), count, over, shift = rebin_block(
                x, y, z, ids, count, shift)
        diag = diag | jnp.where(over, DIAG_SLAB_OVERFLOW,
                                0).astype(jnp.int32)

        states = states.replace(sweep=states.sweep + 1)
        return (states, (x, y, z, ids), count, shift, key, diag)

    def block_core(carry, pot, cell_tabs, seed0, kernels):
        carry, _ = jax.lax.scan(
            lambda c, _: (sweep_step(c, pot, cell_tabs, seed0, kernels),
                          None),
            carry, None, length=mod)
        states, slabs, count, shift, key, diag = carry
        # drift-free energetics + position sync at the record point
        r = states.temp.shape[0]
        params = params_of(states)
        e, w, _ = totals(kernels[1], slabs, params, pot,
                         jnp.ones((r,), jnp.float32))
        pos = jax.vmap(lambda s4x, s4y, s4z, s4i, b: CM.unbin(
            geom, (s4x, s4y, s4z, s4i), b, shift))(
            slabs[0], slabs[1], slabs[2], slabs[3], states.box)
        states = states.replace(pe=e, virial=w, pos=pos)
        rec = jax.vmap(lambda s: make_record(s, kb))(states)
        if adapt:    # bench runs keep counters accumulating instead
            states = jax.vmap(
                lambda s: adapt_step_sizes(s, targets=targets,
                                           factor=factor))(states)
        frame = (states.pos, states.box) if write_traj else ()
        return (states, slabs, count, shift, key, diag), rec, frame

    if not exchange:
        def run(states, slabs, count, shift, pot, cell_tabs, seed0):
            kernels = get_kernels(states.temp.shape[0])
            # fold the sweep counter in: chained chunks reuse seed0, and
            # the volume/rebin stream must not replay across chunks
            key0 = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(0), seed0[0]),
                states.sweep[0])

            def record_block(carry, _):
                carry, rec, frame = block_core(carry, pot, cell_tabs,
                                               seed0, kernels)
                return carry, (rec, frame)

            diag0 = jnp.zeros((), jnp.int32)
            carry = (states, slabs, count, shift, key0, diag0)
            carry, (recs, frames) = jax.lax.scan(record_block, carry,
                                                 None, length=nrecords)
            states, slabs, count, shift, _, diag = carry
            return (states, slabs, count, shift, recs,
                    (frames if write_traj else None), diag)

        return jax.jit(run, donate_argnums=(0, 1, 2)) if jit else run

    assert npress * ntemp > 0

    def run_x(states, slabs, count, shift, slot_of, xkey, pot, cell_tabs,
              t_grid, p_grid, seed0):
        kernels = get_kernels(states.temp.shape[0])
        key0 = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(1), seed0[0]),
            states.sweep[0])   # no volume/rebin replay across chunks

        def record_block_x(carry, event_idx):
            (states, slabs, count, shift, key, slot_of, diag) = carry
            inner = (states, slabs, count, shift, key, diag)
            inner, rec, frame = block_core(inner, pot, cell_tabs,
                                           seed0, kernels)
            states, slabs, count, shift, key, diag = inner
            slots_at_record = slot_of
            # fold the sweep counter in: chained chunks/restarts never
            # replay exchange randomness (ADVICE.md r1)
            ekey = jax.random.fold_in(jax.random.fold_in(xkey, event_idx),
                                      states.sweep[0])
            states, slot_of, n_acc = tempering.exchange_event(
                states, slot_of, ekey, event_idx, npress, ntemp,
                t_grid, p_grid, kb, p2e)
            return (states, slabs, count, shift, key, slot_of, diag), \
                (rec, frame, slots_at_record, n_acc)

        diag0 = jnp.zeros((), jnp.int32)
        carry = (states, slabs, count, shift, key0, slot_of, diag0)
        carry, (recs, frames, hist, xacc) = jax.lax.scan(
            record_block_x, carry, jnp.arange(nrecords), length=nrecords)
        states, slabs, count, shift, _, slot_of, diag = carry
        return (states, slabs, count, shift, slot_of, recs,
                (frames if write_traj else None), hist, xacc, diag)

    return jax.jit(run_x, donate_argnums=(0, 1, 2)) if jit else run_x


def refresh_energies(geom, states, slabs, pot, rt: int = 0,
                     interpret=None):
    """Exact pe/virial for an ensemble from its slabs (setup/restart)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = states.temp.shape[0]
    rtt = rt or pick_rt(r)
    total = CM.make_total_fn(geom, interpret=interpret, rt=rtt)
    nxf, nyf, nzf = (float(n) for n in geom.ncell)
    wvec = jnp.stack([states.box[:, 0] / nxf, states.box[:, 1] / nyf,
                      states.box[:, 2] / nzf], axis=1)
    params = jnp.stack([
        jnp.ones((r,), jnp.float32), jnp.ones((r,), jnp.float32),
        wvec[:, 0], wvec[:, 1], wvec[:, 2],
        states.box[:, 0], states.box[:, 1], states.box[:, 2]])
    pot3 = jnp.stack([pot.eps, pot.sigma, pot.rc, jnp.zeros_like(pot.eps)])
    x, y, z, _ = slabs
    sums = total((x.T, y.T, z.T), params, pot3,
                 jnp.ones((1, r), jnp.float32))
    e, w, _ = CM.combine_sums(sums, pot.eps, jnp.ones((r,), jnp.float32))
    return states.replace(pe=e, virial=w)


# ---------------------------------------------------------------------------
# EAM engine (stride-3 cells, density slab, Chebyshev potential)
# ---------------------------------------------------------------------------

def eam_pack(cheb):
    """Kernel transport for an EAMCheb: (scal (8,), series6, nser)."""
    scal = jnp.stack([cheb.rc * cheb.rc, cheb.u_lo, cheb.u_hi, cheb.q_lo,
                      jnp.sqrt(cheb.rho_hi), cheb.rho_hi,
                      0.0 * cheb.rc, 0.0 * cheb.rc])
    series = (cheb.c_phi, cheb.c_phid, cheb.c_rho, cheb.c_rhod,
              cheb.c_f, cheb.c_fd)
    nser = (cheb.c_phi.shape[0], cheb.c_rho.shape[0], cheb.c_f.shape[0])
    return scal, series, nser


def make_eam_run_fn(kb, p2e, geom, nser, mod: int, nrecords: int,
                    ncyc: int = 8, nvol: int = 1,
                    targets=(0.5, 0.5, 0.5), factor: float = 1.0625,
                    write_traj: bool = False, exchange: bool = False,
                    npress: int = 0, ntemp: int = 0, rt: int = 0,
                    interpret=None, adapt: bool = True, jit: bool = True,
                    vol_every: int = 1, rebin_every: int = 1,
                    axis_name=None):
    """EAM twin of make_cellmc_run_fn (see its docstring): slabs carry a
    per-slot density cache; volume trials cost one full EAM energy pass
    at the proposed scale (no homogeneous-scaling shortcut); records
    refresh pe/virial AND the density cache from scratch.

    Signature (exchange=True):
      ``run(states, slabs5, count, shift, slot_of, xkey, scal, series6,
        cell_tabs, t_grid, p_grid, seed0)`` with slabs5 =
      (x, y, z, ids, rho) leading-R.
    Without exchange (single-(P,T) debugging runs and the shard_map
    inner block of parallel/cellmc_sharded.py):
      ``run(states, slabs5, count, shift, scal, series6, cell_tabs,
        seed0) -> (states, slabs5, count, shift, recs, frames, diag)``.

    ``axis_name``: exactly the LJ twin's contract — per-shard kernel
    seeds and volume draws get the shard index folded in, while the
    grid-shift rebin draw stays shared so ``shift`` remains replicated.
    """
    from neuralmelting_tpu.ops.pallas import cellmc_eam as CE

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nxf, nyf, nzf = (float(n) for n in geom.ncell)
    deltas = [0.9 / n for n in geom.ncell]

    def get_kernels(r):
        rtt = rt or pick_rt(r)
        return (CE.make_eam_sweep_fn(geom, ncyc=ncyc, nser=nser,
                                     interpret=interpret, rt=rtt),
                CE.make_eam_total_fn(geom, nser, with_virial=True,
                                     interpret=interpret, rt=rtt),
                CE.make_eam_total_fn(geom, nser, with_virial=False,
                                     interpret=interpret, rt=rtt),
                -(-r // rtt))   # ceil: last tile lane-padded

    def params_of(states):
        wvec = jnp.stack([states.box[:, 0] / nxf, states.box[:, 1] / nyf,
                          states.box[:, 2] / nzf], axis=1)
        wmin = jnp.min(wvec, axis=-1)
        dpos_eff = jnp.minimum(states.dpos, 0.45 * wmin)
        return jnp.stack([
            1.0 / (kb * states.temp), dpos_eff,
            wvec[:, 0], wvec[:, 1], wvec[:, 2],
            states.box[:, 0], states.box[:, 1], states.box[:, 2]])

    def sweep_step(carry, scal, series, cell_tabs, seed0, kernels):
        sweep_k, total_w, total_e, ntiles = kernels
        states, slabs, count, shift, key, diag = carry
        x, y, z, ids, rho = slabs
        r = x.shape[0]

        wmin = jnp.min(jnp.stack([states.box[:, 0] / nxf,
                                  states.box[:, 1] / nyf,
                                  states.box[:, 2] / nzf]))
        # geometry validity: cells must cover rc (scal[0] = rc^2)
        diag = diag | jnp.where(wmin * wmin < scal[0], DIAG_CB_INVALID,
                                0).astype(jnp.int32)

        sweep_id = states.sweep[0]
        if axis_name is not None:   # decorrelate shards (see docstring)
            shard_ix = jax.lax.axis_index(axis_name).astype(jnp.int32)
            word1 = jnp.broadcast_to(seed0[1] + shard_ix, (ntiles,))
        else:
            # keep the single-device trace byte-identical to round 3 so
            # the on-chip compile cache stays warm (no +0 add node)
            word1 = jnp.broadcast_to(seed0[1], (ntiles,))
        seeds = jnp.stack([
            seed0[0] + sweep_id * np.int32(ntiles)
            + jnp.arange(ntiles, dtype=jnp.int32), word1], axis=1)
        params = params_of(states)
        (xt, yt, zt, rt_), st = sweep_k(
            (x.T, y.T, z.T, rho.T), count.T, params, scal,
            (series[0], series[2], series[4]), seeds)
        x, y, z, rho = xt.T, yt.T, zt.T, rt_.T
        states = states.replace(
            pe=states.pe + st[0],
            nap=states.nap + st[1].astype(jnp.int32),
            ntp=states.ntp + st[2].astype(jnp.int32))

        key, kvol, kreb = jax.random.split(key, 3)
        if axis_name is not None:   # per-shard volume draws; shared kreb
            kvol = jax.random.fold_in(kvol, jax.lax.axis_index(axis_name))

        def vol_block(x, y, z, rho, states):
            # exact e_old: one s=1 pass refreshes pe AND the density
            # cache before the trials — the incrementally accumulated
            # states.pe carries f32 drift since the last record, which
            # the LJ path's same-pass e_old deliberately avoids
            # (VERDICT.md r2 weak #3)
            params = params_of(states)
            st1, rho1 = total_e((x.T, y.T, z.T), params, scal, series,
                                jnp.ones((1, r), jnp.float32))
            rho = rho1.T
            states = states.replace(pe=st1[0])
            for v in range(nvol):
                kv = jax.random.fold_in(kvol, v)
                ku, ka = jax.random.split(kv)
                u = jax.random.uniform(ku, (r,), jnp.float32)
                vol = jnp.prod(states.box, axis=-1)
                dv = states.dvol * (2.0 * u - 1.0)
                ok = (vol + dv) > 0.0
                s = jnp.where(ok,
                              jnp.cbrt(jnp.maximum(vol + dv, 1e-6) / vol),
                              1.0)
                # recompute per trial: an accepted earlier trial rescaled
                # the box, and the stencil's +-L wrap correction reads
                # params (ADVICE.md r2)
                params = params_of(states)
                stt, rho_s = total_e((x.T, y.T, z.T), params, scal,
                                     series, s[None, :])
                e_new = stt[0]
                beta = 1.0 / (kb * states.temp)
                n = geom.natoms
                ln_acc = (-beta * ((e_new - states.pe)
                                   + states.press * p2e * dv)
                          + n * jnp.log(jnp.where(ok, (vol + dv) / vol,
                                                  1.0)))
                ln_u = jnp.log(jax.random.uniform(ka, (r,), jnp.float32,
                                                  1e-38, 1.0))
                acc = ok & (ln_u < ln_acc)
                sca = jnp.where(acc, s, 1.0)[:, None]
                x = jnp.where(x < 0.1 * CM.INVALID, x * sca, x)
                y = jnp.where(y < 0.1 * CM.INVALID, y * sca, y)
                z = jnp.where(z < 0.1 * CM.INVALID, z * sca, z)
                rho = jnp.where(acc[:, None], rho_s.T, rho)
                states = states.replace(
                    box=states.box * sca,
                    pe=jnp.where(acc, e_new, states.pe),
                    nav=states.nav + acc.astype(jnp.int32),
                    ntv=states.ntv + 1)
            return x, y, z, rho, states

        if nvol > 0 and vol_every > 1:
            x, y, z, rho, states = jax.lax.cond(
                jax.lax.rem(sweep_id, np.int32(vol_every)) == 0,
                vol_block,
                lambda x, y, z, rho, s_: (x, y, z, rho, s_),
                x, y, z, rho, states)
        elif nvol > 0:
            x, y, z, rho, states = vol_block(x, y, z, rho, states)

        du = jax.random.uniform(kreb, (), jnp.float32)

        def rebin_block(x, y, z, ids, rho, count, shift):
            axis_t = jax.lax.rem(
                jax.lax.div(sweep_id, np.int32(rebin_every)), 3)

            def do_axis(a):
                def f():
                    delta = du * deltas[a]
                    slabs2, count2, over, (rho2,) = CM.rebin_axis(
                        geom, (x, y, z, ids), count, states.box, delta, a,
                        cell_tab=cell_tabs[a], extras=(rho,))
                    return slabs2, rho2, count2, over, \
                        shift.at[a].add(delta)
                return f

            return jax.lax.switch(axis_t,
                                  [do_axis(0), do_axis(1), do_axis(2)])

        if rebin_every > 1:
            (x, y, z, ids), rho, count, over, shift = jax.lax.cond(
                jax.lax.rem(sweep_id, np.int32(rebin_every)) == 0,
                rebin_block,
                lambda x, y, z, ids, rho, count, shift:
                    ((x, y, z, ids), rho, count,
                     jnp.zeros((), jnp.bool_), shift),
                x, y, z, ids, rho, count, shift)
        else:
            (x, y, z, ids), rho, count, over, shift = rebin_block(
                x, y, z, ids, rho, count, shift)
        diag = diag | jnp.where(over, DIAG_SLAB_OVERFLOW,
                                0).astype(jnp.int32)
        states = states.replace(sweep=states.sweep + 1)
        return (states, (x, y, z, ids, rho), count, shift, key, diag)

    def block_core(carry, scal, series, cell_tabs, seed0, kernels):
        carry, _ = jax.lax.scan(
            lambda c, _: (sweep_step(c, scal, series, cell_tabs, seed0,
                                     kernels), None),
            carry, None, length=mod)
        states, slabs, count, shift, key, diag = carry
        x, y, z, ids, rho = slabs
        r = states.temp.shape[0]
        params = params_of(states)
        stt, rho_f = kernels[1]((x.T, y.T, z.T), params, scal, series,
                                jnp.ones((1, r), jnp.float32))
        rho = rho_f.T
        pos = jax.vmap(lambda sx, sy, sz, si, b: CM.unbin(
            geom, (sx, sy, sz, si), b, shift))(x, y, z, ids, states.box)
        states = states.replace(pe=stt[0], virial=stt[1], pos=pos)
        rec = jax.vmap(lambda s_: make_record(s_, kb))(states)
        if adapt:
            states = jax.vmap(
                lambda s_: adapt_step_sizes(s_, targets=targets,
                                            factor=factor))(states)
        frame = (states.pos, states.box) if write_traj else ()
        return (states, (x, y, z, ids, rho), count, shift, key, diag),             rec, frame

    if not exchange:
        # single-(P,T)-grid-free mode: mirrors the LJ twin so the EAM
        # production engine supports the simplest debugging/validation
        # runs AND serves as the shard_map inner block (VERDICT r3 weak
        # #5 / missing #3b)
        def run(states, slabs5, count, shift, scal, series, cell_tabs,
                seed0):
            kernels = get_kernels(states.temp.shape[0])
            key0 = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(2), seed0[0]),
                states.sweep[0])   # no volume/rebin replay across chunks

            def record_block(carry, _):
                carry, rec, frame = block_core(carry, scal, series,
                                               cell_tabs, seed0, kernels)
                return carry, (rec, frame)

            diag0 = jnp.zeros((), jnp.int32)
            carry = (states, slabs5, count, shift, key0, diag0)
            carry, (recs, frames) = jax.lax.scan(record_block, carry,
                                                 None, length=nrecords)
            states, slabs, count, shift, _, diag = carry
            return (states, slabs, count, shift, recs,
                    (frames if write_traj else None), diag)

        return jax.jit(run, donate_argnums=(0, 1, 2)) if jit else run

    assert npress * ntemp > 0, "EAM exchange runner needs the (P,T) grid"

    def run_x(states, slabs5, count, shift, slot_of, xkey, scal, series,
              cell_tabs, t_grid, p_grid, seed0):
        kernels = get_kernels(states.temp.shape[0])
        key0 = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(2), seed0[0]),
            states.sweep[0])   # no volume/rebin replay across chunks

        def record_block_x(carry, event_idx):
            (states, slabs, count, shift, key, slot_of, diag) = carry
            inner = (states, slabs, count, shift, key, diag)
            inner, rec, frame = block_core(inner, scal, series, cell_tabs,
                                           seed0, kernels)
            states, slabs, count, shift, key, diag = inner
            slots_at_record = slot_of
            ekey = jax.random.fold_in(jax.random.fold_in(xkey, event_idx),
                                      states.sweep[0])
            states, slot_of, n_acc = tempering.exchange_event(
                states, slot_of, ekey, event_idx, npress, ntemp,
                t_grid, p_grid, kb, p2e)
            return (states, slabs, count, shift, key, slot_of, diag),                 (rec, frame, slots_at_record, n_acc)

        diag0 = jnp.zeros((), jnp.int32)
        carry = (states, slabs5, count, shift, key0, slot_of, diag0)
        carry, (recs, frames, hist, xacc) = jax.lax.scan(
            record_block_x, carry, jnp.arange(nrecords), length=nrecords)
        states, slabs, count, shift, _, slot_of, diag = carry
        return (states, slabs, count, shift, slot_of, recs,
                (frames if write_traj else None), hist, xacc, diag)

    return jax.jit(run_x, donate_argnums=(0, 1, 2)) if jit else run_x


def eam_initial_rho(geom, states, slabs, scal, series, nser, rt: int = 0,
                    interpret=None):
    """Density slab + exact pe/virial for a fresh EAM ensemble."""
    from neuralmelting_tpu.ops.pallas import cellmc_eam as CE

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = states.temp.shape[0]
    rtt = rt or pick_rt(r)
    total = CE.make_eam_total_fn(geom, nser, with_virial=True,
                                 interpret=interpret, rt=rtt)
    nxf, nyf, nzf = (float(n) for n in geom.ncell)
    wvec = jnp.stack([states.box[:, 0] / nxf, states.box[:, 1] / nyf,
                      states.box[:, 2] / nzf], axis=1)
    params = jnp.stack([
        jnp.ones((r,), jnp.float32), jnp.ones((r,), jnp.float32),
        wvec[:, 0], wvec[:, 1], wvec[:, 2],
        states.box[:, 0], states.box[:, 1], states.box[:, 2]])
    x, y, z, ids = slabs
    stt, rho = total((x.T, y.T, z.T), params, scal, series,
                     jnp.ones((1, r), jnp.float32))
    return states.replace(pe=stt[0], virial=stt[1]), rho.T
