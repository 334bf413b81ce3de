"""Host-side run orchestration: config -> ensemble -> chunks -> files.

The library equivalent of the reference's lammps_remcmc.py __main__
(SURVEY.md §3.1): builds the potential and replica ensemble from a
RunConfig, advances it in jitted chunks with tempering, and writes the
reference-style per-(P,T)-slot .thrm/.traj files plus a restartable
checkpoint. The fused never-leaves-HBM path is neuralmelting_tpu.pipeline.
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu import units
from neuralmelting_tpu.config import ELEMENTS, RunConfig, grids
from neuralmelting_tpu.io import checkpoint as ckpt
from neuralmelting_tpu.io import naming, thermo, traj
from neuralmelting_tpu.models import eam as eam_mod
from neuralmelting_tpu.models import eam_gen
from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops import cells as cells_ops
from neuralmelting_tpu.ops import ghosts as GH
from neuralmelting_tpu.ops import potential_ops as PO
from neuralmelting_tpu.parallel import ensemble as ENS
from neuralmelting_tpu.ops.pallas import cellmc as CMK
from neuralmelting_tpu.sampler import cellmc as SC
from neuralmelting_tpu.sampler import dense as DS
from neuralmelting_tpu.sampler.driver import ThermoRecord
from neuralmelting_tpu.sampler.state import ensemble_init


@dataclasses.dataclass
class RunSetup:
    cfg: RunConfig
    pot: object
    style: str
    us: units.UnitSystem
    mass: float
    press: np.ndarray          # (npress,)
    temp: np.ndarray           # (ntemp,)
    t_grid: jnp.ndarray        # (R,) slot temps
    p_grid: jnp.ndarray        # (R,) slot pressures
    states: object
    nls: object
    aux: object
    cap: int
    cellcfg: object
    table: jnp.ndarray
    slot_of: jnp.ndarray
    natoms: int
    engine: str = "gather"     # "gather" | "dense" | "cellmc" (pair-only)
    gms: object = None              # GhostMap ensemble (dense engine)
    shell: float = 0.0
    gcap: int = 0
    # cellmc engine state (slab-resident positions)
    geom: object = None
    slabs: object = None            # (x, y, z, ids) leading-R
    slab_count: object = None       # (R, C) i32
    shift: object = None            # (3,) fractional grid shift
    cell_tabs: object = None        # (3, C*K) i32 static row tables


def build_potential(cfg: RunConfig, setfl: Optional[str] = None):
    el = ELEMENTS[cfg.element]
    spec = el.potential
    if spec.style == "lj/cut":
        return LJCut.create(spec.eps, spec.sigma, spec.rc), "pair"
    path = setfl or spec.setfl
    if path is None:
        # no table supplied: generate the synthetic Al table
        path = os.path.join(tempfile.gettempdir(),
                            "nm_synthetic_Al.eam.alloy")
        if not os.path.exists(path):
            eam_gen.write_setfl(path)
    return eam_mod.load(path), "eam"


def setup_run(cfg: RunConfig, setfl: Optional[str] = None,
              stride: int = 0, engine: str = "gather") -> RunSetup:
    """engine="dense" uses the gather-free MXU sampler (pair potentials
    only; ~7x faster on this TPU stack — sampler/dense.py)."""
    el = ELEMENTS[cfg.element]
    us = units.get(el.units)
    if cfg.phmc > 0 and engine in ("dense", "cellmc"):
        raise ValueError(
            f"HMC (phmc={cfg.phmc}) is not offered on the '{engine}' "
            "engine — use --engine gather (or serial), or drop --phmc. "
            "Deliberate exclusion: README.md 'Known deviations'.")
    pot, style = build_potential(cfg, setfl)
    press, temp = grids(cfg)
    npress, ntemp = len(press), len(temp)
    r = npress * ntemp
    t_grid = jnp.asarray(np.tile(temp, npress), jnp.float32)
    p_grid = jnp.asarray(np.repeat(press, ntemp), jnp.float32)

    pos, box = make_supercell(el.lattice, el.lat_const, cfg.ncells)
    n = len(pos)
    states = ensemble_init(
        pot, pos, box, cfg.seed, t_grid, p_grid,
        dpos0=cfg.dpos0, dvol_frac0=cfg.dvol0, dt0=el.dt,
        energy_fn=lambda p_, a, b: (jnp.zeros(()), jnp.zeros(())))

    if stride <= 0:
        stride = 4 if style == "pair" else 2
    cellcfg = None
    if engine != "cellmc":
        # legacy checkerboard cell table (gather/dense engines only; the
        # cellmc engine builds its own stride-2/3 slab geometry below)
        rng = eam_mod.interaction_range(pot)
        cellcfg = cells_ops.make_cell_config(box, rng, stride=stride,
                                             dpos_cap=0.25)
    cap = cfg.max_neighbors if cfg.max_neighbors > 0 else None
    nls = aux = None
    if engine != "cellmc":
        # slab engine needs no neighbor lists; building them for a
        # 32x32-grid ensemble would alone exceed HBM
        nls, cap = ENS.build_ensemble_nl(pot, states, skin=cfg.skin,
                                         capacity=cap, box_host=box)
        aux = ENS.build_ensemble_aux(pot, states, nls)
        pops = PO.ops_for_style(style)
        pe, vir = jax.vmap(lambda p, b, nl: pops.total(pot, p, b, nl))(
            states.pos, states.box, nls)
        states = states.replace(pe=pe, virial=vir)
    gms, shell, gcap = None, 0.0, 0
    geom = slabs = slab_count = shift = cell_tabs = None
    if engine == "dense":
        if style != "pair":
            raise ValueError("dense engine supports pair potentials only")
        shell = pot.rc_host + cfg.skin
        gcap = GH.suggest_gcap(n, box, shell)
        gms = DS.build_ensemble_ghosts(states, shell, gcap)
    elif engine == "cellmc":
        shift = jnp.zeros((3,), jnp.float32)
        if style == "pair":
            geom = CMK.make_geom(box, pot.rc_host, n)
            geom, slabs, slab_count, over = _bin_tightened(geom, states,
                                                           shift)
            cell_tabs = jnp.asarray(CMK.geom_tables(geom))
            states = SC.refresh_energies(geom, states, slabs, pot)
        else:
            # EAM: Chebyshev form + stride-3 cells (2w >= 2rc for exact
            # parallel acceptance of the density-coupled moves)
            from neuralmelting_tpu.models import eam_cheb as ECH
            cheb = ECH.from_spline(pot)
            geom = CMK.make_geom(box, cheb.rc_host, n, nsub=1, stride=3)
            geom, slabs, slab_count, over = _bin_tightened(geom, states,
                                                           shift)
            scal, series, nser = SC.eam_pack(cheb)
            states, rho = SC.eam_initial_rho(geom, states, slabs, scal,
                                             series, nser)
            slabs = slabs + (rho,)
            pot = cheb                    # the sampled potential
            cell_tabs = jnp.asarray(CMK.geom_tables(geom))
        if bool(over):
            raise RuntimeError("cell slot capacity overflow at setup; "
                               "raise kcap")
    slot_of = jnp.arange(r, dtype=jnp.int32)
    if jax.process_count() > 1:
        # multi-controller run (parallel/mesh.init_multihost): every
        # process built the identical full-R ensemble above; convert it
        # to replica-sharded GLOBAL arrays so ONE jitted program spans
        # all hosts' devices and each host samples only its shard.
        # GSPMD partitions the gather engine transparently; the cellmc
        # engine routes through the explicit shard_map wrapper
        # (parallel/cellmc_sharded.py) in run_sampling. ``shift`` and
        # ``cell_tabs`` stay host-local (replicated by value across
        # processes, exactly like pot/t_grid/p_grid).
        if engine == "dense":
            raise NotImplementedError(
                "multi-host runner supports the gather and cellmc "
                "engines; the dense/MXU engine is single-process "
                "(superseded by cellmc for production scale)")
        from neuralmelting_tpu.parallel.mesh import (make_replica_mesh,
                                                     to_global)
        gmesh = make_replica_mesh()
        if engine == "cellmc":
            states, slabs, slab_count, slot_of = to_global(
                gmesh, (states, slabs, slab_count, slot_of))
        else:
            states, nls, aux, slot_of = to_global(
                gmesh, (states, nls, aux, slot_of))
    return RunSetup(cfg=cfg, pot=pot, style=style, us=us, mass=el.mass,
                    press=press, temp=temp, t_grid=t_grid, p_grid=p_grid,
                    states=states, nls=nls, aux=aux, cap=cap,
                    cellcfg=cellcfg,
                    table=(jnp.asarray(cellcfg.active_table)
                           if cellcfg is not None else None),
                    slot_of=slot_of, natoms=n,
                    engine=engine, gms=gms, shell=shell, gcap=gcap,
                    geom=geom, slabs=slabs, slab_count=slab_count,
                    shift=shift, cell_tabs=cell_tabs)


def restore_setup(setup: RunSetup, checkpoint_path: str) -> RunSetup:
    """Resume from a checkpoint: replaces the ensemble state AND rebuilds
    every position-derived structure (neighbor lists, EAM density cache,
    ghost images) from the restored configuration — a restart that kept
    lattice-built caches would run the first sweeps with wrong energetics.
    Warns when the stored config differs from the current one."""
    import warnings

    from neuralmelting_tpu.io import checkpoint as ckpt_mod

    if jax.process_count() > 1:
        # checkpoint writes are gated to process 0 (run_sampling); a
        # restart that reads before the writer finished sees a torn
        # file — barrier so every process observes the completed write
        # (the save is synchronous on process 0 before it reaches here)
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("nm_restore_checkpoint")
    states, slot_of, cfg_json, _ = ckpt_mod.load(checkpoint_path)
    if cfg_json not in ("{}", setup.cfg.to_json()):
        warnings.warn("checkpoint was written with a different RunConfig; "
                      "proceeding with the current flags")
    nls, aux = setup.nls, setup.aux
    if setup.engine != "cellmc":
        nls, _ = ENS.build_ensemble_nl(setup.pot, states,
                                       skin=setup.cfg.skin,
                                       capacity=setup.cap)
        aux = ENS.build_ensemble_aux(setup.pot, states, nls)
        pops = PO.ops_for_style(setup.style)
        pe, vir = jax.vmap(
            lambda p, b, nl: pops.total(setup.pot, p, b, nl)
        )(states.pos, states.box, nls)
        states = states.replace(pe=pe, virial=vir)
    gms = setup.gms
    if setup.engine == "dense":
        gms = DS.build_ensemble_ghosts(states, setup.shell, setup.gcap)
    extra = {}
    setup = dataclasses.replace(setup, states=states, slot_of=slot_of,
                                nls=nls, aux=aux, gms=gms)
    if setup.engine == "cellmc":
        # rebin the restored ensemble; a checkpoint whose NPT-compressed
        # boxes exceed the current kcap (silently clipping would drop
        # atoms) is absorbed by _rebind_cellmc's grow-and-retry, which
        # raises if capacity can't be found. (Runs on host-local full-R
        # arrays — the checkpoint loads identically on every process —
        # so the pallas refresh kernels stay un-partitioned.)
        setup = _rebind_cellmc(setup, setup.geom)
    if jax.process_count() > 1:
        # re-apply the global replica sharding: the checkpoint loads as
        # identical host-local full-R arrays on every process (exactly
        # to_global's contract), and without this conversion each process
        # would redundantly sample the full ensemble after a restart —
        # correct-looking output, zero scale-out.
        from neuralmelting_tpu.parallel.mesh import (make_replica_mesh,
                                                     to_global)
        gmesh = make_replica_mesh()
        if setup.engine == "cellmc":
            states_g, slabs_g, count_g, slots_g = to_global(
                gmesh, (setup.states, setup.slabs, setup.slab_count,
                        setup.slot_of))
            setup = dataclasses.replace(setup, states=states_g,
                                        slabs=slabs_g, slab_count=count_g,
                                        slot_of=slots_g)
        else:
            states_g, nls_g, aux_g, slots_g = to_global(
                gmesh, (setup.states, setup.nls, setup.aux, setup.slot_of))
            setup = dataclasses.replace(setup, states=states_g, nls=nls_g,
                                        aux=aux_g, slot_of=slots_g)
    return setup


def _bin_tightened(geom, states, shift):
    """Bin the ensemble, tighten kcap to the measured occupancy (sweep
    cost is linear in K; mid-run overflow is detected and retried in
    run_sampling), re-bin if tightened, then apply the VMEM guard. One
    policy shared by both setup_run styles — _rebind_cellmc implements
    the inverse (grow-on-overflow) for mid-run geometry changes."""
    slabs, slab_count, over = SC.build_slabs(geom, states, shift)
    kt = CMK.tight_kcap(int(jnp.max(slab_count)), geom.nsub)
    if kt < geom.kcap:
        geom = dataclasses.replace(geom, kcap=kt)
        slabs, slab_count, over = SC.build_slabs(geom, states, shift)
    return _vmem_guard_geom(geom), slabs, slab_count, over


def _vmem_guard_geom(geom):
    """Scoped-VMEM guard: sweep-kernel temporaries scale with J*K; at
    K>=72, J=16 exceeds the 112 MB Mosaic scoped-vmem budget (measured
    OOM at K=64/100MB, 106.7 MB needed). J=8 halves the candidate
    temporaries; throughput per attempt is K-bound anyway. Applied on
    BOTH geometry paths — fresh setup_run and mid-run rebinds — so a
    high-occupancy run can never launch a J=16, K>=72 kernel."""
    if geom.kcap >= 72 and geom.nsub > 8:
        geom = dataclasses.replace(geom, nsub=8)
    return geom


def _rebind_cellmc(setup: RunSetup, geom) -> RunSetup:
    """Re-bin the CURRENT ensemble into slabs for a new cell geometry
    (changed kcap and/or ncell). Off the hot path: runs at chunk
    boundaries, where states.pos is synced and exact (sampler/cellmc.py
    record contract). Grows kcap once more if the tightened guess still
    overflows the true occupancy.

    Multi-controller runs: the refresh kernels (refresh_energies /
    eam_initial_rho) are pallas_calls, which GSPMD cannot partition over
    globally-sharded inputs — gather the ensemble to every host (DCN
    collective, all processes participate), rebind on full-R local
    arrays, then re-shard. Chunk-boundary-only, so the gather cost is
    amortized over whole sweep blocks."""
    if not getattr(setup.states.pos, "is_fully_addressable", True):
        from neuralmelting_tpu.parallel.mesh import (host_fetch,
                                                     make_replica_mesh,
                                                     to_global)
        local = dataclasses.replace(setup, states=host_fetch(setup.states),
                                    slabs=None, slab_count=None)
        local = _rebind_cellmc(local, geom)
        gmesh = make_replica_mesh()
        states_g, slabs_g, count_g = to_global(
            gmesh, (local.states, local.slabs, local.slab_count))
        return dataclasses.replace(local, states=states_g, slabs=slabs_g,
                                   slab_count=count_g,
                                   slot_of=setup.slot_of)
    shift = jnp.zeros((3,), jnp.float32)
    geom = _vmem_guard_geom(geom)
    slabs, slab_count, over = SC.build_slabs(geom, setup.states, shift)
    if bool(over):
        geom = dataclasses.replace(
            geom, kcap=CMK.tight_kcap(int(jnp.max(slab_count)), geom.nsub))
        slabs, slab_count, over = SC.build_slabs(geom, setup.states, shift)
        if bool(over):
            raise RuntimeError("cell slot overflow persists after rebuild")
    if setup.style == "eam":
        scal, series, nser = SC.eam_pack(setup.pot)
        states, rho = SC.eam_initial_rho(geom, setup.states, slabs, scal,
                                         series, nser)
        slabs = slabs + (rho,)
    else:
        states = SC.refresh_energies(geom, setup.states, slabs, setup.pot)
    return dataclasses.replace(
        setup, geom=geom, slabs=slabs, slab_count=slab_count, shift=shift,
        cell_tabs=jnp.asarray(CMK.geom_tables(geom)), states=states)


def _refresh_cellmc_geom(setup: RunSetup) -> RunSetup:
    """Pre-chunk geometry maintenance for long NPT runs: re-derive the
    cell grid from the CURRENT per-replica boxes (a shrinking box must
    not drive cell width below rc) and re-tighten the slot capacity to
    measured occupancy (sweep cost is linear in K). A changed geom
    re-specializes the jitted chunk — cached per geom, so equilibrated
    runs settle into one compilation."""
    g = setup.geom
    minbox = np.asarray(jnp.min(setup.states.box, axis=0), np.float64)
    ng = CMK.make_geom(minbox, setup.pot.rc_host, setup.natoms,
                       nsub=g.nsub, stride=g.stride)
    if ng.ncell != g.ncell:
        return _rebind_cellmc(setup, ng)
    # kcap hysteresis: every kcap change re-jits the whole chunk fn
    # (~minutes at production scale), so act only when occupancy is
    # within 4 slots of overflowing (grow) or the tight cap is a full
    # 16 slots below the current one (shrink). Equilibrated NPT max
    # counts wander by a few atoms chunk-to-chunk; a plain
    # tight_kcap != kcap test flaps 48<->56 and recompiles every chunk.
    maxcount = int(jnp.max(setup.slab_count))
    kt = CMK.tight_kcap(maxcount, g.nsub)
    if maxcount > g.kcap - 4 or kt <= g.kcap - 16:
        return _rebind_cellmc(setup, dataclasses.replace(g, kcap=kt))
    return setup


def liquid_start(setup: RunSetup, nrecords: int = 5,
                 overheat: float = 1.3) -> RunSetup:
    """Pre-melt the ensemble for a cooling-leg (hysteresis) run.

    Every T_m in a lattice-start heating sweep overshoots: a perfect
    crystal survives above the true melting point (superheating), and
    nothing bounds the bias (VERDICT r4 weak #5). The cooling leg needs
    the opposite initial condition — a LIQUID at every (P, T), which
    only refreezes below T_m (undercooling) — so the pair of runs
    brackets the truth: T_cool <= T_m <= T_heat.

    Implementation: pin every replica's temperature to overheat *
    max(T_grid) (well above melting for every pressure on the grid),
    sample ``nrecords`` record blocks to melt, then restore each
    replica's true slot temperature. Positions/boxes/caches carry over;
    pe/virial are exact at the record boundary (MCState contract)."""
    t_hot = jnp.full_like(setup.t_grid, overheat * float(
        jnp.max(setup.t_grid)))
    hot = dataclasses.replace(
        setup, t_grid=t_hot,
        states=setup.states.replace(temp=t_hot[setup.slot_of]))
    hot, _recs, _frames, _hist, _xacc, diag = run_sampling(
        hot, write_files=False, write_traj=False, nrecords=nrecords)
    if int(diag) != 0:
        import warnings
        warnings.warn(f"liquid_start melt leg finished with diag={int(diag)}",
                      RuntimeWarning, stacklevel=2)
    st = hot.states.replace(temp=setup.t_grid[hot.slot_of])
    return dataclasses.replace(hot, states=st, t_grid=setup.t_grid)


def nvol_per_sweep(cfg: RunConfig, natoms: int) -> int:
    """Volume attempts per sweep from the reference's per-move probability,
    capped so full-energy recomputes don't dominate at large N."""
    return max(1, min(4, int(round(cfg.pvol * natoms / 32))))



# Chained chunks MUST reuse the same jitted run fn: rebuilding it per
# run_sampling call makes every chunk re-trace and re-compile (measured
# ~500 s/chunk through this environment's compile relay even with the
# persistent cache warm). Keyed on everything that shapes the program.
_RUN_FN_CACHE: dict = {}


def _cached_run_fn(key, build):
    fn = _RUN_FN_CACHE.get(key)
    if fn is None:
        fn = build()
        _RUN_FN_CACHE[key] = fn
    return fn


def _no_exchange_adapter(run):
    """Present a make_[eam_]cellmc_run_fn(exchange=False) 7-tuple runner
    under the exchange 10-tuple contract run_sampling unpacks: slot_of
    passes through untouched (no tempering -> no slot movement), hist
    repeats it per record, xacc is all-zero. The exchange-form call site
    passes (..., slot_of, xkey, *pot_args, cell_tabs, t_grid, p_grid,
    seed0); the no-exchange runner wants (*pot_args, cell_tabs, seed0),
    i.e. the same tail minus (t_grid, p_grid) — true for both the pair
    and EAM signatures (sampler/cellmc.py:95-101, 414-421)."""
    def run_x(states, slabs, count, shift, slot_of, xkey, *tail):
        inner = tail[:-3] + (tail[-1],)
        states, slabs, count, shift, recs, frames, diag = run(
            states, slabs, count, shift, *inner)
        nrec = recs.sweep.shape[0]
        hist = jnp.broadcast_to(slot_of[None, :],
                                (nrec, slot_of.shape[0]))
        xacc = jnp.zeros((nrec,), jnp.int32)
        return (states, slabs, count, shift, slot_of, recs, frames,
                hist, xacc, diag)
    return run_x


def run_sampling(setup: RunSetup, outdir: Optional[str] = None,
                 write_files: bool = True, checkpoint_path: Optional[str] = None,
                 nrecords: Optional[int] = None, write_traj: bool = True,
                 metrics=None, exchange: bool = True):
    """Advance the ensemble nrecords blocks; write per-slot text outputs.

    Returns (setup, recs, frames, hist, xacc, diag) with recs fields
    (nrec, R) replica-ordered and hist (nrec, R) the replica->slot map.

    ``exchange=False`` disables parallel tempering: every replica keeps
    its slot for the whole run (hist rows stay the identity, xacc stays
    0). Required by experiments where each row's configuration must
    evolve at its own fixed (P, T) — e.g. the two-phase coexistence
    bracket (neuralmelting_tpu/coexist.py), where a tempering swap would
    teleport a melted interface into a colder row and destroy the
    which-way-did-it-move signal. Only the single-process cellmc engine
    offers it; the sampling itself is the identical sweep kernel.
    """
    cfg = setup.cfg
    npress, ntemp = len(setup.press), len(setup.temp)
    nrecords = nrecords or cfg.nsmpl
    nvol = nvol_per_sweep(cfg, setup.natoms)
    nhmc = 1 if cfg.phmc > 0 else 0
    if not exchange and (setup.engine != "cellmc"
                         or jax.process_count() > 1):
        raise ValueError(
            "exchange=False is offered on the single-process cellmc "
            "engine only (coexistence experiments run there); got "
            f"engine={setup.engine!r}, processes={jax.process_count()}")

    import time as _time
    _t0 = _time.time()
    if setup.engine == "cellmc":
        # multi-controller: one process per host joined via
        # init_multihost; the Pallas engine runs per-shard under
        # shard_map over the global replica mesh (GSPMD cannot partition
        # pallas_call), tempering outside it — same 10-tuple contract
        multi = jax.process_count() > 1
        gmesh = None
        if multi:
            from neuralmelting_tpu.parallel import cellmc_sharded as CSH
            from neuralmelting_tpu.parallel.mesh import make_replica_mesh
            gmesh = make_replica_mesh()
        setup = _refresh_cellmc_geom(setup)
        while True:
            # the run fns donate (states, slabs, slab_count) — donated
            # buffers are DELETED on dispatch — so keep an intact copy of
            # the pre-chunk ensemble for the slab-overflow retry below,
            # which must rebuild slabs from the true pre-chunk positions
            # (one ~50 MB on-device copy per chunk; chunks run seconds)
            pre_states = jax.tree.map(jnp.copy, setup.states)
            if setup.style == "eam":
                scal, series, nser = SC.eam_pack(setup.pot)
                key = ("eam", setup.geom, nser, cfg.mod, nrecords, nvol,
                       cfg.adapt_factor, npress, ntemp, write_traj, multi,
                       cfg.vol_every, cfg.rebin_every, exchange,
                       cfg.acc_target_pos, cfg.acc_target_vol, setup.us.kb)
                if multi:
                    run = _cached_run_fn(
                        key, lambda: CSH.make_sharded_cellmc_run_fn(
                            gmesh, setup.us.kb, setup.us.p2e, setup.geom,
                            mod=cfg.mod, nrecords=nrecords,
                            npress=npress, ntemp=ntemp,
                            ncyc=SC.default_ncyc(setup.geom), nvol=nvol,
                            vol_every=cfg.vol_every,
                            rebin_every=cfg.rebin_every,
                            targets=(cfg.acc_target_pos,
                                     cfg.acc_target_vol,
                                     cfg.acc_target_hmc),
                            factor=cfg.adapt_factor, style="eam",
                            nser=nser, write_traj=write_traj))
                else:
                    def _build_eam(nser=nser):
                        fn = SC.make_eam_run_fn(
                            setup.us.kb, setup.us.p2e, setup.geom, nser,
                            mod=cfg.mod, nrecords=nrecords,
                            ncyc=SC.default_ncyc(setup.geom),
                            nvol=nvol, factor=cfg.adapt_factor,
                            vol_every=cfg.vol_every,
                            rebin_every=cfg.rebin_every,
                            targets=(cfg.acc_target_pos,
                                     cfg.acc_target_vol,
                                     cfg.acc_target_hmc),
                            exchange=exchange, npress=npress,
                            ntemp=ntemp, write_traj=write_traj)
                        return fn if exchange else _no_exchange_adapter(fn)
                    run = _cached_run_fn(key, _build_eam)
                out = run(setup.states, setup.slabs, setup.slab_count,
                          setup.shift, setup.slot_of,
                          jax.random.key(cfg.seed + 1), scal, series,
                          setup.cell_tabs, setup.t_grid, setup.p_grid,
                          jnp.asarray([cfg.seed, cfg.seed + 7], jnp.int32))
            else:
                # NM_FAST_RECIP=1: approx-reciprocal+Newton epilogue
                # (ops/pallas/cellmc.py ediff) for on-chip A/B runs
                fr = os.environ.get("NM_FAST_RECIP", "") == "1"
                key = ("cellmc", setup.geom, cfg.mod, nrecords, nvol,
                       cfg.adapt_factor, npress, ntemp, write_traj, fr,
                       multi, cfg.vol_every, cfg.rebin_every, exchange,
                       cfg.acc_target_pos, cfg.acc_target_vol, setup.us.kb)
                if multi:
                    run = _cached_run_fn(
                        key, lambda: CSH.make_sharded_cellmc_run_fn(
                            gmesh, setup.us.kb, setup.us.p2e, setup.geom,
                            mod=cfg.mod, nrecords=nrecords,
                            npress=npress, ntemp=ntemp,
                            ncyc=SC.default_ncyc(setup.geom), nvol=nvol,
                            vol_every=cfg.vol_every,
                            rebin_every=cfg.rebin_every,
                            targets=(cfg.acc_target_pos,
                                     cfg.acc_target_vol,
                                     cfg.acc_target_hmc),
                            factor=cfg.adapt_factor, fast_recip=fr,
                            write_traj=write_traj))
                else:
                    def _build_pair(fr=fr):
                        fn = SC.make_cellmc_run_fn(
                            setup.us.kb, setup.us.p2e, setup.geom,
                            mod=cfg.mod, nrecords=nrecords,
                            ncyc=SC.default_ncyc(setup.geom),
                            nvol=nvol, factor=cfg.adapt_factor,
                            fast_recip=fr, vol_every=cfg.vol_every,
                            rebin_every=cfg.rebin_every,
                            targets=(cfg.acc_target_pos,
                                     cfg.acc_target_vol,
                                     cfg.acc_target_hmc),
                            exchange=exchange, npress=npress,
                            ntemp=ntemp, write_traj=write_traj)
                        return fn if exchange else _no_exchange_adapter(fn)
                    run = _cached_run_fn(key, _build_pair)
                out = run(setup.states, setup.slabs, setup.slab_count,
                          setup.shift, setup.slot_of,
                          jax.random.key(cfg.seed + 1), setup.pot,
                          setup.cell_tabs, setup.t_grid, setup.p_grid,
                          jnp.asarray([cfg.seed, cfg.seed + 7], jnp.int32))
            (states, slabs, slab_count, shift, slot_of, recs, frames,
             hist, xacc, diag) = out
            if int(diag) & SC.DIAG_SLAB_OVERFLOW:
                # a cell outgrew its slots mid-chunk: the chunk's outputs
                # dropped atoms and are invalid. Rebuild from the intact
                # PRE-chunk state with more slots and rerun — NEVER
                # commit the truncated ensemble as ongoing state.
                if setup.geom.kcap >= 96:
                    raise RuntimeError(
                        f"cell slot overflow persists at kcap="
                        f"{setup.geom.kcap}: a cell packed >96 atoms — "
                        "the chunk outputs dropped atoms and cannot be "
                        "used; the cell geometry no longer fits this "
                        "density (shrink ncells or raise pressure grid)")
                import warnings
                warnings.warn(
                    f"cell slot overflow at kcap={setup.geom.kcap}: "
                    f"retrying chunk with kcap={setup.geom.kcap + 8}",
                    RuntimeWarning, stacklevel=2)
                # the chunk consumed (donated) setup.states/slabs; retry
                # from the snapshot taken at the top of this iteration
                setup = dataclasses.replace(setup, states=pre_states)
                setup = _rebind_cellmc(
                    setup, dataclasses.replace(
                        setup.geom, kcap=setup.geom.kcap + 8))
                continue
            break
        nls, aux = setup.nls, setup.aux
        setup = dataclasses.replace(setup, slabs=slabs,
                                    slab_count=slab_count, shift=shift)
    elif setup.engine == "dense":
        import neuralmelting_tpu.sampler.checkerboard as CB
        npasses = CB.default_npasses(setup.natoms, setup.cellcfg)
        key = ("dense", setup.cellcfg.ncell, setup.shell, setup.gcap,
               cfg.mod, nrecords, nvol, cfg.adapt_factor, npress, ntemp,
               write_traj, cfg.acc_target_pos, cfg.acc_target_vol,
               setup.us.kb)
        run = _cached_run_fn(key, lambda: DS.make_dense_run_fn(
            setup.us.kb, setup.us.p2e, setup.cellcfg, shell=setup.shell,
            gcap=setup.gcap, mod=cfg.mod, nrecords=nrecords,
            npasses=npasses, nvol=nvol, factor=cfg.adapt_factor,
            targets=(cfg.acc_target_pos, cfg.acc_target_vol,
                     cfg.acc_target_hmc),
            exchange=True, npress=npress, ntemp=ntemp,
            write_traj=write_traj))
        out = run(setup.states, setup.gms, setup.slot_of,
                  jax.random.key(cfg.seed + 1), setup.pot, setup.table,
                  setup.t_grid, setup.p_grid)
        states, gms, slot_of, recs, frames, hist, xacc, diag = out
        nls, aux = setup.nls, setup.aux
        setup = dataclasses.replace(setup, gms=gms)
    else:
        key = ("gather", setup.cellcfg.ncell, cfg.mod, nrecords, nvol,
               nhmc, cfg.nstps, setup.mass, cfg.adapt_factor, setup.cap,
               cfg.skin, setup.style, npress, ntemp, write_traj,
               setup.natoms, cfg.acc_target_pos, cfg.acc_target_vol,
               cfg.acc_target_hmc, setup.us.kb)
        run = _cached_run_fn(key, lambda: ENS.make_ensemble_run_fn(
            setup.us.kb, setup.us.p2e, setup.cellcfg, skin=cfg.skin,
            capacity=setup.cap, mod=cfg.mod, nrecords=nrecords,
            nvol=nvol, nhmc=nhmc, nstps=cfg.nstps, mass=setup.mass,
            factor=cfg.adapt_factor,
            targets=(cfg.acc_target_pos, cfg.acc_target_vol,
                     cfg.acc_target_hmc),
            natoms=setup.natoms, exchange=True, npress=npress,
            ntemp=ntemp, style=setup.style, write_traj=write_traj))
        out = run(setup.states, setup.nls, setup.aux, setup.slot_of,
                  jax.random.key(cfg.seed + 1), setup.pot, setup.table,
                  setup.t_grid, setup.p_grid)
        states, nls, aux, slot_of, recs, frames, hist, xacc, diag = out
    jax.block_until_ready(states.pos)
    diag_host = int(diag)
    if diag_host != 0:
        import warnings
        bits = {1: "NL_OVERFLOW", 2: "CB_INVALID", 4: "GHOST_OVERFLOW",
                8: "NL_STALE", 16: "SHIFT_DESYNC"}
        names = [v for k, v in bits.items() if diag_host & k]
        warnings.warn(
            f"sampling chunk finished with diagnostic flags {diag_host} "
            f"({'|'.join(names)}): outputs may be physically wrong — "
            "increase max_neighbors/skin or reduce step caps",
            RuntimeWarning, stacklevel=2)
    setup = dataclasses.replace(setup, states=states, nls=nls, aux=aux,
                                slot_of=slot_of)

    ck_states, ck_slots = states, slot_of
    if jax.process_count() > 1:
        # multi-controller runs (parallel/mesh.init_multihost): gather the
        # replica-sharded outputs over DCN — a COLLECTIVE, so every
        # process participates — then only process 0 touches the
        # filesystem
        from neuralmelting_tpu.parallel.mesh import host_fetch
        recs, frames, hist, xacc = host_fetch((recs, frames, hist, xacc))
        if checkpoint_path:
            ck_states, ck_slots = host_fetch((states, slot_of))
        is_writer = jax.process_index() == 0
    else:
        is_writer = True
    if metrics is not None and is_writer:
        import numpy as _np
        metrics.log("sampling_chunk",
                    records=int(nrecords), replicas=int(hist.shape[1]),
                    natoms=setup.natoms, seconds=round(_time.time() - _t0, 3),
                    diag=diag_host,
                    exchange_acc=[int(x) for x in _np.asarray(xacc)])
    if write_files and outdir is not None and is_writer:
        os.makedirs(outdir, exist_ok=True)
        write_slot_files(cfg, outdir, recs, frames, hist,
                         npress, ntemp, setup.natoms)
    if checkpoint_path and is_writer:
        ckpt.save(checkpoint_path, ck_states, ck_slots, cfg.to_json())
    return setup, recs, frames, hist, xacc, diag


def write_slot_files(cfg: RunConfig, outdir: str, recs: ThermoRecord,
                     frames, hist, npress: int, ntemp: int, natoms: int):
    """Distribute replica-ordered records into per-(P,T)-slot text files."""
    el = ELEMENTS[cfg.element]
    hist = np.asarray(hist)                      # (nrec, R) replica->slot
    nrec, r = hist.shape
    rec_np = {k: np.asarray(getattr(recs, k)) for k in thermo.COLUMNS}
    if frames is not None:
        pos_np = np.asarray(frames[0])           # (nrec, R, N, 3)
        box_np = np.asarray(frames[1])           # (nrec, R, 3)

    # hist[k] is a permutation replica->slot; one argsort inverts every
    # record at once: sel_all[k, slot] = replica holding `slot` at record k
    # (the per-(record, slot) argmax loop here was O(nrec * R^2) host time,
    # minutes at the 32x32-grid scale — VERDICT.md r1 weak #5)
    sel_all = np.argsort(hist, axis=1)           # (nrec, R)
    rows_all = {c: rec_np[c][np.arange(nrec)[:, None], sel_all]
                for c in thermo.COLUMNS}         # (nrec, R) slot-ordered

    for slot in range(r):
        p_idx, t_idx = divmod(slot, ntemp)
        prefix = naming.sample_prefix(cfg.name, cfg.element, el.lattice,
                                      cfg.ncells, p_idx, t_idx)
        tpath, jpath = naming.sample_paths(outdir, prefix)
        sel = sel_all[:, slot]
        rows = {c: rows_all[c][:, slot] for c in thermo.COLUMNS}
        params = {"element": cfg.element, "natoms": natoms,
                  "press_idx": p_idx, "temp_idx": t_idx,
                  "config": cfg.to_json()}
        thermo.write(tpath, rows, params=params)
        if frames is not None and cfg.write_traj:
            traj.write(jpath, pos_np[np.arange(nrec), sel],
                       box_np[np.arange(nrec), sel],
                       sweeps=rows["sweep"].astype(np.int64))
