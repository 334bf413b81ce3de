"""Physics + bookkeeping tests for the PRODUCTION cellmc engine layer
(sampler/cellmc.py) — the volume acceptance via the scaled-energy trick,
slab rescale, rebin scheduling, record refresh/unbin, adaptation and
tempering wiring that no kernel oracle covers (VERDICT.md r2 weak #2/#3).

Oracles:
  * exact ideal-gas NPT statistics: eps=0 makes <V> = (N+1) kT / P;
  * the golden-validated serial chain: equilibrium <pe>/<V> on a warm LJ
    solid must agree between engines (same stationary distribution);
  * brute-force totals: after volume moves + rebinning + tempering, the
    unbinned positions' O(N^2) energy must equal the engine's record pe.

Interpret-mode kernels on CPU (tests/conftest.py).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow   # full-engine statistical chains; the measured wall of the old default tier

import jax
import jax.numpy as jnp

from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops import energy as EN
from neuralmelting_tpu.ops.pallas import cellmc as CM
from neuralmelting_tpu.sampler import cellmc as SC
from neuralmelting_tpu.sampler import driver, moves, serial
from neuralmelting_tpu.sampler.state import ensemble_init, init_state


def _cellmc_run(pot, pos, box, temps, presses, mod, nrecords, ncyc=1,
                nvol=1, seed=3, dpos0=0.2, dvol0=0.05, nsub=8):
    r = len(temps)
    states = ensemble_init(pot, pos, box, seed,
                           jnp.asarray(temps, jnp.float32),
                           jnp.asarray(presses, jnp.float32),
                           dpos0=dpos0, dvol_frac0=dvol0, dt0=0.005)
    geom = CM.make_geom(box, pot.rc_host, len(pos), nsub=nsub)
    shift = jnp.zeros((3,), jnp.float32)
    slabs, count, over = SC.build_slabs(geom, states, shift)
    assert not bool(over)
    states = SC.refresh_energies(geom, states, slabs, pot)
    cell_tabs = jnp.asarray(CM.geom_tables(geom))
    run = SC.make_cellmc_run_fn(1.0, 1.0, geom, mod=mod,
                                nrecords=nrecords, ncyc=ncyc, nvol=nvol,
                                exchange=False)
    seed0 = jnp.asarray([seed, seed + 7], jnp.int32)
    out = run(states, slabs, count, shift, pot, cell_tabs, seed0)
    states, slabs, count, shift, recs, frames, diag = out
    return states, recs, int(diag)


def test_cellmc_ideal_gas_mean_volume():
    """eps=0 LJ is an ideal gas: NPT with the V^N Jacobian convention
    gives <V> = (N+1) kT / P exactly — wrong Jacobian handling, a wrong
    beta*P*dV term, or a slab-rescale bug all shift this mean."""
    kt, press, n = 2.0, 1.0, 32
    v_expect = (n + 1) * kt / press                  # 66.0
    a = v_expect ** (1.0 / 3.0) / 2.0                # start AT the mean
    pos, box = make_supercell("fcc", a, 2)
    pot = LJCut.create(0.0, 1.0, 1.0)                # eps = 0
    r = 8
    states, recs, diag = _cellmc_run(
        pot, pos, box, [kt] * r, [press] * r, mod=5, nrecords=60, nvol=2)
    assert diag == 0
    vols = np.asarray(recs.vol)                      # (nrec, R)
    assert np.isfinite(vols).all()
    mean_v = vols[10:].mean()                        # burn-in: 10 records
    assert abs(mean_v / v_expect - 1.0) < 0.06, (mean_v, v_expect)


def test_cellmc_equilibrium_matches_serial_chain():
    """Warm LJ fcc solid at (T*=0.7, P*=2): <pe> and <V> from the cellmc
    engine agree with the golden-validated serial chain; the record pe is
    bitwise-consistent with a brute-force total of the synced positions
    (unbin/shift/rescale bookkeeping)."""
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 2.0 ** (2 / 3), 4)   # 256 atoms
    n = len(pos)
    t, p = 0.7, 2.0

    # serial reference chain
    state = init_state(pot, jnp.asarray(pos), jnp.asarray(box),
                       jax.random.key(12), t, p,
                       dpos0=0.1, dvol_frac0=0.01, dt0=0.005)
    sweep = serial.make_sweep_fn(1.0, 1.0, moves.brute_backend(),
                                 ppos=0.97, pvol=0.03, nstps=4, mass=1.0)
    run = driver.make_run_fn(sweep, kb=1.0, mod=5, nrecords=70)
    state, recs_s, _ = run(pot, state)
    pe_s = np.asarray(recs_s.pe)[20:] / n
    vol_s = np.asarray(recs_s.vol)[20:] / n

    # cellmc ensemble at the same (T, P), 4 replicas
    states, recs_c, diag = _cellmc_run(
        pot, pos, box, [t] * 4, [p] * 4, mod=5, nrecords=60, ncyc=2,
        nvol=1, seed=9, dpos0=0.1, dvol0=0.01)
    assert diag == 0
    pe_c = np.asarray(recs_c.pe)[20:] / n
    vol_c = np.asarray(recs_c.vol)[20:] / n

    assert abs(pe_c.mean() - pe_s.mean()) < 0.08, (pe_c.mean(), pe_s.mean())
    assert abs(vol_c.mean() - vol_s.mean()) / vol_s.mean() < 0.01, \
        (vol_c.mean(), vol_s.mean())

    # record-point pe == brute total of the synced positions
    for rr in range(2):
        pe_b, _ = EN.pair_energy_virial(pot, states.pos[rr], states.box[rr])
        np.testing.assert_allclose(float(states.pe[rr]), float(pe_b),
                                   rtol=5e-4, atol=0.05)


def test_cellmc_npt_virial_pressure_consistency():
    """Thermodynamic consistency (SURVEY.md §4.2 'EOS points'): in NPT
    the mechanical pressure must reproduce the imposed P. For the
    TRUNCATED (unshifted) LJ the pair-virial estimator misses the
    impulsive term from the energy step at rc, so

        P_imposed = <(N kT + W/3)/V> + (2 pi/3) rho^2 rc^3 g(rc) u(rc)

    (u(rc) < 0). At T*=0.7, P*=2.0 the correction is ~ -0.65 while the
    raw estimator reads ~2.73 — a sign error, wrong factor, or broken
    volume acceptance in ANY of the virial kernel / volume move / RDF
    normalization moves the closed sum far outside the gate. Calibrated:
    residual 0.08 at these settings (sem ~0.07)."""
    from neuralmelting_tpu.features import rdf_frames

    pot = LJCut.create()
    pos, box = make_supercell("fcc", 2.0 ** (2 / 3), 4)   # 256 atoms
    n = len(pos)
    t, p = 0.7, 2.0
    states, recs, diag = _cellmc_run(
        pot, pos, box, [t] * 8, [p] * 8, mod=5, nrecords=50, ncyc=2,
        nvol=1, seed=21, dpos0=0.1, dvol0=0.01)
    assert diag == 0
    w = np.asarray(recs.virial)[15:]
    v = np.asarray(recs.vol)[15:]
    p_vir = ((n * t + w / 3.0) / v).mean()
    assert p_vir > p + 0.4, (p_vir, "impulsive gap vanished?")

    rc = float(pot.rc_host)
    nbins, rmax = 100, rc + 0.1
    g = np.asarray(rdf_frames(states.pos, states.box, nbins, rmax))
    centers = (np.arange(nbins) + 0.5) * (rmax / nbins)
    g_rc = g[:, (centers > rc - 0.08) & (centers < rc)].mean()
    rho = n / v.mean()
    u_rc = 4.0 * ((1.0 / rc) ** 12 - (1.0 / rc) ** 6)
    p_delta = (2.0 * np.pi / 3.0) * rho ** 2 * rc ** 3 * g_rc * u_rc
    assert abs(p_vir + p_delta - p) < 0.3, (p_vir, p_delta)


def test_cellmc_runner_with_exchange():
    """cellmc engine through the production runner incl. tempering
    (mirror of test_dense_runner_with_exchange)."""
    from neuralmelting_tpu import runner
    from neuralmelting_tpu.config import RunConfig

    cfg = RunConfig(name="c", element="LJ", ncells=(4, 4, 4),
                    npress=1, ntemp=4, press=(1.0,),
                    temp=(0.5, 0.8, 1.1, 1.4),
                    nsmpl=4, mod=4, ncut=1, seed=5,
                    dpos0=0.1, dvol0=0.01)
    setup = runner.setup_run(cfg, engine="cellmc")
    setup, recs, frames, hist, xacc, diag = runner.run_sampling(
        setup, write_files=False)
    assert int(diag) == 0
    pe = np.asarray(recs.pe[-1]) / 256
    assert np.isfinite(pe).all()
    perm = np.argsort(np.asarray(hist)[-1])
    pe_slots = pe[perm]
    assert pe_slots[0] < pe_slots[-1]
    assert sorted(np.asarray(setup.slot_of).tolist()) == [0, 1, 2, 3]
    # bookkeeping: engine pe == brute total after exchanges + rebinning
    for rr in range(2):
        pe_b, _ = EN.pair_energy_virial(setup.pot, setup.states.pos[rr],
                                        setup.states.box[rr])
        np.testing.assert_allclose(float(setup.states.pe[rr]), float(pe_b),
                                   rtol=5e-4, atol=0.05)


def test_cellmc_lane_padding_any_replica_count():
    """Replica counts that don't divide the lane tile run via dead-lane
    padding (VERDICT r2 weak #6: a 12x12 grid, R=144, must work). Forced
    rt=8 with R=12 exercises the padded last tile; live-lane records must
    be finite and bitwise-unaffected bookkeeping holds (pe vs brute)."""
    pot = LJCut.create(1.0, 1.0, 1.0)     # short rc: tiny box suffices
    pos, box = make_supercell("fcc", 2.0 ** (2 / 3), 2)   # 32 atoms
    r = 12
    states = ensemble_init(pot, jnp.asarray(pos), jnp.asarray(box), 11,
                           jnp.full((r,), 0.9, jnp.float32),
                           jnp.full((r,), 1.5, jnp.float32),
                           dpos0=0.1, dvol_frac0=0.01, dt0=0.005)
    geom = CM.make_geom(box, pot.rc_host, len(pos), nsub=4)
    shift = jnp.zeros((3,), jnp.float32)
    slabs, count, over = SC.build_slabs(geom, states, shift)
    assert not bool(over)
    states = SC.refresh_energies(geom, states, slabs, pot)
    cell_tabs = jnp.asarray(CM.geom_tables(geom))
    run = SC.make_cellmc_run_fn(1.0, 1.0, geom, mod=3, nrecords=3,
                                ncyc=1, nvol=1, exchange=False, rt=8,
                                adapt=False)   # keep counters accumulating
    out = run(states, slabs, count, shift, pot, cell_tabs,
              jnp.asarray([11, 18], jnp.int32))
    states, slabs, count, shift, recs, frames, diag = out
    assert int(diag) == 0
    assert np.isfinite(np.asarray(recs.pe)).all()
    assert int(jnp.sum(states.ntp)) > 0
    for rr in (0, r - 1):      # last replica lives in the padded tile
        pe_b, _ = EN.pair_energy_virial(pot, states.pos[rr],
                                        states.box[rr])
        np.testing.assert_allclose(float(states.pe[rr]), float(pe_b),
                                   rtol=5e-4, atol=0.05)


def test_eam_cellmc_npt_pressure_closure():
    """EAM twin of the virial-pressure closure: the synthetic Al table
    (eam_gen: P = 0 at a = 4.05 A) goes smoothly to zero at rc, so there
    is NO impulsive term and <(N kb T + W/3)/V> must equal the imposed
    P = 0 directly. The round-2 virial SIGN bug (ADVICE r2 high #1)
    would read ~2 N kb T / V ~ +0.006 eV/A^3 (~1e5 bar scale error)
    here; calibrated: mean 1.2e-4 eV/A^3 (~190 bar), per-sample std
    3.8e-3."""
    import os
    import tempfile

    from neuralmelting_tpu.models import eam as EAM
    from neuralmelting_tpu.models import eam_cheb as EC
    from neuralmelting_tpu.models import eam_gen

    path = os.path.join(tempfile.gettempdir(), "nm_synthetic_Al.eam.alloy")
    if not os.path.exists(path):
        eam_gen.write_setfl(path)
    ch = EC.from_spline(EAM.load(path))
    pos, box = make_supercell("fcc", 4.05, (5, 5, 5))      # 500 atoms
    n = len(pos)
    kb = 8.617333e-5
    r = 4
    temps = [600.0] * r
    presses = [0.0] * r
    states = ensemble_init(ch, jnp.asarray(pos), jnp.asarray(box), 4,
                           jnp.asarray(temps, jnp.float32),
                           jnp.asarray(presses, jnp.float32),
                           dpos0=0.12, dvol_frac0=0.005, dt0=0.005,
                           energy_fn=lambda p_, a, b: (jnp.zeros(()),
                                                       jnp.zeros(())))
    geom = CM.make_geom(box, ch.rc_host, n, nsub=1, stride=3, kcap=32)
    shift = jnp.zeros((3,), jnp.float32)
    slabs, count, over = SC.build_slabs(geom, states, shift)
    assert not bool(over)
    scal, series, nser = SC.eam_pack(ch)
    states, rho = SC.eam_initial_rho(geom, states, slabs, scal, series,
                                     nser)
    slabs = slabs + (rho,)
    cell_tabs = jnp.asarray(CM.geom_tables(geom))
    run = SC.make_eam_run_fn(kb, 1.0, geom, nser, mod=5, nrecords=30,
                             ncyc=1, nvol=1, exchange=True, npress=1,
                             ntemp=r, adapt=False)
    out = run(states, slabs, count, shift,
              jnp.arange(r, dtype=jnp.int32), jax.random.key(2),
              scal, series, cell_tabs,
              jnp.asarray(temps, jnp.float32),
              jnp.asarray(presses, jnp.float32),
              jnp.asarray([11, 18], jnp.int32))
    (states, slabs, count, shift, slot_of, recs, frames, hist, xacc,
     diag) = out
    assert int(diag) == 0
    w = np.asarray(recs.virial)[10:]
    v = np.asarray(recs.vol)[10:]
    p_meas = ((n * kb * 600.0 + w / 3.0) / v).mean()
    assert abs(p_meas) < 0.002, (p_meas, "eV/A^3; sign/factor error?")


def test_eam_cellmc_engine_bookkeeping():
    """EAM engine layer (make_eam_run_fn): volume trials with exact e_old,
    density-cache transport through rebinning, record refresh — the final
    record pe must match an O(N^2) brute evaluation of the same Chebyshev
    potential at the synced positions."""
    import os
    import tempfile

    from neuralmelting_tpu.models import eam as EAM
    from neuralmelting_tpu.models import eam_cheb as EC
    from neuralmelting_tpu.models import eam_gen
    from tests.test_cellmc_eam import brute_cheb

    path = os.path.join(tempfile.gettempdir(), "nm_synthetic_Al.eam.alloy")
    if not os.path.exists(path):
        eam_gen.write_setfl(path)
    ch = EC.from_spline(EAM.load(path))
    pos, box = make_supercell("fcc", 4.05, (5, 5, 5))      # 500 atoms
    n = len(pos)
    kb = 8.617333e-5
    temps, presses = [300.0, 1200.0], [0.0, 0.0]
    states = ensemble_init(ch, jnp.asarray(pos), jnp.asarray(box), 4,
                           jnp.asarray(temps, jnp.float32),
                           jnp.asarray(presses, jnp.float32),
                           dpos0=0.15, dvol_frac0=0.005, dt0=0.005,
                           energy_fn=lambda p_, a, b: (jnp.zeros(()),
                                                       jnp.zeros(())))
    geom = CM.make_geom(box, ch.rc_host, n, nsub=1, stride=3, kcap=32)
    shift = jnp.zeros((3,), jnp.float32)
    slabs, count, over = SC.build_slabs(geom, states, shift)
    assert not bool(over)
    scal, series, nser = SC.eam_pack(ch)
    states, rho = SC.eam_initial_rho(geom, states, slabs, scal, series,
                                     nser)
    slabs = slabs + (rho,)
    cell_tabs = jnp.asarray(CM.geom_tables(geom))
    run = SC.make_eam_run_fn(kb, 1.0, geom, nser, mod=2, nrecords=2,
                             ncyc=1, nvol=1, exchange=True,
                             npress=1, ntemp=2, adapt=False)
    out = run(states, slabs, count, shift,
              jnp.arange(2, dtype=jnp.int32), jax.random.key(8),
              scal, series, cell_tabs,
              jnp.asarray(temps, jnp.float32),
              jnp.asarray(presses, jnp.float32),
              jnp.asarray([11, 18], jnp.int32))
    (states, slabs, count, shift, slot_of, recs, frames, hist, xacc,
     diag) = out
    assert int(diag) == 0
    assert np.isfinite(np.asarray(recs.pe)).all()
    assert int(states.ntp[0]) > 0
    for rr in range(2):
        eb, _ = brute_cheb(ch, states.pos[rr], states.box[rr])
        np.testing.assert_allclose(float(states.pe[rr]), float(eb),
                                   rtol=1e-4, atol=5e-3)


def test_eam_cellmc_single_point_smoke():
    """Non-exchange EAM mode (VERDICT r3 weak #5): a single-(P,T) run
    through the production EAM engine — the simplest possible EAM
    debugging configuration must work without a tempering grid."""
    import os
    import tempfile

    from neuralmelting_tpu.models import eam as EAM
    from neuralmelting_tpu.models import eam_cheb as EC
    from neuralmelting_tpu.models import eam_gen
    from tests.test_cellmc_eam import brute_cheb

    path = os.path.join(tempfile.gettempdir(), "nm_synthetic_Al.eam.alloy")
    if not os.path.exists(path):
        eam_gen.write_setfl(path)
    ch = EC.from_spline(EAM.load(path))
    pos, box = make_supercell("fcc", 4.05, (5, 5, 5))      # 500 atoms
    n = len(pos)
    kb = 8.617333e-5
    states = ensemble_init(None, jnp.asarray(pos), jnp.asarray(box), 23,
                           jnp.asarray([600.0], jnp.float32),
                           jnp.asarray([0.0], jnp.float32),
                           dpos0=0.12, dvol_frac0=0.004, dt0=0.001,
                           energy_fn=lambda p_, a, b: (jnp.zeros(()),
                                                       jnp.zeros(())))
    geom = CM.make_geom(box, ch.rc_host, n, nsub=1, stride=3, kcap=32)
    shift = jnp.zeros((3,), jnp.float32)
    slabs, count, over = SC.build_slabs(geom, states, shift)
    assert not bool(over)
    scal, series, nser = SC.eam_pack(ch)
    states, rho = SC.eam_initial_rho(geom, states, slabs, scal, series,
                                     nser)
    slabs = slabs + (rho,)
    cell_tabs = jnp.asarray(CM.geom_tables(geom))
    run = SC.make_eam_run_fn(kb, 1.0, geom, nser, mod=2, nrecords=2,
                             ncyc=1, nvol=1, exchange=False, adapt=False)
    out = run(states, slabs, count, shift, scal, series, cell_tabs,
              jnp.asarray([41, 2], jnp.int32))
    states, slabs, count, shift, recs, frames, diag = out
    assert int(diag) == 0
    assert frames is None                      # write_traj=False
    assert np.isfinite(np.asarray(recs.pe)).all()
    assert int(states.ntp[0]) > 0 and int(states.ntv[0]) > 0
    eb, _ = brute_cheb(ch, states.pos[0], states.box[0])
    np.testing.assert_allclose(float(states.pe[0]), float(eb),
                               rtol=1e-4, atol=5e-3)
