"""Correctness of the batched checkerboard sampler.

Oracles (SURVEY.md §4.2):
  * energy-cache consistency vs. brute-force recompute,
  * exact ideal-gas NPT volume statistics <V> = (N+1) kT / P,
  * statistical agreement with the serial golden sampler on an LJ system.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops import cells as cells_ops
from neuralmelting_tpu.ops import energy as E
from neuralmelting_tpu.parallel import ensemble as ENS
from neuralmelting_tpu.sampler.state import ensemble_init


def _make(ncells=4, temps=(1.0,), presses=(2.0,), a=1.6, seed=3,
          dpos0=0.1, dvol0=0.01):
    pot = LJCut.create()
    pos, box = make_supercell("fcc", a, ncells)
    r = len(temps)
    states = ensemble_init(pot, pos, box, seed,
                           jnp.asarray(temps), jnp.asarray(presses),
                           dpos0, dvol0, 0.005)
    cellcfg = cells_ops.make_cell_config(box, float(pot.rc), stride=2,
                                         dpos_cap=0.25)
    return pot, states, cellcfg, box


@pytest.mark.slow
def test_cb_energy_cache_consistency():
    pot, states, cellcfg, _ = _make(temps=(0.8, 1.5), presses=(1.0, 3.0))
    nls, cap = ENS.build_ensemble_nl(pot, states, skin=0.4)
    aux = ENS.build_ensemble_aux(pot, states, nls)
    run = ENS.make_ensemble_run_fn(1.0, 1.0, cellcfg, skin=0.4,
                                   capacity=cap, mod=5, nrecords=2,
                                   natoms=256)
    table = jnp.asarray(cellcfg.active_table)
    states, nls, aux, recs, frames, diag = run(states, nls, aux, pot, table)
    assert int(diag) == 0
    for r in range(2):
        pe_b, vir_b = E.pair_energy_virial(pot, states.pos[r], states.box[r])
        np.testing.assert_allclose(float(states.pe[r]), float(pe_b),
                                   rtol=5e-4, atol=5e-2)
    assert recs.pe.shape == (2, 2)
    assert frames[0].shape == (2, 2, 256, 3)
    # all replicas advanced 10 sweeps and tried moves
    assert (np.asarray(states.sweep) == 10).all()


def test_cb_counters_move_budget():
    """Per sweep each particle is trialed at most once; tries <= N."""
    pot, states, cellcfg, _ = _make()
    nls, cap = ENS.build_ensemble_nl(pot, states, skin=0.4)
    aux = ENS.build_ensemble_aux(pot, states, nls)
    run = ENS.make_ensemble_run_fn(1.0, 1.0, cellcfg, skin=0.4,
                                   capacity=cap, mod=3, nrecords=1, nvol=1,
                                   natoms=256)
    table = jnp.asarray(cellcfg.active_table)
    _, _, _, recs, _, _ = run(states, nls, aux, pot, table)
    # acceptance ratios are well-formed
    assert 0.0 <= float(recs.acc_pos[0, 0]) <= 1.0


@pytest.mark.slow
def test_ideal_gas_npt_volume():
    """eps=0: <V> must equal (N+1) kT / P (linear-V NPT weight)."""
    pot = LJCut.create(eps=0.0, sigma=1.0, rc=0.5)
    pos, box = make_supercell("sc", 1.0, 4)  # 64 atoms, box 4^3
    n = len(pos)
    temps = jnp.array([1.0])
    presses = jnp.array([1.0])
    states = ensemble_init(pot, pos, box, 17, temps, presses,
                           0.3, 0.2, 0.005)
    cellcfg = cells_ops.make_cell_config(box, 0.5, stride=2, dpos_cap=0.25)
    nls, cap = ENS.build_ensemble_nl(pot, states, skin=0.3)
    aux = ENS.build_ensemble_aux(pot, states, nls)
    run = ENS.make_ensemble_run_fn(1.0, 1.0, cellcfg, skin=0.3,
                                   capacity=cap, mod=10, nrecords=120,
                                   nvol=4, natoms=64, write_traj=False)
    table = jnp.asarray(cellcfg.active_table)
    states, nls, aux, recs, _, diag = run(states, nls, aux, pot, table)
    vols = np.asarray(recs.vol[40:, 0])  # discard burn-in
    v_expect = (n + 1) * 1.0 / 1.0
    assert abs(vols.mean() - v_expect) / v_expect < 0.08, (
        f"<V>={vols.mean():.2f} expected {v_expect}")


@pytest.mark.slow
def test_cb_matches_serial_statistics():
    """Same <pe>, <V> as the serial golden sampler on a warm LJ solid."""
    from neuralmelting_tpu.sampler import moves, serial, driver
    from neuralmelting_tpu.sampler.state import init_state

    pot = LJCut.create()
    pos, box = make_supercell("fcc", 1.6, 4)
    n = len(pos)
    temp, press = 0.8, 2.0

    # serial
    st = init_state(pot, pos, box, jax.random.key(21), temp, press,
                    0.1, 0.01, 0.005)
    sweep = serial.make_sweep_fn(1.0, 1.0, moves.brute_backend(),
                                 0.96875, 0.03125, 4, 1.0)
    run_s = driver.make_run_fn(sweep, kb=1.0, mod=10, nrecords=60,
                               write_traj=False)
    _, recs_s, _ = run_s(pot, st)

    # checkerboard
    states = ensemble_init(pot, pos, box, 22, jnp.array([temp]),
                           jnp.array([press]), 0.1, 0.01, 0.005)
    cellcfg = cells_ops.make_cell_config(box, float(pot.rc), stride=2)
    nls, cap = ENS.build_ensemble_nl(pot, states, skin=0.4)
    aux = ENS.build_ensemble_aux(pot, states, nls)
    run_c = ENS.make_ensemble_run_fn(1.0, 1.0, cellcfg, skin=0.4,
                                     capacity=cap, mod=10, nrecords=60,
                                     nvol=2, natoms=n, write_traj=False)
    table = jnp.asarray(cellcfg.active_table)
    _, _, _, recs_c, _, diag = run_c(states, nls, aux, pot, table)
    assert int(diag) == 0

    pe_s = np.asarray(recs_s.pe[20:]).mean() / n
    pe_c = np.asarray(recs_c.pe[20:, 0]).mean() / n
    v_s = np.asarray(recs_s.vol[20:]).mean()
    v_c = np.asarray(recs_c.vol[20:, 0]).mean()
    assert abs(pe_c - pe_s) < 0.15, f"pe/N serial={pe_s:.3f} cb={pe_c:.3f}"
    assert abs(v_c - v_s) / v_s < 0.05, f"V serial={v_s:.1f} cb={v_c:.1f}"
