import jax
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops import energy as E
from neuralmelting_tpu.sampler import moves, serial, driver
from neuralmelting_tpu.sampler.state import init_state


def _setup(n_cells=2, temp=0.75, press=1.0):
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 2.0 ** (2 / 3), n_cells)
    state = init_state(pot, pos, box, jax.random.key(7), temp, press,
                       dpos0=0.1, dvol_frac0=0.01, dt0=0.005)
    return pot, state


def test_energy_cache_stays_consistent():
    """Incremental pe/virial must match a from-scratch recompute."""
    pot, state = _setup()
    sweep = serial.make_sweep_fn(kb=1.0, p2e=1.0,
                                 backend=moves.brute_backend(),
                                 ppos=0.9, pvol=0.1, nstps=4, mass=1.0)
    run = driver.make_run_fn(sweep, kb=1.0, mod=5, nrecords=2, jit=True)
    state, recs, frames = run(pot, state)
    pe_full, vir_full = E.pair_energy_virial(pot, state.pos, state.box)
    np.testing.assert_allclose(state.pe, pe_full, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(state.virial, vir_full, rtol=1e-3, atol=0.2)
    assert int(state.sweep) == 10
    assert recs.pe.shape == (2,)
    assert frames[0].shape == (2, 32, 3)


def test_acceptance_counters_and_ratios():
    pot, state = _setup()
    sweep = serial.make_sweep_fn(kb=1.0, p2e=1.0,
                                 backend=moves.brute_backend(),
                                 ppos=1.0, pvol=0.0, nstps=4, mass=1.0)
    state2 = sweep(pot, state)
    n = state.pos.shape[0]
    assert int(state2.ntp) == n
    assert 0 <= int(state2.nap) <= n


def test_hmc_move_runs_and_preserves_energy_cache():
    pot, state = _setup()
    key = jax.random.key(3)
    st = moves.hmc_move(pot, 1.0, moves.brute_backend(), state, key,
                        nstps=8, mass=1.0)
    pe_full, _ = E.pair_energy_virial(pot, st.pos, st.box)
    np.testing.assert_allclose(st.pe, pe_full, rtol=1e-4, atol=1e-2)
    assert int(st.nth) == 1


def test_volume_move_rescales_consistently():
    pot, state = _setup()
    accepted = 0
    st = state
    for s in range(20):
        st = moves.volume_move(pot, 1.0, 1.0, moves.brute_backend(), st,
                               jax.random.key(100 + s))
    pe_full, _ = E.pair_energy_virial(pot, st.pos, st.box)
    np.testing.assert_allclose(st.pe, pe_full, rtol=1e-4, atol=1e-2)
    assert int(st.ntv) == 20
    # positions must remain inside the (possibly rescaled) box
    assert bool(jnp.all(st.pos >= 0)) and bool(jnp.all(st.pos <= st.box))


def test_cold_crystal_low_t_stays_bound():
    """At very low T a crystal must not blow apart (basic physics sanity)."""
    pot, state = _setup(temp=0.05)
    sweep = serial.make_sweep_fn(kb=1.0, p2e=1.0,
                                 backend=moves.brute_backend(),
                                 ppos=0.97, pvol=0.03, nstps=4, mass=1.0)
    run = driver.make_run_fn(sweep, kb=1.0, mod=10, nrecords=3, jit=True)
    pe0 = float(state.pe)
    state, recs, _ = run(pot, state)
    assert float(state.pe) < 0.5 * pe0  # stays strongly bound (pe0 < 0)
