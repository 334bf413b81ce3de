"""Replica exchange: permutation algebra, acceptance, and sharded execution."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops import cells as cells_ops
from neuralmelting_tpu.parallel import ensemble as ENS
from neuralmelting_tpu.parallel import mesh as MESH
from neuralmelting_tpu.sampler import tempering
from neuralmelting_tpu.sampler.state import ensemble_init


def test_pair_partner():
    p0 = np.asarray(tempering._pair_partner(6, 0))
    np.testing.assert_array_equal(p0, [1, 0, 3, 2, 5, 4])
    p1 = np.asarray(tempering._pair_partner(6, 1))
    np.testing.assert_array_equal(p1, [0, 2, 1, 4, 3, 5])
    # odd length leaves the last element unpaired in phase 0
    p0 = np.asarray(tempering._pair_partner(5, 0))
    np.testing.assert_array_equal(p0, [1, 0, 3, 2, 4])


def test_propose_swaps_always_accepts_when_favorable():
    """Hot replica with LOW energy next to cold replica with HIGH energy
    must always swap (ln A > 0)."""
    npress, ntemp = 1, 2
    e = jnp.array([100.0, 0.0])     # cold slot has high E, hot slot low E
    v = jnp.array([50.0, 50.0])
    t = jnp.array([0.5, 2.0])
    p = jnp.array([1.0, 1.0])
    sigma, n_acc = tempering.propose_swaps(
        e, v, t, p, npress, ntemp, axis=1, phase=0,
        key=jax.random.key(0), kb=1.0, p2e=1.0)
    np.testing.assert_array_equal(np.asarray(sigma), [1, 0])
    assert int(n_acc) == 1


def test_propose_swaps_never_accepts_when_impossible():
    """ln A very negative -> no swap."""
    e = jnp.array([0.0, 1000.0])    # cold slot already low E
    v = jnp.array([50.0, 50.0])
    t = jnp.array([0.5, 2.0])
    p = jnp.array([1.0, 1.0])
    sigma, n_acc = tempering.propose_swaps(
        e, v, 1.0 * t, p, 1, 2, axis=1, phase=0,
        key=jax.random.key(0), kb=1.0, p2e=1.0)
    np.testing.assert_array_equal(np.asarray(sigma), [0, 1])
    assert int(n_acc) == 0


def test_apply_exchange_moves_slot_attached_fields():
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 1.6, 2)
    t_grid = jnp.array([0.5, 1.5])
    p_grid = jnp.array([1.0, 1.0])
    states = ensemble_init(pot, pos, box, 1, t_grid, p_grid, 0.1, 0.01, 0.005)
    states = states.replace(dpos=jnp.array([0.111, 0.222]))
    slot_of = jnp.array([0, 1], jnp.int32)
    sigma = jnp.array([1, 0], jnp.int32)  # swap the two slots
    new_states, new_slot_of = tempering.apply_exchange(
        states, slot_of, sigma, t_grid, p_grid)
    # replica 0 now owns slot 1 -> its temp becomes 1.5, dpos becomes the
    # step size tuned for slot 1 (0.222)
    np.testing.assert_array_equal(np.asarray(new_slot_of), [1, 0])
    np.testing.assert_allclose(float(new_states.temp[0]), 1.5)
    np.testing.assert_allclose(float(new_states.temp[1]), 0.5)
    np.testing.assert_allclose(float(new_states.dpos[0]), 0.222)
    np.testing.assert_allclose(float(new_states.dpos[1]), 0.111)
    # configurations did NOT move
    np.testing.assert_array_equal(np.asarray(new_states.pos),
                                  np.asarray(states.pos))


@pytest.mark.slow
def test_exchange_preserves_permutation_validity():
    """After many random exchange events slot_of stays a permutation."""
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 1.6, 2)
    npress, ntemp = 2, 4
    t_grid = jnp.tile(jnp.linspace(0.5, 2.0, ntemp), npress)
    p_grid = jnp.repeat(jnp.linspace(1.0, 4.0, npress), ntemp)
    states = ensemble_init(pot, pos, box, 2, t_grid, p_grid, 0.1, 0.01, 0.005)
    # randomize energies so swaps actually happen
    states = states.replace(
        pe=10.0 * jax.random.normal(jax.random.key(3), (8,)))
    slot_of = jnp.arange(8, dtype=jnp.int32)
    for e in range(8):
        states, slot_of, n = tempering.exchange_event(
            states, slot_of, jax.random.key(100 + e), jnp.asarray(e),
            npress, ntemp, t_grid, p_grid, 1.0, 1.0)
        assert sorted(np.asarray(slot_of).tolist()) == list(range(8))
        # temp of each replica must equal the grid temp of its slot
        np.testing.assert_allclose(
            np.asarray(states.temp),
            np.asarray(t_grid)[np.asarray(slot_of)], rtol=1e-6)


@pytest.mark.slow
def test_ensemble_run_with_exchange_and_sharding():
    """Full exchange run on an 8-device CPU mesh (SURVEY.md §4.4)."""
    assert jax.device_count() == 8
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 1.6, 4)  # 256 atoms
    n = len(pos)
    npress, ntemp = 2, 4
    t_grid = jnp.tile(jnp.linspace(0.6, 1.6, ntemp), npress)
    p_grid = jnp.repeat(jnp.array([1.0, 4.0]), ntemp)
    states = ensemble_init(pot, pos, box, 7, t_grid, p_grid,
                           0.1, 0.01, 0.005)
    cellcfg = cells_ops.make_cell_config(box, float(pot.rc), stride=2)
    nls, cap = ENS.build_ensemble_nl(pot, states, skin=0.4)

    aux = ENS.build_ensemble_aux(pot, states, nls)
    mesh = MESH.make_replica_mesh()
    states, nls = MESH.shard_ensemble(mesh, states, nls)

    run = ENS.make_ensemble_run_fn(
        1.0, 1.0, cellcfg, skin=0.4, capacity=cap,
        mod=3, nrecords=4, nvol=1, natoms=n,
        exchange=True, npress=npress, ntemp=ntemp, write_traj=False)

    slot_of = jnp.arange(8, dtype=jnp.int32)
    table = jnp.asarray(cellcfg.active_table)
    out = run(states, nls, aux, slot_of, jax.random.key(0), pot, table,
              t_grid, p_grid)
    states, nls, aux, slot_of, recs, frames, hist, xacc, diag = out
    assert int(diag) == 0
    assert recs.pe.shape == (4, 8)
    assert hist.shape == (4, 8)
    assert xacc.shape == (4,)
    # slot_of still a permutation; temps consistent with slots
    assert sorted(np.asarray(slot_of).tolist()) == list(range(8))
    np.testing.assert_allclose(
        np.asarray(states.temp),
        np.asarray(t_grid)[np.asarray(slot_of)], rtol=1e-6)
    # every record's replica temps are a permutation of the grid temps
    for k in range(4):
        np.testing.assert_allclose(
            sorted(np.asarray(recs.temp[k]).tolist()),
            sorted(np.asarray(t_grid).tolist()), rtol=1e-6)
