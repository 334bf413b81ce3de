"""Dense (ghost + MXU matmul) path vs the gather/neighbor-list oracle."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops import cells as cells_ops
from neuralmelting_tpu.ops import dense_delta as DD
from neuralmelting_tpu.ops import energy as E
from neuralmelting_tpu.ops import ghosts as GH
from neuralmelting_tpu.sampler import dense as DS
from neuralmelting_tpu.sampler.state import ensemble_init


def _sys(ncells=4, a=1.6, jitter=0.0, seed=0):
    pos, box = make_supercell("fcc", a, ncells)
    pos = jnp.asarray(pos)
    box = jnp.asarray(box)
    if jitter:
        pos = pos + jitter * jax.random.normal(jax.random.key(seed),
                                               pos.shape)
        pos = pos - box * jnp.floor(pos / box)
    return pos, box


def test_ghost_build_counts_and_positions():
    pos, box = _sys()
    shell = 2.9
    gcap = GH.suggest_gcap(len(pos), box, shell)
    gm = GH.build(pos, box, shell, gcap)
    assert not bool(gm.overflow)
    ng = int(gm.nghost)
    assert ng > 0
    # every ghost equals parent + sign*box
    pe = np.asarray(gm.pos_ext)
    par = np.asarray(gm.parent_ext)
    sg = np.asarray(gm.sign)
    n = len(pos)
    for g in range(0, ng, max(1, ng // 13)):
        expect = np.asarray(pos)[par[n + g]] + sg[g] * np.asarray(box)
        np.testing.assert_allclose(pe[n + g], expect, rtol=1e-6)
    # unused slots parked far away
    if ng < gcap:
        assert (pe[n + ng:] > 1e29).all()


def test_ghost_rank_overflow_flagged():
    """shell > box/2 makes an atom need >7 images (within shell of BOTH
    faces of an axis); the build must flag it instead of silently dropping
    image slots (ADVICE.md r1 low #1)."""
    pos, box = _sys(ncells=2, a=1.6)          # box = 3.2 per axis
    shell = 1.7                                # > box/2 = 1.6
    gm = GH.build(pos, box, shell, gcap=512)
    assert bool(gm.overflow)
    # a safe shell on the same system stays clean
    gm_ok = GH.build(pos, box, 1.5, gcap=512)
    assert not bool(gm_ok.overflow)


def test_ghost_needs_rebuild_budget_and_shrink():
    pos, box = _sys(jitter=0.05, seed=3)
    rc = 2.5
    gm = GH.build(pos, box, rc + 0.4, GH.suggest_gcap(len(pos), box, rc + 0.4))
    assert not bool(GH.needs_rebuild(gm, rc))
    # an upcoming pass may move any particle by 0.25 -> pre-trigger
    assert bool(GH.needs_rebuild(gm, rc, budget=0.25))
    assert not bool(GH.needs_rebuild(gm, rc, budget=0.19))
    # pending shrink c: coverage needs rc/c + 2*maxdisp <= shell
    assert bool(GH.needs_rebuild(gm, rc, shrink=rc / (rc + 0.5)))
    assert not bool(GH.needs_rebuild(gm, rc, shrink=0.999))


def test_dense_delta_matches_brute():
    pot = LJCut.create()
    pos, box = _sys(jitter=0.05)
    shell = 2.9
    gm = GH.build(pos, box, shell, GH.suggest_gcap(len(pos), box, shell))
    ids = jnp.array([3, 77, 200])
    disp = jax.random.uniform(jax.random.key(2), (3, 3),
                              minval=-0.15, maxval=0.15)
    old_r = pos[ids]
    new_r = old_r + disp
    de, dw = DD.delta_moves_dense(pot, gm, ids, old_r, new_r,
                                  with_virial=True)
    for k in range(3):
        de_b, dw_b = E.delta_move_brute(pot, pos, box, int(ids[k]), new_r[k])
        np.testing.assert_allclose(de[k], de_b, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(dw[k], dw_b, rtol=2e-4, atol=2e-3)


def test_dense_total_matches_brute():
    pot = LJCut.create()
    pos, box = _sys(jitter=0.05)
    gm = GH.build(pos, box, 2.9, GH.suggest_gcap(len(pos), box, 2.9))
    pe_d, w_d = DD.total_energy_virial_dense(pot, gm, len(pos))
    pe_b, w_b = E.pair_energy_virial(pot, pos, box)
    np.testing.assert_allclose(pe_d, pe_b, rtol=3e-4, atol=1e-2)
    np.testing.assert_allclose(w_d, w_b, rtol=3e-4, atol=0.1)


def test_apply_moves_updates_ghosts():
    pot = LJCut.create()
    pos, box = _sys()
    gm = GH.build(pos, box, 2.9, GH.suggest_gcap(len(pos), box, 2.9))
    # move a boundary atom (has ghosts) and an interior atom
    par = np.asarray(gm.parent_ext)
    n = len(pos)
    boundary = int(par[n])  # parent of first ghost
    ids = jnp.array([boundary], jnp.int32)
    delta = jnp.array([[0.07, -0.02, 0.01]])
    gm2 = GH.apply_moves(gm, box, ids, delta)
    pe = np.asarray(gm2.pos_ext)
    np.testing.assert_allclose(pe[boundary],
                               np.asarray(pos)[boundary] + delta[0],
                               rtol=1e-5)
    # all its ghosts moved by the same delta
    slots = np.asarray(gm.slots_of)[boundary]
    for s in slots:
        if s < gm.pos_ext.shape[0]:
            np.testing.assert_allclose(
                pe[s] - np.asarray(gm.pos_ext)[s], delta[0], atol=1e-5)


@pytest.mark.slow
def test_dense_mc_matches_gather_statistics():
    """Dense sampler equilibrium agrees with brute-force total energies."""
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 1.6, 4)
    n = len(pos)
    states = ensemble_init(pot, pos, box, 11, jnp.array([0.8, 1.4]),
                           jnp.array([2.0, 2.0]), 0.1, 0.01, 0.005)
    cellcfg = cells_ops.make_cell_config(box, pot.rc_host, stride=2)
    shell = pot.rc_host + 0.4
    gcap = GH.suggest_gcap(n, box, shell)
    gms = DS.build_ensemble_ghosts(states, shell, gcap)
    run = DS.make_dense_run_fn(1.0, 1.0, cellcfg, shell=shell, gcap=gcap,
                               mod=5, nrecords=4,
                               npasses=max(1, n // cellcfg.ncells_total),
                               nvol=1)
    table = jnp.asarray(cellcfg.active_table)
    states, gms, recs, _, diag = run(states, gms, pot, table)
    assert int(diag) == 0
    # energy cache (from dense total) must equal an independent brute total
    for r in range(2):
        pe_b, _ = E.pair_energy_virial(pot, states.pos[r], states.box[r])
        np.testing.assert_allclose(float(states.pe[r]), float(pe_b),
                                   rtol=5e-4, atol=0.05)
    # sampling actually happened (window counters reset at adaptation, so
    # look at the recorded acceptance ratios) and cold < hot in energy
    assert int(states.sweep[0]) == 20
    assert float(np.asarray(recs.acc_pos).max()) > 0.0
    assert float(states.pe[0]) < float(states.pe[1])


@pytest.mark.slow
def test_dense_runner_with_exchange():
    """Dense engine through the production runner incl. tempering."""
    import numpy as np
    from neuralmelting_tpu import runner
    from neuralmelting_tpu.config import RunConfig

    cfg = RunConfig(name="d", element="LJ", ncells=(4, 4, 4),
                    npress=1, ntemp=4, press=(1.0,),
                    temp=(0.5, 0.8, 1.1, 1.4),
                    nsmpl=4, mod=4, ncut=1, seed=5,
                    dpos0=0.1, dvol0=0.01)
    setup = runner.setup_run(cfg, engine="dense")
    setup, recs, frames, hist, xacc, diag = runner.run_sampling(
        setup, write_files=False)
    assert int(diag) == 0
    pe = np.asarray(recs.pe[-1]) / 256
    assert np.isfinite(pe).all()
    # energies ordered with temperature at the last record (slot order)
    perm = np.argsort(np.asarray(hist)[-1])
    pe_slots = pe[perm]
    assert pe_slots[0] < pe_slots[-1]
    # slot permutation remains valid
    assert sorted(np.asarray(setup.slot_of).tolist()) == [0, 1, 2, 3]
