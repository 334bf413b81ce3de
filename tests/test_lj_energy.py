import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops import energy as E


def numpy_lj_reference(pos, box, eps, sigma, rc):
    """Independent slow loop implementation (SURVEY.md §4.1)."""
    pos = np.asarray(pos, np.float64)
    box = np.asarray(box, np.float64)
    n = len(pos)
    pe = 0.0
    vir = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            d = pos[i] - pos[j]
            d -= box * np.round(d / box)
            r2 = (d ** 2).sum()
            if r2 < rc * rc:
                sr6 = (sigma * sigma / r2) ** 3
                pe += 4 * eps * (sr6 * sr6 - sr6)
                vir += 24 * eps * (2 * sr6 * sr6 - sr6)
    return pe, vir


def test_dimer_at_minimum():
    pot = LJCut.create()
    pos = jnp.array([[0.0, 0.0, 0.0], [2.0 ** (1 / 6), 0.0, 0.0]])
    box = jnp.array([50.0, 50.0, 50.0])
    pe, vir = E.pair_energy_virial(pot, pos, box)
    np.testing.assert_allclose(pe, -1.0, atol=1e-5)
    np.testing.assert_allclose(vir, 0.0, atol=1e-4)


def test_cutoff_excludes_far_pair():
    pot = LJCut.create(rc=2.5)
    pos = jnp.array([[0.0, 0.0, 0.0], [2.6, 0.0, 0.0]])
    box = jnp.array([50.0, 50.0, 50.0])
    pe, _ = E.pair_energy_virial(pot, pos, box)
    assert pe == 0.0


def test_minimum_image_across_boundary():
    pot = LJCut.create()
    # particles at 0.1 and L-0.1: true separation 0.2 through the boundary
    box = jnp.array([10.0, 10.0, 10.0])
    pos = jnp.array([[0.1, 5.0, 5.0], [9.9, 5.0, 5.0]])
    pe, _ = E.pair_energy_virial(pot, pos, box)
    ref, _ = numpy_lj_reference(pos, box, 1.0, 1.0, 2.5)
    np.testing.assert_allclose(pe, ref, rtol=1e-4)


def test_fcc_crystal_vs_numpy_reference():
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 2.0 ** (2 / 3), 3)
    pe, vir = E.pair_energy_virial(pot, jnp.asarray(pos), jnp.asarray(box))
    pe_ref, vir_ref = numpy_lj_reference(pos, box, 1.0, 1.0, 2.5)
    np.testing.assert_allclose(pe, pe_ref, rtol=2e-4)
    np.testing.assert_allclose(vir, vir_ref, rtol=2e-3, atol=1e-2)


def test_delta_move_matches_full_recompute():
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 1.6, 3)
    pos = jnp.asarray(pos)
    box = jnp.asarray(box)
    key = jax.random.key(0)
    pe0, vir0 = E.pair_energy_virial(pot, pos, box)
    i = 17
    new_ri = pos[i] + jax.random.uniform(key, (3,), minval=-0.2, maxval=0.2)
    de, dw = E.delta_move_brute(pot, pos, box, i, new_ri)
    pos2 = pos.at[i].set(new_ri)
    pe1, vir1 = E.pair_energy_virial(pot, pos2, box)
    np.testing.assert_allclose(de, pe1 - pe0, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(dw, vir1 - vir0, rtol=1e-3, atol=2e-2)


def test_forces_are_negative_gradient():
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 1.6, 2)
    pos = jnp.asarray(pos) + 0.05 * jax.random.normal(
        jax.random.key(1), (len(pos), 3))
    box = jnp.asarray(box)
    f = E.forces(pot, pos, box)
    g = jax.grad(lambda p: E.pair_energy_virial(pot, p, box)[0])(pos)
    np.testing.assert_allclose(f, -g, rtol=1e-3, atol=1e-3)
