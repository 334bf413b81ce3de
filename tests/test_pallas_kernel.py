"""Pallas LJ delta-E kernel vs the brute-force oracle (interpret mode on
CPU; the same kernel compiles for real TPU — exercised via bench/verify)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops import energy as E
from neuralmelting_tpu.ops.pallas.lj_kernel import delta_moves_pallas


@pytest.mark.slow
def test_pallas_delta_matches_brute():
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 1.6, 4)  # 256 atoms
    pos = jnp.asarray(pos) + 0.04 * jax.random.normal(jax.random.key(0),
                                                      (256, 3))
    box = jnp.asarray(box)
    pos = pos - box * jnp.floor(pos / box)

    ids = jnp.array([[3, 60, 120, 250]], jnp.int32)       # (R=1, M=4)
    old_r = pos[ids[0]][None]
    disp = jax.random.uniform(jax.random.key(1), (1, 4, 3),
                              minval=-0.15, maxval=0.15)
    new_r = old_r + disp

    de = delta_moves_pallas(pot, pos[None], box[None], ids, old_r, new_r,
                            interpret=True)
    assert de.shape == (1, 4)
    for k in range(4):
        de_b, _ = E.delta_move_brute(pot, pos, box, int(ids[0, k]),
                                     new_r[0, k])
        np.testing.assert_allclose(de[0, k], de_b, rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_pallas_delta_batched_replicas():
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 1.6, 3)  # 108 atoms
    pos = jnp.asarray(pos)
    box = jnp.asarray(box)
    posb = jnp.stack([pos, pos + 0.01])
    boxb = jnp.stack([box, box])
    ids = jnp.array([[5, 50], [7, 90]], jnp.int32)
    old_r = jnp.stack([posb[0][ids[0]], posb[1][ids[1]]])
    new_r = old_r + 0.05
    de = delta_moves_pallas(pot, posb, boxb, ids, old_r, new_r,
                            interpret=True)
    assert de.shape == (2, 2)
    de_b, _ = E.delta_move_brute(pot, posb[1], box, int(ids[1, 0]),
                                 new_r[1, 0])
    np.testing.assert_allclose(de[1, 0], de_b, rtol=3e-4, atol=3e-4)
