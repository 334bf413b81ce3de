"""HMC (hybrid MC) coverage in the batched ensemble (SURVEY.md §2.4)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops import cells as cells_ops
from neuralmelting_tpu.ops import energy as E
from neuralmelting_tpu.parallel import ensemble as ENS
from neuralmelting_tpu.sampler import moves
from neuralmelting_tpu.sampler.state import ensemble_init, init_state


def test_hmc_energy_conservation_small_dt():
    """dH -> 0 as dt -> 0: leapfrog correctness."""
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 1.6, 2)
    st = init_state(pot, pos, box, jax.random.key(5), 0.5, 1.0,
                    0.1, 0.01, 1e-4)
    backend = moves.brute_backend()
    # with a tiny timestep virtually every HMC move must be accepted
    acc = 0
    for k in range(5):
        st2 = moves.hmc_move(pot, 1.0, backend, st, jax.random.key(k),
                             nstps=10, mass=1.0)
        acc += int(st2.nah) - int(st.nah)
        st = st2
    assert acc == 5, f"only {acc}/5 tiny-dt HMC moves accepted"


@pytest.mark.slow
def test_ensemble_with_hmc_moves():
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 1.6, 4)
    states = ensemble_init(pot, pos, box, 3, jnp.array([0.8, 1.2]),
                           jnp.array([1.0, 1.0]), 0.1, 0.01, 0.002)
    cellcfg = cells_ops.make_cell_config(box, pot.rc_host, stride=2)
    nls, cap = ENS.build_ensemble_nl(pot, states, skin=0.4)
    aux = ENS.build_ensemble_aux(pot, states, nls)
    run = ENS.make_ensemble_run_fn(1.0, 1.0, cellcfg, skin=0.4,
                                   capacity=cap, mod=3, nrecords=2,
                                   nvol=1, nhmc=1, nstps=5, mass=1.0,
                                   natoms=256, write_traj=False)
    table = jnp.asarray(cellcfg.active_table)
    states, nls, aux, recs, _, diag = run(states, nls, aux, pot, table)
    assert int(diag) == 0
    # HMC was attempted and recorded
    assert float(np.asarray(recs.acc_hmc).max()) >= 0.0
    assert int(states.sweep[0]) == 6
    # energy cache still consistent after whole-configuration moves
    for r in range(2):
        pe_b, _ = E.pair_energy_virial(pot, states.pos[r], states.box[r])
        np.testing.assert_allclose(float(states.pe[r]), float(pe_b),
                                   rtol=5e-4, atol=0.05)
