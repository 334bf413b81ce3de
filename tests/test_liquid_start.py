"""Cooling-leg seeding (runner.liquid_start): the hysteresis-bracket
machinery's liquid initial condition (docs/VALIDATION.md brackets).

A lattice-start heating sweep superheats; the bracket's other leg needs
every replica molten before it samples at its true slot temperature.
liquid_start pins all slots to overheat*max(T), melts, then restores the
per-slot temperatures. Oracle: potential energy rises well above the
cold-crystal value, and the restored temperature set is exactly the
grid (per-slot; replica order may change through tempering swaps).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neuralmelting_tpu import runner
from neuralmelting_tpu.config import RunConfig


@pytest.mark.slow
def test_liquid_start_melts_and_restores_grid():
    cfg = RunConfig(name="liq", element="LJ", ncells=(3, 3, 3),
                    npress=1, ntemp=4, press=(1.0,),
                    temp=(0.4, 0.6, 0.8, 1.0),
                    nsmpl=1, mod=4, ncut=0, seed=5, dpos0=0.1, dvol0=0.01)
    setup = runner.setup_run(cfg, engine="gather")
    pe0 = float(jnp.mean(setup.states.pe))

    liq = runner.liquid_start(setup, nrecords=3)

    # molten: mean pe rose far above the cold-crystal ensemble's
    pe1 = float(jnp.mean(liq.states.pe))
    assert pe1 > pe0 + 0.5 * setup.natoms * 0.3   # >> thermal noise

    # per-slot temperatures restored exactly (replica order may differ)
    assert np.allclose(sorted(np.asarray(liq.states.temp)),
                       sorted(np.asarray(setup.states.temp)))
    # slot assignment consistent: temp[i] == t_grid[slot_of[i]]
    assert np.allclose(np.asarray(liq.states.temp),
                       np.asarray(liq.t_grid)[np.asarray(liq.slot_of)])
    # energies exact at the boundary: pe is finite and per-replica
    assert np.isfinite(np.asarray(liq.states.pe)).all()
