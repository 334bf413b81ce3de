"""Long-rc EAM drop-in path (VERDICT r4 missing #2 / directive #7).

Published Al tables (Al99.eam.alloy-style) carry rc ~ 6.3 A — much
longer than the rc=3.8 bench table every prior round exercised. The
long cutoff changes the production geometry regime entirely: stride-3
cells must be >= rc wide, so a 5^3-supercell box (20.25 A) bins into
the minimum 3^3 = 27 cells at ~18.5 atoms/cell — well above the bench
table's 16-slot regime.

Fast tier: the formal drop-in path (parser -> spline -> Chebyshev refit
-> cell geometry) at the long range. Slow tier: the production engine's
total kernel at that geometry pinned to the brute O(N^2) oracle (the
CPU interpret-mode kernel pass alone costs ~1 min; the at-scale on-chip
record comes from scripts/longrc_run.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neuralmelting_tpu import runner
from neuralmelting_tpu.config import RunConfig
from neuralmelting_tpu.models import eam as EAM
from neuralmelting_tpu.models import eam_cheb as EC
from neuralmelting_tpu.models import eam_gen
from neuralmelting_tpu.ops.pallas import cellmc as CMK

RC_LONG = 6.3


def brute_cheb_pe(ch, pos, box):
    d = pos[:, None, :] - pos[None, :, :]
    d -= box * jnp.round(d / box)
    u = (d ** 2).sum(-1)
    n = pos.shape[0]
    mask = (u < ch.rc * ch.rc) & ~jnp.eye(n, dtype=bool)
    phi = jnp.where(mask, EC.cheb_eval(ch.c_phi, ch.u_lo, ch.u_hi, u), 0.0)
    fr = jnp.where(mask, EC.cheb_eval(ch.c_rho, ch.u_lo, ch.u_hi, u), 0.0)
    rho = fr.sum(-1)
    q = jnp.sqrt(jnp.clip(rho, 0.0, ch.rho_hi))
    femb = EC.cheb_eval(ch.c_f, ch.q_lo, jnp.sqrt(ch.rho_hi), q)
    return float(0.5 * phi.sum() + femb.sum())


def test_longrc_refit_and_geometry(tmp_path):
    """Fast: setfl at rc=6.3 parses, refits, and produces the minimum
    3^3 stride-3 geometry with the kcap the ~18.5-atom cells need."""
    path = str(tmp_path / "Al_longrc.eam.alloy")
    eam_gen.write_setfl(path, rc=RC_LONG, rs=5.1)
    pot = EAM.load(path)
    assert float(pot.rc_host) == pytest.approx(RC_LONG)
    ch = EC.from_spline(pot)
    # refit quality holds at the long range (errors recorded on the pot)
    assert max(ch.fit_err) < 5e-4
    box = np.array([5, 5, 5], float) * 4.05      # 500-atom supercell
    geom = CMK.make_geom(box, float(ch.rc_host), 500, nsub=1, stride=3)
    assert geom.ncell == (3, 3, 3)
    assert geom.kcap >= 24          # ~18.5 atoms/cell mean occupancy


@pytest.mark.slow
def test_longrc_setfl_dropin(tmp_path):
    path = str(tmp_path / "Al_longrc.eam.alloy")
    eam_gen.write_setfl(path, rc=RC_LONG, rs=5.1)

    cfg = RunConfig(name="lrc", element="AL", ncells=(5, 5, 5),
                    npress=1, ntemp=1, press=(1.0,), temp=(300.0,),
                    nsmpl=1, mod=1, seed=3, dpos0=0.1, dvol0=0.004)
    setup = runner.setup_run(cfg, setfl=str(path), engine="cellmc")

    # the long cutoff must have produced the 3^3 minimum-cell geometry
    assert setup.style == "eam"
    assert setup.geom.ncell == (3, 3, 3)
    assert float(setup.pot.rc_host) == pytest.approx(RC_LONG)
    # ~18.5 atoms/cell mean: kcap must sit above the rc=3.8 regime (16)
    assert setup.geom.kcap >= 24

    # energy oracle at the long range: setup_run's eam_initial_rho pass
    # (total kernel at scale=1) vs brute O(N^2) Chebyshev
    pe_kernel = float(setup.states.pe[0])
    pe_brute = brute_cheb_pe(setup.pot, setup.states.pos[0],
                             setup.states.box[0])
    assert pe_kernel == pytest.approx(pe_brute, rel=1e-4, abs=0.02)
    # cohesive-energy sanity: the synthetic Al parameterization gives
    # ~ -3.36 eV/atom at a=4.05 regardless of the switch range
    assert -3.7 < pe_kernel / setup.natoms < -3.0
