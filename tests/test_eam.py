"""EAM pipeline: setfl generation -> parse -> splines -> energies -> MC.

Oracles (SURVEY.md §4.1): spline interpolation vs the analytic generator
functions; incremental delta-E vs full recompute; forces vs autodiff;
physics sanity of the synthetic Al parameterization.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralmelting_tpu.models import eam as eam_mod
from neuralmelting_tpu.models import eam_gen
from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.ops import eam_energy as EE
from neuralmelting_tpu.ops import neighbors as NB


@pytest.fixture(scope="module")
def setfl_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("eam") / "Al.synthetic.eam.alloy")
    eam_gen.write_setfl(path)
    return path


@pytest.fixture(scope="module")
def eam(setfl_path):
    return eam_mod.load(setfl_path)


@pytest.fixture(scope="module")
def al_crystal():
    pos, box = make_supercell("fcc", 4.05, 3)  # 108 atoms, box 12.15
    return jnp.asarray(pos), jnp.asarray(box)


def test_parse_roundtrip(setfl_path):
    data = eam_mod.parse_setfl(setfl_path)
    assert data.element == "Al"
    assert data.nr == data.nrho == 5000
    np.testing.assert_allclose(data.rc, 6.0)
    # tables match the analytic generator
    r = np.arange(data.nr) * data.dr
    np.testing.assert_allclose(data.rho_r[1000:], eam_gen.rho_f(r[1000:]),
                               rtol=1e-10)
    rho = np.arange(data.nrho) * data.drho
    np.testing.assert_allclose(data.f_rho[1:], eam_gen.embed_f(rho[1:]),
                               rtol=1e-10)


def test_spline_matches_analytic(eam):
    r = jnp.linspace(1.5, 5.8, 777)
    val, der = eam_mod.spline_eval(eam.rho_coef, eam.dr, r)
    np.testing.assert_allclose(val, eam_gen.rho_f(np.asarray(r)),
                               rtol=2e-4, atol=2e-6)
    # derivative vs numeric difference of the analytic function
    h = 1e-4
    dnum = (eam_gen.rho_f(np.asarray(r) + h)
            - eam_gen.rho_f(np.asarray(r) - h)) / (2 * h)
    np.testing.assert_allclose(der, dnum, rtol=5e-3, atol=5e-4)


def test_embedding_spline(eam):
    rho = jnp.linspace(2.0, 40.0, 321)
    val, _ = eam_mod.spline_eval(eam.f_coef, eam.drho, rho)
    np.testing.assert_allclose(val, eam_gen.embed_f(np.asarray(rho)),
                               rtol=2e-4, atol=2e-5)


def test_cohesive_energy_reasonable(eam, al_crystal):
    pos, box = al_crystal
    nl = NB.build(pos, box, float(eam.rc) + 0.3, capacity=96)
    assert not bool(nl.overflow)
    pe, vir = EE.total_energy_virial(eam, pos, box, nl)
    ecoh = float(pe) / len(pos)
    assert -4.5 < ecoh < -2.0, f"cohesive energy {ecoh} eV/atom unphysical"
    # near-equilibrium: |P| below ~2 GPa-equivalent in eV/A^3 terms
    vol = float(jnp.prod(box))
    p_virial = float(vir) / (3 * vol)  # eV/A^3
    assert abs(p_virial) < 0.02, f"virial pressure {p_virial} eV/A^3"


def test_delta_matches_full_recompute(eam, al_crystal):
    pos, box = al_crystal
    nl = NB.build(pos, box, float(eam.rc) + 0.3, capacity=96)
    rho = EE.rho_sums(eam, pos, box, nl)
    ids = jnp.array([5, 60])
    disp = jax.random.uniform(jax.random.key(1), (2, 3),
                              minval=-0.2, maxval=0.2)
    new_r = pos[ids] + disp

    pe0, _ = EE.total_energy_virial(eam, pos, box, nl)
    # movers are far apart (>2rc) in this 12.15 A box? 2rc=12 > box/2 —
    # so move ONE at a time for the oracle comparison
    for k in range(2):
        de, dw, payload = EE.delta_moves(eam, pos, box, nl, rho,
                                         ids[k:k+1], new_r[k:k+1])
        pos2 = pos.at[ids[k]].set(new_r[k])
        nl2 = NB.build(pos2, box, float(eam.rc) + 0.3, capacity=96)
        pe1, _ = EE.total_energy_virial(eam, pos2, box, nl2)
        np.testing.assert_allclose(float(de[0]), float(pe1 - pe0),
                                   rtol=2e-3, atol=5e-4)


def test_apply_accept_updates_rho(eam, al_crystal):
    pos, box = al_crystal
    nl = NB.build(pos, box, float(eam.rc) + 0.3, capacity=96)
    rho = EE.rho_sums(eam, pos, box, nl)
    i = jnp.array([17])
    new_r = pos[i] + jnp.array([[0.15, -0.1, 0.05]])
    de, dw, payload = EE.delta_moves(eam, pos, box, nl, rho, i, new_r)
    rho2 = EE.apply_accept(rho, i, jnp.array([True]), payload)
    pos2 = pos.at[17].set(new_r[0])
    rho_ref = EE.rho_sums(eam, pos2, box, nl)  # same nl: skin covers 0.19
    np.testing.assert_allclose(rho2, rho_ref, rtol=2e-4, atol=2e-4)
    # rejected move leaves rho untouched
    rho3 = EE.apply_accept(rho, i, jnp.array([False]), payload)
    np.testing.assert_allclose(rho3, rho, rtol=0, atol=0)


def test_forces_are_negative_gradient(eam, al_crystal):
    pos, box = al_crystal
    pos = pos + 0.08 * jax.random.normal(jax.random.key(3), pos.shape)
    nl = NB.build(pos, box, float(eam.rc) + 0.3, capacity=96)
    f = EE.forces(eam, pos, box, nl)
    g = jax.grad(lambda p: EE.total_energy_virial(eam, p, box, nl)[0])(pos)
    np.testing.assert_allclose(f, -g, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_eam_checkerboard_mc_runs(al_crystal):
    """Short NPT MC on synthetic Al via the full ensemble machinery."""
    from neuralmelting_tpu.ops import cells as cells_ops
    from neuralmelting_tpu.parallel import ensemble as ENS
    from neuralmelting_tpu.sampler.state import ensemble_init
    from neuralmelting_tpu import units

    # shorter-cutoff table: EAM checkerboard needs (stride-1)*w >= 2*rc,
    # so a 16.2 A box requires rc <= ~3.9 (full-range Al runs need >= 7^3
    # cells; covered by the melting-curve pipeline, not unit tests)
    import tempfile
    short_path = tempfile.mktemp(suffix=".eam.alloy")
    eam_gen.write_setfl(short_path, rc=3.8, rs=3.0)
    eam = eam_mod.load(short_path)
    pos, box = make_supercell("fcc", 4.05, 4)  # 256 atoms, box 16.2
    u = units.METAL
    temps = jnp.array([300.0, 900.0])
    presses = jnp.array([1.0, 1.0])  # bar
    states = ensemble_init(eam, pos, box, 5, temps, presses,
                           dpos0=0.1, dvol_frac0=0.005, dt0=0.004,
                           energy_fn=lambda pot, p, b: (
                               jnp.zeros(()), jnp.zeros(())))
    cellcfg = cells_ops.make_cell_config(
        box, eam_mod.interaction_range(eam), stride=2, dpos_cap=0.2)
    nls, cap = ENS.build_ensemble_nl(eam, states, skin=0.3)
    assert not bool(nls.overflow.any())
    aux = ENS.build_ensemble_aux(eam, states, nls)
    # fix pe/virial now that lists exist
    from neuralmelting_tpu.ops import potential_ops as PO
    pe, vir = jax.vmap(lambda p, b, nl: PO.eam_ops.total(eam, p, b, nl))(
        states.pos, states.box, nls)
    states = states.replace(pe=pe, virial=vir)

    run = ENS.make_ensemble_run_fn(u.kb, u.p2e, cellcfg, skin=0.3,
                                   capacity=cap, mod=3, nrecords=2,
                                   nvol=1, natoms=256, style="eam",
                                   write_traj=False)
    table = jnp.asarray(cellcfg.active_table)
    states, nls, aux, recs, _, diag = run(states, nls, aux, eam, table)
    assert int(diag) == 0
    # energy cache consistent with full recompute
    for r in range(2):
        nl_r = NB.build(states.pos[r], states.box[r],
                        float(eam.rc) + 0.3, cap)  # noqa: cap from run
        pe_full, _ = EE.total_energy_virial(eam, states.pos[r],
                                            states.box[r], nl_r)
        np.testing.assert_allclose(float(states.pe[r]), float(pe_full),
                                   rtol=1e-4, atol=0.05)
    # cold replica stays bound near cohesive energy
    assert float(recs.pe[-1, 0]) / 256 < -2.5
