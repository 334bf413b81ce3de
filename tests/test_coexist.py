"""Two-phase coexistence method (neuralmelting_tpu/coexist.py).

Unit tests for the splice geometry and the lever-rule classification,
plus an interpret-mode smoke test of the full prep -> ensemble -> no-
exchange sampling path at toy scale (the on-chip production runs live in
scripts/coexist_run.py; their artifacts are committed, not re-run here).
"""

import numpy as np
import pytest

from neuralmelting_tpu import coexist
from neuralmelting_tpu.models.lattice import make_supercell


def _min_cross_distance(pos_a, pos_b, box):
    d = pos_a[:, None, :] - pos_b[None, :, :]
    d -= box * np.round(d / box)
    return float(np.sqrt((d ** 2).sum(-1)).min())


def test_splice_geometry():
    a = 2.0 ** (2.0 / 3.0)
    ncells = (4, 2, 2)
    solid, _ = make_supercell("fcc", a, (2, 2, 2))
    box = np.array([4 * a, 2 * a, 2 * a], np.float64)
    rng = np.random.default_rng(0)
    lbox = np.array([2.1 * a, 1.9 * a, 2.2 * a])   # drifted NPT box
    liq = rng.uniform(0.0, 1.0, (32, 3)) * lbox
    gap = 0.4

    pos = coexist.splice_two_phase(solid, liq, lbox, box, gap=gap)
    assert pos.shape == (64, 3)
    # solid half untouched, liquid confined to its margin-trimmed half
    np.testing.assert_allclose(pos[:32], solid, rtol=0, atol=1e-6)
    lx = pos[32:, 0]
    assert lx.min() >= 2 * a + gap - 1e-5
    assert lx.max() <= 4 * a - gap + 1e-5
    # transverse axes fill the full box
    assert (pos[32:, 1:] >= -1e-5).all()
    assert (pos[32:, 1] <= box[1] + 1e-5).all()
    # the gap bounds every cross-seam pair distance
    assert _min_cross_distance(pos[:32], pos[32:], box) >= gap - 1e-5

    with pytest.raises(ValueError):
        coexist.splice_two_phase(pos[:40], liq, lbox, box)  # crosses half
    with pytest.raises(ValueError):
        coexist.splice_two_phase(solid, liq, lbox, box, gap=2 * a)


def test_tile_liquid_fills_box():
    a = 1.6
    box = np.array([4 * a, 2 * a, 2 * a])
    lbox = np.array([2.2 * a, 2.0 * a, 1.8 * a])
    rng = np.random.default_rng(1)
    liq = rng.uniform(0.0, 1.0, (16, 3)) * lbox
    pos = coexist.tile_liquid(liq, lbox, box)
    assert pos.shape == (32, 3)
    assert pos[:16, 0].max() <= box[0] / 2 + 1e-5
    assert pos[16:, 0].min() >= box[0] / 2 - 1e-5
    np.testing.assert_allclose(pos[16:, 0] - box[0] / 2, pos[:16, 0],
                               atol=1e-5)


def test_lever_rule_and_classification():
    ntemp = 6
    temps = np.linspace(0.70, 0.80, ntemp)
    pe = np.zeros((coexist.NROWS, ntemp))
    pe[coexist.ROW_SOLID] = -7.0
    pe[coexist.ROW_LIQUID] = -6.0
    # two-phase: frozen, frozen, half, half, melted, melted
    pe[coexist.ROW_TWOPHASE] = -7.0 + np.array(
        [0.05, 0.1, 0.5, 0.55, 0.9, 0.98])
    x = coexist.liquid_fraction(pe)
    np.testing.assert_allclose(x, [0.05, 0.1, 0.5, 0.55, 0.9, 0.98])
    res = coexist.classify_rows(temps, x)
    assert res["consistent"]
    assert res["bracket"] == [pytest.approx(temps[1]),
                              pytest.approx(temps[4])]
    assert len(res["unresolved_temps"]) == 2

    # an inverted ordering must be flagged, not papered over
    res2 = coexist.classify_rows([1.0, 2.0], np.array([0.9, 0.1]))
    assert not res2["consistent"]


def test_classify_series_reference_collapse_guard():
    """Outside the mutual metastability window the pure-phase reference
    rows transform and the raw lever rule blows up; classify_series must
    read the collapse itself as the classification (toy-run regression:
    x = -670 on a frozen-liquid-reference row)."""
    temps = [0.5, 0.75, 1.2]
    nc = 6
    s = np.zeros((nc, coexist.NROWS, 3))
    s[:, coexist.ROW_SOLID] = -7.0
    s[:, coexist.ROW_LIQUID] = -6.0
    # T=0.5: liquid reference freezes after chunk 2 (branch collapse);
    # the two-phase row drifts below the dead branches
    s[2:, coexist.ROW_LIQUID, 0] = -6.95
    s[:, coexist.ROW_TWOPHASE, 0] = -6.9
    # T=0.75: clean coexistence, x ~ 0.5 throughout
    s[:, coexist.ROW_TWOPHASE, 1] = -6.5
    # T=1.2: solid reference melts; two-phase melted too
    s[3:, coexist.ROW_SOLID, 2] = -6.05
    s[:, coexist.ROW_TWOPHASE, 2] = -6.0
    res = coexist.classify_series(temps, s)
    assert res["liquid_ref_froze"] == [True, False, False]
    assert res["solid_ref_melted"] == [False, False, True]
    assert res["frozen_temps"] == [0.5]
    assert res["melted_temps"] == [1.2]
    assert res["unresolved_temps"] == [0.75]
    assert res["consistent"]
    assert res["bracket"] == [0.5, 1.2]

    # both references gone -> the row carries no signal (unresolved)
    s2 = s.copy()
    s2[2:, coexist.ROW_LIQUID, 0] = -6.95
    s2[3:, coexist.ROW_SOLID, 0] = -6.1
    res2 = coexist.classify_series(temps, s2)
    assert 0.5 in res2["unresolved_temps"]


def test_row_pe_per_atom_slot_ordering():
    ntemp, natoms = 2, 10
    r = coexist.NROWS * ntemp
    pe = np.arange(2 * r, dtype=np.float64).reshape(2, r) * natoms
    hist = np.tile(np.arange(r), (2, 1))
    rows = coexist.row_pe_per_atom(pe, hist, natoms, ntemp)
    np.testing.assert_allclose(rows.ravel(), np.arange(r) + r / 2.0)
    # a permuted hist must land records back in slot order
    perm = np.array([1, 0, 3, 2, 5, 4])
    rows2 = coexist.row_pe_per_atom(pe[:, perm], np.tile(perm, (2, 1)),
                                    natoms, ntemp)
    np.testing.assert_allclose(rows2, rows)


@pytest.mark.slow
def test_no_exchange_run_keeps_slots():
    """runner.run_sampling(exchange=False): slots never move, xacc = 0,
    and the sampled physics stays finite (interpret-mode cellmc;
    slow tier — full-engine chains, like test_cellmc_engine.py)."""
    from neuralmelting_tpu import runner
    from neuralmelting_tpu.config import RunConfig

    cfg = RunConfig(name="nx", element="LJ", ncells=(4, 4, 4),
                    npress=2, ntemp=2, press=(1.0, 1.0),
                    temp=(0.6, 1.2), nsmpl=1, mod=4, ncut=0, seed=3,
                    dpos0=0.1, dvol0=0.01)
    setup = runner.setup_run(cfg, engine="cellmc")
    setup, recs, frames, hist, xacc, diag = runner.run_sampling(
        setup, write_files=False, write_traj=False, nrecords=2,
        exchange=False)
    assert int(diag) == 0
    assert np.asarray(xacc).tolist() == [0, 0]
    np.testing.assert_array_equal(np.asarray(hist),
                                  np.tile(np.arange(4), (2, 1)))
    np.testing.assert_array_equal(np.asarray(setup.slot_of), np.arange(4))
    assert np.isfinite(np.asarray(recs.pe)).all()


def test_no_exchange_rejected_off_cellmc():
    from neuralmelting_tpu import runner
    from neuralmelting_tpu.config import RunConfig

    cfg = RunConfig(name="nx2", element="LJ", ncells=(3, 3, 3),
                    npress=1, ntemp=2, press=(1.0,), temp=(0.6, 1.2),
                    nsmpl=1, mod=2, ncut=0, seed=3)
    setup = runner.setup_run(cfg, engine="gather")
    with pytest.raises(ValueError, match="exchange=False"):
        runner.run_sampling(setup, write_files=False, nrecords=1,
                            exchange=False)


@pytest.mark.slow
def test_coexist_prep_and_ensemble_smoke():
    """Full construction path at toy scale: melt a half-box liquid,
    splice, build the 3-row ensemble, advance it two records with
    exchange off. The solid row must stay lower-PE than the liquid row
    at every T, and the two-phase row must sit between the branches."""
    liq_pos, liq_box = coexist.prep_liquid(
        "LJ", (4, 4, 4), temp_melt=2.2, temp_hold=0.9, press=1.0,
        mod=4, melt_records=2, hold_records=1)
    temps = [0.4, 1.0]
    setup = coexist.build_coexist_setup(
        "LJ", (8, 4, 4), temps, press=1.0,
        liquid_pos=liq_pos, liquid_box=liq_box, mod=4)
    from neuralmelting_tpu import runner
    setup, recs, frames, hist, xacc, diag = runner.run_sampling(
        setup, write_files=False, write_traj=False, nrecords=2,
        exchange=False)
    assert int(diag) == 0
    rows = coexist.row_pe_per_atom(np.asarray(recs.pe[-1:]),
                                   np.asarray(hist[-1:]),
                                   setup.natoms, len(temps))
    assert np.isfinite(rows).all()
    # branch ordering at both temperatures
    assert (rows[coexist.ROW_SOLID] < rows[coexist.ROW_LIQUID]).all()
    x = coexist.liquid_fraction(rows)
    assert np.isfinite(x).all()
