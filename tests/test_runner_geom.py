"""Unit tests for the runner's cellmc geometry maintenance: kcap
hysteresis (no recompile flap), overflow-grow on rebind, and atom
conservation through a forced rebin (runner.py `_refresh_cellmc_geom`
/ `_rebind_cellmc`; VERDICT r2 weak #6 follow-up, ADVICE r2 #4).

Spec parity: the reference had no equivalent — LAMMPS owned neighbor
binning (SURVEY.md section 2.1); these guard the TPU-native slab
machinery that replaces it.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow   # every geometry-maintenance chain costs 60-330 s of CPU-interpret compile

from neuralmelting_tpu import runner
from neuralmelting_tpu.config import RunConfig
from neuralmelting_tpu.ops.pallas import cellmc as CMK


@pytest.fixture(scope="module")
def small_setup():
    cfg = RunConfig(name="geomtest", element="LJ", ncells=(4, 4, 4),
                    npress=1, ntemp=2, press=(1.0,), temp=(0.8, 1.2),
                    nsmpl=1, mod=2, seed=3, dpos0=0.1, dvol0=0.01)
    return runner.setup_run(cfg, engine="cellmc")


def _count_rebinds(monkeypatch):
    calls = []
    orig = runner._rebind_cellmc

    def spy(setup, geom):
        calls.append(geom)
        return orig(setup, geom)

    monkeypatch.setattr(runner, "_rebind_cellmc", spy)
    return calls


def test_kcap_hysteresis_holds_in_band(small_setup, monkeypatch):
    """Occupancy comfortably inside (kcap-16, kcap-4] must NOT rebind —
    a plain tight_kcap != kcap test recompiles every chunk."""
    setup = small_setup
    calls = _count_rebinds(monkeypatch)
    g = setup.geom
    mid = g.kcap - 8                      # inside the dead band
    fake = dataclasses.replace(
        setup, slab_count=jnp.minimum(setup.slab_count, 0) + mid)
    out = runner._refresh_cellmc_geom(fake)
    assert calls == []
    assert out.geom.kcap == g.kcap


def test_kcap_grows_near_overflow(small_setup, monkeypatch):
    """Max occupancy within 4 slots of kcap must grow capacity."""
    setup = small_setup
    calls = _count_rebinds(monkeypatch)
    g = setup.geom
    near = g.kcap - 2
    fake = dataclasses.replace(
        setup,
        slab_count=setup.slab_count.at[0, 0].set(near))
    out = runner._refresh_cellmc_geom(fake)
    assert len(calls) == 1
    # strict: capacity actually grew to fit the near-overflow occupancy
    # (ADVICE r3 low #2: the old `or kcap > kcap-4` clause was vacuous)
    assert out.geom.kcap >= CMK.tight_kcap(near, g.nsub)
    assert out.geom.kcap > g.kcap


def test_rebind_overflow_grows_and_conserves_atoms(small_setup):
    """A rebind into a too-small kcap must grow-and-retry (never drop
    atoms silently) — the restore_setup path rides this (ADVICE r2 #4)."""
    setup = small_setup
    tiny = dataclasses.replace(setup.geom, kcap=8)
    out = runner._rebind_cellmc(setup, tiny)
    # per-replica atom totals preserved exactly
    per_rep = np.asarray(jnp.sum(out.slab_count, axis=1))
    assert (per_rep == setup.natoms).all()
    assert int(jnp.max(out.slab_count)) <= out.geom.kcap
    # energies refreshed for the new slabs: finite and matching shape
    assert np.isfinite(np.asarray(out.states.pe)).all()


def test_scoped_vmem_guard_drops_nsub(small_setup):
    """kcap >= 72 with nsub 16 exceeds the Mosaic scoped-VMEM budget;
    the rebind guard must halve the mover groups."""
    setup = small_setup
    big = dataclasses.replace(setup.geom, kcap=72, nsub=16)
    out = runner._rebind_cellmc(setup, big)
    assert out.geom.nsub == 8


def test_midchunk_overflow_retry_survives_donation(small_setup,
                                                   monkeypatch):
    """Mid-chunk DIAG_SLAB_OVERFLOW must grow kcap and RERUN the chunk
    from the intact pre-chunk ensemble. The run fns donate
    (states, slabs, slab_count), so the retry can only work from the
    snapshot run_sampling takes before dispatch — rebuilding from the
    donated arrays raises 'Array has been deleted' (code-review r3).

    Overflow is forced by shrinking kcap to the exact current max
    occupancy (zero margin): the grid-shift rebins inside the chunks
    redistribute cell populations past it. Two details make the trigger
    reliable where the original version silently stopped firing:

      * run_sampling's PRE-chunk maintenance (_refresh_cellmc_geom,
        added in round 4) sees the zero-margin occupancy and grows kcap
        BEFORE the chunk ever dispatches — defusing the mid-chunk path
        this test exists to cover. It is monkeypatched to identity here;
        the pre-chunk grow has its own test above
        (test_kcap_grows_near_overflow).
      * one chunk's rebin draws are not a sure trigger, so chunks loop
        (re-using the first chunk's compile) until the retry fires,
        with a bound that only then fails the test.
    """
    import warnings

    from neuralmelting_tpu.sampler import cellmc as SC

    monkeypatch.setattr(runner, "_refresh_cellmc_geom", lambda s: s)
    setup = small_setup
    mx = int(jnp.max(setup.slab_count))
    kc = -(-mx // 8) * 8                       # ceil to sublane multiple
    tight = dataclasses.replace(setup.geom, kcap=kc)
    shift = jnp.zeros((3,), jnp.float32)
    slabs, count, over = SC.build_slabs(tight, setup.states, shift)
    assert not bool(over), "zero-margin build must still fit"
    states = SC.refresh_energies(tight, setup.states, slabs, setup.pot)
    cfg = dataclasses.replace(setup.cfg, mod=6, rebin_every=1)
    setup = dataclasses.replace(
        setup, cfg=cfg, geom=tight, slabs=slabs, slab_count=count,
        shift=shift, states=states,
        cell_tabs=jnp.asarray(CMK.geom_tables(tight)))
    fired = False
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        for _chunk in range(8):                # <= 48 rebin draws
            setup, recs, frames, hist, xacc, diag = runner.run_sampling(
                setup, outdir=None, write_files=False)
            if any("cell slot overflow" in str(w.message) for w in caught):
                fired = True
                break
    assert fired, "overflow retry never fired in 8 chunks (48 rebins)"
    assert int(diag) == 0                      # retried chunk is clean
    assert setup.geom.kcap > kc                # capacity actually grew
    per_rep = np.asarray(jnp.sum(setup.slab_count, axis=1))
    assert (per_rep == setup.natoms).all()     # no atoms dropped
    assert np.isfinite(np.asarray(recs.pe)).all()
