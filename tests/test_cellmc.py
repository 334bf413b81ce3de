"""Cell-confined checkerboard Pallas kernel: correctness oracles.

Runs in interpret mode on the CPU test mesh (conftest pins JAX_PLATFORMS=
cpu). The kernel's RNG is an in-kernel threefry2x32, bit-reproducible
between interpret and compiled TPU mode, so these tests pin the exact
production behavior:

  * threefry known-answer vectors (Random123 test vectors)
  * bin/rebin/unbin roundtrips preserve atoms exactly
  * one full sweep keeps every atom inside its cell (the confinement
    invariant the whole scheme rests on)
  * tracked pe delta == brute-force E(final) - E(initial): every pair the
    physics needs is in the stencil, every acceptance was bookkept
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops import energy as EN
from neuralmelting_tpu.ops.pallas import cellmc as CM


def _setup(ncells=(4, 4, 4), jitter=0.05, seed=0, sigma=1.0):
    # sigma scales the whole geometry (LJ corresponding states), so a
    # sigma != 1 run probes the kernel's sigma handling without changing
    # the physics regime (regression for the shared-reciprocal ediff bug:
    # q must be sig2/(r2n*r2o), not sig2^2/(...)).
    pot = LJCut.create(sigma=sigma, rc=2.5 * sigma)
    pos, box = make_supercell("fcc", 2.0 ** (2.0 / 3.0) * sigma, ncells)
    n = pos.shape[0]
    geom = CM.make_geom(box, pot.rc_host, n, nsub=8)
    key = jax.random.key(seed)
    pos = (jnp.asarray(pos) + jitter * jax.random.normal(key, pos.shape)) \
        % jnp.asarray(box)
    shift = jnp.asarray([0.23, 0.61, 0.07], jnp.float32)
    return pot, geom, pos, jnp.asarray(box, jnp.float32), shift


def test_threefry_known_answers():
    z = jnp.zeros((1,), jnp.int32)
    f = jnp.full((1,), -1, jnp.int32)
    x0, x1 = CM.threefry2x32(z[0], z[0], z, z)
    assert (np.uint32(np.asarray(x0)[0]), np.uint32(np.asarray(x1)[0])) == \
        (0x6b200159, 0x99ba4efe)
    x0, x1 = CM.threefry2x32(f[0], f[0], f, f)
    assert (np.uint32(np.asarray(x0)[0]), np.uint32(np.asarray(x1)[0])) == \
        (0x1cb996fc, 0xbb002be7)


def test_bin_unbin_roundtrip():
    pot, geom, pos, box, shift = _setup()
    x, y, z, ids, count, over = CM.bin_initial(geom, pos, box, shift)
    assert not bool(over)
    assert int(count.sum()) == geom.natoms
    back = CM.unbin(geom, (x, y, z, ids), box, shift)
    assert float(jnp.max(jnp.abs(back - pos))) < 2e-5
    # every binned atom sits inside its cell
    tabs = CM.geom_tables(geom)
    w = np.asarray(box) / np.asarray(geom.ncell)
    valid = np.asarray(ids) >= 0
    for a, coord in enumerate((x, y, z)):
        c = np.asarray(coord)
        lo = tabs[a] * w[a]
        assert not (valid & ((c < lo - 1e-4) |
                             (c >= lo + w[a] + 1e-4))).any()


def test_rebin_axis_preserves_atoms():
    pot, geom, pos, box, shift = _setup()
    slabs = CM.bin_initial(geom, pos, box, shift)[:4]
    count = CM.bin_initial(geom, pos, box, shift)[4]
    r = 3
    slabs_b = tuple(jnp.broadcast_to(s[None], (r,) + s.shape)
                    for s in slabs)
    count_b = jnp.broadcast_to(count[None], (r, geom.ncells))
    box_b = jnp.broadcast_to(box[None], (r, 3))
    sh = shift
    for axis in (0, 1, 2):
        delta = 0.4 / geom.ncell[axis]
        tab = jnp.asarray(CM.geom_tables(geom)[axis])
        slabs_b, count_b, over = CM.rebin_axis(
            geom, slabs_b, count_b, box_b, delta, axis, cell_tab=tab)
        assert not bool(over)
        sh = sh.at[axis].add(delta)
    assert int(count_b[0].sum()) == geom.natoms
    back = CM.unbin(geom, tuple(s[0] for s in slabs_b), box, sh)
    assert float(jnp.max(jnp.abs(back - pos))) < 2e-5
    # packedness: occupied slots first in every cell
    ids2 = np.asarray(slabs_b[3][0]).reshape(geom.ncells, geom.kcap)
    occ = (ids2 >= 0).astype(int)
    assert (np.diff(occ, axis=1) <= 0).all()


@pytest.mark.parametrize("ncells,ncyc,fast_recip,sigma",
                         [((4, 4, 4), 2, False, 1.0),
                          ((6, 6, 6), 1, False, 1.0),
                          ((4, 4, 4), 2, True, 1.0),
                          ((4, 4, 4), 2, False, 1.2),
                          ((4, 4, 4), 2, True, 1.2)])
@pytest.mark.slow
def test_sweep_pe_identity_and_confinement(ncells, ncyc, fast_recip, sigma):
    """pe bookkeeping == brute force, and atoms never leave their cells.

    (6,6,6) exercises the real roll/wrap paths (within-color grid 3^3);
    (4,4,4) the degenerate h=1 all-wrap case. sigma=1.2 pins ediff's
    shared-reciprocal sigma scaling against eterm (advisor r3 finding).
    """
    pot, geom, pos, box, shift = _setup(ncells, sigma=sigma)
    x, y, z, ids, count, over = CM.bin_initial(geom, pos, box, shift)
    r = 2
    temps = np.asarray([0.9, 1.3], np.float32)
    w = np.asarray(box) / np.asarray(geom.ncell)
    params = jnp.stack([
        jnp.asarray(1.0 / temps), jnp.full((r,), 0.1),
        jnp.full((r,), w[0]), jnp.full((r,), w[1]), jnp.full((r,), w[2]),
        jnp.full((r,), box[0]), jnp.full((r,), box[1]),
        jnp.full((r,), box[2])])
    pot3 = jnp.asarray([1.0, sigma, 2.5 * sigma, 0.0], jnp.float32)
    seeds = jnp.asarray([[99, 100]], jnp.int32)
    t = lambda s: jnp.transpose(jnp.broadcast_to(s[None], (r,) + s.shape))
    sweep = CM.make_sweep_fn(geom, ncyc=ncyc, interpret=True, rt=r,
                             fast_recip=fast_recip)
    (ox, oy, oz), stats = sweep((t(x), t(y), t(z)), t(count),
                                params, pot3, seeds)
    e0, _ = EN.pair_energy_virial(pot, pos, box)
    tabs = CM.geom_tables(geom)
    for ri in range(r):
        pos_r = CM.unbin(geom, (ox[:, ri], oy[:, ri], oz[:, ri], ids),
                         box, shift)
        e1, _ = EN.pair_energy_virial(pot, pos_r, box)
        tracked = float(stats[0][ri])
        true = float(e1 - e0)
        assert abs(tracked - true) < 5e-3 + 1e-4 * abs(true), \
            (ri, tracked, true)
        assert float(stats[2][ri]) > 0
        assert 0.0 < float(stats[1][ri]) <= float(stats[2][ri])
        for a, oc in enumerate((ox, oy, oz)):
            c = np.asarray(oc[:, ri])
            lo = tabs[a] * w[a]
            bad = (np.asarray(ids) >= 0) & \
                ((c < lo - 1e-5) | (c > lo + w[a] + 1e-5))
            assert bad.sum() == 0


@pytest.mark.slow
def test_sweep_reproducible():
    """Same seeds -> bit-identical slabs (threefry is counter-based)."""
    pot, geom, pos, box, shift = _setup()
    x, y, z, ids, count, _ = CM.bin_initial(geom, pos, box, shift)
    r = 2
    w = np.asarray(box) / np.asarray(geom.ncell)
    params = jnp.stack([
        jnp.full((r,), 1.0), jnp.full((r,), 0.1),
        jnp.full((r,), w[0]), jnp.full((r,), w[1]), jnp.full((r,), w[2]),
        jnp.full((r,), box[0]), jnp.full((r,), box[1]),
        jnp.full((r,), box[2])])
    pot3 = jnp.asarray([1.0, 1.0, 2.5, 0.0], jnp.float32)
    seeds = jnp.asarray([[5, 6]], jnp.int32)
    t = lambda s: jnp.transpose(jnp.broadcast_to(s[None], (r,) + s.shape))
    sweep = CM.make_sweep_fn(geom, ncyc=1, interpret=True, rt=r)
    out1, st1 = sweep((t(x), t(y), t(z)), t(count), params, pot3, seeds)
    out2, st2 = sweep((t(x), t(y), t(z)), t(count), params, pot3, seeds)
    for a, b in zip(out1, out2):
        assert jnp.array_equal(a, b)
    assert jnp.array_equal(st1, st2)
