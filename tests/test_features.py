"""RDF / S(q) / density oracles (SURVEY.md §4.1: vs brute-force histogram
and known limits)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu.features import rdf_hist, rdf_frames, structure_factor, density
from neuralmelting_tpu.models.lattice import make_supercell


def brute_rdf(pos, box, nbins, rmax):
    pos = np.asarray(pos, np.float64)
    box = np.asarray(box, np.float64)
    n = len(pos)
    d = pos[None, :, :] - pos[:, None, :]
    d -= box * np.round(d / box)
    r = np.sqrt((d ** 2).sum(-1))
    iu = np.triu_indices(n, 1)
    rr = r[iu]
    rr = rr[rr < rmax]
    counts, _ = np.histogram(rr, bins=nbins, range=(0, rmax))
    rho = n / box.prod()
    edges = np.linspace(0, rmax, nbins + 1)
    shell = 4 / 3 * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    return counts / (0.5 * n * rho * shell), counts


def test_rdf_matches_brute_force():
    pos, box = make_supercell("fcc", 1.6, 3)
    pos = jnp.asarray(pos) + 0.05 * jax.random.normal(jax.random.key(0),
                                                      (108, 3))
    box = jnp.asarray(box)
    g, counts = rdf_hist(pos, box, nbins=60, rmax=2.3)
    g_ref, c_ref = brute_rdf(pos, box, 60, 2.3)
    np.testing.assert_array_equal(np.asarray(counts), c_ref)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-4)


def test_rdf_fcc_first_peak():
    """Cold fcc: first g(r) peak at the nearest-neighbor distance a/sqrt(2)."""
    a = 1.5874
    pos, box = make_supercell("fcc", a, 4)
    g, _ = rdf_hist(jnp.asarray(pos), jnp.asarray(box), nbins=100, rmax=3.0)
    peak_r = (np.argmax(np.asarray(g)) + 0.5) * 3.0 / 100
    np.testing.assert_allclose(peak_r, a / np.sqrt(2), atol=0.05)


def test_ideal_gas_g_is_one():
    """Random uniform particles: g(r) ~= 1 away from r=0."""
    key = jax.random.key(1)
    box = jnp.array([12.0, 12.0, 12.0])
    pos = jax.random.uniform(key, (800, 3)) * box
    g, _ = rdf_hist(pos, box, nbins=40, rmax=5.0)
    np.testing.assert_allclose(np.asarray(g)[10:], 1.0, atol=0.25)


def test_rdf_frames_batched():
    pos, box = make_supercell("fcc", 1.6, 3)
    frames = jnp.stack([jnp.asarray(pos)] * 3)
    boxes = jnp.stack([jnp.asarray(box)] * 3)
    g = rdf_frames(frames, boxes, nbins=50, rmax=2.0)
    assert g.shape == (3, 50)
    np.testing.assert_allclose(g[0], g[2], rtol=1e-6)


def test_structure_factor_ideal_gas_near_one():
    key = jax.random.key(2)
    box = jnp.array([14.0, 14.0, 14.0])
    pos = jax.random.uniform(key, (1000, 3)) * box
    g, _ = rdf_hist(pos, box, nbins=64, rmax=6.0)
    q, s = structure_factor(g[None, :], box[None, :], 1000, rmax=6.0)
    # away from q->0, S(q) of an ideal gas is ~1
    np.testing.assert_allclose(np.asarray(s)[0, 8:], 1.0, atol=0.35)


def test_density():
    boxes = jnp.array([[2.0, 2.0, 2.0], [4.0, 2.0, 2.0]])
    rho = density(boxes, 16)
    np.testing.assert_allclose(rho, [2.0, 1.0])
