import numpy as np

from neuralmelting_tpu.models.lattice import make_supercell, natoms


def test_fcc_counts_and_box():
    pos, box = make_supercell("fcc", 1.5, 4)
    assert pos.shape == (256, 3)
    assert natoms("fcc", 4) == 256
    np.testing.assert_allclose(box, [6.0, 6.0, 6.0], rtol=1e-6)
    assert pos.min() >= 0.0 and (pos < box).all()


def test_noncubic_supercell():
    pos, box = make_supercell("fcc", 1.0, (16, 8, 8))
    assert pos.shape == (4096, 3)
    np.testing.assert_allclose(box, [16.0, 8.0, 8.0], rtol=1e-6)


def test_bcc_sc():
    assert make_supercell("bcc", 1.0, 3)[0].shape == (54, 3)
    assert make_supercell("sc", 1.0, 3)[0].shape == (27, 3)


def test_fcc_nearest_neighbor_distance():
    a = 2.0 ** (2.0 / 3.0)  # nn distance = a/sqrt(2) = 2^(1/6)
    pos, box = make_supercell("fcc", a, 3)
    d = pos[None, :, :] - pos[:, None, :]
    d -= box * np.round(d / box)
    r = np.sqrt((d ** 2).sum(-1))
    r[r == 0] = np.inf
    np.testing.assert_allclose(r.min(), 2.0 ** (1.0 / 6.0), rtol=1e-5)
