import numpy as np

from neuralmelting_tpu.io import naming, thermo, traj


def test_naming_scheme():
    p = naming.sample_prefix("remcmc", "LJ", "fcc", (4, 4, 4), 2, 13)
    assert p == "remcmc.lj.fcc.4x4x4.02.13"
    t, j = naming.sample_paths("/tmp/out", p)
    assert t.endswith(".thrm") and j.endswith(".traj")


def test_thermo_roundtrip(tmp_path):
    nrec = 7
    rng = np.random.default_rng(0)
    recs = {c: rng.uniform(size=nrec) for c in thermo.COLUMNS}
    recs["sweep"] = np.arange(nrec) * 8
    path = str(tmp_path / "x.thrm")
    thermo.write(path, recs, params={"element": "LJ", "natoms": 256})
    params, data = thermo.read(path)
    assert params["element"] == "LJ"
    assert params["natoms"] == "256"
    np.testing.assert_array_equal(data["sweep"], recs["sweep"])
    for c in thermo.COLUMNS[1:]:
        np.testing.assert_allclose(data[c], recs[c], rtol=1e-9)


def test_thermo_append(tmp_path):
    path = str(tmp_path / "x.thrm")
    rec1 = {c: np.array([1.0]) for c in thermo.COLUMNS}
    rec2 = {c: np.array([2.0]) for c in thermo.COLUMNS}
    thermo.write(path, rec1, params={})
    thermo.write(path, rec2, append=True)
    _, data = thermo.read(path)
    assert len(data["pe"]) == 2


def test_traj_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 6, size=(3, 32, 3))
    boxes = np.tile(np.array([6.0, 6.5, 7.0]), (3, 1))
    sweeps = np.array([8, 16, 24])
    path = str(tmp_path / "x.traj")
    traj.write(path, pos, boxes, sweeps)
    p2, b2, s2 = traj.read(path)
    # the format carries 9 significant digits and the native parser is
    # f32-exact (the sampler's own precision)
    np.testing.assert_allclose(p2, pos, rtol=1e-6)
    np.testing.assert_allclose(b2, boxes, rtol=1e-6)
    np.testing.assert_array_equal(s2, sweeps)


def test_traj_append(tmp_path):
    pos = np.zeros((1, 4, 3))
    box = np.ones((1, 3))
    path = str(tmp_path / "x.traj")
    traj.write(path, pos, box)
    traj.write(path, pos + 1, box, append=True)
    p2, b2, s2 = traj.read(path)
    assert p2.shape == (2, 4, 3)
    np.testing.assert_allclose(p2[1], 1.0)


def test_traj_bad_magic(tmp_path):
    path = str(tmp_path / "bad.traj")
    with open(path, "w") as f:
        f.write("garbage\n")
    try:
        traj.read(path)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "nm-traj" in str(e)
