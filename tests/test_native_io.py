"""Native C++ text IO vs the pure-Python reference writers."""

import os

import numpy as np
import pytest

from neuralmelting_tpu.io import native, thermo, traj


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="no C++ toolchain")


def _frames(nf=3, n=32, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 6.35, size=(nf, n, 3)).astype(np.float32)
    boxes = np.tile(np.array([6.35, 6.35, 6.35], np.float32), (nf, 1))
    sweeps = (np.arange(nf) + 1) * 8
    return pos, boxes, sweeps


def test_traj_write_byte_identical(tmp_path):
    pos, boxes, sweeps = _frames()
    pnat = str(tmp_path / "nat.traj")
    ppy = str(tmp_path / "py.traj")
    assert native.write_traj(pnat, pos, boxes, sweeps, append=False)
    os.environ["NM_NATIVE_IO"] = "0"
    try:
        # force the pure-Python path via a fresh module state
        traj.write(ppy, pos, boxes, sweeps)
    finally:
        os.environ.pop("NM_NATIVE_IO")
    with open(pnat, "rb") as a, open(ppy, "rb") as b:
        na, pb = a.read(), b.read()
    assert na == pb, "native and python .traj writers differ"


def test_traj_native_roundtrip(tmp_path):
    pos, boxes, sweeps = _frames(nf=4, n=20, seed=2)
    path = str(tmp_path / "x.traj")
    traj.write(path, pos, boxes, sweeps)
    p2, b2, s2 = traj.read(path)
    np.testing.assert_allclose(p2, pos, rtol=1e-6)
    np.testing.assert_allclose(b2, boxes, rtol=1e-6)
    np.testing.assert_array_equal(s2, sweeps)


def test_traj_native_append(tmp_path):
    pos, boxes, sweeps = _frames(nf=1)
    path = str(tmp_path / "x.traj")
    traj.write(path, pos, boxes, sweeps)
    traj.write(path, pos + 1, boxes, sweeps + 8, append=True)
    p2, b2, s2 = traj.read(path)
    assert p2.shape[0] == 2
    np.testing.assert_allclose(p2[1], pos[0] + 1, rtol=1e-6)


def test_thermo_write_byte_identical(tmp_path):
    rng = np.random.default_rng(1)
    recs = {c: rng.uniform(size=5) for c in thermo.COLUMNS}
    recs["sweep"] = np.arange(5) * 4
    pnat = str(tmp_path / "nat.thrm")
    ppy = str(tmp_path / "py.thrm")
    thermo.write(pnat, recs, params={"element": "LJ"})
    os.environ["NM_NATIVE_IO"] = "0"
    try:
        with open(ppy, "w") as f:
            thermo.write_header(f, {"element": "LJ"})
            thermo.append_records(f, recs)
    finally:
        os.environ.pop("NM_NATIVE_IO")
    with open(pnat, "rb") as a, open(ppy, "rb") as b:
        assert a.read() == b.read(), "native and python .thrm writers differ"


def test_bad_magic_raises(tmp_path):
    path = str(tmp_path / "bad.traj")
    with open(path, "w") as f:
        f.write("garbage\n")
    with pytest.raises(ValueError):
        traj.read(path)


def test_native_throughput_sanity(tmp_path):
    """Native writer should beat ~20 MB/s on a meaningful payload."""
    import time
    pos, boxes, sweeps = _frames(nf=20, n=4096, seed=3)
    path = str(tmp_path / "big.traj")
    t0 = time.perf_counter()
    traj.write(path, pos, boxes, sweeps)
    dt = time.perf_counter() - t0
    mb = os.path.getsize(path) / 1e6
    assert mb / dt > 8, f"native writer only {mb/dt:.1f} MB/s"
