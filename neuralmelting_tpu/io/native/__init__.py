"""ctypes bindings to the native text-IO library (nm_textio.cpp).

Compiles the shared library with g++ on first use (no pip, no pybind11 —
see the environment constraints) and caches it next to the source. All
entry points return None/fall back cleanly when no toolchain is available,
so the pure-Python writers in io/thermo.py and io/traj.py remain the
reference implementation; byte-identical output is enforced by
tests/test_native_io.py. Disable with NM_NATIVE_IO=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "nm_textio.cpp")
_SO = os.path.join(_DIR, "nm_textio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded library, or None when unavailable/disabled."""
    global _lib, _tried
    if os.environ.get("NM_NATIVE_IO", "1") == "0":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.nm_write_traj.restype = ctypes.c_int
        lib.nm_scan_traj.restype = ctypes.c_int
        lib.nm_read_traj.restype = ctypes.c_int
        lib.nm_write_thermo.restype = ctypes.c_int
        _lib = lib
        return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def write_traj(path, positions, boxes, sweeps, append: bool) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    pos = np.ascontiguousarray(positions, np.float32)
    box = np.ascontiguousarray(boxes, np.float32)
    sw = np.ascontiguousarray(sweeps, np.int64)
    nframes, natoms, _ = pos.shape
    rc = lib.nm_write_traj(path.encode(), int(append),
                           ctypes.c_long(nframes), ctypes.c_long(natoms),
                           _ptr(pos, ctypes.c_float),
                           _ptr(box, ctypes.c_float),
                           _ptr(sw, ctypes.c_long))
    return rc == 0


def read_traj(path):
    """(positions, boxes, sweeps) or None on fallback."""
    lib = get_lib()
    if lib is None:
        return None
    nframes = ctypes.c_long()
    natoms = ctypes.c_long()
    rc = lib.nm_scan_traj(path.encode(), ctypes.byref(nframes),
                          ctypes.byref(natoms))
    if rc == -3:
        raise ValueError(f"{path}: not a # nm-traj-1 file")
    if rc != 0:
        return None
    f, n = nframes.value, natoms.value
    pos = np.empty((f, n, 3), np.float32)
    box = np.empty((f, 3), np.float32)
    sw = np.empty((f,), np.int64)
    rc = lib.nm_read_traj(path.encode(), ctypes.c_long(f), ctypes.c_long(n),
                          _ptr(pos, ctypes.c_float),
                          _ptr(box, ctypes.c_float),
                          _ptr(sw, ctypes.c_long))
    if rc != 0:
        return None
    return pos.astype(np.float64), box.astype(np.float64), sw


def write_thermo_rows(path, data_2d, header: str, append: bool) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(data_2d, np.float64)
    nrec, ncol = data.shape
    rc = lib.nm_write_thermo(path.encode(), int(append),
                             ctypes.c_long(nrec), ctypes.c_long(ncol),
                             _ptr(data, ctypes.c_double),
                             header.encode())
    return rc == 0
