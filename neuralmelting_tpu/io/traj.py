""".traj text format: per-frame header + coordinates (SURVEY.md §2.5).

Format (version nm-traj-1):
    # nm-traj-1
    <natoms> <box_x> <box_y> <box_z> <sweep>
    <x> <y> <z>          (natoms lines, %.9e)
    ...next frame...
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from neuralmelting_tpu.io import native

MAGIC = "# nm-traj-1"


def write(path: str, positions: np.ndarray, boxes: np.ndarray,
          sweeps=None, append: bool = False):
    """positions: (nframes, N, 3); boxes: (nframes, 3).

    Uses the native C++ writer when available (byte-identical output;
    io/native), falling back to this pure-Python reference implementation.
    """
    positions = np.asarray(positions)
    boxes = np.asarray(boxes)
    nframes, natoms, _ = positions.shape
    if sweeps is None:
        sweeps = np.zeros((nframes,), np.int64)
    if native.write_traj(path, positions, boxes, sweeps, append):
        return
    mode = "a" if append else "w"
    with open(path, mode) as f:
        if not append:
            f.write(MAGIC + "\n")
        for k in range(nframes):
            b = boxes[k]
            f.write(f"{natoms:d} {b[0]:.9e} {b[1]:.9e} {b[2]:.9e} "
                    f"{int(sweeps[k]):d}\n")
            for row in positions[k]:
                f.write(f"{row[0]:.9e} {row[1]:.9e} {row[2]:.9e}\n")


def read(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse a .traj file -> (positions (F,N,3), boxes (F,3), sweeps (F,)).

    Native C++ parser when available (values f32-exact, the writer's own
    precision); pure-Python fallback below.
    """
    out = native.read_traj(path)
    if out is not None:
        return out
    frames: List[np.ndarray] = []
    boxes: List[np.ndarray] = []
    sweeps: List[int] = []
    with open(path) as f:
        first = f.readline().strip()
        if first != MAGIC:
            raise ValueError(f"{path}: not a {MAGIC} file (got {first!r})")
        while True:
            header = f.readline()
            if not header:
                break
            header = header.strip()
            if not header:
                continue
            parts = header.split()
            natoms = int(parts[0])
            boxes.append(np.array([float(parts[1]), float(parts[2]),
                                   float(parts[3])]))
            sweeps.append(int(parts[4]) if len(parts) > 4 else 0)
            frame = np.empty((natoms, 3))
            for i in range(natoms):
                frame[i] = [float(x) for x in f.readline().split()]
            frames.append(frame)
    if not frames:
        return (np.zeros((0, 0, 3)), np.zeros((0, 3)),
                np.zeros((0,), np.int64))
    return (np.stack(frames), np.stack(boxes),
            np.asarray(sweeps, np.int64))
