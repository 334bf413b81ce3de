"""Checkerboard cell decomposition for batched Metropolis moves.

The serial reference attempted one move at a time (SURVEY.md §3.1 hot loop);
a TPU needs thousands of independent trials in flight. We use stride-colored
cells (the scalable hard-shape MC scheme of Anderson et al., arXiv:1509.04692
— listed in PAPERS.md): the box is cut into an (nx, ny, nz) grid with each
axis count divisible by ``stride``; cells whose coordinates are congruent
mod ``stride`` share a color. Two distinct same-color cells are separated by
at least (stride-1) * cell_width, so with

    (stride - 1) * min(cell_width) >= rc + 2 * dpos

one particle per active-color cell can be trialed and accepted in parallel
with exact Metropolis acceptance. A random fractional grid shift per sweep
restores ergodicity across cell boundaries; a random color order per sweep
removes directional bias.

Cell membership is computed by sorting particle cell ids — an O(N log N)
XLA sort — rather than emulating linked-cell pointer structures.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CellConfig:
    ncell: tuple            # (nx, ny, nz), each divisible by stride
    stride: int
    active_table: np.ndarray  # (ncolors, M) int32 cell ids per color

    @property
    def ncells_total(self) -> int:
        return int(np.prod(self.ncell))

    @property
    def ncolors(self) -> int:
        return self.stride ** 3

    @property
    def cells_per_color(self) -> int:
        return self.ncells_total // self.ncolors


def make_cell_config(box0, rc, stride=4, dpos_cap=0.25) -> CellConfig:
    """Choose the cell grid for initial box ``box0``.

    Guarantees (stride-1)*w >= rc + 2*dpos_cap at the initial box; the
    sampler re-validates per sweep as the box fluctuates and clamps dpos.
    """
    box0 = np.asarray(box0, np.float64)
    w_min = (float(rc) + 2.0 * dpos_cap) / (stride - 1)
    ncell = []
    for b in box0:
        n = int(np.floor(b / w_min))
        n = (n // stride) * stride
        ncell.append(max(stride, n))
    ncell = tuple(ncell)
    if min(np.asarray(box0) / np.asarray(ncell)) * (stride - 1) < rc:
        raise ValueError(
            f"box {box0} too small for stride {stride} checkerboard at rc={rc}")

    nx, ny, nz = ncell
    cid = np.arange(nx * ny * nz).reshape(nx, ny, nz)
    table = []
    for ax in range(stride):
        for ay in range(stride):
            for az in range(stride):
                table.append(cid[ax::stride, ay::stride, az::stride].ravel())
    return CellConfig(ncell=ncell, stride=stride,
                      active_table=np.asarray(table, np.int32))


def bin_particles(pos, box, ncell, shift_frac):
    """Sort particles into cells of the (shifted) grid.

    Returns:
      sorted_ids: (N,) particle indices ordered by cell id.
      start:      (C,) first slot in sorted_ids of each cell.
      count:      (C,) particles per cell.
    """
    # componentwise with Python-int cell counts: no jnp array constants may
    # be baked into traced code on this stack (docs/tpu_notes.md §1)
    n0, n1, n2 = (int(c) for c in ncell)
    frac = pos / box + shift_frac
    frac = frac - jnp.floor(frac)
    c0 = jnp.minimum((frac[:, 0] * n0).astype(jnp.int32), n0 - 1)
    c1 = jnp.minimum((frac[:, 1] * n1).astype(jnp.int32), n1 - 1)
    c2 = jnp.minimum((frac[:, 2] * n2).astype(jnp.int32), n2 - 1)
    cid = (c0 * n1 + c1) * n2 + c2
    order = jnp.argsort(cid).astype(jnp.int32)
    c_total = n0 * n1 * n2
    # bincount + exclusive cumsum instead of searchsorted (4x cheaper on
    # this stack)
    count = jnp.bincount(cid, length=c_total).astype(jnp.int32)
    csum = jnp.cumsum(count)
    start = (csum - count).astype(jnp.int32)
    return order, start, count
