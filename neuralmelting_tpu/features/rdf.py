"""Structural features on device: g(r), S(q), density.

TPU-native replacement for the reference's lammps_rdf.py (SURVEY.md §2.5,
§3.2): pairwise minimum-image distances -> radial histogram -> ideal-gas
shell normalization; the structure factor follows from the Fourier sine
transform of g(r)-1. Frames are processed vmapped straight from the
device-resident trajectory stack, so featurization never leaves HBM
(BASELINE north star). Distance work is row-blocked like the neighbor
build to keep peak memory O(block * N).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu.ops.neighbors import _mi


def rdf_hist(pos, box, nbins: int, rmax: float, row_block: int = 0):
    """Radial distribution g(r) for one frame.

    Returns (g, counts): g (nbins,) normalized by the ideal-gas shell
    occupancy; counts (nbins,) raw unordered pair counts.
    Valid for rmax <= min(box)/2 (minimum image).
    """
    n = pos.shape[0]
    if row_block <= 0:
        row_block = max(8, min(n, (1 << 21) // max(n, 1)))
    nblocks = -(-n // row_block)
    npad = nblocks * row_block
    dr = rmax / nbins

    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    if npad != n:
        pad = jnp.full((npad - n,), 1e30, pos.dtype)
        rx = jnp.concatenate([px, pad])
        ry = jnp.concatenate([py, pad])
        rz = jnp.concatenate([pz, pad])
    else:
        rx, ry, rz = px, py, pz

    # Scatter-free histogram: cumulative pair counts at each bin edge,
    # differenced into per-bin counts. A scatter-add over the flattened
    # row_block*N index array faults the TPU worker at production scale
    # (observed: R=1024 x N=4096, docs/evidence_r4.log 06:20Z) and
    # scatters serialize on TPU anyway; 'nbins' masked reductions over
    # the same r2 block vectorize cleanly on the VPU.
    edges2 = ((jnp.arange(nbins, dtype=jnp.float32) + 1.0) * dr) ** 2

    def block_fn(start):
        bx = jax.lax.dynamic_slice(rx, (start,), (row_block,))[:, None]
        by = jax.lax.dynamic_slice(ry, (start,), (row_block,))[:, None]
        bz = jax.lax.dynamic_slice(rz, (start,), (row_block,))[:, None]
        dx = _mi(bx - px[None, :], box[0])
        dy = _mi(by - py[None, :], box[1])
        dz = _mi(bz - pz[None, :], box[2])
        r2 = dx * dx + dy * dy + dz * dz
        gidx = start + jnp.arange(row_block)[:, None]
        valid = jnp.arange(n)[None, :] != gidx
        r2 = jnp.where(valid, r2, 1e30)

        def edge_step(c, e2):
            return c, jnp.sum(jnp.where(r2 < e2, 1.0, 0.0))

        _, cum = jax.lax.scan(edge_step, 0, edges2)
        # difference PER BLOCK: block cumulatives stay < row_block*N
        # (~2^21), so f32 diffs are exact; differencing the global sum
        # instead would hit the 2^24 f32 integer ceiling at large N
        return jnp.diff(cum, prepend=0.0)         # (nbins,) per-bin

    starts = jnp.arange(nblocks) * row_block
    counts = jnp.sum(jax.lax.map(block_fn, starts), axis=0) * 0.5

    vol = jnp.prod(box)
    rho = n / vol
    edges = jnp.arange(nbins + 1, dtype=jnp.float32) * dr
    shell = (4.0 / 3.0) * jnp.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    ideal = 0.5 * n * rho * shell  # unordered ideal-gas pair count per shell
    g = counts / jnp.maximum(ideal, 1e-30)
    return g, counts


def rdf_frames(positions, boxes, nbins: int, rmax: float,
               frame_batch: int = 8):
    """g(r) stacked over frames: positions (F,N,3), boxes (F,3) -> (F,nbins).

    Frames run in vmapped batches of ``frame_batch`` under lax.map: a
    flat vmap multiplies the row-blocked distance workspace by F and
    OOMs at production scale (observed 33 GB for 672 frames x 4096
    atoms; the blocked workspace is O(frame_batch * row_block * N))."""
    f = lambda pb: rdf_hist(pb[0], pb[1], nbins, rmax)[0]
    return jax.lax.map(f, (positions, boxes), batch_size=frame_batch)


def structure_factor(g, box, natoms, rmax: float, nq: int = 0, qmax: float = 0.0):
    """S(q) from g(r) via S(q) = 1 + 4 pi rho int r^2 (g-1) sinc(qr) dr.

    g: (..., nbins); box (..., 3). Returns (q (nq,), S (..., nq)).
    """
    nbins = g.shape[-1]
    dr = rmax / nbins
    r = (jnp.arange(nbins, dtype=jnp.float32) + 0.5) * dr
    vol = jnp.prod(box, axis=-1)[..., None]
    rho = natoms / vol
    if nq <= 0:
        nq = nbins // 2
    if qmax <= 0.0:
        qmax = jnp.pi / dr * 0.5
    q = jnp.linspace(2.0 * jnp.pi / rmax, qmax, nq)
    qr = q[None, :] * r[:, None]                     # (nbins, nq)
    sinc = jnp.sin(qr) / qr
    integrand = (g - 1.0)[..., :, None] * (r * r)[:, None] * sinc
    s = 1.0 + 4.0 * jnp.pi * rho * dr * jnp.sum(integrand, axis=-2)
    return q, s


def density(boxes, natoms):
    """Number density per frame: boxes (..., 3) -> (...)."""
    return natoms / jnp.prod(boxes, axis=-1)
