#!/usr/bin/env python
"""On-chip probe: why does rdf_frames(1024 x 4096) crash the TPU worker?

Tests at full north-star scale (R=1024 frames, N=4096 atoms):
  a) current scatter-add rdf_frames at frame_batch=8  (known: crashes)
  b) same at frame_batch=1
  c) scatter-free cumulative-histogram variant (sum(r2<edge^2) per edge,
     differenced) at frame_batch=8

Usage: python scripts/rdf_probe.py [a|b|c ...]   (default: c b)
Each variant runs in-process; a worker crash aborts the process, so run
one flaky variant per invocation.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

sys.path.insert(0, "/root/repo")

from neuralmelting_tpu.features.rdf import rdf_frames, rdf_hist
from neuralmelting_tpu.ops.neighbors import _mi

R, N, NBINS, BOX = 1024, 4096, 64, 10.0
RMAX = 0.48 * BOX


def make_data():
    k = jax.random.key(0)
    pos = jax.random.uniform(k, (R, N, 3), jnp.float32) * BOX
    boxes = jnp.full((R, 3), BOX, jnp.float32)
    return pos, boxes


def rdf_hist_cum(pos, box, nbins, rmax, row_block=512):
    """Scatter-free g(r): cumulative counts at bin edges, differenced."""
    n = pos.shape[0]
    nblocks = -(-n // row_block)
    dr = rmax / nbins
    edges2 = ((jnp.arange(nbins, dtype=jnp.float32) + 1.0) * dr) ** 2

    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]

    def block_fn(start):
        bx = jax.lax.dynamic_slice(px, (start,), (row_block,))[:, None]
        by = jax.lax.dynamic_slice(py, (start,), (row_block,))[:, None]
        bz = jax.lax.dynamic_slice(pz, (start,), (row_block,))[:, None]
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
        return cum                                  # (nbins,) cumulative

    starts = jnp.arange(nblocks) * row_block
    cum = jnp.sum(jax.lax.map(block_fn, starts), axis=0) * 0.5
    counts = jnp.diff(cum, prepend=0.0)

    vol = jnp.prod(box)
    rho = n / vol
    e = jnp.arange(nbins + 1, dtype=jnp.float32) * dr
    shell = (4.0 / 3.0) * jnp.pi * (e[1:] ** 3 - e[:-1] ** 3)
    ideal = 0.5 * n * rho * shell
    return counts / jnp.maximum(ideal, 1e-30), counts


def rdf_frames_cum(positions, boxes, nbins, rmax, frame_batch=8):
    f = lambda pb: rdf_hist_cum(pb[0], pb[1], nbins, rmax)[0]
    return jax.lax.map(f, (positions, boxes), batch_size=frame_batch)


def run(tag, fn):
    pos, boxes = make_data()
    t0 = time.perf_counter()
    g = fn(pos, boxes)
    gn = np.asarray(g)
    dt = time.perf_counter() - t0
    print(f"{tag}: ok {dt:.1f}s shape={gn.shape} "
          f"finite={np.isfinite(gn).all()} tail_mean={gn[:, -8:].mean():.3f}",
          flush=True)


def main():
    which = sys.argv[1:] or ["c", "b"]
    print("device:", jax.devices()[0], flush=True)
    for w in which:
        if w == "a":
            run("a scatter fb=8", lambda p, b: rdf_frames(p, b, NBINS, RMAX))
        elif w == "b":
            run("b scatter fb=1",
                lambda p, b: rdf_frames(p, b, NBINS, RMAX, frame_batch=1))
        elif w == "c":
            run("c cum fb=8", lambda p, b: rdf_frames_cum(p, b, NBINS, RMAX))


if __name__ == "__main__":
    main()
