# cache-bust v2
"""Fixed-capacity neighbor lists (static shapes; SURVEY.md §7 Phase 3).

TPU-native replacement for LAMMPS's binned neighbor lists (SURVEY.md §2.1).
The list is built by an O(N^2) masked top-k, *blocked over rows* so peak
memory is O(row_block * N); at the N of interest a full distance matrix is
a trivial, perfectly-tiled VPU workload, far cheaper than emulating
pointer-chasing cell bins on a vector machine. Static capacity K keeps all
shapes fixed; overflow and staleness are tracked as flags, and rebuilds are
triggered globally (all replicas at once) so `lax.cond` stays out of
vmapped code.

Layout note (TPU-specific): every large intermediate is kept with K or N as
the minor dimension. A (..., 3) coordinate array of any size is poison on
TPU — the (8,128) tile pads the minor dim 3 -> 128 lanes, a 42x memory
blowup (observed: a 528 MB gather materializing as 22.5 GB). Hence all hot
paths below compute per x/y/z component on (..., K)-shaped arrays.

Safety invariant: every pair currently within rc must appear in the list.
With rlist = rc + skin at build, box rescaled by s since build, and maximum
effective particle displacement D (measured against affinely-rescaled build
positions), the condition is   rc + 2*D <= rlist * min(s).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from neuralmelting_tpu.ops.energy import min_image


def _mi(d, length):
    """Minimum image, one component."""
    return d - length * jnp.round(d / length)


@struct.dataclass
class NeighborList:
    idx: jnp.ndarray       # (N, K) i32, padded with self-index
    count: jnp.ndarray     # (N,) i32
    ref_pos: jnp.ndarray   # (N, 3) positions at build
    ref_box: jnp.ndarray   # (3,) box at build
    rlist: jnp.ndarray     # () rc + skin at build
    overflow: jnp.ndarray  # () bool — capacity exceeded, list unusable

    @property
    def capacity(self) -> int:
        return self.idx.shape[-1]


def suggest_capacity(n, box, rlist, safety=1.6, cap_min=16):
    """Static neighbor capacity from the build-time density (+ margin)."""
    import numpy as np
    rho = n / float(np.prod(np.asarray(box, np.float64)))
    k = int(np.ceil(safety * rho * (4.0 / 3.0) * np.pi * float(rlist) ** 3))
    k = max(cap_min, k)
    k = int((k + 7) // 8 * 8)
    return min(k, n - 1)  # can't have more neighbors than n-1


def build(pos, box, rlist, capacity: int,
          row_block: int = 0) -> NeighborList:
    """Blocked O(N^2) masked build. All shapes static."""
    n = pos.shape[0]
    if row_block <= 0:
        # keep each block's (row_block, N) distance tile <= ~2^21 elements
        row_block = max(8, min(n, (1 << 21) // max(n, 1)))
    nblocks = -(-n // row_block)
    npad = nblocks * row_block

    rlist2 = rlist * rlist
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    # pad rows so dynamic_slice never clamps (padded rows are discarded;
    # columns always use the original n positions)
    if npad != n:
        pad = jnp.full((npad - n,), 1e30, pos.dtype)
        rx = jnp.concatenate([px, pad])
        ry = jnp.concatenate([py, pad])
        rz = jnp.concatenate([pz, pad])
    else:
        rx, ry, rz = px, py, pz

    def block_fn(start):
        bx = jax.lax.dynamic_slice(rx, (start,), (row_block,))[:, None]
        by = jax.lax.dynamic_slice(ry, (start,), (row_block,))[:, None]
        bz = jax.lax.dynamic_slice(rz, (start,), (row_block,))[:, None]
        dx = _mi(bx - px[None, :], box[0])
        dy = _mi(by - py[None, :], box[1])
        dz = _mi(bz - pz[None, :], box[2])
        r2 = dx * dx + dy * dy + dz * dz                 # (B, N)
        gidx = start + jnp.arange(row_block)[:, None]     # global row ids
        notself = jnp.arange(n)[None, :] != gidx
        mask = (r2 < rlist2) & notself
        cnt = jnp.sum(mask, axis=-1).astype(jnp.int32)
        # top_k on the 0/1 mask returns the first `capacity` True columns
        # in ascending index order (ties keep lower indices first).
        vals, idx = jax.lax.top_k(mask.astype(jnp.float32), capacity)
        return cnt, vals, idx

    starts = jnp.arange(nblocks) * row_block
    cnt_b, vals_b, idx_b = jax.lax.map(block_fn, starts)
    count = cnt_b.reshape(npad)[:n]
    vals = vals_b.reshape(npad, capacity)[:n]
    idx = idx_b.reshape(npad, capacity)[:n]
    valid = vals > 0.5
    self_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                                (n, capacity))
    idx = jnp.where(valid, idx.astype(jnp.int32), self_idx)
    return NeighborList(
        idx=idx,
        count=count,
        # copies: ref_pos/ref_box must not alias the live state buffers, or
        # jit(donate_argnums=(states, nls)) would donate one buffer twice
        ref_pos=jnp.copy(pos),
        ref_box=jnp.copy(box),
        rlist=jnp.asarray(rlist, jnp.float32),
        overflow=jnp.any(count > capacity),
    )


def max_displacement(nl: NeighborList, pos, box) -> jnp.ndarray:
    """() max effective displacement vs. affinely-rescaled build positions."""
    s = box / nl.ref_box
    d = min_image(pos - nl.ref_pos * s, box)
    return jnp.sqrt(jnp.max(jnp.sum(d * d, axis=-1)))


def needs_rebuild(nl: NeighborList, pos, box, rc,
                  budget=0.0, shrink=1.0) -> jnp.ndarray:
    """() bool — True when the safety invariant may no longer hold.

    ``budget`` is extra per-particle displacement headroom the caller will
    consume BEFORE the next staleness check (e.g. sqrt(3)*dpos for one more
    checkerboard move per particle) — without it the trigger fires exactly
    at violation, after stale energies were already used (ADVICE.md r1).
    ``shrink`` (<1) budgets a pending isotropic box rescale: the invariant
    must hold at box*shrink for a volume-move energy to be exact.
    """
    s = box / nl.ref_box
    maxdisp = max_displacement(nl, pos, box)
    return (rc + 2.0 * (maxdisp + budget)) > nl.rlist * jnp.min(s) * shrink


def _row_terms(pot, pos, box, idx, count, ri_x, ri_y, ri_z):
    """Per-row pair energies/virials + components, all (..., K) minor-K.

    idx/count: (..., K) neighbor rows and (...,) counts.
    ri_*: (...,) coordinates of the central particles.
    Returns e, w, dx, dy, dz, r2, valid with shape (..., K).
    """
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    # promise_in_bounds: indices are valid by construction; without the
    # promise XLA emits a kCustom scalar-space gather ~1000x slower
    # (docs/tpu_notes.md §5)
    gx = px.at[idx].get(mode="promise_in_bounds")
    gy = py.at[idx].get(mode="promise_in_bounds")
    gz = pz.at[idx].get(mode="promise_in_bounds")
    dx = _mi(ri_x[..., None] - gx, box[0])
    dy = _mi(ri_y[..., None] - gy, box[1])
    dz = _mi(ri_z[..., None] - gz, box[2])
    r2 = dx * dx + dy * dy + dz * dz
    k = idx.shape[-1]
    slot = jnp.arange(k, dtype=jnp.int32)
    valid = (slot < count[..., None]) & (r2 < pot.rc * pot.rc)
    e, w = pot.pair_e_w(jnp.where(valid, r2, 1.0))
    return (jnp.where(valid, e, 0.0), jnp.where(valid, w, 0.0),
            dx, dy, dz, r2, valid)


def pair_energy_virial(pot, pos, box, nl: NeighborList):
    """Total pe/virial from the list (each pair appears twice -> x0.5)."""
    e, w, *_ = _row_terms(pot, pos, box, nl.idx, nl.count,
                          pos[:, 0], pos[:, 1], pos[:, 2])
    return 0.5 * jnp.sum(e), 0.5 * jnp.sum(w)


def forces(pot, pos, box, nl: NeighborList):
    e, w, dx, dy, dz, r2, valid = _row_terms(
        pot, pos, box, nl.idx, nl.count, pos[:, 0], pos[:, 1], pos[:, 2])
    coef = jnp.where(valid, w / jnp.where(valid, r2, 1.0), 0.0)
    fx = jnp.sum(coef * dx, axis=-1)
    fy = jnp.sum(coef * dy, axis=-1)
    fz = jnp.sum(coef * dz, axis=-1)
    return jnp.stack([fx, fy, fz], axis=-1)


def delta_moves(pot, pos, box, nl: NeighborList, ids, new_r):
    """Batched (dE, dW) for moving particles ``ids`` (M,) to ``new_r`` (M,3).

    Exact provided the moved particles are pairwise non-interacting
    (checkerboard guarantee) and the list is fresh (needs_rebuild False).
    """
    rows = nl.idx.at[ids].get(mode="promise_in_bounds")   # (M, K)
    cnt = nl.count.at[ids].get(mode="promise_in_bounds")   # (M,)
    old = pos.at[ids].get(mode="promise_in_bounds")

    def side(rx, ry, rz):
        e, w, *_ = _row_terms(pot, pos, box, rows, cnt, rx, ry, rz)
        return jnp.sum(e, axis=-1), jnp.sum(w, axis=-1)

    e_old, w_old = side(old[:, 0], old[:, 1], old[:, 2])
    e_new, w_new = side(new_r[:, 0], new_r[:, 1], new_r[:, 2])
    return e_new - e_old, w_new - w_old


def delta_move_single(pot, pos, box, nl, i, new_ri):
    """Single-particle wrapper matching the EnergyBackend.delta_move API."""
    de, dw = delta_moves(pot, pos, box, nl,
                         jnp.asarray(i)[None], new_ri[None])
    return de[0], dw[0]
