"""Fixed-capacity neighbor lists (static shapes; SURVEY.md §7 Phase 3).

TPU-native replacement for LAMMPS's binned neighbor lists (SURVEY.md §2.1).
The list is built by an O(N^2) masked top-k — at the N of interest
(<= tens of thousands per replica) a full distance matrix is a trivial,
perfectly-tiled VPU workload, far cheaper than emulating pointer-chasing
cell bins on a vector machine. Static capacity K keeps all shapes fixed;
overflow and staleness are tracked as flags, and rebuilds are triggered
globally (all replicas at once) so `lax.cond` stays out of vmapped code.

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


def build(pos, box, rlist, capacity: int) -> NeighborList:
    """O(N^2) masked build. `capacity` and shapes are static."""
    n = pos.shape[0]
    disp = min_image(pos[None, :, :] - pos[:, None, :], box)
    r2 = jnp.sum(disp * disp, axis=-1)
    mask = (r2 < rlist * rlist) & ~jnp.eye(n, dtype=bool)
    count = jnp.sum(mask, axis=-1).astype(jnp.int32)
    # top_k on the 0/1 mask returns the first `capacity` True columns in
    # ascending index order (ties keep lower indices first).
    vals, idx = jax.lax.top_k(mask.astype(jnp.float32), capacity)
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


def needs_rebuild(nl: NeighborList, pos, box, rc) -> jnp.ndarray:
    """() bool — True when the safety invariant may no longer hold."""
    s = box / nl.ref_box
    # effective displacement vs. affinely-rescaled build positions
    d = min_image(pos - nl.ref_pos * s, box)
    maxdisp = jnp.sqrt(jnp.max(jnp.sum(d * d, axis=-1)))
    return (rc + 2.0 * maxdisp) > nl.rlist * jnp.min(s)


def _pair_terms(pot, pos, box, nl, pos_override=None, box_override=None):
    p = pos if pos_override is None else pos_override
    b = box if box_override is None else box_override
    rj = p[nl.idx]                                    # (N, K, 3)
    d = min_image(p[:, None, :] - rj, b)
    r2 = jnp.sum(d * d, axis=-1)
    slot = jnp.arange(nl.capacity, dtype=jnp.int32)[None, :]
    valid = (slot < nl.count[:, None]) & (r2 < pot.rc * pot.rc)
    e, w = pot.pair_e_w(jnp.where(valid, r2, 1.0))
    return jnp.where(valid, e, 0.0), jnp.where(valid, w, 0.0), d, r2, valid


def pair_energy_virial(pot, pos, box, nl: NeighborList):
    """Total pe/virial from the list (each pair appears twice -> x0.5)."""
    e, w, _, _, _ = _pair_terms(pot, pos, box, nl)
    return 0.5 * jnp.sum(e), 0.5 * jnp.sum(w)


def forces(pot, pos, box, nl: NeighborList):
    e, w, d, r2, valid = _pair_terms(pot, pos, box, nl)
    coef = jnp.where(valid, w / jnp.where(valid, r2, 1.0), 0.0)
    return jnp.sum(coef[:, :, None] * d, axis=1)


def delta_moves(pot, pos, box, nl: NeighborList, ids, new_r):
    """Batched (dE, dW) for moving particles ``ids`` (M,) to ``new_r`` (M,3).

    Exact provided the moved particles are pairwise non-interacting
    (checkerboard guarantee) and the list is fresh (needs_rebuild False).
    """
    rows = nl.idx[ids]                                 # (M, K)
    cnt = nl.count[ids]                                # (M,)
    rj = pos[rows]                                     # (M, K, 3)
    slot = jnp.arange(nl.capacity, dtype=jnp.int32)[None, :]
    in_row = slot < cnt[:, None]
    rc2 = pot.rc * pot.rc

    def side(ri):
        d = min_image(ri[:, None, :] - rj, box)
        r2 = jnp.sum(d * d, axis=-1)
        valid = in_row & (r2 < rc2)
        e, w = pot.pair_e_w(jnp.where(valid, r2, 1.0))
        return (jnp.sum(jnp.where(valid, e, 0.0), axis=-1),
                jnp.sum(jnp.where(valid, w, 0.0), axis=-1))

    e_old, w_old = side(pos[ids])
    e_new, w_new = side(new_r)
    return e_new - e_old, w_new - w_old


def delta_move_single(pot, pos, box, nl, i, new_ri):
    """Single-particle wrapper matching the EnergyBackend.delta_move API."""
    de, dw = delta_moves(pot, pos, box, nl,
                         jnp.asarray(i)[None], new_ri[None])
    return de[0], dw[0]
