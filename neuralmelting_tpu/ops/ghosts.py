"""Ghost (periodic-image) atoms for gather-free pair energies.

On this TPU stack dynamic gathers run ~3 orders of magnitude below HBM
speed (docs/tpu_notes.md), so the fast LJ path computes trial-move energies
as a dense batched matmul against ALL atoms:

    r^2_mj = |r_m|^2 - 2 r_m . p_j + |p_j|^2,

which is exact only without minimum-image wrapping. Ghost copies of every
atom within ``shell`` of a periodic face/edge/corner (up to 26 images)
extend the position array so that every interacting pair has an unwrapped
image within rc: the matmul needs no wrapping at all.

Ghosts carry their parent index; accepted movers update their own row and
their ghost rows in one fused scatter. Staleness follows the same
displacement criterion as neighbor lists; unused ghost capacity is parked
at +1e30 so padded rows never interact.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

# 26 neighbor-image sign vectors (static)
_SIGNS = np.array([(sx, sy, sz)
                   for sx in (-1, 0, 1)
                   for sy in (-1, 0, 1)
                   for sz in (-1, 0, 1)
                   if (sx, sy, sz) != (0, 0, 0)], np.float32)  # (26, 3)

GCAP_PER_ATOM = 7  # exactly the 7-image worst case (corner atom)


@struct.dataclass
class GhostMap:
    """Extended position bookkeeping. Ext index space: [0,N) real,
    [N, N+gcap) ghosts."""
    pos_ext: jnp.ndarray      # (N+gcap, 3); unused ghost rows at 1e30
    parent_ext: jnp.ndarray   # (N+gcap,) i32; real rows = own index
    sign: jnp.ndarray         # (gcap, 3) f32 image signs of each ghost slot
    slots_of: jnp.ndarray     # (N, GCAP_PER_ATOM) i32 ext-slots of each
                              #   atom's ghosts, padded with N+gcap (dumped)
    nghost: jnp.ndarray       # () i32
    ref_pos: jnp.ndarray      # (N, 3) at build
    ref_box: jnp.ndarray      # (3,)
    shell: jnp.ndarray        # () shell width used
    overflow: jnp.ndarray     # () bool

    @property
    def gcap(self) -> int:
        return self.sign.shape[0]


def suggest_gcap(n, box_host, shell, safety=1.4):
    """Static ghost capacity from the shell volume fraction."""
    box = np.asarray(box_host, np.float64)
    frac = float(np.prod(box + 2 * shell) / np.prod(box) - 1.0)
    g = int(np.ceil(safety * n * frac)) + 32
    return (g + 127) // 128 * 128


def build(pos, box, shell, gcap: int) -> GhostMap:
    """Select ghosts: atom i is an image for sign s iff for every axis c
    with s_c=+1: x_c < shell, and s_c=-1: x_c > L_c - shell."""
    n = pos.shape[0]
    signs = jnp.asarray(_SIGNS)                       # (26, 3)
    lo = pos[None, :, :] < shell                      # (1, N, 3)
    hi = pos[None, :, :] > (box - shell)[None, None, :]
    s = signs[:, None, :]
    ok = jnp.where(s > 0, lo, jnp.where(s < 0, hi, True))
    mask = jnp.all(ok, axis=-1)                       # (26, N)
    flat = mask.reshape(-1)
    count = jnp.sum(flat).astype(jnp.int32)
    # first `gcap` active (offset-major) entries, in index order
    vals, idx = jax.lax.top_k(flat.astype(jnp.float32), gcap)
    valid = vals > 0.5
    off_id = (idx // n).astype(jnp.int32)
    parent = jnp.where(valid, (idx % n).astype(jnp.int32), 0)
    sign = jnp.where(valid[:, None], signs[off_id], 0.0)

    gpos = pos[parent] + sign * box
    gpos = jnp.where(valid[:, None], gpos, 1e30)
    pos_ext = jnp.concatenate([pos, gpos], axis=0)
    parent_ext = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32),
         jnp.where(valid, parent, -1)], axis=0)

    # slots_of: rank of ghost g among ghosts of the same parent (O(gcap^2),
    # rebuild-time only), scattered into a fixed (N, GCAP_PER_ATOM) table
    g_ids = jnp.arange(gcap, dtype=jnp.int32)
    same = (parent[None, :] == parent[:, None]) & valid[None, :] & valid[:, None]
    rank = jnp.sum(same & (g_ids[None, :] < g_ids[:, None]),
                   axis=1).astype(jnp.int32)
    # an atom needs more than the 7 single-shift images only when
    # 2*shell > min(box) (it sits within shell of BOTH faces of an axis);
    # clamping would silently stop updating the dropped image, so flag it
    rank_overflow = jnp.any(valid & (rank > GCAP_PER_ATOM - 1))
    rank = jnp.minimum(rank, GCAP_PER_ATOM - 1)
    dump = n + gcap
    slots_of = jnp.full((n + 1, GCAP_PER_ATOM), dump, jnp.int32)
    row = jnp.where(valid, parent, n)
    slots_of = slots_of.at[row, rank].set(
        jnp.where(valid, n + g_ids, dump))
    slots_of = slots_of[:n]

    return GhostMap(
        pos_ext=pos_ext, parent_ext=parent_ext, sign=sign,
        slots_of=slots_of, nghost=count,
        ref_pos=jnp.copy(pos), ref_box=jnp.copy(box),
        shell=jnp.asarray(shell, jnp.float32),
        overflow=(count > gcap) | rank_overflow,
    )


def needs_rebuild(gm: GhostMap, rc, budget=0.0, shrink=1.0) -> jnp.ndarray:
    """True when accumulated displacement may break image coverage.

    Uses the REAL rows of pos_ext vs the build snapshot; box rescales are
    handled conservatively like neighbor lists (safe when the shell at
    build, scaled, still covers rc + 2*maxdisp).

    ``budget`` is extra displacement headroom the caller consumes before the
    next check (one checkerboard move = sqrt(3)*dpos); ``shrink`` (<1)
    budgets a pending isotropic rescale by c: coverage of gm scaled by c
    requires rc/c + 2*maxdisp <= shell (ADVICE.md r1).
    """
    n = gm.ref_pos.shape[0]
    pos = gm.pos_ext[:n]
    d = pos - gm.ref_pos
    maxdisp = jnp.sqrt(jnp.max(jnp.sum(d * d, axis=-1)))
    return (rc / shrink + 2.0 * (maxdisp + budget)) > gm.shell


def scaled(gm: GhostMap, s) -> GhostMap:
    """Apply an isotropic volume rescale to all extended positions."""
    return gm.replace(pos_ext=gm.pos_ext * s,
                      ref_pos=gm.ref_pos * s,
                      ref_box=gm.ref_box * s,
                      shell=gm.shell * jnp.min(s))


def apply_moves(gm: GhostMap, box, ids, delta) -> GhostMap:
    """Scatter accepted displacements into real + ghost rows (one op each).

    ids (A,), delta (A,3) with zeros for rejected movers. Positions are NOT
    wrapped here — the unwrapped coordinates plus ghosts keep all pair math
    exact between rebuilds (rebuild re-wraps).
    """
    slots = gm.slots_of.at[ids].get(mode="promise_in_bounds")  # (A, GPA)
    all_idx = jnp.concatenate([ids[:, None], slots], axis=1)   # (A, 1+GPA)
    all_delta = jnp.broadcast_to(delta[:, None, :],
                                 all_idx.shape + (3,))
    # row-scatter form measured fastest on this stack (a flattened 1-D
    # scatter with 3x the indices is ~1.6x slower end to end)
    pos_ext = gm.pos_ext.at[all_idx.reshape(-1)].add(
        all_delta.reshape(-1, 3), mode="drop")
    return gm.replace(pos_ext=pos_ext)


def rewrap_rebuild(gm: GhostMap, box, shell, gcap: int) -> GhostMap:
    """Wrap real rows back into the box and rebuild ghosts."""
    n = gm.ref_pos.shape[0]
    pos = gm.pos_ext[:n]
    pos = pos - box * jnp.floor(pos / box)
    return build(pos, box, shell, gcap)
