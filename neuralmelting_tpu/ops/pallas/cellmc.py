"""Whole-sweep Pallas TPU kernel: cell-confined checkerboard NPT position MC.

This is the production LJ hot path (BASELINE.json north star: "pair
energies ... written as Pallas kernels"). One ``pallas_call`` advances a
whole replica tile through NCYC checkerboard cycles — every substep's
candidate energies, PRNG, Metropolis acceptance and position updates stay
in VMEM, amortizing the per-dispatch overhead and HBM traffic that bounded
the XLA engines (sampler/dense.py ran one dispatch per color substep).

Scheme (Anderson et al., arXiv:1509.04692 — the scalable checkerboard MC
the reference's serial LAMMPS loop cannot express): the box is cut into an
even (nx, ny, nz) grid of cells of width >= rc; cells are 2-strided into 8
colors. Trial moves are CONFINED to the mover's cell, so

  * same-color movers can never interact (gap >= w >= rc): exact parallel
    Metropolis acceptance for all active cells at once;
  * every interaction partner of a mover lies in its 27-cell stencil: the
    candidate set is the 26 neighbor blocks (other colors) + own cell;
  * atoms never leave their cell between rebinnings: no neighbor-list
    staleness tracking, no rebuild budget, unlimited substeps per binning.

Ergodicity across cell boundaries comes from a random continuous grid
shift, applied OUTSIDE the kernel as an incremental one-axis slab->slab
rebinning (`rebin_axis`, a batched minor-axis sort — measured 0.5 ms at
R=64 vs 26 ms for a gather/scatter rebuild on this stack).

Data layout ("slabs"): positions live binned as (C*K, R) arrays per
coordinate — C cells (color-major: 8 colors x (hx,hy,hz) within-color
grid), K fixed slots per cell (occupied slots packed first), replicas in
the 128-lane minor axis. Stencil candidates come from STATIC rolls of
neighbor color blocks (sublane-axis rolls compile to static slices); the
periodic wrap rows get a +-L coordinate correction, so pair distances need
no min-image math at all. Per color step, J movers per cell are trialed:
their energies against the 26 static (other-color) blocks vectorize over
J, and the own-cell interactions + acceptance run as J exact sequential
substeps against the live slab.

RNG is an in-kernel threefry2x32 (20 rounds, Random123/JAX's generator),
keyed per replica tile and counter-based — bitwise reproducible across
TPU and interpret mode, no reliance on the hardware PRNG.

Reference parity: replaces lammps_remcmc.py's position-move hot loop
(SURVEY.md §3.1) — one Python->LAMMPS round trip per trial there; ~10^4
trials per dispatch here.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID = 1.0e30        # parked coordinate for empty slots
RT = 128                # replica lane tile


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CellGeom:
    """Static slab geometry: cells of width >= rc, checkerboard stride s
    (s=2 for pair potentials — same-color movers can't interact; s=3 for
    EAM — same-color movers 2w >= 2rc apart have DISJOINT neighborhoods,
    so the density-coupled acceptance stays exact in parallel). Each axis
    count divisible by s so colors tile periodically."""
    ncell: tuple            # (nx, ny, nz), each divisible by stride
    kcap: int               # slots per cell (multiple of 8)
    nsub: int               # J: mover picks per cell per color step
    natoms: int
    stride: int = 2

    @property
    def ncolors(self) -> int:
        return self.stride ** 3

    @property
    def ncells(self) -> int:
        return int(np.prod(self.ncell))

    @property
    def half(self) -> tuple:             # within-color grid (historical name)
        return tuple(n // self.stride for n in self.ncell)

    @property
    def cw(self) -> int:                 # cells per color
        return self.ncells // self.ncolors

    @property
    def rows(self) -> int:
        return self.ncells * self.kcap


def make_geom(box0, rc: float, natoms: int, nsub: int = 16,
              shrink_margin: float = 0.05, kcap: int = 0,
              stride: int = 2) -> CellGeom:
    """Pick the cell grid for initial box ``box0``: per axis the largest
    stride-divisible cell count with width >= rc/(1-shrink_margin)
    (margin budgets NPT box shrink within a chunk; validated per sweep by
    the engine)."""
    box0 = np.asarray(box0, np.float64)
    wmin = float(rc) / (1.0 - shrink_margin)
    ncell = []
    for b in box0:
        n = int(np.floor(b / wmin))
        n = max(stride, (n // stride) * stride)
        if b / n < wmin:
            raise ValueError(
                f"box {box0} too small for cell MC at rc={rc} "
                f"(need >= {stride * wmin} per axis)")
        ncell.append(n)
    ncell = tuple(ncell)
    if kcap <= 0:
        dens = natoms / float(np.prod(box0))
        cellvol = float(np.prod(box0 / np.asarray(ncell)))
        mean = dens * cellvol
        # margin: condensed-phase occupancy fluctuations are strongly
        # sub-Poisson (var ~ S(0)*mean with S(0) ~ 0.03-0.1 for LJ
        # solid/liquid); 2.5*sqrt(mean) is ~8-14 real sigmas with floor 6
        # for small cells. Every padded slot costs candidate work in the
        # sweep kernel, and overflow is DETECTED at runtime (diag bit
        # DIAG_SLAB_OVERFLOW), so a tight cap fails loudly, not silently.
        kcap = int(np.ceil(mean + max(2.5 * np.sqrt(mean), 6.0)))
    kcap = max(kcap, nsub)
    # divisible by 8: the total kernels iterate mover slots in chunks of
    # 8; a remainder would silently drop pairs from total energy/virial
    # (ADVICE.md r2). Consecutive-pick movers put no J constraint on K.
    kcap = -(-kcap // 8) * 8
    return CellGeom(ncell=ncell, kcap=kcap, nsub=nsub, natoms=natoms,
                    stride=stride)


def tight_kcap(maxcount: int, nsub: int = 8, margin: int = 12) -> int:
    """Slot capacity from MEASURED occupancy: max cell count + margin,
    rounded up to 8. Candidate work in the sweep kernel is linear in K
    (27*K pair slots per trial), so a data-driven cap beats the analytic
    density bound by ~20%; overflow is detected (DIAG_SLAB_OVERFLOW) and
    the runner retries the chunk with K+8 (runner.run_sampling).

    margin=12: measured at the bench config (NPT liquid lanes, 100
    sweeps, 1024 replicas x 128 cells), max occupancy drifts ~+10 over
    the initial max as boxes compress; margin 6 overflowed (diag=4),
    12 has not. Overflow stays detected-and-retried either way."""
    k = max(maxcount + margin, nsub, 8)
    return -(-k // 8) * 8


def geom_tables(geom: CellGeom):
    """Static per-row full-cell coordinates (3, C*K) int32 — passed as jit
    arguments, never baked into traced code (docs/tpu_notes.md §1)."""
    s = geom.stride
    hx, hy, hz = geom.half
    k = geom.kcap
    rows = np.arange(geom.rows)
    cell = rows // k
    color = cell // geom.cw
    w = cell % geom.cw
    sx, sy, sz = color // (s * s), (color // s) % s, color % s
    vx, vy, vz = w // (hy * hz), (w // hz) % hy, w % hz
    return np.stack([s * vx + sx, s * vy + sy,
                     s * vz + sz]).astype(np.int32)


def _scid(geom: CellGeom, c3):
    """Color-major slab cell index from full-cell coords (..., 3)."""
    s = geom.stride
    hx, hy, hz = geom.half
    cx, cy, cz = c3[..., 0], c3[..., 1], c3[..., 2]
    color = ((cx % s) * s + (cy % s)) * s + (cz % s)
    w = ((cx // s) * hy + (cy // s)) * hz + (cz // s)
    return color * geom.cw + w


# ---------------------------------------------------------------------------
# XLA side: bin / rebin / unbin (slab-resident state helpers)
# ---------------------------------------------------------------------------

def bin_initial(geom: CellGeom, pos, box, shift):
    """pos (N,3) original frame -> slabs; once per chunk (off hot path).

    Returns (x, y, z, ids, count, overflow): coords (C*K,) in the SHIFTED
    frame (y = (x/L + shift) mod 1 * L, so cells are axis-aligned blocks
    [c*w, (c+1)*w) — no cell is split by the periodic boundary), ids
    (C*K,) i32 with -1 padding, count (C,) i32.
    """
    n = pos.shape[0]
    k = geom.kcap
    ncell_i = jnp.asarray(np.asarray(geom.ncell, np.int32))
    ncell_f = jnp.asarray(np.asarray(geom.ncell, np.float32))
    y = ((pos / box + shift) % 1.0) * box
    w = box / ncell_f
    c3 = jnp.minimum((y / w).astype(jnp.int32), ncell_i - 1)
    scid = _scid(geom, c3)
    s, xs, ys, zs, ids = jax.lax.sort(
        (scid, y[:, 0], y[:, 1], y[:, 2], jnp.arange(n, dtype=jnp.int32)),
        num_keys=1)
    count = jnp.bincount(s, length=geom.ncells).astype(jnp.int32)
    # rank within cell without gathers: distance to the last cell boundary
    iota = jnp.arange(n, dtype=jnp.int32)
    boundary = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (s[1:] != s[:-1]).astype(jnp.int32)])
    seg_start = jax.lax.cummax(jnp.where(boundary > 0, iota, 0))
    rank = iota - seg_start
    rows = s * k + jnp.minimum(rank, k - 1)
    xs_, ys_, zs_ = (jnp.full((geom.rows,), INVALID, jnp.float32)
                     for _ in range(3))
    ids_ = jnp.full((geom.rows,), -1, jnp.int32)
    okw = dict(indices_are_sorted=True, unique_indices=False, mode="drop")
    xs_ = xs_.at[rows].set(xs, **okw)
    ys_ = ys_.at[rows].set(ys, **okw)
    zs_ = zs_.at[rows].set(zs, **okw)
    ids_ = ids_.at[rows].set(ids, **okw)
    return xs_, ys_, zs_, ids_, count, jnp.any(count > k)


def unbin(geom: CellGeom, slabs, box, shift):
    """slabs -> (N, 3) positions in the ORIGINAL frame, atom-id order."""
    x, y, z, ids = slabs[:4]
    key = jnp.where(ids >= 0, ids, geom.rows + 1)
    _, xs, ys, zs = jax.lax.sort((key, x, y, z), num_keys=1)
    n = geom.natoms
    yy = jnp.stack([xs[:n], ys[:n], zs[:n]], axis=-1)
    return ((yy / box - shift) % 1.0) * box


def _cellgrid(geom: CellGeom, arr):
    """(..., C, K) -> (..., s,s,s, hx,hy,hz, K) color-major view."""
    s = geom.stride
    hx, hy, hz = geom.half
    return arr.reshape(arr.shape[:-2] + (s, s, s, hx, hy, hz, geom.kcap))


def _shift_cells_up(geom: CellGeom, arr, axis: int):
    """out[c] = in[c - 1] along full-cell ``axis`` (periodic): donor view
    for rebinning. arr (..., C, K); pure reshape/roll/concat — no gathers.
    """
    g = _cellgrid(geom, arr)
    s = geom.stride
    sa = g.ndim - 7 + axis      # sigma_axis index in the 8D view
    va = g.ndim - 4 + axis      # v_axis index
    # c-1 of (sigma=j>0, v) is (sigma=j-1, v); c-1 of (sigma=0, v) is
    # (sigma=s-1, v-1): roll the top color down by one v step.
    parts = [jax.lax.index_in_dim(g, j, axis=sa, keepdims=True)
             for j in range(s)]
    out = jnp.concatenate([jnp.roll(parts[s - 1], 1, axis=va)]
                          + parts[:s - 1], axis=sa)
    return out.reshape(arr.shape)


def rebin_axis(geom: CellGeom, slabs, count, box, delta_frac, axis: int,
               cell_tab=None, extras=()):
    """Advance the grid shift by ``delta_frac`` (< 1/ncell[axis]) along one
    axis: every atom stays in its cell or moves to the cell BELOW (its cell
    index grows by one as the grid slides). Batched (R, C*K) slabs ->
    updated slabs; one 5-operand minor-axis sort, zero gathers.

    Caller updates its shift bookkeeping: shift[axis] += delta_frac.
    """
    x, y, z, ids = slabs
    r = x.shape[0]
    c, k = geom.ncells, geom.kcap
    la = box[:, axis:axis + 1]                       # (R, 1)
    na = geom.ncell[axis]
    coord = (x, y, z)[axis]
    valid = ids >= 0
    moved = (coord + delta_frac * la) % la
    coord2 = jnp.where(valid, moved, INVALID)
    slabs2 = [coord2 if a == axis else s for a, s in enumerate((x, y, z))]
    wa = la / na
    newc = jnp.minimum((coord2 / wa).astype(jnp.int32), na - 1)
    # static per-row cell coordinate along `axis` (geom_tables row `axis`);
    # pass cell_tab as a jit argument from scan bodies — a freshly created
    # constant would be baked into the trace (docs/tpu_notes.md §1)
    cello = cell_tab if cell_tab is not None else _static_cell_axis(geom,
                                                                    axis)
    cell_a = jnp.broadcast_to(cello[None, :], x.shape)
    stays = valid & (newc == cell_a)
    goes = valid & ~stays

    def blocks(v, fill):
        stay = jnp.where(stays, v, fill).reshape(r, c, k)
        mover = jnp.where(goes, v, fill).reshape(r, c, k)
        donor = _shift_cells_up(geom, mover, axis)
        return jnp.concatenate([stay, donor], axis=-1)      # (R, C, 2K)

    bx = blocks(slabs2[0], INVALID)
    by = blocks(slabs2[1], INVALID)
    bz = blocks(slabs2[2], INVALID)
    bi = blocks(ids, -1)
    bex = [blocks(e, 0.0) for e in extras]   # e.g. the EAM density slab
    keyf = jnp.where(bi >= 0, 0.0, 1.0)
    sorted_ops = jax.lax.sort((keyf, bx, by, bz, bi) + tuple(bex),
                              num_keys=1, dimension=2)
    sx, sy, sz, si = sorted_ops[1:5]
    sex = sorted_ops[5:]
    nvalid = jnp.sum((bi >= 0).astype(jnp.int32), axis=-1)   # (R, C)
    overflow = jnp.any(nvalid > k)
    out = tuple(a[..., :k].reshape(r, c * k) for a in (sx, sy, sz, si))
    oex = tuple(a[..., :k].reshape(r, c * k) for a in sex)
    if extras:
        return out, jnp.minimum(nvalid, k), overflow, oex
    return out, jnp.minimum(nvalid, k), overflow


@functools.lru_cache(maxsize=None)
def _static_cell_axis_np(ncell, kcap, axis):
    geom = CellGeom(ncell=ncell, kcap=kcap, nsub=1, natoms=0)
    return geom_tables(geom)[axis]


def _static_cell_axis(geom: CellGeom, axis: int):
    return jnp.asarray(_static_cell_axis_np(geom.ncell, geom.kcap, axis))


# ---------------------------------------------------------------------------
# in-kernel threefry2x32 (Random123, 20 rounds — JAX's default generator)
# ---------------------------------------------------------------------------

_TF_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_TF_C = np.int32(np.uint32(0x1BD11BDA).view(np.int32))


def _rotl(x, r):
    return (x << r) | jax.lax.shift_right_logical(x, 32 - r)


def threefry2x32(k0, k1, x0, x1):
    """int32 in/out; bit-identical to the uint32 reference algorithm
    (two's-complement adds wrap the same way)."""
    ks = [k0, k1, k0 ^ k1 ^ _TF_C]
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for i in range(5):
        for r in _TF_ROT[4 * (i % 2):4 * (i % 2) + 4]:
            x0 = x0 + x1
            x1 = _rotl(x1, r) ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + np.int32(i + 1)
    return x0, x1


def _bits_to_u01(b):
    """int32 bits -> f32 uniform in (0, 1] (never 0: log-safe)."""
    return ((b & 0x7fffff) + 1).astype(jnp.float32) * (2.0 ** -23)


# ---------------------------------------------------------------------------
# the sweep kernel
# ---------------------------------------------------------------------------

def _offsets26():
    return [(dx, dy, dz)
            for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
            if (dx, dy, dz) != (0, 0, 0)]


def _offsets13():
    """Half-space offsets: each unordered cell pair appears exactly once
    across (color, offset) iteration (lexicographically positive)."""
    return [d for d in _offsets26()
            if d[0] > 0 or (d[0] == 0 and (d[1] > 0 or
                                           (d[1] == 0 and d[2] > 0)))]


def _block_utils(geom: CellGeom, rt: int):
    """In-kernel helpers shared by the sweep and total-energy kernels."""
    s = geom.stride
    hx, hy, hz = geom.half
    k = geom.kcap
    blk = geom.cw * k
    strides = (hy * hz * k, hz * k, k)
    half = (hx, hy, hz)

    def row_iota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim)

    def roll0(b, shift):
        """Static sublane roll; skips identity (a full-size roll would
        lower to a zero-length slice, which Mosaic rejects)."""
        sh = shift % b.shape[0]
        return b if sh == 0 else jnp.roll(b, sh, axis=0)

    def neighbor_color(sbits, off):
        """Traced color index of the block at cell offset ``off``."""
        cp = 0
        for a in range(3):
            sa = sbits[a] + off[a]
            sa = jnp.where(sa < 0, sa + s, jnp.where(sa >= s, sa - s, sa))
            cp = cp * s + sa
        return cp

    def align_value(b, coord_axis, sbits, off, axis_l,
                    reverse: bool = False):
        """Neighbor color block aligned to the active color's w-grid.

        The active color is TRACED (sbits = per-axis color trits in
        [0, stride)): for each offset axis with d_a != 0 the w-grid carry
        is +-1 exactly when the active trit steps past the color range
        (d>0 and trit==stride-1, or d<0 and trit==0), so the carry-aligned
        variant is computed with STATIC rolls and selected by the traced
        condition. Row alignment is coordinate-independent; the periodic
        +-L image correction applies only to the coordinate of the axis
        that wrapped (coord_axis; pass coord_axis=None for non-coordinate
        per-slot data like densities).

        ``reverse=True`` applies the INVERSE row alignment (color index
        still computed from the forward offset): use it to push per-
        candidate results (e.g. EAM density increments) back into the
        neighbor block's own row order.
        """
        dvec = off
        rows = row_iota((blk, 1), 0)
        for a in range(3):
            da = dvec[a]
            if da == 0:
                continue
            # carry is active iff stepping past this axis' color range
            active = (sbits[a] == (s - 1 if da > 0 else 0)).reshape(1, 1)
            ra = -da if reverse else da      # roll direction
            va = (rows // strides[a]) % half[a]
            edge = (half[a] - 1) if ra > 0 else 0
            if half[a] == 1:
                rolled = b        # single w-cell: identity alignment
            elif a == 0:
                # outermost axis: flat roll wraps exactly
                rolled = roll0(b, -ra * strides[a])
            else:
                # jnp.roll(b, s): out[i] = in[i - s]. Main rows read
                # in[i + ra*stride]; wrap rows (edge of the w-grid)
                # read the opposite end: in[i - ra*(half-1)*stride].
                main = roll0(b, -ra * strides[a])
                wrap = roll0(b, ra * (half[a] - 1) * strides[a])
                rolled = jnp.where(va == edge, wrap, main)
            if coord_axis is not None and a == coord_axis:
                # rows whose source cell wrapped around the box read
                # the periodic image: high wrap -> +L, low wrap -> -L
                rolled = rolled + jnp.where(
                    va == edge, jnp.float32(da) * axis_l[a], 0.0)
            b = jnp.where(active, rolled, b)
        return b

    def aligned_block(ref, coord_axis, sbits, off, axis_l,
                      reverse: bool = False):
        """Read the neighbor color block of ``off`` and align it."""
        cprime = neighbor_color(sbits, off)
        b = ref[pl.ds(cprime * blk, blk)]               # (blk, rt)
        return align_value(b, coord_axis, sbits, off, axis_l,
                           reverse=reverse)

    return row_iota, roll0, aligned_block, align_value, neighbor_color


def make_sweep_fn(geom: CellGeom, ncyc: int, interpret: bool = False,
                  rt: int = RT, fast_recip: bool = False):
    """Build ``sweep(slabs, count, params, pot3, seeds) -> (slabs, stats)``.

    slabs: (x, y, z) each (C*K, Rp) f32, Rp a multiple of RT (or == the
      true replica count padded by the caller); SHIFTED-frame coords.
    count: (C, Rp) i32 occupied slots per cell (packed first).
    params: (8, Rp) f32 rows [beta, dpos, wx, wy, wz, Lx, Ly, Lz].
    pot3:  (4,) f32 [eps, sigma, rc, pad] (global LJ parameters).
    seeds: (ntiles, 2) i32 threefry key per replica tile (fold the sweep
      counter in OUTSIDE so every call consumes fresh randomness).
    stats: (8, Rp) f32 rows [pe_delta, n_accept, n_try, 0...].

    Position moves only: volume/HMC moves and thermo records run outside
    on the slab state (sampler/cellmc.py).
    """
    nx, ny, nz = geom.ncell
    hx, hy, hz = geom.half
    k = geom.kcap
    cw = geom.cw
    j = geom.nsub
    stride = geom.stride
    ncolors = geom.ncolors
    blk = cw * k               # rows per color block
    strides = (hy * hz * k, hz * k, k)   # w-grid row strides per axis
    half = (hx, hy, hz)
    row_iota, roll0, aligned_block, align_value, neighbor_color = \
        _block_utils(geom, rt)

    def kernel(seed_ref, pot_ref, params_ref, count_ref,
               x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref, st_ref):
        tile = pl.program_id(0)
        k0 = seed_ref[tile, 0]
        k1 = seed_ref[tile, 1]
        eps = pot_ref[0]
        sig2 = pot_ref[1] * pot_ref[1]
        rc2 = pot_ref[2] * pot_ref[2]
        beta = params_ref[0:1]                  # (1, RT)
        dpos = params_ref[1:2]
        wvec = [params_ref[2 + a:3 + a] for a in range(3)]
        lvec = [params_ref[5 + a:6 + a] for a in range(3)]

        ox_ref[:] = x_ref[:]
        oy_ref[:] = y_ref[:]
        oz_ref[:] = z_ref[:]
        st_ref[:] = jnp.zeros_like(st_ref)

        def eterm(r2):
            """(sigma/r)^12 - (sigma/r)^6, zero beyond rc (pre-4x factor).

            Empty candidate slots self-mask: their coords are 1e30, so
            r2 = inf fails the cutoff. A mover against its OWN slot
            (r2 = 0 exactly) selects NaN here — callers mask that single
            slot explicitly (onehot); no other validity mask is carried
            (measured ~6% of the VPU work)."""
            sr2 = sig2 / r2
            sr6 = sr2 * sr2 * sr2
            return jnp.where(r2 < rc2, sr6 * sr6 - sr6, 0.0)

        def ediff(r2n, r2o):
            """eterm(r2n) - eterm(r2o) with ONE divide: f32 division is
            the most expensive VPU op in the epilogue, and the candidate
            loop needs the new- and old-position terms of every pair, so
            share the reciprocal: q = sig2/(r2n*r2o), sr2_new = q*r2o
            = sig2/r2n, sr2_old = q*r2n = sig2/r2o (matching eterm's
            sr2 = sig2/r2). Degenerate inputs (0 or inf from empty
            slots / self pairs) propagate NaN into BOTH sides, and every
            such slot is already excluded by the cutoff compare or the
            caller's onehot mask, exactly as for eterm.

            fast_recip swaps the divide for Mosaic's approximate
            reciprocal plus ONE Newton step (~1 ulp f32 — the raw
            approximation's 2^-12 error would couple the new/old terms
            at a level that breaks cycle consistency of the effective
            energy). Flag-gated: flips compiled-vs-interpret parity
            from bitwise to ~1 ulp, so scripts/ab_interpret.py keeps
            the exact-divide path."""
            d = r2n * r2o
            if fast_recip:
                y = pl.reciprocal(d, approx=True)
                y = y * (2.0 - d * y)
                q = sig2 * y
            else:
                q = sig2 / d
            s2n = q * r2o
            s2o = q * r2n
            s6n = s2n * s2n * s2n
            s6o = s2o * s2o * s2o
            en = jnp.where(r2n < rc2, s6n * s6n - s6n, 0.0)
            eo = jnp.where(r2o < rc2, s6o * s6o - s6o, 0.0)
            return en - eo

        def color_step(step):
            color = jax.lax.rem(step, ncolors)
            sbits = (color // (stride * stride), (color // stride) % stride,
                     color % stride)
            base = color * blk
            ctr = step * 8
            cnt = count_ref[pl.ds(color * cw, cw)]           # (cw, rt)

            # --- draws (2 threefry calls per mover: 128 bits) ------------
            shape = (j * cw, rt)
            flat = row_iota(shape, 0) * shape[1] + row_iota(shape, 1)
            a0, a1 = threefry2x32(k0, k1,
                                  jnp.full(shape, ctr + 0, jnp.int32), flat)
            b0, b1 = threefry2x32(k0, k1,
                                  jnp.full(shape, ctr + 1, jnp.int32), flat)
            u_acc = _bits_to_u01(a0)          # 23-bit: log-safe
            u_pick = _bits_to_u01(a1)

            def sym16(b, sh):
                """16-bit field -> symmetric f32 in (-1, 1): values
                +-(2m+1)/65536 — a symmetric discrete proposal (exact
                detailed balance at 16-bit displacement granularity)."""
                v = jax.lax.shift_right_logical(b, sh) & 0xffff
                return (v.astype(jnp.float32) - 32767.5) * (1.0 / 32768.0)

            disp = [dpos * d.reshape(j, cw, rt)
                    for d in (sym16(b0, 0), sym16(b0, 16), sym16(b1, 0))]

            # --- mover selection: J CONSECUTIVE occupied slots starting at
            # a random slot s0 per (cell, replica). All J movers distinct
            # whenever cnt >= J (always at production occupancy ~32), so
            # every pick is a valid trial — vs ~7.1/8 for i.i.d. picks with
            # duplicate rejection. A state-independent scan order composed
            # with per-move Metropolis updates leaves the target invariant
            # (systematic-scan MC); s0 re-randomizes every color step.
            cnt_t = jnp.broadcast_to(cnt[None], (j, cw, rt))
            u0 = u_pick.reshape(j, cw, rt)[0]                # (cw, rt)
            s0 = jnp.minimum((u0 * cnt.astype(jnp.float32))
                             .astype(jnp.int32),
                             jnp.maximum(cnt - 1, 0))        # [0, cnt)
            aio = row_iota((j, cw, rt), 0)
            raw = s0[None] + aio                             # < 2*cnt
            pick = jnp.where(raw >= cnt_t, raw - cnt_t, raw)
            valid = aio < cnt_t                              # (j, cw, rt)

            # --- movers (state at color-step start; slots distinct) ------
            bx = ox_ref[pl.ds(base, blk)]
            by = oy_ref[pl.ds(base, blk)]
            bz = oz_ref[pl.ds(base, blk)]
            kio = row_iota((1, cw, k, rt), 2)
            onehot = kio == pick[:, :, None, :]              # (j, cw, k, rt)

            def extract(b):
                b4 = b.reshape(1, cw, k, rt)
                return jnp.sum(jnp.where(onehot, b4, 0.0), axis=2)

            m = [extract(bx), extract(by), extract(bz)]      # (j, cw, rt)
            mn = [m[a] + disp[a] for a in range(3)]

            # --- candidate field: 26 neighbor blocks + OWN cell ----------
            # The own cell rides the same vectorized loop as offset
            # (0,0,0): the mover's own slot self-masks (r2=0 -> NaN ->
            # cutoff-compare false) in the OLD term and is masked
            # explicitly in the NEW term; cell-mate movers enter at their
            # COLOR-STEP-START positions and the sequential resolve below
            # applies exact pairwise corrections for earlier-accepted
            # movers. This replaces the former J sequential full-block
            # reload/eval substeps (parallel-trial + pairwise-correction;
            # measured ~1.2x at J=16). Per-pair e(new)-e(old) fuses into
            # ONE reduce over the K axis (two reduces measured slower).
            de = jnp.zeros((j, cw, rt), jnp.float32)
            for off in [(0, 0, 0)] + _offsets26():
                if off == (0, 0, 0):
                    c4 = [b.reshape(1, cw, k, rt) for b in (bx, by, bz)]
                else:
                    cnd = [aligned_block(r, a, sbits, off, lvec)
                           for a, r in enumerate((ox_ref, oy_ref, oz_ref))]
                    c4 = [c.reshape(1, cw, k, rt) for c in cnd]

                def r2of(p):
                    d0 = c4[0] - p[0][:, :, None, :]
                    d1 = c4[1] - p[1][:, :, None, :]
                    d2 = c4[2] - p[2][:, :, None, :]
                    return d0 * d0 + d1 * d1 + d2 * d2

                diff = ediff(r2of(mn), r2of(m))
                if off == (0, 0, 0):
                    # the pair against the mover's own (old) slot row is
                    # NaN (r2_old = 0 exactly) — mask that single slot
                    diff = jnp.where(onehot, 0.0, diff)
                de = de + 4.0 * jnp.sum(diff, axis=-2)

            # --- in-cell confinement test --------------------------------
            # full-cell coords of each cell row: stride*v + traced color bit
            crow = row_iota((cw, 1), 0)
            vxyz = [(crow // (strides[a] // k)) % half[a] for a in range(3)]
            cfull = [stride * vxyz[a] + sbits[a]
                     for a in range(3)]                          # (cw, 1)
            incell = valid                                       # (j,cw,rt)
            for a in range(3):
                lo_a = cfull[a].astype(jnp.float32) * wvec[a]    # (cw, rt)
                incell = (incell & (mn[a] >= lo_a[None])
                          & (mn[a] < (lo_a + wvec[a])[None]))
            ln_u = jnp.log(u_acc.reshape(j, cw, rt))

            def pair_e(p, i, q, l):
                """4*eterm between mover i of list p and mover l of q."""
                d0 = p[0][i] - q[0][l]
                d1 = p[1][i] - q[1][l]
                d2 = p[2][i] - q[2][l]
                return 4.0 * eterm(d0 * d0 + d1 * d1 + d2 * d2)

            # --- sequential resolve (registers only, no K-wide work) ----
            # mover a's trial was evaluated with cell-mate b at its START
            # position; if b (earlier in the scan) accepted, correct both
            # the old and new terms of the (a, b) pair exactly.
            accs, accf, de_acc = [], [], jnp.zeros((1, rt), jnp.float32)
            nacc = jnp.zeros((1, rt), jnp.float32)
            for ai in range(j):
                dej = de[ai]
                for bi in range(ai):
                    corr = (pair_e(mn, ai, mn, bi) - pair_e(mn, ai, m, bi)
                            - pair_e(m, ai, mn, bi) + pair_e(m, ai, m, bi))
                    dej = dej + accf[bi] * corr
                acc = incell[ai] & (ln_u[ai] < -beta * eps * dej)
                accs.append(acc)
                accf.append(acc.astype(jnp.float32))
                de_acc = de_acc + jnp.sum(
                    jnp.where(acc, eps * dej, 0.0), axis=0, keepdims=True)
                nacc = nacc + jnp.sum(accf[ai], axis=0, keepdims=True)

            # --- apply accepted displacements (one pass) -----------------
            accj = jnp.stack(accs)                           # (j, cw, rt)
            sel = onehot & accj[:, :, None, :]               # (j,cw,k,rt)
            for a, (b, ref) in enumerate(((bx, ox_ref), (by, oy_ref),
                                          (bz, oz_ref))):
                upd = jnp.sum(jnp.where(sel, disp[a][:, :, None, :], 0.0),
                              axis=0)                        # (cw, k, rt)
                ref[pl.ds(base, blk)] = (b.reshape(cw, k, rt)
                                         + upd).reshape(blk, rt)

            st_ref[0:1] = st_ref[0:1] + de_acc
            st_ref[1:2] = st_ref[1:2] + nacc
            st_ref[2:3] = st_ref[2:3] + jnp.sum(
                valid.astype(jnp.float32), axis=(0, 1))[None]

        def step_body(s, _):
            color_step(s)
            return 0

        jax.lax.fori_loop(0, ncyc * ncolors, step_body, 0, unroll=False)

    def sweep(slabs, count, params, pot3, seeds):
        x, y, z = slabs
        rows, rp = x.shape
        rpad = -rp % rt          # dead-lane padding: any replica count
        if rpad:                 # runs (e.g. a 12x12 grid, R=144)
            pc = lambda a, v: jnp.pad(a, ((0, 0), (0, rpad)),
                                      constant_values=v)
            x, y, z = pc(x, INVALID), pc(y, INVALID), pc(z, INVALID)
            count = pc(count, 0)      # empty cells: no movers, no trials
            params = pc(params, 1.0)
        rp0, rp = rp, rp + rpad
        ntiles = rp // rt
        lane = lambda bs: pl.BlockSpec((bs, rt), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(ntiles,),
            out_shape=(jax.ShapeDtypeStruct((rows, rp), jnp.float32),) * 3
            + (jax.ShapeDtypeStruct((8, rp), jnp.float32),),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),    # seeds
                pl.BlockSpec(memory_space=pltpu.SMEM),    # pot3
                lane(8),                                  # params
                lane(geom.ncells),                        # count
                lane(rows), lane(rows), lane(rows),       # slabs
            ],
            out_specs=(lane(rows),) * 3 + (lane(8),),
            input_output_aliases={4: 0, 5: 1, 6: 2},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(seeds, pot3, params, count, x, y, z)
        if rpad:
            return tuple(a[:, :rp0] for a in out[:3]), out[3][:, :rp0]
        return out[:3], out[3]

    return sweep


def make_total_fn(geom: CellGeom, interpret: bool = False, rt: int = RT):
    """Build ``total(slabs, params, pot3, scale) -> sums (8, Rp)``.

    One half-stencil pass over the slab state accumulating the raw LJ pair
    sums, each unordered pair exactly once:

      row 0: S12o = sum_{r<rc}    4 (sigma/r)^12
      row 1: S6o  = sum_{r<rc}    4 (sigma/r)^6
      row 2: S12s = sum_{r<rc/s}  4 (sigma/r)^12
      row 3: S6s  = sum_{r<rc/s}  4 (sigma/r)^6

    From these the engine gets drift-free record thermodynamics AND the
    exact total energy of the isotropically scaled configuration:

      E      = eps (S12o - S6o)
      W      = eps (12 S12o - 6 S6o)          (pair virial sum r*f)
      E(s x) = eps (s^-12 S12s - s^-6 S6s)

    because LJ scales homogeneously and the scaled system's cutoff
    (r' = s r < rc) is exactly the second mask. One pass therefore serves
    both thermo records (s=1) and NPT volume-move trials (s = proposed
    rescale, per replica) — no ghost build, no second energy pass.

    ``scale`` is (1, Rp) f32. Replaces the dense engine's
    total_energy_virial_dense + GhostMap path on the slab state.
    """
    k = geom.kcap
    cw = geom.cw
    stride = geom.stride
    ncolors = geom.ncolors
    blk = cw * k
    mch = 8                           # mover slots per chunk
    assert k % mch == 0, (            # make_geom guarantees this
        f"kcap={k} must be a multiple of {mch}: the chunked mover loop "
        "would silently drop pairs from the totals")
    row_iota, roll0, aligned_block, align_value, neighbor_color = \
        _block_utils(geom, rt)

    def kernel(pot_ref, params_ref, scale_ref, x_ref, y_ref, z_ref, st_ref):
        sig2 = pot_ref[1] * pot_ref[1]
        rc2 = pot_ref[2] * pot_ref[2]
        lvec = [params_ref[5 + a:6 + a] for a in range(3)]
        s = scale_ref[0:1]
        rc2s = rc2 / (s * s)                          # (1, rt)
        st_ref[:] = jnp.zeros_like(st_ref)

        kio = row_iota((1, 1, k, 1), 2)
        qio = row_iota((1, mch, 1, 1), 1)

        def accum(mov, cand, selfmask, weight):
            """mov 3x(cw,mch,1,rt), cand 3x(cw,1,k,rt) -> accumulate into
            st_ref rows 0-3. (Accumulating in loop-local values and
            writing once per color step measured SLOWER — 18.6 vs 14.8 ms
            — as did hoisting the aligned blocks out of the chunk loop,
            26.4 ms: Mosaic schedules the straightforward form best.)"""
            d0 = cand[0] - mov[0]
            d1 = cand[1] - mov[1]
            d2 = cand[2] - mov[2]
            r2 = d0 * d0 + d1 * d1 + d2 * d2
            ok = (cand[0] < 0.1 * INVALID) & (mov[0] < 0.1 * INVALID)
            if selfmask is not None:
                ok = ok & ~selfmask
            sr2 = sig2 / jnp.maximum(r2, 1e-12)
            sr6 = sr2 * sr2 * sr2
            q6 = 4.0 * sr6
            q12 = q6 * sr6
            mo = ok & (r2 < rc2)
            ms = ok & (r2 < rc2s)
            red = lambda v: jnp.sum(v, axis=(0, 1, 2))[None, :]  # (1, rt)
            st_ref[0:1] = st_ref[0:1] + weight * red(
                jnp.where(mo, q12, 0.0))
            st_ref[1:2] = st_ref[1:2] + weight * red(
                jnp.where(mo, q6, 0.0))
            st_ref[2:3] = st_ref[2:3] + weight * red(
                jnp.where(ms, q12, 0.0))
            st_ref[3:4] = st_ref[3:4] + weight * red(
                jnp.where(ms, q6, 0.0))

        def color_step(color, _):
            sbits = (color // (stride * stride), (color // stride) % stride,
                     color % stride)
            base = color * blk
            bx = x_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            by = y_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            bz = z_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            own = [jnp.expand_dims(b, 1) for b in (bx, by, bz)]
            # (cw, 1, k, rt)

            for c in range(k // mch):
                # slice then expand: mixing slices with newaxis lowers to
                # an (unsupported) >2D gather in Mosaic
                mov = [jnp.expand_dims(
                    jax.lax.slice_in_dim(b, c * mch, (c + 1) * mch,
                                         axis=1), 2)
                       for b in (bx, by, bz)]                # (cw,mch,1,rt)
                # own cell: every (i != j) pair twice -> weight 1/2
                selfm = kio == (c * mch + qio)               # (1,mch,k,1)
                accum(mov, own, selfm, 0.5)
                for off in _offsets13():
                    cnd = [jnp.expand_dims(
                        aligned_block(r, a, sbits, off, lvec)
                        .reshape(cw, k, rt), 1)
                           for a, r in enumerate((x_ref, y_ref, z_ref))]
                    accum(mov, cnd, None, 1.0)
            return 0

        jax.lax.fori_loop(0, ncolors, color_step, 0, unroll=False)

    def total(slabs, params, pot3, scale):
        x, y, z = slabs
        rows, rp = x.shape
        rpad = -rp % rt               # dead-lane padding (any R)
        if rpad:
            pc = lambda a, v: jnp.pad(a, ((0, 0), (0, rpad)),
                                      constant_values=v)
            x, y, z = pc(x, INVALID), pc(y, INVALID), pc(z, INVALID)
            params = pc(params, 1.0)
            scale = pc(scale, 1.0)
        rp0, rp = rp, rp + rpad
        ntiles = rp // rt
        lane = lambda bs: pl.BlockSpec((bs, rt), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(ntiles,),
            out_shape=jax.ShapeDtypeStruct((8, rp), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),    # pot3
                lane(8),                                  # params
                lane(1),                                  # scale
                lane(rows), lane(rows), lane(rows),       # slabs
            ],
            out_specs=lane(8),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(pot3, params, scale, x, y, z)
        return out[:, :rp0] if rpad else out

    return total


def combine_sums(sums, eps, scale):
    """(E, W, E_scaled) per replica from make_total_fn's raw pair sums."""
    s12o, s6o, s12s, s6s = sums[0], sums[1], sums[2], sums[3]
    e = eps * (s12o - s6o)
    w = eps * (12.0 * s12o - 6.0 * s6o)
    si = 1.0 / scale
    si6 = si * si * si * si * si * si
    e_scaled = eps * (si6 * si6 * s12s - si6 * s6s)
    return e, w, e_scaled
