"""Whole-sweep Pallas TPU kernels for tabulated EAM (Chebyshev form).

EAM's embedding term makes parallel MC harder than pairs: moving atom i
changes rho_j of every neighbor j, so two movers sharing ANY neighbor are
coupled through F(rho_j + drho_j^A + drho_j^B). The cell scheme handles
this exactly with STRIDE-3 colors (ops/pallas/cellmc.py CellGeom): cells
of width w >= rc put same-color movers >= 2w >= 2rc apart, which makes
their neighborhoods DISJOINT — batched Metropolis acceptance is exact,
with one mover per cell per color step (J=1: same-cell movers would
couple, so the pair engine's slot-group vectorization does not apply).

The potential is the Chebyshev form (models/eam_cheb.py): phi and f_rho
are series in u = r^2 (no sqrt, no table gathers — the spline tables'
per-pair coefficient gathers are both catastrophically slow on this stack
and inexpressible in Mosaic), F is a series in q = sqrt(rho). A per-slot
density slab rides with the position slabs: the sweep kernel updates it
incrementally on every acceptance (the mover's own rho plus aligned
write-backs of drho into all 26 neighbor blocks + own cell), and
make_eam_total_fn refreshes it from scratch at records/volume trials,
killing f32 drift.

Replaces the reference's LAMMPS ``pair_style eam/alloy`` hot path
(SURVEY.md §2.1) on the kernel engine; BASELINE config 3's "tabulated
potential -> Pallas spline-interp kernel" is realized as this
Chebyshev-in-VMEM kernel (mathematically the same tables to ~1e-5 eV,
recorded on EAMCheb.fit_err).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuralmelting_tpu.ops.pallas.cellmc import (
    INVALID, RT, CellGeom, _block_utils, _offsets26, _offsets13,
    threefry2x32, _bits_to_u01)

OFF27 = [(0, 0, 0)] + _offsets26()     # own cell first


def _clenshaw(c_ref, n, a, b, x, scoped=True):
    """Chebyshev series from SMEM coefficients on [a, b]; clamps x.

    The recurrence runs as a fori_loop with dynamic scalar reads from
    SMEM — unrolling ~30 terms at every one of the ~8 evaluation sites
    per stencil offset would put O(100k) ops into the kernel body and
    stall the Mosaic compiler. In compiled mode the recurrence state
    lives in VMEM scratch refs (Mosaic rejects loop-carried VALUES
    seeded from splats: "Invalid relayout ... replicated in
    destination"); interpret mode uses plain value carries (run_scoped
    interprets to separately-compiled XLA loops that take minutes to
    build on CPU). Operands are flattened to 2D either way.
    """
    shape = x.shape
    rt = shape[-1]
    xx = jnp.clip(x, a, b).reshape(-1, rt)
    t = (2.0 * xx - (a + b)) / (b - a)
    t2 = 2.0 * t

    if not scoped:
        def body(i, bb):
            b1, b2 = bb
            return (t2 * b1 - b2 + c_ref[n - 1 - i], b1)

        b1, b2 = jax.lax.fori_loop(
            0, n - 1, body, (jnp.zeros_like(t), jnp.zeros_like(t)))
        return (t * b1 - b2 + c_ref[0]).reshape(shape)

    def inner(b1_ref, b2_ref):
        b1_ref[:] = jnp.zeros_like(t)
        b2_ref[:] = jnp.zeros_like(t)

        def body(i, _):
            b1 = b1_ref[:]
            b1_ref[:] = t2 * b1 - b2_ref[:] + c_ref[n - 1 - i]
            b2_ref[:] = b1
            return 0

        jax.lax.fori_loop(0, n - 1, body, 0, unroll=False)
        return t * b1_ref[:] - b2_ref[:] + c_ref[0]

    out = pl.run_scoped(inner, pltpu.VMEM(t.shape, jnp.float32),
                        pltpu.VMEM(t.shape, jnp.float32))
    return out.reshape(shape)


def make_eam_sweep_fn(geom: CellGeom, ncyc: int, nser: tuple,
                      interpret: bool = False, rt: int = RT,
                      goff: int = 9):
    """Build ``sweep(slabs4, count, params, scal, series3, seeds)``.

    slabs4: (x, y, z, rho) each (C*K, Rp); rho is the per-slot density
      cache (exact on entry; updated incrementally, exact on exit).
    scal: (8,) f32 [rc2, u_lo, u_hi, q_lo, q_hi, rho_hi, 0, 0].
    series3: (c_phi, c_rho, c_f) coefficient arrays (static lengths
      ``nser``). params/seeds/stats as in the LJ sweep kernel.

    ``goff``: stencil offsets per batched Chebyshev evaluation. The
    Clenshaw recurrence is a sequential fori_loop (latency/overhead-
    bound at cell-block sizes), so the kernel concatenates ``goff``
    offsets' operands and runs ONE recurrence per series per group —
    ceil(27/goff)*(2 pair-series + 1 embedding) + 1 mover instances per
    color step instead of 27*3 + 1. Elementwise recurrences on a
    concatenation are bitwise identical to per-offset calls; only VMEM
    liveness (~2*goff*cw*K*rt floats per concat) bounds the group size.
    """
    assert geom.stride == 3, "EAM requires stride-3 colors (2w >= 2rc)"
    assert geom.nsub == 1, "EAM: one mover per cell (same-cell coupling)"
    k = geom.kcap
    cw = geom.cw
    ncolors = geom.ncolors
    stride = geom.stride
    blk = cw * k
    np_, nr_, nf_ = nser
    (row_iota, roll0, aligned_block, align_value,
     neighbor_color) = _block_utils(geom, rt)

    def kernel(seed_ref, scal_ref, cphi_ref, crho_ref, cf_ref,
               params_ref, count_ref, x_ref, y_ref, z_ref, rho_ref,
               ox_ref, oy_ref, oz_ref, orho_ref, st_ref):
        tile = pl.program_id(0)
        k0 = seed_ref[tile, 0]
        k1 = seed_ref[tile, 1]
        rc2 = scal_ref[0]
        u_lo, u_hi = scal_ref[1], scal_ref[2]
        q_lo, q_hi = scal_ref[3], scal_ref[4]
        rho_hi = scal_ref[5]
        beta = params_ref[0:1]
        dpos = params_ref[1:2]
        wvec = [params_ref[2 + a:3 + a] for a in range(3)]
        lvec = [params_ref[5 + a:6 + a] for a in range(3)]

        ox_ref[:] = x_ref[:]
        oy_ref[:] = y_ref[:]
        oz_ref[:] = z_ref[:]
        orho_ref[:] = rho_ref[:]
        st_ref[:] = jnp.zeros_like(st_ref)

        def uniform(shape, ctr):
            flat = row_iota(shape, 0) * shape[1] + row_iota(shape, 1)
            b0, _ = threefry2x32(k0, k1, jnp.full(shape, ctr, jnp.int32),
                                 flat)
            return _bits_to_u01(b0)

        sc = not interpret
        phi = lambda u: _clenshaw(cphi_ref, np_, u_lo, u_hi, u, sc)
        frho = lambda u: _clenshaw(crho_ref, nr_, u_lo, u_hi, u, sc)

        def femb(rho):
            q = jnp.sqrt(jnp.clip(rho, 0.0, rho_hi))
            return _clenshaw(cf_ref, nf_, q_lo, q_hi, q, sc)

        def color_step(step):
            color = jax.lax.rem(step, ncolors)
            sbits = (color // (stride * stride),
                     (color // stride) % stride, color % stride)
            base = color * blk
            ctr = step * 8

            u_pick = uniform((cw, rt), ctr + 0)
            u_dx = uniform((cw, rt), ctr + 1)
            u_dy = uniform((cw, rt), ctr + 2)
            u_dz = uniform((cw, rt), ctr + 3)
            u_acc = uniform((cw, rt), ctr + 4)

            cnt = count_ref[pl.ds(color * cw, cw)]           # (cw, rt)
            valid = cnt > 0
            pick = jnp.minimum((u_pick * cnt.astype(jnp.float32))
                               .astype(jnp.int32),
                               jnp.maximum(cnt - 1, 0))      # (cw, rt)
            disp = [dpos * (2.0 * u - 1.0) for u in (u_dx, u_dy, u_dz)]

            bx = ox_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            by = oy_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            bz = oz_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            brho = orho_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            kio = row_iota((cw, k, rt), 1)
            onehot = kio == pick[:, None, :]                 # (cw, k, rt)

            def extract(b):
                return jnp.sum(jnp.where(onehot, b, 0.0), axis=1)

            m = [extract(bx), extract(by), extract(bz)]      # (cw, rt)
            rho_m = extract(brho)
            mn = [m[a] + disp[a] for a in range(3)]

            de_pair = jnp.zeros((cw, rt), jnp.float32)
            de_emb = jnp.zeros((cw, rt), jnp.float32)
            drho_m = jnp.zeros((cw, rt), jnp.float32)
            drho_blocks = []          # per offset: (cw, k, rt)
            rho_blocks = []           # per offset: (cw, k, rt)
            mask_on = []              # per offset: (mo, mn_)

            def u_of(cnd, p):
                d0 = cnd[0] - p[0][:, None, :]
                d1 = cnd[1] - p[1][:, None, :]
                d2 = cnd[2] - p[2][:, None, :]
                return d0 * d0 + d1 * d1 + d2 * d2

            # phase A+B: per GROUP of goff offsets, compute candidate
            # r^2 forms, then ONE frho and ONE phi recurrence over the
            # whole group ([old_0..old_g; new_0..new_g] stacked —
            # elementwise, so bitwise equal to per-offset evaluation)
            for g0 in range(0, len(OFF27), goff):
                grp = OFF27[g0:g0 + goff]
                uos, uns = [], []
                for off in grp:
                    own = off == (0, 0, 0)
                    if own:
                        cnd = [bx, by, bz]
                        rho_c = brho
                    else:
                        cnd = [aligned_block(r, a, sbits, off, lvec)
                               .reshape(cw, k, rt)
                               for a, r in enumerate((ox_ref, oy_ref,
                                                      oz_ref))]
                        rho_c = aligned_block(orho_ref, None, sbits, off,
                                              lvec).reshape(cw, k, rt)
                    candv = cnd[0] < 0.1 * INVALID
                    if own:
                        candv = candv & ~onehot  # exclude mover itself
                    uo = u_of(cnd, m)
                    un = u_of(cnd, mn)
                    mask_on.append((candv & (uo < rc2), candv & (un < rc2)))
                    rho_blocks.append(rho_c)
                    uos.append(uo)
                    uns.append(un)
                ng = len(grp)
                u_cat = jnp.concatenate(uos + uns, axis=0)
                f_cat = frho(u_cat)
                p_cat = phi(u_cat)
                for i in range(ng):
                    mo, mn_ = mask_on[g0 + i]
                    fo = jnp.where(mo, f_cat[i * cw:(i + 1) * cw], 0.0)
                    fn = jnp.where(
                        mn_, f_cat[(ng + i) * cw:(ng + i + 1) * cw], 0.0)
                    de_pair = de_pair + jnp.sum(
                        jnp.where(mn_,
                                  p_cat[(ng + i) * cw:(ng + i + 1) * cw],
                                  0.0)
                        - jnp.where(mo, p_cat[i * cw:(i + 1) * cw], 0.0),
                        axis=1)
                    drho_c = fn - fo                          # (cw, k, rt)
                    drho_blocks.append(drho_c)
                    drho_m = drho_m + jnp.sum(drho_c, axis=1)

            # phase C: embedding differences, one femb recurrence per
            # group over [rho+drho_0..; rho_0..] stacked
            for g0 in range(0, len(OFF27), goff):
                ng = len(OFF27[g0:g0 + goff])
                r_cat = jnp.concatenate(
                    [rho_blocks[g0 + i] + drho_blocks[g0 + i]
                     for i in range(ng)]
                    + [rho_blocks[g0 + i] for i in range(ng)], axis=0)
                f_rr = femb(r_cat)
                for i in range(ng):
                    de_emb = de_emb + jnp.sum(
                        f_rr[i * cw:(i + 1) * cw]
                        - f_rr[(ng + i) * cw:(ng + i + 1) * cw], axis=1)

            f_mm = femb(jnp.concatenate([rho_m + drho_m, rho_m],
                                         axis=0))
            de = de_pair + de_emb + f_mm[:cw] - f_mm[cw:]     # (cw, rt)

            crow = row_iota((cw, 1), 0)
            strides_w = (geom.half[1] * geom.half[2], geom.half[2], 1)
            incell = jnp.ones((cw, rt), jnp.bool_)
            for a in range(3):
                va = (crow // strides_w[a]) % geom.half[a]
                cfull = (stride * va + sbits[a]).astype(jnp.float32)
                lo_a = cfull * wvec[a]
                incell &= (mn[a] >= lo_a) & (mn[a] < lo_a + wvec[a])
            ln_u = jnp.log(u_acc)
            acc = valid & incell & (ln_u < -beta * de)        # (cw, rt)
            acc3 = acc[:, None, :]

            # --- apply: positions + densities ------------------------
            updp = [jnp.where(onehot & acc3, disp[a][:, None, :], 0.0)
                    for a in range(3)]
            ox_ref[pl.ds(base, blk)] = (bx + updp[0]).reshape(blk, rt)
            oy_ref[pl.ds(base, blk)] = (by + updp[1]).reshape(blk, rt)
            oz_ref[pl.ds(base, blk)] = (bz + updp[2]).reshape(blk, rt)

            # own block: mover's own rho plus own-cell neighbors' drho
            own_drho = jnp.where(acc3, drho_blocks[0], 0.0)
            own_drho = own_drho + jnp.where(
                onehot & acc3, drho_m[:, None, :], 0.0)
            orho_ref[pl.ds(base, blk)] = (brho + own_drho).reshape(blk, rt)

            # neighbor blocks: push drho back in THEIR row order
            for i, off in enumerate(OFF27[1:]):
                cprime = neighbor_color(sbits, off)
                dr = jnp.where(acc3, drho_blocks[1 + i], 0.0)
                dr = align_value(dr.reshape(blk, rt), None, sbits, off,
                                 lvec, reverse=True)
                tgt = pl.ds(cprime * blk, blk)
                orho_ref[tgt] = orho_ref[tgt] + dr

            accf = acc.astype(jnp.float32)
            st_ref[0:1] = st_ref[0:1] + jnp.sum(
                jnp.where(acc, de, 0.0), axis=0, keepdims=True)
            st_ref[1:2] = st_ref[1:2] + jnp.sum(accf, axis=0,
                                                keepdims=True)
            st_ref[2:3] = st_ref[2:3] + jnp.sum(
                valid.astype(jnp.float32), axis=0, keepdims=True)

        def step_body(s, _):
            color_step(s)
            return 0

        jax.lax.fori_loop(0, ncyc * ncolors, step_body, 0, unroll=False)

    def sweep(slabs4, count, params, scal, series3, seeds):
        x, y, z, rho = slabs4
        rows, rp = x.shape
        rpad = -rp % rt               # dead-lane padding (any R)
        if rpad:
            pc = lambda a, v: jnp.pad(a, ((0, 0), (0, rpad)),
                                      constant_values=v)
            x, y, z = pc(x, INVALID), pc(y, INVALID), pc(z, INVALID)
            rho, count, params = pc(rho, 0.0), pc(count, 0), pc(params, 1.0)
        rp0, rp = rp, rp + rpad
        ntiles = rp // rt
        lane = lambda bs: pl.BlockSpec((bs, rt), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        out = pl.pallas_call(
            kernel,
            grid=(ntiles,),
            out_shape=(jax.ShapeDtypeStruct((rows, rp), jnp.float32),) * 4
            + (jax.ShapeDtypeStruct((8, rp), jnp.float32),),
            in_specs=[smem, smem, smem, smem, smem,
                      lane(8), lane(geom.ncells),
                      lane(rows), lane(rows), lane(rows), lane(rows)],
            out_specs=(lane(rows),) * 4 + (lane(8),),
            input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(seeds, scal, series3[0], series3[1], series3[2],
          params, count, x, y, z, rho)
        if rpad:
            return tuple(a[:, :rp0] for a in out[:4]), out[4][:, :rp0]
        return out[:4], out[4]

    return sweep


def make_eam_total_fn(geom: CellGeom, nser: tuple, with_virial: bool,
                      interpret: bool = False, rt: int = RT):
    """Build ``total(slabs3, params, scal, series, scale) ->
    (stats (8, Rp), rho_slab (C*K, Rp))`` at isotropic rescale ``scale``:

      stats rows: [E, W, E_pair, E_emb, 0...]   (W = 0 unless with_virial)
      rho_slab:   densities of the SCALED configuration (drift-free
                  refresh at s=1; new cache when a volume trial accepts).

    EAM has no homogeneous-scaling shortcut (unlike LJ), so a volume
    trial is one extra full pass at the proposed scale. series =
    (c_phi, c_phid, c_rho, c_rhod, c_f, c_fd); derivative series are only
    read when with_virial (records), not for volume trials.
    """
    assert geom.stride == 3
    k = geom.kcap
    assert k % 8 == 0, (              # make_geom guarantees this
        f"kcap={k} must be a multiple of 8: the chunked mover loop "
        "would silently drop pairs from the totals")
    cw = geom.cw
    ncolors = geom.ncolors
    stride = geom.stride
    blk = cw * k
    np_, nr_, nf_ = nser
    (row_iota, roll0, aligned_block, align_value,
     neighbor_color) = _block_utils(geom, rt)

    def kernel(scal_ref, cphi_ref, cphid_ref, crho_ref, crhod_ref,
               cf_ref, cfd_ref, params_ref, scale_ref,
               x_ref, y_ref, z_ref, st_ref, rho_ref, fp_ref):
        rc2 = scal_ref[0]
        u_lo, u_hi = scal_ref[1], scal_ref[2]
        q_lo, q_hi = scal_ref[3], scal_ref[4]
        rho_hi = scal_ref[5]
        lvec = [params_ref[5 + a:6 + a] for a in range(3)]
        s = scale_ref[0:1]
        s2 = s * s                  # u = (r*s)^2: mask u < rc2 is exact
        st_ref[:] = jnp.zeros_like(st_ref)

        sc = not interpret
        phi = lambda u: _clenshaw(cphi_ref, np_, u_lo, u_hi, u, sc)
        phid = lambda u: _clenshaw(cphid_ref, np_, u_lo, u_hi, u, sc)
        frho = lambda u: _clenshaw(crho_ref, nr_, u_lo, u_hi, u, sc)
        frhod = lambda u: _clenshaw(crhod_ref, nr_, u_lo, u_hi, u, sc)

        def femb(rho):
            q = jnp.sqrt(jnp.clip(rho, 0.0, rho_hi))
            return _clenshaw(cf_ref, nf_, q_lo, q_hi, q, sc)

        def fembd(rho):
            """dF/drho = (dF/dq) / (2 q)."""
            q = jnp.sqrt(jnp.clip(rho, 1e-12, rho_hi))
            return _clenshaw(cfd_ref, nf_, q_lo, q_hi, q, sc) / (2.0 * q)

        kio2 = row_iota((cw, k, 1, 1), 1)
        kio3 = row_iota((cw, 1, k, 1), 2)

        # ---- phase 1: densities + pair energy/virial ----------------
        # mover slots processed in chunks of mch: full K x K blocks
        # neither fit VMEM nor pass Mosaic relayout at narrow lane tiles;
        # wider chunks mean fewer latency-bound Clenshaw instances
        mch = 16 if k % 16 == 0 else 8
        kio_c = row_iota((cw, mch, 1, 1), 1)
        kio_k = row_iota((cw, 1, k, 1), 2)

        def color_step1(color, _):
            sbits = (color // (stride * stride),
                     (color // stride) % stride, color % stride)
            base = color * blk
            bx = x_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            by = y_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            bz = z_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            selfv = bx < 0.1 * INVALID                       # (cw, k, rt)
            e_pair = jnp.zeros((1, rt), jnp.float32)
            w_pair = jnp.zeros((1, rt), jnp.float32)
            rho_chunks = []

            for c in range(k // mch):
                sl = lambda b: jnp.expand_dims(
                    jax.lax.slice_in_dim(b, c * mch, (c + 1) * mch,
                                         axis=1), 2)         # (cw,mch,1,rt)
                mx, my, mz = sl(bx), sl(by), sl(bz)
                mv = mx < 0.1 * INVALID
                rho_acc = jnp.zeros((cw, mch, rt), jnp.float32)
                for off in OFF27:
                    own = off == (0, 0, 0)
                    if own:
                        cnd = [jnp.expand_dims(b, 1)
                               for b in (bx, by, bz)]        # (cw,1,k,rt)
                    else:
                        cnd = [jnp.expand_dims(
                            aligned_block(r, a, sbits, off, lvec)
                            .reshape(cw, k, rt), 1)
                            for a, r in enumerate((x_ref, y_ref, z_ref))]
                    candv = cnd[0] < 0.1 * INVALID
                    d0 = cnd[0] - mx
                    d1 = cnd[1] - my
                    d2 = cnd[2] - mz
                    u = (d0 * d0 + d1 * d1 + d2 * d2) * s2
                    ok = candv & mv & (u < rc2)
                    if own:
                        ok = ok & (kio_k != (c * mch + kio_c))
                    rho_acc = rho_acc + jnp.sum(
                        jnp.where(ok, frho(u), 0.0), axis=2)
                    e_pair = e_pair + 0.5 * jnp.sum(
                        jnp.where(ok, phi(u), 0.0),
                        axis=(0, 1, 2))[None, :]
                    if with_virial:
                        w_pair = w_pair + 0.5 * jnp.sum(
                            jnp.where(ok, 2.0 * u * phid(u), 0.0),
                            axis=(0, 1, 2))[None, :]
                rho_chunks.append(rho_acc)

            rho_full = jnp.concatenate(rho_chunks, axis=1)   # (cw, k, rt)
            rho_ref[pl.ds(base, blk)] = rho_full.reshape(blk, rt)
            if with_virial:
                fp_ref[pl.ds(base, blk)] = jnp.where(
                    selfv, fembd(rho_full), 0.0).reshape(blk, rt)
            st_ref[2:3] = st_ref[2:3] + e_pair
            st_ref[5:6] = st_ref[5:6] + w_pair
            return 0

        jax.lax.fori_loop(0, ncolors, color_step1, 0, unroll=False)

        # ---- phase 2: embedding energy (+ embedding virial) ---------
        def color_step2(color, _):
            sbits = (color // (stride * stride),
                     (color // stride) % stride, color % stride)
            base = color * blk
            rho_b = rho_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            bx = x_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            selfv = bx < 0.1 * INVALID
            e_emb = jnp.sum(jnp.where(selfv, femb(rho_b), 0.0),
                            axis=(0, 1))[None, :]
            st_ref[3:4] = st_ref[3:4] + e_emb
            if not with_virial:
                return 0
            by = y_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            bz = z_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            fp_b = fp_ref[pl.ds(base, blk)].reshape(cw, k, rt)
            w_emb = jnp.zeros((1, rt), jnp.float32)
            for c in range(k // mch):
                sl = lambda b: jnp.expand_dims(
                    jax.lax.slice_in_dim(b, c * mch, (c + 1) * mch,
                                         axis=1), 2)
                mx, my, mz = sl(bx), sl(by), sl(bz)
                fpm = sl(fp_b)
                mv = mx < 0.1 * INVALID
                for off in OFF27:
                    own = off == (0, 0, 0)
                    if own:
                        cnd = [jnp.expand_dims(b, 1)
                               for b in (bx, by, bz)]
                        fp_c = jnp.expand_dims(fp_b, 1)
                    else:
                        cnd = [jnp.expand_dims(
                            aligned_block(r, a, sbits, off, lvec)
                            .reshape(cw, k, rt), 1)
                            for a, r in enumerate((x_ref, y_ref, z_ref))]
                        fp_c = jnp.expand_dims(
                            aligned_block(fp_ref, None, sbits, off,
                                          lvec).reshape(cw, k, rt), 1)
                    candv = cnd[0] < 0.1 * INVALID
                    d0 = cnd[0] - mx
                    d1 = cnd[1] - my
                    d2 = cnd[2] - mz
                    u = (d0 * d0 + d1 * d1 + d2 * d2) * s2
                    ok = candv & mv & (u < rc2)
                    if own:
                        ok = ok & (kio_k != (c * mch + kio_c))
                    # each unordered pair once: 2 * 0.5 * (F'_i + F'_j)
                    coef = fpm + fp_c
                    w_emb = w_emb + 0.5 * jnp.sum(
                        jnp.where(ok, coef * 2.0 * u * frhod(u), 0.0),
                        axis=(0, 1, 2))[None, :]
            st_ref[6:7] = st_ref[6:7] + w_emb
            return 0

        jax.lax.fori_loop(0, ncolors, color_step2, 0, unroll=False)
        st_ref[0:1] = st_ref[2:3] + st_ref[3:4]          # E
        # rows 5/6 accumulate +dE/dlns = +sum r dU/dr; the repo virial
        # convention is W = sum r*f = -sum r dU/dr (ops/eam_energy.py:62,
        # matching the LJ engines' combine_sums) — negate here.
        st_ref[1:2] = -(st_ref[5:6] + st_ref[6:7])       # W

    def total(slabs3, params, scal, series, scale):
        x, y, z = slabs3
        rows, rp = x.shape
        rpad = -rp % rt               # dead-lane padding (any R)
        if rpad:
            pc = lambda a, v: jnp.pad(a, ((0, 0), (0, rpad)),
                                      constant_values=v)
            x, y, z = pc(x, INVALID), pc(y, INVALID), pc(z, INVALID)
            params, scale = pc(params, 1.0), pc(scale, 1.0)
        rp0, rp = rp, rp + rpad
        ntiles = rp // rt
        lane = lambda bs: pl.BlockSpec((bs, rt), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        st, rho, _fp = pl.pallas_call(
            kernel,
            grid=(ntiles,),
            out_shape=(jax.ShapeDtypeStruct((8, rp), jnp.float32),
                       jax.ShapeDtypeStruct((rows, rp), jnp.float32),
                       jax.ShapeDtypeStruct((rows, rp), jnp.float32)),
            in_specs=[smem] * 7 + [lane(8), lane(1),
                                   lane(rows), lane(rows), lane(rows)],
            out_specs=(lane(8), lane(rows), lane(rows)),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(scal, series[0], series[1], series[2], series[3], series[4],
          series[5], params, scale, x, y, z)
        if rpad:
            return st[:, :rp0], rho[:, :rp0]
        return st, rho

    return total
