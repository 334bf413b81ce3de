#!/usr/bin/env python
"""Measure the VPU ceiling for the LJ pair-eval op mix on the real chip.

The sweep kernel's epilogue evaluates ~26 offsets x K candidates x 2
configs of: diff(3) -> r2(5) -> sr2 = sig2/r2 -> sr6 -> e -> mask ->
accumulate. This probe times synthetic Pallas kernels that run exactly
that op mix over the same-shaped VMEM arrays, in variants, to find where
cycles go (docs/tpu_notes.md section 5 follow-up):

  div      — baseline: sig2 / r2 (what the kernel ships)
  recip    — pl.reciprocal(r2, approx=True) * sig2 + 1 Newton step
  recip0   — raw approx reciprocal, no Newton (accuracy floor ~2^-12)
  rsqrt    — lax.rsqrt path (sr2 from rsqrt(r2)^2) for comparison
  nodiv    — (σ²)³/(r²)³ via repeated multiply of reciprocal-free form:
             evaluates e from u = r2 with Horner-in-1/u eliminated; here
             we model cost with a 6th-power of (sig2 * rcp_est) where
             rcp_est comes from one multiply (NOT numerically valid —
             cost probe only)

Each kernel does REPS sequential passes over a (ROWS, 128) f32 block and
accumulates, so the measurement is issue-bound, not memory-bound.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

ROWS, LANES, REPS = 2048, 128, 64


def make_kernel(variant: str):
    # *_bf16 variants run the identical op mix on bfloat16 operands:
    # measures whether the VPU issues packed-16-bit arithmetic faster
    # than f32 on this chip (VERDICT r3 weak #2: "try one packed/bf16
    # candidate-scan variant"). Accuracy is irrelevant — cost probe.
    dt = jnp.bfloat16 if variant.endswith("_bf16") else jnp.float32

    def kernel(a_ref, b_ref, o_ref):
        sig2 = dt(1.0)
        rc2 = dt(6.25)

        def body(i, acc):
            # fresh "candidate minus mover" diffs (3 sub, 3 mul, 2 add).
            # The i-dependent factor (CSE defeat) is computed in f32 and
            # cast ONCE: Mosaic cannot lower scalar bf16 arith.mulf
            # (r4 on-chip crash), and the op under test is the VECTOR mul
            scale = (jnp.float32(1.0)
                     + jnp.float32(1e-6) * i.astype(jnp.float32)).astype(dt)
            d0 = a_ref[:] - b_ref[:] * scale
            d1 = a_ref[:] * dt(0.5) - b_ref[:]
            d2 = a_ref[:] - dt(0.5) * b_ref[:]
            r2 = d0 * d0 + d1 * d1 + d2 * d2
            if variant.startswith("fma_peak"):
                # issue-rate ceiling: same op COUNT as nothing — a pure
                # fma chain of the same length as one r2 eval (6 ops)
                return acc + r2
            if variant.startswith("pair_"):
                # the REAL sweep epilogue: TWO configs per pair (old +
                # displaced mover), fused e(new)-e(old). Mirrors
                # ops/pallas/cellmc.py ediff()/r2of() exactly
                # (q = sig2/(r2n*r2o) — post r4 sigma fix).
                dd = dt(0.01) * b_ref[:]
                if variant == "pair_incr":
                    # r2_new from r2_old incrementally: the mover's
                    # displacement D is shared by all K candidates, so
                    # r2n = r2o - d.(2D) + |D|^2 (5 ops vs 8 fresh)
                    dot = d0 * dd + d1 * dd + d2 * dd
                    r2n = r2 - (dot + dot) + dt(3.0) * (dd * dd)
                else:
                    e0 = d0 - dd
                    e1 = d1 - dd
                    e2 = d2 - dd
                    r2n = e0 * e0 + e1 * e1 + e2 * e2
                if variant == "pair_recip":
                    y = pl.reciprocal(r2n * r2, approx=True)
                    q = sig2 * y
                else:
                    q = sig2 / (r2n * r2)
                s2n = q * r2
                s2o = q * r2n
                s6n = s2n * s2n * s2n
                s6o = s2o * s2o * s2o
                en = jnp.where(r2n < rc2, s6n * s6n - s6n, dt(0.0))
                eo = jnp.where(r2 < rc2, s6o * s6o - s6o, dt(0.0))
                return acc + (en - eo)
            if variant == "div":
                sr2 = sig2 / r2
            elif variant == "recip":
                y = pl.reciprocal(r2, approx=True)
                y = y * (2.0 - r2 * y)          # 1 Newton: ~24-bit
                sr2 = sig2 * y
            elif variant == "recip0":
                sr2 = sig2 * pl.reciprocal(r2, approx=True)
            elif variant == "rsqrt":
                y = jax.lax.rsqrt(r2)
                sr2 = sig2 * y * y
            elif variant == "nodiv":
                sr2 = sig2 * (2.0 - r2)         # cost model only
            else:
                raise ValueError(variant)
            sr6 = sr2 * sr2 * sr2
            e = jnp.where(r2 < rc2, sr6 * sr6 - sr6, 0.0)
            return acc + e

        acc = jax.lax.fori_loop(0, REPS, body,
                                jnp.zeros((ROWS, LANES), dt))
        o_ref[:] = acc.astype(jnp.float32)

    return kernel


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    a = jnp.asarray(np.random.RandomState(0).uniform(
        1.0, 2.0, (ROWS, LANES)).astype(np.float32))
    b = jnp.asarray(np.random.RandomState(1).uniform(
        1.0, 2.0, (ROWS, LANES)).astype(np.float32))

    results = {}
    # pair_div = as-shipped epilogue (fresh r2 + one divide) and is the
    # baseline the incr/recip variants are judged against; the _bf16
    # twins measure the packed-16-bit issue-rate question
    for variant in ("div", "recip", "recip0", "rsqrt", "nodiv", "fma_peak",
                    "pair_div", "pair_incr", "pair_recip",
                    "fma_peak_bf16", "pair_div_bf16"):
        indt = (jnp.bfloat16 if variant.endswith("_bf16")
                else jnp.float32)
        av, bv = a.astype(indt), b.astype(indt)
        fn = pl.pallas_call(
            make_kernel(variant),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=jax.default_backend() != "tpu",
        )
        jfn = jax.jit(fn)
        try:
            out = jfn(av, bv)
            _ = float(jnp.sum(out))    # readback: honest timing mode
        except Exception as e:         # a variant the lowering rejects
            print(f"{variant:7s} FAILED: {str(e).splitlines()[0][:120]}")
            continue                   # must not cost the other variants
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = jfn(av, bv)
        _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / iters
        pairs = ROWS * LANES * REPS
        ns = dt / pairs * 1e9
        # cycles per pair-ROW (8x128 vector): dt * clock / (ROWS/8 * REPS)
        cycles_row = dt * 0.94e9 / ((ROWS / 8) * REPS)
        results[variant] = (dt * 1e3, ns, cycles_row)
        print(f"{variant:7s} {dt*1e3:7.3f} ms/call  {ns:6.3f} ns/pair  "
              f"{cycles_row:6.2f} cyc/(8x128 row)")
    base = results["div"][0]
    for k, v in results.items():
        print(f"{k:7s} speedup vs div: {base / v[0]:.3f}x")


if __name__ == "__main__":
    main()
