#!/usr/bin/env python
"""Numerical case against a bf16 candidate scan (VERDICT r3 weak #2).

The VPU probe (scripts/vpu_probe.py) measures a 1.5-1.6x bf16 issue-rate
headroom (fma_peak_bf16 93 vs fma_peak 141 cyc/row), so the obvious
question is whether the sweep kernel's 27-offset candidate scan can run
in bf16. This quantifies the physics cost on 200k LJ pairs at
acceptance-relevant distances (r in [0.9, 2.5] sigma, box L=16) vs f64:

  v1 coords-in-bf16: round the slab coords themselves. Absolute coord
     error ~L*2^-9 ~ 0.03 sigma; through r^-12 that is beta*|dE| p99
     ~ 2.3 PER PAIR at beta=1.25 — acceptance decisions for any
     near-contact mover are essentially randomized. Physics-fatal.
  v2 f32-subtract-then-bf16: keep c-m exact in f32, do r2 = sum d^2 in
     bf16. beta*|dE| p99 ~ 0.17 per pair; a move's delta-e sums ~300
     new+old pair terms, so acceptance exponents carry O(0.1-0.3)
     noise — a measurable sampling bias (T_m-level), AND only the 5
     r2 ops of the ~30-op pair budget drop to bf16 rate: <= ~10%
     throughput for a biased sampler.

Conclusion (recorded in docs/tpu_notes.md 6.2): the r^-12 stiffness of
the LJ core makes bf16 pair math incompatible with exact Metropolis
acceptance; the bf16 issue-rate headroom is real but unreachable for
this op mix. (The Mosaic toolchain also rejects the packed bf16 pair
kernel outright: vpu_probe's pair_div_bf16 leg fails to compile,
docs/evidence_r4.log 06:30Z.)
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def lj(r2):
    sr2 = 1.0 / r2
    sr6 = sr2 ** 3
    return 4 * (sr6 * sr6 - sr6)


def main():
    rng = np.random.default_rng(0)
    L = 16.0
    n = 200000
    r = rng.uniform(0.9, 2.5, n)
    theta = rng.uniform(0, np.pi, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    d = np.stack([r * np.sin(theta) * np.cos(phi),
                  r * np.sin(theta) * np.sin(phi),
                  r * np.cos(theta)], 1)
    c = rng.uniform(0, L, (n, 3))
    m = c - d
    e_ref = lj(np.sum((c - m) ** 2, 1))

    cb = np.asarray(jnp.asarray(c, jnp.bfloat16), np.float64)
    mb = np.asarray(jnp.asarray(m, jnp.bfloat16), np.float64)
    e1 = lj(np.sum((cb - mb) ** 2, 1))

    d32 = (c - m).astype(np.float32)
    r2b = np.asarray(jnp.sum(jnp.asarray(d32, jnp.bfloat16) ** 2, 1))
    e2 = lj(np.asarray(r2b, np.float64))

    beta = 1.0 / 0.8
    for tag, e in (("v1 coords-bf16", e1), ("v2 d-f32->bf16-r2", e2)):
        de = np.abs(e - e_ref)
        sel = r < 1.3
        print(f"{tag}: |dE| mean {de.mean():.4f}  p99 {np.percentile(de, 99):.3f}  "
              f"near-contact p99 {np.percentile(de[sel], 99):.3f}  "
              f"beta*|dE| p99 {beta * np.percentile(de, 99):.3f}")


if __name__ == "__main__":
    main()
