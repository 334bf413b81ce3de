#!/usr/bin/env python
"""Standalone sweep-kernel timing at the bench geometry (fast iteration:
the full bench pays a ~20 min XLA compile; this compiles just the kernel,
~2 min). Usage: python scripts/kbench.py [kcap ...]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops.pallas import cellmc as CM
from neuralmelting_tpu.sampler import cellmc as SC
from neuralmelting_tpu.sampler.state import ensemble_init

NCYC = 5
R = 128


def bench_kcap(spec: str):
    # "K", "K:J", or "K:J:r" (r = fast_recip epilogue)
    kcap, _, rest = spec.partition(":")
    nsub, _, flag = rest.partition(":")
    kcap, nsub = int(kcap), int(nsub or 8)
    fast_recip = flag == "r"
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 2.0 ** (2 / 3), (16, 8, 8))  # 4096
    geom = CM.make_geom(box, pot.rc_host, len(pos), nsub=nsub, kcap=kcap)
    states = ensemble_init(pot, jnp.asarray(pos), jnp.asarray(box), 3,
                           jnp.linspace(0.7, 1.3, R).astype(jnp.float32),
                           jnp.full((R,), 4.0, jnp.float32),
                           dpos0=0.11, dvol_frac0=0.002, dt0=0.005)
    shift = jnp.zeros((3,), jnp.float32)
    (x, y, z, ids), count, over = SC.build_slabs(geom, states, shift)
    assert not bool(over), f"kcap={kcap}: initial binning overflow"
    print(f"kcap={geom.kcap} ncell={geom.ncell} "
          f"count max={int(jnp.max(count))} mean={float(jnp.mean(count)):.1f}")

    nxf, nyf, nzf = (float(n) for n in geom.ncell)
    wvec = jnp.stack([states.box[:, 0] / nxf, states.box[:, 1] / nyf,
                      states.box[:, 2] / nzf], axis=1)
    params = jnp.stack([
        1.0 / states.temp, jnp.full((R,), 0.11, jnp.float32),
        wvec[:, 0], wvec[:, 1], wvec[:, 2],
        states.box[:, 0], states.box[:, 1], states.box[:, 2]])
    pot3 = jnp.stack([pot.eps, pot.sigma, pot.rc, jnp.zeros_like(pot.eps)])

    sweep = jax.jit(CM.make_sweep_fn(geom, ncyc=NCYC, interpret=False,
                                     rt=R, fast_recip=fast_recip))
    t0 = time.perf_counter()
    slabs = (x.T, y.T, z.T)
    seeds = jnp.asarray([[3, 9]], jnp.int32)
    slabs, st = sweep(slabs, count.T, params, pot3, seeds)
    _ = float(jnp.sum(st))
    t_compile = time.perf_counter() - t0

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        seeds = jnp.asarray([[3 + i, 9]], jnp.int32)
        slabs, st = sweep(slabs, count.T, params, pot3, seeds)
    _ = float(jnp.sum(st))
    dt = (time.perf_counter() - t0) / iters
    trials = float(jnp.sum(st[2]))
    rate = trials / dt
    per_color = dt / (NCYC * 8) * 1e6
    print(f"kcap={geom.kcap}: {dt*1e3:.2f} ms/call ({per_color:.0f} us/"
          f"color step), {trials:.0f} trials/call, {rate/1e6:.2f} M "
          f"attempts/s at R={R} (compile {t_compile:.0f}s)")
    return rate


def main():
    kcaps = sys.argv[1:] or ["48", "40"]
    rates = {k: bench_kcap(k) for k in kcaps}
    base = rates[kcaps[0]]
    for k, v in rates.items():
        print(f"{k}: {v / base:.3f}x vs {kcaps[0]}")


if __name__ == "__main__":
    main()
