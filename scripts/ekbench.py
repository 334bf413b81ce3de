#!/usr/bin/env python
"""Standalone EAM sweep/total kernel timing (the eambench counterpart of
scripts/kbench.py): compiles just the kernels, not the full sampler, for
fast iteration on the chip.

Usage: python scripts/ekbench.py [--rc=3.8] [--goff=1,9] [NXxNYxNZ[:kcap]] ...
  default: the committed eambench protocol (16x8x8 supercell = 4096
  atoms, setfl written at rc=3.8 -> stride-3 cells (15,6,6), kcap 16)
  with a goff sweep — goff=1 reproduces the per-offset Clenshaw
  schedule, goff>1 batches that many stencil offsets per recurrence.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from neuralmelting_tpu.config import ELEMENTS
from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models import eam as E, eam_cheb as EC
from neuralmelting_tpu.models.eam_gen import write_setfl
from neuralmelting_tpu.ops.pallas import cellmc as CM
from neuralmelting_tpu.ops.pallas import cellmc_eam as CE
from neuralmelting_tpu.sampler import cellmc as SC
from neuralmelting_tpu.sampler.state import ensemble_init

NCYC = 5
R = 128
SETFL = "/tmp/nm_ekbench_Al.eam.alloy"


def bench_spec(spec: str, cheb, goff: int):
    shape, _, kc = spec.partition(":")
    ncells = tuple(int(v) for v in shape.split("x"))
    el = ELEMENTS["AL"]
    pos, box = make_supercell(el.lattice, el.lat_const, ncells)
    n = len(pos)
    geom = CM.make_geom(box, cheb.rc_host, n, nsub=1, stride=3,
                        kcap=int(kc) if kc else 0)
    states = ensemble_init(
        cheb, jnp.asarray(pos), jnp.asarray(box), 3,
        jnp.linspace(800.0, 1400.0, R).astype(jnp.float32),
        jnp.full((R,), 1.0, jnp.float32),
        dpos0=0.15, dvol_frac0=0.002, dt0=el.dt,
        energy_fn=lambda p, x, b: (jnp.float32(0.0), jnp.float32(0.0)))
    shift = jnp.zeros((3,), jnp.float32)
    (x, y, z, ids), count, over = SC.build_slabs(geom, states, shift)
    maxc = int(jnp.max(count))
    tight = CM.tight_kcap(maxc, nsub=1)
    if not kc and tight < geom.kcap:
        geom = CM.CellGeom(ncell=geom.ncell, kcap=tight, nsub=1,
                           natoms=n, stride=3)
        (x, y, z, ids), count, over = SC.build_slabs(geom, states, shift)
    assert not bool(over), f"{spec}: initial binning overflow"
    scal, series, nser = SC.eam_pack(cheb)
    states, rho = SC.eam_initial_rho(geom, states, (x, y, z, ids), scal,
                                     series, nser, rt=R)
    print(f"{spec} goff={goff}: natoms={n} ncell={geom.ncell} "
          f"kcap={geom.kcap} cw={geom.cw} count max={maxc} "
          f"slots/attempt={27 * geom.kcap}", flush=True)

    nxf, nyf, nzf = (float(v) for v in geom.ncell)
    wvec = jnp.stack([states.box[:, 0] / nxf, states.box[:, 1] / nyf,
                      states.box[:, 2] / nzf], axis=1)
    params = jnp.stack([
        1.0 / (8.617333262e-5 * states.temp),    # beta rows: kb metal
        jnp.full((R,), 0.15, jnp.float32),
        wvec[:, 0], wvec[:, 1], wvec[:, 2],
        states.box[:, 0], states.box[:, 1], states.box[:, 2]])

    sweep = jax.jit(CE.make_eam_sweep_fn(geom, ncyc=NCYC, nser=nser,
                                         interpret=False, rt=R, goff=goff))
    ser3 = (series[0], series[2], series[4])
    slabs4 = (x.T, y.T, z.T, rho.T)
    t0 = time.perf_counter()
    seeds = jnp.asarray([[3, 9]], jnp.int32)
    slabs4, st = sweep(slabs4, count.T, params, scal, ser3, seeds)
    _ = float(jnp.sum(st))
    t_compile = time.perf_counter() - t0

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        seeds = jnp.asarray([[3 + i, 9]], jnp.int32)
        slabs4, st = sweep(slabs4, count.T, params, scal, ser3, seeds)
    _ = float(jnp.sum(st))
    dt = (time.perf_counter() - t0) / iters
    trials = float(jnp.sum(st[2]))
    rate = trials / dt
    per_color = dt / (NCYC * 27) * 1e6
    print(f"{spec} goff={goff}: sweep {dt * 1e3:.2f} ms/call "
          f"({per_color:.0f} us/color step), {trials:.0f} trials/call, "
          f"{rate / 1e6:.2f} M attempts/s at R={R} "
          f"(compile {t_compile:.0f}s)", flush=True)

    # total kernel (volume-trial variant, no virial)
    total = jax.jit(CE.make_eam_total_fn(geom, nser, with_virial=False,
                                         interpret=False, rt=R))
    ones = jnp.ones((1, R), jnp.float32)
    t0 = time.perf_counter()
    stt, rho2 = total((slabs4[0], slabs4[1], slabs4[2]), params, scal,
                      series, ones)
    _ = float(jnp.sum(stt))
    tc2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _i in range(iters):
        stt, rho2 = total((slabs4[0], slabs4[1], slabs4[2]), params, scal,
                          series, ones)
    _ = float(jnp.sum(stt))
    dt2 = (time.perf_counter() - t0) / iters
    ncyc_d = SC.default_ncyc(geom)
    print(f"{spec}: total {dt2 * 1e3:.2f} ms/call (compile {tc2:.0f}s); "
          f"one full sweep at ncyc={ncyc_d} costs "
          f"{dt / NCYC * ncyc_d * 1e3:.1f} ms sweep-kernel + "
          f"{dt2 * 1e3:.2f} ms/total-pass", flush=True)
    return rate


def main():
    rc = 3.8
    goffs = [1, 9]
    specs = []
    for a in sys.argv[1:]:
        if a.startswith("--rc="):
            rc = float(a[5:])
        elif a.startswith("--goff="):
            goffs = [int(v) for v in a[7:].split(",")]
        else:
            specs.append(a)
    specs = specs or ["16x8x8"]
    write_setfl(SETFL, rc=rc)
    cheb = EC.from_spline(E.from_setfl(E.parse_setfl(SETFL)))
    print(f"nser=({cheb.c_phi.shape[0]}, {cheb.c_rho.shape[0]}, "
          f"{cheb.c_f.shape[0]}) rc={cheb.rc_host}", flush=True)
    rates = {(s, g): bench_spec(s, cheb, g) for s in specs for g in goffs}
    base = rates[(specs[0], goffs[0])]
    for (s, g), v in rates.items():
        print(f"{s} goff={g}: {v / base:.3f}x vs {specs[0]} "
              f"goff={goffs[0]}")


if __name__ == "__main__":
    main()
