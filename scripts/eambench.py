#!/usr/bin/env python
"""EAM-aluminum benchmark rows (VERDICT r3 directive #5 / BASELINE config 3).

Two measurements on the real TPU chip, both through the production
Pallas cell-MC EAM engine (ops/pallas/cellmc_eam.py — stride-3 colors,
Chebyshev potential evaluation):

1. moves/s: 4096-atom synthetic-Al NPT MC, 16x16 (P,T) replica grid
   resident on chip — same protocol as bench.py (readback-barrier
   timing, sampler chunks of 20 sweeps).
2. points/hour: the config-3 melting sweep (256 atoms, 1 bar,
   10 temperatures 400-2200 K) end-to-end through melting_pipeline
   (sampling -> RDF -> classifier -> T_m), reported as (P,T) points per
   hour with the extracted T_m next to the gather-engine number
   re-measured by scripts/eam_tm_ab.py (1778 K, same protocol/seed;
   experimental Al is NOT expected — the table is synthetic, and both
   engines share a common lattice-start superheating bias; the
   cross-engine 0.4% agreement is the validation, see
   docs/VALIDATION.md correction history).

Writes eambench_result.json and prints one JSON line.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, "/root/repo")

import numpy as np

from neuralmelting_tpu import runner
from neuralmelting_tpu.config import RunConfig
from neuralmelting_tpu.models.eam_gen import write_setfl
from neuralmelting_tpu.pipeline import melting_pipeline
from neuralmelting_tpu.sampler import cellmc as SC

FAST = "--fast" in sys.argv
SETFL = "/tmp/nm_bench_Al.eam.alloy"
SWEEPS_PER_CHUNK = 20


def bench_moves():
    """EAM cellmc moves/s at a 16x16 grid of 4096-atom replicas."""
    np_, nt = (2, 2) if FAST else (16, 16)
    cfg = RunConfig(
        name="eambench", element="AL", ncells=(4, 4, 4) if FAST else (16, 8, 8),
        npress=np_, ntemp=nt,
        press=tuple(float(p) for p in np.linspace(1.0, 5000.0, np_)),  # bar
        temp=tuple(float(t) for t in np.linspace(600.0, 1400.0, nt)),
        nsmpl=1, mod=SWEEPS_PER_CHUNK, seed=11, dpos0=0.15, dvol0=0.002)
    setup = runner.setup_run(cfg, setfl=SETFL, engine="cellmc")
    scal, series, nser = SC.eam_pack(setup.pot)
    run = SC.make_eam_run_fn(
        setup.us.kb, setup.us.p2e, setup.geom, nser, mod=SWEEPS_PER_CHUNK,
        nrecords=1, ncyc=SC.default_ncyc(setup.geom), nvol=1, vol_every=4,
        rebin_every=2, exchange=True, npress=np_, ntemp=nt,
        adapt=False, write_traj=False)
    seed0 = jnp.asarray([cfg.seed, cfg.seed + 7], jnp.int32)

    def chunk(setup):
        out = run(setup.states, setup.slabs, setup.slab_count, setup.shift,
                  setup.slot_of, jax.random.key(cfg.seed + 1), scal, series,
                  setup.cell_tabs, setup.t_grid, setup.p_grid, seed0)
        (states, slabs, count, shift, slot_of, recs, frames,
         hist, xacc, diag) = out
        return dataclasses.replace(setup, states=states, slabs=slabs,
                                   slab_count=count, shift=shift,
                                   slot_of=slot_of), diag

    setup, diag = chunk(setup)
    jax.block_until_ready(setup.states.pos)
    setup, diag = chunk(setup)
    ntp_a = setup.states.ntp + 0
    ntv_a = setup.states.ntv + 0
    _ = float(jnp.sum(setup.states.pos))
    t1 = time.perf_counter()
    nchunks = 3
    for _i in range(nchunks):
        setup, diag = chunk(setup)
    _ = float(jnp.sum(setup.states.pos))
    t2 = time.perf_counter()
    attempted = int(jnp.sum(setup.states.ntp - ntp_a)
                    + jnp.sum(setup.states.ntv - ntv_a))
    return {
        "eam_moves_per_sec": attempted / (t2 - t1),
        "eam_grid": [np_, nt], "eam_natoms": setup.natoms,
        "eam_kcap": setup.geom.kcap, "eam_diag": int(diag),
        "eam_sec_per_chunk": (t2 - t1) / nchunks,
    }


def bench_melting_sweep():
    """Config-3 melting sweep through the cellmc EAM engine, timed."""
    nt = 4 if FAST else 10
    cfg = RunConfig(
        name="eamsweep", element="AL", ncells=(4, 4, 4),   # 256 atoms
        npress=1, ntemp=nt, press=(1.0,),
        temp=tuple(float(t) for t in np.linspace(400.0, 2200.0, nt)),
        nsmpl=30 if not FAST else 4, mod=15, ncut=6 if not FAST else 1,
        seed=5, dpos0=0.15, dvol0=0.01)
    t0 = time.perf_counter()
    res = melting_pipeline(cfg, setfl=SETFL, engine="cellmc", nbins=48)
    dt = time.perf_counter() - t0
    return {
        "sweep_tm_K": float(res.tm[0]),
        "sweep_tm_gather_engine_K": 1778.2,   # eam_tm_ab.json glong leg
        "sweep_points": nt,
        "sweep_seconds": round(dt, 1),
        "sweep_points_per_hour": nt / (dt / 3600.0),
        "sweep_diag": res.diag,
        "sweep_probs": [round(float(p), 3) for p in res.probs[0]],
    }


def main():
    write_setfl(SETFL, rc=3.8)
    out = {"device": str(jax.devices()[0])}
    out.update(bench_moves())
    out.update(bench_melting_sweep())
    print(json.dumps(out, indent=1))
    with open("eambench_result.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
