#!/usr/bin/env python
"""Headline benchmark: LJ 4096-atom NPT Metropolis MC at the NORTH-STAR
scale — a 32x32 (P,T) replica grid (1024 replicas x 4096 atoms) resident
on one chip; metric = attempted MC moves/sec/chip (BASELINE.md row 3).

Target (BASELINE.md): >= 1.0e8 attempted moves/sec/chip.
Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Engine: the whole-sweep Pallas cell-MC kernel (ops/pallas/cellmc.py) —
checkerboard position sweeps run entirely in VMEM with in-kernel threefry
PRNG and acceptance; volume trials and record thermodynamics come from the
half-stencil pair-sum kernel (E(s*x) exact via LJ's homogeneous scaling).
Round 1's dense/MXU engine measured 0.875 M moves/s on this chip; the
kernel engine is ~25x that (see docs/tpu_notes.md for the perf model).

Timing protocol (docs/tpu_notes.md §0): block_until_ready LIES before the
first device readback on this stack, so the bench forces ONE readback
after warmup/equilibration and then times chunks between two readback
barriers.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, "/root/repo")

import numpy as np

from neuralmelting_tpu.config import RunConfig
from neuralmelting_tpu import runner
from neuralmelting_tpu.sampler import cellmc as SC

BASELINE_TARGET = 1.0e8
SWEEPS_PER_CHUNK = 20


def main():
    try:
        jax.devices()
    except RuntimeError as e:
        # axon tunnel down (port 8082 refused -> claim UNAVAILABLE):
        # emit a self-explaining record instead of a traceback so the
        # round still gets a BENCH json (docs/tpu_notes.md; memory:
        # axon-tpu-tunnel-outages)
        print(json.dumps({
            "metric": "mc_attempted_moves_per_sec_per_chip",
            "value": 0, "unit": "moves/sec/chip", "vs_baseline": 0.0,
            "error": f"TPU backend unavailable: {e}",
        }))
        return
    import os
    fast_recip = os.environ.get("NM_FAST_RECIP", "") == "1"
    cfg = RunConfig(
        name="bench", element="LJ", ncells=(16, 8, 8),   # 4096 atoms
        npress=32, ntemp=32,                              # north-star grid
        press=tuple(float(p) for p in jnp.linspace(1.0, 8.0, 32)),
        temp=tuple(float(t) for t in jnp.linspace(0.7, 1.3, 32)),
        nsmpl=1, mod=SWEEPS_PER_CHUNK, seed=1234,
        dpos0=0.11, dvol0=0.002)
    setup = runner.setup_run(cfg, engine="cellmc")
    npress, ntemp = len(setup.press), len(setup.temp)
    run = SC.make_cellmc_run_fn(
        setup.us.kb, setup.us.p2e, setup.geom, mod=SWEEPS_PER_CHUNK,
        nrecords=1, ncyc=SC.default_ncyc(setup.geom),
        nvol=1, vol_every=4,   # one full-energy volume trial per 4 sweeps
        rebin_every=2,         # grid-shift rebin sort every 2nd sweep
        # (deterministic sweep-counter schedules — see make_cellmc_run_fn
        # docstring; the reference's pvol~0.03 move mix attempts volume
        # trials even less often per position trial)
        exchange=True, npress=npress, ntemp=ntemp,
        adapt=False, write_traj=False, fast_recip=fast_recip)
    seed0 = jnp.asarray([cfg.seed, cfg.seed + 7], jnp.int32)

    def chunk(setup):
        out = run(setup.states, setup.slabs, setup.slab_count, setup.shift,
                  setup.slot_of, jax.random.key(cfg.seed + 1), setup.pot,
                  setup.cell_tabs, setup.t_grid, setup.p_grid, seed0)
        (states, slabs, count, shift, slot_of, recs, frames,
         hist, xacc, diag) = out
        import dataclasses
        return dataclasses.replace(setup, states=states, slabs=slabs,
                                   slab_count=count, shift=shift,
                                   slot_of=slot_of), diag

    # warmup/compile + equilibrate, then ONE readback (honest-timing mode)
    setup, diag = chunk(setup)
    jax.block_until_ready(setup.states.pos)
    setup, diag = chunk(setup)
    ntp_a = setup.states.ntp + 0
    ntv_a = setup.states.ntv + 0
    _ = float(jnp.sum(setup.states.pos))   # drains queue; honest barriers
    t1 = time.perf_counter()
    nchunks = 3
    for _i in range(nchunks):
        setup, diag = chunk(setup)
    _ = float(jnp.sum(setup.states.pos))   # closing readback barrier
    t2 = time.perf_counter()

    diag_v = int(diag)
    attempted = int(jnp.sum(setup.states.ntp - ntp_a)
                    + jnp.sum(setup.states.ntv - ntv_a))
    rate = attempted / (t2 - t1)

    # companion rows recorded by scripts/northstar.py (end-to-end
    # pipeline at this scale: (P,T)-points/hour + melt-T check) and
    # scripts/eambench.py (EAM-Al engine) — merged so BENCH_r*.json
    # carries them; reproduce via those scripts.
    extra = {}
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    for fname, keys in (
            ("northstar_result.json", ("points_per_hour", "tm_p1",
                                       "tm_p1_rel_err", "pass_2pct",
                                       "diag", "total_seconds",
                                       "feature_train_seconds")),
            ("eambench_result.json", ("eam_moves_per_sec", "eam_natoms",
                                      "eam_diag", "sweep_tm_K",
                                      "sweep_points_per_hour")),
            ("ab_result.json", ("ab_pass",))):
        for d in (here, os.getcwd()):
            p = os.path.join(d, fname)
            if os.path.exists(p):
                with open(p) as f:
                    rec = json.load(f)
                tag = fname.split("_")[0]
                extra.update({f"{tag}.{k}": rec[k]
                              for k in keys if k in rec})
                # companion files persist across reruns: stamp their age
                # so a stale row is never mistaken for a fresh one
                extra[f"{tag}.age_hours"] = round(
                    (time.time() - os.path.getmtime(p)) / 3600.0, 2)
                break

    print(json.dumps({
        "metric": "mc_attempted_moves_per_sec_per_chip",
        "value": rate,
        "unit": "moves/s",
        "vs_baseline": rate / BASELINE_TARGET,
        "detail": {
            "natoms": setup.natoms,
            "replicas": len(setup.press) * len(setup.temp),
            "sweeps_per_chunk": SWEEPS_PER_CHUNK,
            "attempted_moves": attempted,
            "sec_per_chunk": (t2 - t1) / nchunks,
            "sweeps_total": int(setup.states.sweep[0]),
            "diag": diag_v,
            "engine": "cellmc-pallas",
            "fast_recip": fast_recip,
            "device": str(jax.devices()[0]),
            **extra,
        },
    }))


if __name__ == "__main__":
    main()
