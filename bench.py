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

import glob
import json
import os
import socket
import subprocess
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

_HERE = os.path.dirname(os.path.abspath(__file__))


def _port_open(host="127.0.0.1", port=8082, timeout=3.0):
    """Fast axon-tunnel probe: the claim leg dials 127.0.0.1:8082, and a
    refused connect means the host-side relay is down (a dead tunnel
    otherwise costs many minutes inside jax.devices())."""
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except OSError:
        return False


def _last_good():
    """Latest committed diag=0 on-chip measurement, so an outage-window
    bench record is never mistaken for a regression to zero."""
    paths = sorted(glob.glob(os.path.join(_HERE, "docs",
                                          "bench_progression_r*.json")))
    for p in reversed(paths):
        try:
            with open(p) as f:
                rec = json.load(f)
            good = [r for r in rec.get("runs", []) if r.get("diag") == 0]
            if good:
                r = good[-1]
                return {"value": r["value"], "ts": r["ts"],
                        "note": r.get("note", ""), "source": os.path.basename(p)}
        except (OSError, ValueError, KeyError):
            continue
    return None


def wait_for_backend(budget_secs=None, interval=60):
    """Poll for the TPU backend for a bounded window before surrendering.

    Axon tunnel outages last hours but are host-side and transient; the
    driver's capture moment is not controllable, so ride out short tails:
    probe port 8082 first (dead tunnel fails in 3 s, not minutes), and
    only when the port answers spend a subprocess attempt on the real
    claim (jax.devices() in THIS process would cache a failed backend
    init, so probing runs out-of-process). Returns (ok, last_error)."""
    if budget_secs is None:
        budget_secs = float(os.environ.get("NM_BENCH_WAIT_SECS", "1800"))
    deadline = time.time() + budget_secs
    last_err = "not attempted"
    first = True
    while True:
        if _port_open():
            try:
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax; d=jax.devices(); print(d[0])"],
                    capture_output=True, text=True, timeout=900)
                if r.returncode == 0:
                    return True, None
                last_err = (r.stderr or r.stdout).strip()[-500:]
            except subprocess.TimeoutExpired:
                last_err = "claim probe timed out (900s)"
        else:
            last_err = "port 8082 refused (axon tunnel down)"
        if first:
            print(f"# bench: TPU backend unavailable ({last_err}); "
                  f"polling up to {budget_secs:.0f}s", file=sys.stderr)
            first = False
        if time.time() >= deadline:
            return False, last_err
        time.sleep(interval)


def main():
    ok, err = wait_for_backend()
    if ok:
        try:
            jax.devices()
            ok, err = True, None
        except RuntimeError as e:   # flapped between probe and claim
            ok, err = False, str(e)
    if not ok:
        # Emit a self-explaining record instead of a traceback so the
        # round still gets a BENCH json; carry the last committed on-chip
        # measurement so value=0 reads as "outage", not "regression".
        print(json.dumps({
            "metric": "mc_attempted_moves_per_sec_per_chip",
            "value": 0, "unit": "moves/sec/chip", "vs_baseline": 0.0,
            "error": f"TPU backend unavailable after poll window: {err}",
            "last_good": _last_good(),
        }))
        return
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

    # end-to-end row (VERDICT r4 directive #8): one PRODUCTION
    # runner.run_sampling chunk at the identical scale — step-size
    # adaptation on, records, geometry maintenance (kcap hysteresis,
    # overflow retry), host readbacks — so BENCH carries the system
    # number next to the kernel number and the orchestration gap is
    # driver-visible. First call compiles; the second is timed.
    # The production pipeline (scripts/northstar2.py) runs 10-record
    # chunks (200 sweeps), so the e2e row measures THAT configuration;
    # at nrecords=1 the fixed per-chunk overhead (geometry-refresh
    # readback, record fetch, pre-state snapshot) bills 1.05 s against
    # a 2.95 s chunk (0.74x kernel, measured 2026-08-19) — real, but
    # not the shape production runs in.
    E2E_RECORDS = 10
    setup, *_ = runner.run_sampling(setup, write_files=False,
                                    write_traj=False, nrecords=E2E_RECORDS)
    # ntp/ntv are adaptation-WINDOW counters (sampler/adapt.py zeroes
    # them each window), so their across-chunk diff cancels with adapt
    # on; the monotonic per-replica sweep counter is the honest base.
    # Volume trials (1 per vol_every sweeps) add <0.01% — excluded.
    sweep_b = setup.states.sweep + 0
    _ = float(jnp.sum(setup.states.pos))
    t3 = time.perf_counter()
    setup, _recs, _frames, _hist, _xacc, e2e_diag = runner.run_sampling(
        setup, write_files=False, write_traj=False, nrecords=E2E_RECORDS)
    _ = float(jnp.sum(setup.states.pos))
    t4 = time.perf_counter()
    e2e_attempted = int(jnp.sum(setup.states.sweep - sweep_b)) * setup.natoms
    e2e_rate = e2e_attempted / (t4 - t3)

    # companion rows recorded by scripts/northstar.py (end-to-end
    # pipeline at this scale: (P,T)-points/hour + melt-T check) and
    # scripts/eambench.py (EAM-Al engine) — merged so BENCH_r*.json
    # carries them; reproduce via those scripts.
    extra = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for fname, tag, keys in (
            ("northstar_result.json", "northstar",
             ("points_per_hour", "points_per_hour_steady", "tm_p1",
              "tm_p1_rel_err", "pass_2pct", "diag", "total_seconds",
              "feature_train_seconds", "breakdown", "bracket")),
            ("eambench_result.json", "eambench",
             ("eam_moves_per_sec", "eam_natoms", "eam_diag", "sweep_tm_K",
              "sweep_points_per_hour")),
            ("coexist_result.json", "coexist_lj",
             ("tm_bracket", "diag", "measured_chunks", "total_seconds")),
            ("coexist_result_al.json", "coexist_al",
             ("tm_bracket", "diag", "measured_chunks", "total_seconds")),
            ("ab_result.json", "ab", ("ab_pass",))):
        for d in (here, os.getcwd()):
            p = os.path.join(d, fname)
            if os.path.exists(p):
                with open(p) as f:
                    rec = json.load(f)
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
            "e2e_moves_per_sec": e2e_rate,
            "e2e_sec_per_chunk": t4 - t3,
            "e2e_sweeps_per_chunk": E2E_RECORDS * SWEEPS_PER_CHUNK,
            "e2e_diag": int(e2e_diag),
            "engine": "cellmc-pallas",
            "fast_recip": fast_recip,
            "device": str(jax.devices()[0]),
            **extra,
        },
    }))


if __name__ == "__main__":
    main()
