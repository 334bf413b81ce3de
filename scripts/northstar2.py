#!/usr/bin/env python
"""Resumable north-star run (BASELINE.json): 32x32 (P,T) x 4096-atom LJ
NPT MC -> RDF -> classifier -> T_m(P), all on chip.

Round-4 lesson (docs/evidence_r4.log 06:20Z): the first full-scale
attempt lost 45 minutes of equilibration to a TPU-worker crash at the
first featurization fetch. This version checkpoints after every stage
so a worker crash costs one chunk, not the run:

  ns_state/progress.json   {"eq_done": k, "samp_done": m, secs: {...}}
  ns_state/ck.npz          ensemble checkpoint (io/checkpoint)
  ns_state/feat_mmm.npz    per-chunk slot-ordered g(r) + box sums

Drive it with a retry loop (scripts/evidence_run4.sh); each attempt
resumes where the last died. Timing is accumulated per completed chunk
in progress.json, so points/hour reflects compute actually spent, not
wall time lost to crashes. A --preflight pass exercises the at-scale
featurization graph on synthetic data BEFORE spending 10+ minutes of
equilibration behind it.

Usage: python scripts/northstar2.py [--fast] [--preflight-only]
Writes northstar_result.json in the CWD when the final stage completes.
"""

import dataclasses
import json
import os
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
from neuralmelting_tpu.features import rdf_frames, structure_factor
from neuralmelting_tpu.io import checkpoint as ckpt_mod
from neuralmelting_tpu.neural import get_scaler, PhaseCNN, train_classifier
from neuralmelting_tpu.neural.train import extreme_t_labels
from neuralmelting_tpu.neural.melt import melting_curve
from neuralmelting_tpu.pipeline import slot_order_features

FAST = "--fast" in sys.argv
PREFLIGHT_ONLY = "--preflight-only" in sys.argv
STATE = os.path.join(os.getcwd(), "ns_state" + ("_fast" if FAST else ""))
NBINS = 64


def make_cfg():
    npress, ntemp = (4, 8) if FAST else (32, 32)
    return RunConfig(
        name="northstar", element="LJ",
        ncells=(4, 4, 4) if FAST else (16, 8, 8),
        npress=npress, ntemp=ntemp,
        press=tuple(float(p) for p in np.linspace(1.0, 5.0, npress)),
        temp=tuple(float(t) for t in np.linspace(0.55, 1.55, ntemp)),
        nsmpl=1, mod=20, ncut=0, seed=7, dpos0=0.11, dvol0=0.004)


def load_progress():
    p = os.path.join(STATE, "progress.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"eq_done": 0, "samp_done": 0,
            "eq_secs": 0.0, "samp_secs": 0.0, "attempts": 0}


def save_progress(prog):
    p = os.path.join(STATE, "progress.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(prog, f)
    os.replace(tmp, p)


def save_ck(setup):
    path = os.path.join(STATE, "ck.npz")
    ckpt_mod.save(path + ".tmp.npz", setup.states, setup.slot_of,
                  setup.cfg.to_json())
    os.replace(path + ".tmp.npz", path)


def preflight(r, natoms, rmax):
    """Run the exact at-scale featurization graph on synthetic data so a
    worker-killing fetch fails in the first minute, not after eq."""
    k = jax.random.key(0)
    pos = jax.random.uniform(k, (r, natoms, 3), jnp.float32) * 10.0
    boxes = jnp.full((r, 3), 10.0, jnp.float32)
    t0 = time.perf_counter()
    g = rdf_frames(pos, boxes, NBINS, rmax)
    gn = np.asarray(g)
    dt = time.perf_counter() - t0
    print(f"preflight: rdf_frames({r}x{natoms}) ok in {dt:.1f}s "
          f"finite={np.isfinite(gn).all()}", file=sys.stderr)
    return dt


def main():
    os.makedirs(STATE, exist_ok=True)
    cfg = make_cfg()
    npress, ntemp = cfg.npress, cfg.ntemp
    r = npress * ntemp
    eq_chunks = 2 if FAST else 30
    samp_chunks = 3 if FAST else 20

    prog = load_progress()
    prog["attempts"] += 1
    save_progress(prog)

    setup = runner.setup_run(cfg, engine="cellmc")
    natoms = setup.natoms
    box0 = np.asarray(setup.states.box[0])
    rmax = 0.48 * float(box0.min())

    pf_secs = preflight(r, natoms, rmax)
    if PREFLIGHT_ONLY:
        return

    ck = os.path.join(STATE, "ck.npz")
    if prog["eq_done"] > 0 or prog["samp_done"] > 0:
        setup = runner.restore_setup(setup, ck)
        print(f"resumed: eq_done={prog['eq_done']} "
              f"samp_done={prog['samp_done']} "
              f"attempt={prog['attempts']}", file=sys.stderr)

    diag_any = int(prog.get("diag", 0))

    # --- equilibrate (no traj), checkpoint every chunk -----------------
    for i in range(prog["eq_done"], eq_chunks):
        t0 = time.perf_counter()
        setup, recs, frames, hist, xacc, diag = runner.run_sampling(
            setup, write_files=False, write_traj=False)
        diag_any |= int(diag)
        dt = time.perf_counter() - t0
        save_ck(setup)
        prog.update(eq_done=i + 1, eq_secs=prog["eq_secs"] + dt,
                    diag=diag_any)
        save_progress(prog)
        print(f"eq chunk {i}: pe/N="
              f"{float(jnp.mean(recs.pe[-1]))/natoms:.3f} "
              f"diag={int(diag)} {dt:.1f}s", file=sys.stderr)

    # --- sample + featurize per chunk, each persisted -------------------
    for i in range(prog["samp_done"], samp_chunks):
        t0 = time.perf_counter()
        setup, recs, frames, hist, xacc, diag = runner.run_sampling(
            setup, write_files=False, write_traj=True)
        diag_any |= int(diag)
        pos, boxes = frames                    # (1, R, N, 3), (1, R, 3)
        g = rdf_frames(pos[0], boxes[0], NBINS, rmax)      # (R, nbins)
        g_slot = slot_order_features(np.asarray(g)[None], hist)[0]
        b_slot = slot_order_features(np.asarray(boxes), hist)[0]
        dt = time.perf_counter() - t0
        fp = os.path.join(STATE, f"feat_{i:03d}.npz")
        np.savez(fp + ".tmp.npz", g=g_slot, box=b_slot)
        os.replace(fp + ".tmp.npz", fp)
        save_ck(setup)
        prog.update(samp_done=i + 1, samp_secs=prog["samp_secs"] + dt,
                    diag=diag_any)
        save_progress(prog)
        print(f"samp chunk {i}: {dt:.1f}s diag={int(diag)}",
              file=sys.stderr)

    # --- classifier (extreme-T labels) + T_m fit ------------------------
    t0 = time.perf_counter()
    gs, bs = [], []
    for i in range(samp_chunks):
        z = np.load(os.path.join(STATE, f"feat_{i:03d}.npz"))
        gs.append(z["g"])
        bs.append(z["box"])
    feats = jnp.asarray(np.mean(gs, axis=0), jnp.float32)   # (R, nbins)
    box_mean = jnp.asarray(np.mean(bs, axis=0))

    q, sq = structure_factor(feats, box_mean, natoms, rmax)
    sc = get_scaler("tanh")
    x = sc.fit_transform(feats)
    band = max(1, ntemp // 8)
    mask1, labels1 = extreme_t_labels(ntemp, band)
    res = train_classifier(PhaseCNN(), x, jnp.tile(mask1, npress),
                           jnp.tile(labels1, npress), jax.random.key(3),
                           epochs=400, lr=2e-3)
    probs = np.asarray(res.probs).reshape(npress, ntemp)
    tms, widths = melting_curve(setup.temp, probs)
    train_secs = time.perf_counter() - t0

    # nominal attempts (see scripts/northstar.py for the derivation)
    g = setup.geom
    from neuralmelting_tpu.sampler import cellmc as SCmod
    ncyc = SCmod.default_ncyc(g)
    ncolors = g.stride ** 3
    sweeps = int(setup.states.sweep[0])
    attempts = int(r * sweeps
                   * (ncyc * ncolors * (g.ncells // ncolors) * g.nsub
                      + runner.nvol_per_sweep(cfg, natoms)
                      / cfg.vol_every))

    compute_secs = prog["eq_secs"] + prog["samp_secs"] + train_secs
    press = np.asarray(setup.press)
    tm_p1 = float(tms[0])
    anchor = 0.780                            # CPU-anchored small-scale
    err_p1 = abs(tm_p1 / anchor - 1.0)
    out = {
        "grid": [npress, ntemp], "natoms": natoms,
        "sweeps_total": sweeps,
        "attempted_moves_nominal": attempts,
        "diag": diag_any,
        "eq_seconds": round(prog["eq_secs"], 1),
        "sample_seconds": round(prog["samp_secs"], 1),
        "feature_train_seconds": round(train_secs, 1),
        "total_seconds": round(compute_secs, 1),
        "attempts_to_complete": prog["attempts"],
        "preflight_seconds": round(pf_secs, 1),
        "moves_per_sec_nominal": attempts / max(
            prog["eq_secs"] + prog["samp_secs"], 1e-9),
        "points_per_hour": r / (compute_secs / 3600.0),
        "tm_by_pressure": {f"{press[i]:.3f}": float(tms[i])
                           for i in range(npress)},
        "tm_p1": tm_p1, "tm_p1_anchor": anchor,
        "tm_p1_rel_err": err_p1,
        "pass_2pct": bool(err_p1 <= 0.02),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out, indent=1))
    with open("northstar_result.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
