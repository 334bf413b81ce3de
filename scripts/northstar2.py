#!/usr/bin/env python
"""Resumable north-star run (BASELINE.json): 32x32 (P,T) x 4096-atom LJ
NPT MC -> RDF -> classifier -> T_m(P), all on chip.

Round-5 redesign (VERDICT r4 weak #1 / directive #1): the round-4 run
wrapped 147 s of kernel time in 3300 s of wall — 77.6 s per 20-sweep eq
chunk vs bench.py's 2.94 s for the identical kernel work. The overhead
was pure orchestration: a 45 MB `np.savez_compressed` checkpoint (full
device->host state fetch over the remote tunnel + single-core deflate)
after EVERY 20-sweep chunk. This version keeps the same total physics
(600 eq + 400 samp sweeps, 20 sampled records, same grid/seeds) but:

  * chunks are bigger (RECORDS=5 records per run_sampling call -> 100
    sweeps per chunk, ONE shape for eq/samp/cooling so XLA compiles a
    single graph), so the jitted chunk amortizes every host-side
    readback;
  * checkpoints are TIME-based (--ck-secs, default 240 s) plus stage
    boundaries — resume granularity costs minutes of recompute, not
    3 s of kernel inside 77 s of wall;
  * checkpoints are uncompressed (io/checkpoint.py compress=False);
  * every chunk logs its breakdown (kernel / featurize / checkpoint
    seconds) into progress.json -> northstar_result.json["breakdown"],
    so the orchestration overhead is a committed measurement.

State layout (ns_state/):
  progress.json   {"eq_done": k, "samp_done": m, secs + breakdown}
  ck.npz          ensemble checkpoint (io/checkpoint, uncompressed)
  feat_mmm.npz    per-chunk slot-ordered g(r) + box means
  sq.npz          final S(q) per slot (ADVICE r4: artifact, not dead code)

Drive it with a retry loop (scripts/evidence_run.sh northstar); each
attempt resumes where the last checkpoint left it. Timing accumulates
per completed chunk, so points/hour reflects compute actually spent.
A --preflight pass exercises the at-scale featurization graph on
synthetic data BEFORE spending minutes of equilibration behind it.

Usage: python scripts/northstar2.py [--fast] [--preflight-only]
                                    [--ck-secs S] [--cool]
Writes northstar_result.json in the CWD when the final stage completes.
--cool appends a cooling-leg bracket run (VERDICT r4 directive #4):
re-sampling on the way DOWN from the hot end brackets T_m between the
heating (superheated) and cooling (undercooled) estimates.
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
if "--cpu" in sys.argv:
    # sitecustomize force-selects the axon TPU plugin and IGNORES the
    # JAX_PLATFORMS env var; only this config update actually overrides
    # it (same mechanism as tests/conftest.py). Use for smoke runs that
    # must not contend with an on-chip job.
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

import numpy as np

from neuralmelting_tpu import runner
from neuralmelting_tpu.config import RunConfig
from neuralmelting_tpu.features import rdf_frames, structure_factor
from neuralmelting_tpu.io import checkpoint as ckpt_mod
from neuralmelting_tpu.neural import get_scaler, PhaseCNN, train_classifier
from neuralmelting_tpu.neural.train import extreme_t_labels
from neuralmelting_tpu.neural.melt import melting_curve, crossing_resolved
from neuralmelting_tpu.pipeline import slot_order_features

FAST = "--fast" in sys.argv
PREFLIGHT_ONLY = "--preflight-only" in sys.argv
COOL = "--cool" in sys.argv
STATE = os.path.join(os.getcwd(), "ns_state" + ("_fast" if FAST else ""))
NBINS = 64
# ONE chunk shape for every phase (eq, sample, cooling): run_sampling's
# compile key includes (nrecords, write_traj), and the round-5 full-scale
# run measured ~300 s of XLA compile PER GRAPH VARIANT on this backend
# (eq chunk 0: 363.8 s vs 38.6 s steady; samp chunk 0: 306.8 s vs 19.4 s
# — docs/evidence_r5.log:114-118). A uniform (records=5,
# write_traj=True) shape pays compile exactly once; eq chunks simply
# discard their trajectory frames. (The persistent compilation cache,
# observed non-functional during that run, works after the mid-round
# backend restart — docs/tpu_notes.md §6.4 item 2 — so a fresh process
# with a populated /root/.jax_cache skips the compile entirely.)
RECORDS = 2 if FAST else 5         # records (x mod sweeps) per chunk


def arg_val(flag, default):
    if flag in sys.argv:
        return float(sys.argv[sys.argv.index(flag) + 1])
    return default


CK_SECS = arg_val("--ck-secs", 240.0)


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
            "eq_secs": 0.0, "samp_secs": 0.0, "attempts": 0,
            "kernel_secs": 0.0, "feat_secs": 0.0, "ck_secs": 0.0,
            "ck_count": 0, "chunk_log": []}


def save_progress(prog):
    p = os.path.join(STATE, "progress.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(prog, f)
    os.replace(tmp, p)


class Checkpointer:
    """Time-based checkpoint policy: save only when --ck-secs of wall
    has passed since the last save (or force=True at stage boundaries).
    progress counters advance ONLY alongside a saved checkpoint, so a
    crash resumes from a consistent (state, counters) pair; skipped
    chunks are simply re-run (MC re-runs are statistically fine and the
    sweep counters live inside the checkpointed state)."""

    def __init__(self, prog):
        self.prog = prog
        self.last = time.perf_counter()
        self.pending = {}

    def note(self, **updates):
        """Stage the progress-counter updates for the NEXT save."""
        self.pending.update(updates)

    def maybe(self, setup, force=False):
        if not force and time.perf_counter() - self.last < CK_SECS:
            return 0.0
        t0 = time.perf_counter()
        path = os.path.join(STATE, "ck.npz")
        ckpt_mod.save(path + ".tmp.npz", setup.states, setup.slot_of,
                      setup.cfg.to_json())
        os.replace(path + ".tmp.npz", path)
        dt = time.perf_counter() - t0
        self.prog.update(self.pending)
        self.prog["ck_secs"] = self.prog.get("ck_secs", 0.0) + dt
        self.prog["ck_count"] = self.prog.get("ck_count", 0) + 1
        save_progress(self.prog)
        self.pending = {}
        self.last = time.perf_counter()
        return dt


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


def featurize_chunk(frames, hist, rmax):
    """(nrec,R,N,3)+(nrec,R,3) frames -> slot-ordered chunk-mean g, box.

    The RDF runs on device straight from the trajectory stack; only the
    (nrec*R, NBINS) result and the (nrec, R, 3) boxes come to host."""
    pos, boxes = frames
    nrec, r = hist.shape
    g = rdf_frames(pos.reshape(nrec * r, -1, 3),
                   boxes.reshape(nrec * r, 3), NBINS, rmax)
    g_slot = slot_order_features(
        np.asarray(g).reshape(nrec, r, NBINS), hist)
    b_slot = slot_order_features(np.asarray(boxes), hist)
    return g_slot.mean(axis=0), b_slot.mean(axis=0)


def train_and_fit(setup, feats, box_mean, npress, ntemp, natoms, rmax):
    """Classifier (extreme-T labels) + sigmoid T_m fit. Returns
    (tms, widths, (q, sq), classifier) where classifier =
    (net, params, fitted scaler) for re-use on a cooling leg."""
    q, sq = structure_factor(feats, box_mean, natoms, rmax)
    sc = get_scaler("tanh")
    x = sc.fit_transform(feats)
    band = max(1, ntemp // 8)
    mask1, labels1 = extreme_t_labels(ntemp, band)
    net = PhaseCNN()
    res = train_classifier(net, x, jnp.tile(mask1, npress),
                           jnp.tile(labels1, npress), jax.random.key(3),
                           epochs=400, lr=2e-3)
    probs = np.asarray(res.probs).reshape(npress, ntemp)
    tms, widths = melting_curve(setup.temp, probs)
    resolved = crossing_resolved(setup.temp, probs, tms)
    return tms, widths, resolved, (np.asarray(q), np.asarray(sq)), (
        net, res.params, sc)


def apply_and_fit(setup, clf, feats, npress, ntemp):
    """Apply a TRAINED classifier (heating leg's) to new features.
    Extreme-T labels are invalid on a liquid-start ensemble (the bottom
    band need not have refrozen), so the cooling leg must NOT retrain —
    measured: a fast-tier cooling leg retrained in-leg reported its
    crossing ABOVE the heating leg's.

    Returns (tms, widths, resolved, probs): ``resolved`` marks rows whose
    probabilities actually span 0.5 with an in-grid fitted midpoint. The
    round-5 full-scale cooling leg resolved NOTHING (the undercooled LJ
    liquid never refroze anywhere on the grid within the sweep budget,
    so every fit extrapolated to a negative reduced temperature); those
    rows are censored observations, not bracket edges."""
    net, params, sc = clf
    x = sc.transform(feats)
    probs = np.asarray(jax.nn.sigmoid(net.apply(params, x)))
    probs = probs.reshape(npress, ntemp)
    tms, widths = melting_curve(setup.temp, probs)
    resolved = crossing_resolved(setup.temp, probs, tms)
    return tms, widths, resolved, probs


def main():
    os.makedirs(STATE, exist_ok=True)
    cfg = make_cfg()
    npress, ntemp = cfg.npress, cfg.ntemp
    r = npress * ntemp
    eq_chunks = 1 if FAST else 6       # x RECORDS x mod sweeps (600 eq)
    samp_chunks = 2 if FAST else 4     # x RECORDS x mod sweeps (400 samp)

    prog = load_progress()
    # Stale-vintage guard: progress counters are only meaningful under
    # the chunking that wrote them. A leftover state dir from an older
    # chunking (e.g. round 4's 30x 20-sweep eq chunks -> eq_done=30 >
    # today's eq_chunks=3) would skip BOTH loops and report the old
    # run's accumulated timings as this run's result. Wipe and restart.
    sig = {"eq_chunks": eq_chunks, "samp_chunks": samp_chunks,
           "records": RECORDS, "uniform_graph": True,
           "mod": cfg.mod, "grid": [npress, ntemp]}
    if (prog["eq_done"] or prog["samp_done"]) and prog.get("chunking") != sig:
        print(f"stale ns_state (chunking {prog.get('chunking')} != {sig}); "
              f"starting fresh", file=sys.stderr)
        for f in os.listdir(STATE):
            os.remove(os.path.join(STATE, f))
        prog = load_progress()
    prog["chunking"] = sig
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
    cker = Checkpointer(prog)

    # --- equilibrate: uniform chunk shape, time-based checkpoints ------
    # write_traj=True here too (frames discarded) so eq/samp/cooling all
    # hit ONE compiled graph; the frames stack for 5 records is ~250 MB
    # of HBM, freed at chunk end.
    attempt = prog["attempts"]
    for i in range(prog["eq_done"], eq_chunks):
        t0 = time.perf_counter()
        setup, recs, frames, hist, xacc, diag = runner.run_sampling(
            setup, write_files=False, write_traj=True, nrecords=RECORDS)
        jax.block_until_ready(setup.states.pos)
        del frames
        diag_any |= int(diag)
        kdt = time.perf_counter() - t0
        prog.setdefault("chunk_log", []).append(
            {"phase": "eq", "i": i, "kernel": round(kdt, 2),
             "attempt": attempt})
        cker.note(eq_done=i + 1, eq_secs=prog["eq_secs"] + kdt,
                  kernel_secs=prog.get("kernel_secs", 0.0) + kdt,
                  chunk_log=prog["chunk_log"], diag=diag_any)
        prog["eq_secs"] += kdt
        prog["kernel_secs"] = prog.get("kernel_secs", 0.0) + kdt
        cdt = cker.maybe(setup, force=(i + 1 == eq_chunks))
        print(f"eq chunk {i}: pe/N="
              f"{float(jnp.mean(recs.pe[-1]))/natoms:.3f} "
              f"diag={int(diag)} kernel={kdt:.1f}s ck={cdt:.1f}s",
              file=sys.stderr)

    # --- sample + featurize per chunk --------------------------------
    for i in range(prog["samp_done"], samp_chunks):
        t0 = time.perf_counter()
        setup, recs, frames, hist, xacc, diag = runner.run_sampling(
            setup, write_files=False, write_traj=True, nrecords=RECORDS)
        jax.block_until_ready(setup.states.pos)
        diag_any |= int(diag)
        kdt = time.perf_counter() - t0
        t1 = time.perf_counter()
        g_slot, b_slot = featurize_chunk(frames, np.asarray(hist), rmax)
        fdt = time.perf_counter() - t1
        fp = os.path.join(STATE, f"feat_{i:03d}.npz")
        np.savez(fp + ".tmp.npz", g=g_slot, box=b_slot)
        os.replace(fp + ".tmp.npz", fp)
        prog.setdefault("chunk_log", []).append(
            {"phase": "samp", "i": i, "kernel": round(kdt, 2),
             "feat": round(fdt, 2), "attempt": attempt})
        cker.note(samp_done=i + 1,
                  samp_secs=prog["samp_secs"] + kdt + fdt,
                  kernel_secs=prog.get("kernel_secs", 0.0) + kdt,
                  feat_secs=prog.get("feat_secs", 0.0) + fdt,
                  chunk_log=prog["chunk_log"], diag=diag_any)
        prog["samp_secs"] += kdt + fdt
        prog["kernel_secs"] = prog.get("kernel_secs", 0.0) + kdt
        prog["feat_secs"] = prog.get("feat_secs", 0.0) + fdt
        cdt = cker.maybe(setup, force=(i + 1 == samp_chunks))
        print(f"samp chunk {i}: kernel={kdt:.1f}s feat={fdt:.1f}s "
              f"ck={cdt:.1f}s diag={int(diag)}", file=sys.stderr)

    # --- classifier (extreme-T labels) + T_m fit ----------------------
    t0 = time.perf_counter()
    gs, bs = [], []
    for i in range(samp_chunks):
        z = np.load(os.path.join(STATE, f"feat_{i:03d}.npz"))
        gs.append(z["g"])
        bs.append(z["box"])
    feats = jnp.asarray(np.mean(gs, axis=0), jnp.float32)   # (R, nbins)
    box_mean = jnp.asarray(np.mean(bs, axis=0))
    tms, widths, resolved_h, (q, sq), clf = train_and_fit(
        setup, feats, box_mean, npress, ntemp, natoms, rmax)
    np.savez(os.path.join(STATE, "sq.npz"), q=q, sq=sq)
    train_secs = time.perf_counter() - t0
    print(f"train+fit done in {train_secs:.1f}s tm_p1={float(tms[0]):.4f}",
          file=sys.stderr)

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

    compute_secs = prog["eq_secs"] + prog["samp_secs"] \
        + prog.get("ck_secs", 0.0) + train_secs

    # Steady-state accounting: the FIRST chunk of each attempt carries
    # the one-time XLA compile (~300 s on this backend when the
    # persistent cache is cold; ~0 when /root/.jax_cache already holds
    # the executable — tpu_notes §6.4 item 2), which a production
    # campaign amortizes over hours. Estimate it IN-PROCESS from the
    # committed chunk log: steady rate = median of the non-first chunks,
    # compile = excess of each attempt's first chunk over that median.
    clog = prog.get("chunk_log", [])
    compile_secs = 0.0
    if len(clog) >= 3:
        firsts = {}
        for c in clog:
            firsts.setdefault(c["attempt"], c)   # first chunk per attempt
        rest = [c["kernel"] for c in clog
                if c is not firsts.get(c["attempt"])]
        if rest:
            steady = float(np.median(rest))
            compile_secs = float(sum(max(0.0, f["kernel"] - steady)
                                     for f in firsts.values()))
    steady_secs = max(compute_secs - compile_secs, 1e-9)

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
        "breakdown": {
            "kernel_seconds": round(prog.get("kernel_secs", 0.0), 1),
            "featurize_seconds": round(prog.get("feat_secs", 0.0), 1),
            "checkpoint_seconds": round(prog.get("ck_secs", 0.0), 1),
            "checkpoint_count": prog.get("ck_count", 0),
            "train_seconds": round(train_secs, 1),
            "records_per_chunk": RECORDS,
            "xla_compile_seconds": round(compile_secs, 1),
            "chunk_log": clog,
        },
        "moves_per_sec_nominal": attempts / max(
            prog["eq_secs"] + prog["samp_secs"], 1e-9),
        "points_per_hour": r / (compute_secs / 3600.0),
        # compile-amortized rate: what a campaign that keeps the process
        # alive (or any backend whose compilation cache works) sustains
        "points_per_hour_steady": r / (steady_secs / 3600.0),
        "tm_by_pressure": {f"{press[i]:.3f}": float(tms[i])
                           for i in range(npress)},
        "tm_p1": tm_p1, "tm_p1_anchor": anchor,
        "tm_p1_rel_err": err_p1,
        "pass_2pct": bool(err_p1 <= 0.02),
        "heat_resolved_rows": int(np.sum(resolved_h)),
        "device": str(jax.devices()[0]),
    }

    if COOL:
        # --- cooling-leg bracket (VERDICT r4 directive #4) ------------
        # The heating leg above starts every replica from a perfect
        # lattice, so its 50% crossing overshoots T_m (superheating).
        # The cooling leg starts every temperature row from the HOTTEST
        # row's molten configuration at the same pressure, re-
        # equilibrates, and re-samples: a liquid only refreezes below
        # T_m (undercooling), so this leg's crossing UNDERshoots. The
        # truth lies inside [T_cool, T_heat] — committed as a bracket,
        # not a point. Same grid, sweeps, classifier, and fit as the
        # heating leg; only the initial condition differs.
        cool_secs0 = time.perf_counter()
        slot_np = np.asarray(setup.slot_of)          # replica -> slot
        pos_np = np.asarray(setup.states.pos)
        box_np = np.asarray(setup.states.box)
        rep_of_slot = np.argsort(slot_np)            # slot -> replica
        hot = rep_of_slot[(np.arange(r) // ntemp) * ntemp + (ntemp - 1)]
        # replica i (holding slot s) gets the config of the replica
        # holding (P(s), T_max) — molten for every pressure on this grid
        donor = hot[slot_np]                         # (R,) replica idx
        states2 = setup.states.replace(
            pos=jnp.asarray(pos_np[donor]),
            box=jnp.asarray(box_np[donor]))
        setup = dataclasses.replace(setup, states=states2)
        print("cool: donor injection done, rebinding", file=sys.stderr)
        setup = runner._rebind_cellmc(setup, setup.geom)
        print("cool: rebind done", file=sys.stderr)
        cool_log = []
        for i in range(eq_chunks):                   # re-equilibrate
            t0 = time.perf_counter()
            setup, recs, frames, hist, xacc, diag = runner.run_sampling(
                setup, write_files=False, write_traj=True,
                nrecords=RECORDS)
            jax.block_until_ready(setup.states.pos)
            del frames
            diag_any |= int(diag)
            cool_log.append({"phase": "cool_eq", "i": i,
                             "kernel": round(time.perf_counter() - t0, 2)})
            print(f"cool_eq chunk {i}: {cool_log[-1]['kernel']:.1f}s "
                  f"diag={int(diag)}", file=sys.stderr)
        gs2, bs2 = [], []
        for i in range(samp_chunks):
            t0 = time.perf_counter()
            setup, recs, frames, hist, xacc, diag = runner.run_sampling(
                setup, write_files=False, write_traj=True,
                nrecords=RECORDS)
            diag_any |= int(diag)
            g2, b2 = featurize_chunk(frames, np.asarray(hist), rmax)
            gs2.append(g2)
            bs2.append(b2)
            cool_log.append({"phase": "cool_samp", "i": i,
                             "kernel": round(time.perf_counter() - t0, 2)})
            print(f"cool_samp chunk {i}: {cool_log[-1]['kernel']:.1f}s "
                  f"diag={int(diag)}", file=sys.stderr)
        feats2 = jnp.asarray(np.mean(gs2, axis=0), jnp.float32)
        box2 = jnp.asarray(np.mean(bs2, axis=0))
        tms2, _, resolved2, probs2 = apply_and_fit(setup, clf, feats2,
                                                   npress, ntemp)
        np.savez(os.path.join(STATE, "cool_probs.npz"),
                 probs=probs2, tms=tms2, resolved=resolved2)
        cool_secs = time.perf_counter() - cool_secs0
        t_min = float(np.asarray(setup.temp)[0])
        # Censoring: a cooling row that never refroze on-grid gives only
        # "T_cool < T_min scanned" — report null, not the extrapolated
        # fit. The bracket lower edge is then unresolved; the heating leg
        # alone still upper-bounds T_m.
        tm_cool = [float(tms2[i]) if resolved2[i] else None
                   for i in range(npress)]
        lo0 = tm_cool[0] if resolved2[0] else None
        hi0 = float(tms[0])
        out["bracket"] = {
            "tm_heat_by_pressure": {f"{press[i]:.3f}": float(tms[i])
                                    for i in range(npress)},
            "tm_cool_by_pressure": {f"{press[i]:.3f}": tm_cool[i]
                                    for i in range(npress)},
            "cool_resolved_rows": int(np.sum(resolved2)),
            "cool_censored_below": t_min,
            "tm_bracket_p1": [lo0, hi0],
            "bracket_p1_resolved": bool(resolved2[0]),
            "anchor_in_bracket_p1": (
                bool(lo0 - 0.02 <= anchor <= hi0 + 0.02)
                if lo0 is not None else None),
            "anchor_below_heating_edge_p1": bool(anchor <= hi0 + 0.02),
            "cool_seconds": round(cool_secs, 1),
            "cool_chunk_log": cool_log,
            "diag": diag_any,
        }

    print(json.dumps(out, indent=1))
    # --fast smoke runs get their own artifact: a smoke run must never
    # clobber the committed full-scale result (it did once, round 5).
    name = "northstar_result_fast.json" if FAST else "northstar_result.json"
    with open(name, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
