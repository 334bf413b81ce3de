#!/usr/bin/env python
"""Measure the per-replica slot-occupancy distribution -> decide
per-density-band kcap (VERDICT r3 next #3a).

Physics of the question: the cell grid is SHARED across the replica
ensemble, so every replica has mean occupancy natoms/ncells — NPT volume
moves rescale the cell WIDTH, not the per-cell population. Per-replica
kcap needs therefore differ only through occupancy FLUCTUATION width:
liquid lanes (high S(0)) and boundary-commensurate solid lanes (a sliding
grid plane capturing an extra lattice plane) spike differently. Sweep
cost is linear in K (27*K candidate slots per attempt), so banding
replicas into groups with separate pallas_calls at tight per-band K wins
only if the per-band tight kcaps actually spread by >= 8 slots (the
sublane granularity).

This script runs the production cellmc engine for several chunks and
reports, per (P,T) band, the running max cell occupancy and the implied
throughput gain of 2/4-band kcap vs the global kcap:

    gain = (R * K_global) / sum_b(R_b * K_b)

Run on chip at the bench config (default) or --small on CPU (interpret
kernels, 256 atoms, 4x4 grid — a preview with the same analysis).
Writes occupancy_result.json.
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

SMALL = "--small" in sys.argv

if SMALL:
    jax.config.update("jax_platforms", "cpu")

from neuralmelting_tpu.config import RunConfig
from neuralmelting_tpu import runner
from neuralmelting_tpu.ops.pallas import cellmc as CMK
from neuralmelting_tpu.sampler import cellmc as SC


def main():
    if SMALL:
        cfg = RunConfig(name="occ", element="LJ", ncells=(4, 4, 4),
                        npress=4, ntemp=4,
                        press=(1.0, 3.0, 5.5, 8.0),
                        temp=(0.7, 0.9, 1.1, 1.3),
                        nsmpl=1, mod=4, seed=77, dpos0=0.11, dvol0=0.002)
        nchunks = 6
    else:
        cfg = RunConfig(name="occ", element="LJ", ncells=(16, 8, 8),
                        npress=32, ntemp=32,
                        press=tuple(float(p) for p in
                                    jnp.linspace(1.0, 8.0, 32)),
                        temp=tuple(float(t) for t in
                                   jnp.linspace(0.7, 1.3, 32)),
                        nsmpl=1, mod=20, seed=77,
                        dpos0=0.11, dvol0=0.002)
        nchunks = 10
    setup = runner.setup_run(cfg, engine="cellmc")
    r = len(setup.press) * len(setup.temp)
    p_of = np.asarray(setup.p_grid)
    t_of = np.asarray(setup.t_grid)

    run_max = np.zeros((r,), np.int64)
    t0 = time.time()
    for c in range(nchunks):
        setup, recs, frames, hist, xacc, diag = runner.run_sampling(
            setup, outdir=None, write_files=False, write_traj=False)
        counts = np.asarray(setup.slab_count)          # (R, C)
        # map replica -> current slot identity for the (P,T) banding:
        # configurations stay put under tempering; occupancy is a
        # property of the CONFIGURATION, banded by its CURRENT (T, P)
        per_rep = counts.max(axis=1)
        run_max = np.maximum(run_max, per_rep)
        print(f"chunk {c}: diag={int(diag)} max={per_rep.max()} "
              f"mean_of_max={per_rep.mean():.1f} "
              f"global_kcap={setup.geom.kcap}", flush=True)

    temp_now = np.asarray(setup.states.temp)
    press_now = np.asarray(setup.states.press)

    def band_analysis(nbands, order_key):
        """Split replicas into nbands equal groups by order_key; per-band
        tight kcap; implied candidate-work gain vs global."""
        idx = np.argsort(order_key)
        bands = np.array_split(idx, nbands)
        kg = CMK.tight_kcap(int(run_max.max()), setup.geom.nsub)
        ks, sizes = [], []
        for b in bands:
            ks.append(CMK.tight_kcap(int(run_max[b].max()),
                                     setup.geom.nsub))
            sizes.append(len(b))
        gain = (sum(sizes) * kg) / sum(s * k for s, k in zip(sizes, ks))
        return {"nbands": nbands, "k_global": kg, "k_bands": ks,
                "band_sizes": sizes, "implied_gain": round(gain, 4)}

    # band by the replica's CURRENT temperature (phase proxy) and by
    # current pressure; also the oracle banding (by measured max itself,
    # the best any static banding could do)
    res = {
        "config": "small" if SMALL else "bench",
        "natoms": setup.natoms,
        "replicas": r,
        "ncell": list(setup.geom.ncell),
        "kcap_global_geom": setup.geom.kcap,
        "chunks": nchunks,
        "sweeps_per_chunk": cfg.mod,
        "run_max_hist": {str(v): int((run_max == v).sum())
                         for v in sorted(set(run_max.tolist()))},
        "by_temp_2": band_analysis(2, temp_now),
        "by_temp_4": band_analysis(4, temp_now),
        "by_press_4": band_analysis(4, press_now),
        "oracle_2": band_analysis(2, run_max),
        "oracle_4": band_analysis(4, run_max),
        "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(res, indent=2))
    with open("occupancy_result.json", "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
