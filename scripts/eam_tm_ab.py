#!/usr/bin/env python
"""EAM T_m engine/protocol A/B (round-4: resolve 1772 K vs 1264 K).

eambench's cellmc config-3 sweep reported T_m = 1772 K where the
gather-engine run behind docs/VALIDATION.md reported 1264 K. The two
runs differ in BOTH engine and protocol (VALIDATION: nsmpl=40, mod=20,
ncut=15, dpos0=0.1 -> 300 burn-in sweeps; eambench: nsmpl=30, mod=15,
ncut=6, dpos0=0.15 -> 90 burn-in sweeps). A lattice start superheats:
with a short burn-in the crystal survives above the true melting
point, biasing T_m high. This script separates engine from protocol:

  legs (pick by name on argv, default: gshort glong):
    gshort  gather engine, eambench's short protocol
    glong   gather engine, VALIDATION's long protocol
    cshort  cellmc engine, short protocol   (chip recommended)
    clong   cellmc engine, long protocol    (chip recommended)

Same T grid (10 points, 400-2200 K), same setfl table, same seeds as
eambench. If gshort ~ cshort >> glong ~ clong, the discrepancy is
protocol (superheating), not engine physics.

Writes eam_tm_ab.json (merging across invocations).
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, "/root/repo")

import numpy as np

from neuralmelting_tpu.config import RunConfig
from neuralmelting_tpu.models.eam_gen import write_setfl
from neuralmelting_tpu.pipeline import melting_pipeline

SETFL = "/tmp/nm_bench_Al.eam.alloy"
OUT = "eam_tm_ab.json"


def make_cfg(protocol: str) -> RunConfig:
    nt = 10
    base = dict(
        name="eamab", element="AL", ncells=(4, 4, 4),
        npress=1, ntemp=nt, press=(1.0,),
        temp=tuple(float(t) for t in np.linspace(400.0, 2200.0, nt)),
        seed=5)
    if protocol == "short":     # eambench's protocol (scripts/eambench.py:100)
        return RunConfig(nsmpl=30, mod=15, ncut=6, dpos0=0.15, dvol0=0.01,
                         **base)
    return RunConfig(nsmpl=40, mod=20, ncut=15, dpos0=0.1, dvol0=0.01,
                     **base)   # docs/VALIDATION.md config 3


LEGS = {                      # (engine, protocol, init)
    "gshort": ("gather", "short", "lattice"),
    "glong": ("gather", "long", "lattice"),
    "cshort": ("cellmc", "short", "lattice"),
    "clong": ("cellmc", "long", "lattice"),
    # cooling legs (VERDICT r4 directive #4): liquid start -> the
    # crossing is the refreeze estimate; [cool, heat] brackets T_m
    "gcool": ("gather", "long", "liquid"),
    "ccool": ("cellmc", "long", "liquid"),
}


def _brackets(res):
    """Hysteresis brackets [T_cool, T_heat] per engine where both legs
    exist. The heating leg superheats, the cooling leg undercools; the
    true T_m lies inside."""
    out = {}
    for eng, heat, cool in (("gather", "glong", "gcool"),
                            ("cellmc", "clong", "ccool")):
        if heat in res and cool in res:
            th, tc = res[heat]["tm_K"], res[cool]["tm_K"]
            out[eng] = {"tm_bracket_K": [min(th, tc), max(th, tc)],
                        "width_K": abs(th - tc)}
    return out


def main():
    write_setfl(SETFL, rc=3.8)
    res = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            res = json.load(f)
    res["device"] = str(jax.devices()[0])
    heat_of = {"gcool": "glong", "ccool": "clong"}
    in_mem = {}                 # leg -> MeltingResult (this process)
    legs = list(sys.argv[1:] or ["gshort", "glong"])
    # a cooling leg applies its heating leg's classifier (extreme-T
    # labels are invalid on a liquid start — pipeline docstring), so
    # the heating leg must run IN THIS PROCESS first
    for leg in list(legs):
        h = heat_of.get(leg)
        if h and h not in legs[:legs.index(leg)]:
            legs.insert(legs.index(leg), h)
    for leg in legs:
        engine, protocol, init = LEGS[leg]
        t0 = time.perf_counter()
        r = melting_pipeline(make_cfg(protocol), setfl=SETFL,
                             engine=engine, nbins=48, init=init,
                             classify_with=in_mem.get(heat_of.get(leg)))
        in_mem[leg] = r
        dt = time.perf_counter() - t0
        res[leg] = {
            "engine": engine, "protocol": protocol, "init": init,
            "tm_K": float(r.tm[0]), "diag": r.diag,
            "seconds": round(dt, 1),
            "probs": [round(float(p), 3) for p in r.probs[0]],
        }
        print(leg, json.dumps(res[leg]), flush=True)
        res["brackets"] = _brackets(res)
        with open(OUT, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
