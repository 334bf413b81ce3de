#!/usr/bin/env python
"""Long-rc EAM run record (VERDICT r4 directive #7).

Regenerates the synthetic Al table at the published-table cutoff range
(rc = 6.3 A, Al99.eam.alloy-like) and runs the production cellmc EAM
engine on a 7^3-supercell box (1372 atoms — the smallest box where
min-image holds comfortably at this rc) for a few real NPT chunks on
whatever backend is active (chip under axon; CPU interpret otherwise).
This is the end-to-end exercise of the --setfl drop-in path at real
table range that rounds 1-4 never ran (docs/VALIDATION.md).

Writes longrc_result.json: geometry, kcap, pe/N trace, moves/s, diag.
Usage: python scripts/longrc_run.py [--fast]
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

from neuralmelting_tpu import runner
from neuralmelting_tpu.config import RunConfig
from neuralmelting_tpu.models.eam_gen import write_setfl

FAST = "--fast" in sys.argv
SETFL = "/tmp/nm_longrc_Al.eam.alloy"


def main():
    write_setfl(SETFL, rc=6.3, rs=5.1)
    nt = 2 if FAST else 8
    cfg = RunConfig(
        name="longrc", element="AL", ncells=(7, 7, 7),     # 1372 atoms
        npress=1, ntemp=nt, press=(1.0,),
        temp=tuple(float(t) for t in np.linspace(400.0, 1800.0, nt)),
        nsmpl=1, mod=2 if FAST else 10, seed=9,
        dpos0=0.12, dvol0=0.004)
    setup = runner.setup_run(cfg, setfl=SETFL, engine="cellmc")
    pe0 = float(jnp.mean(setup.states.pe)) / setup.natoms

    nchunks = 1 if FAST else 3
    ntp_a = setup.states.ntp + 0
    ntv_a = setup.states.ntv + 0
    _ = float(jnp.sum(setup.states.pos))
    diag_any = 0
    pe_trace = []
    t0 = time.perf_counter()
    for _i in range(nchunks):
        setup, recs, frames, hist, xacc, diag = runner.run_sampling(
            setup, write_files=False, write_traj=False)
        diag_any |= int(diag)
        pe_trace.append(round(float(jnp.mean(recs.pe[-1])) / setup.natoms,
                              4))
    _ = float(jnp.sum(setup.states.pos))
    dt = time.perf_counter() - t0
    attempted = int(jnp.sum(setup.states.ntp - ntp_a)
                    + jnp.sum(setup.states.ntv - ntv_a))

    out = {
        "setfl_rc": 6.3, "ncells": [7, 7, 7], "natoms": setup.natoms,
        "replicas": nt,
        "geom_ncell": list(setup.geom.ncell), "kcap": setup.geom.kcap,
        "pe_per_atom_initial": round(pe0, 4),
        "pe_per_atom_trace": pe_trace,
        "diag": diag_any,
        "moves_per_sec": attempted / dt,
        "seconds": round(dt, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out, indent=1))
    with open("longrc_result.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
