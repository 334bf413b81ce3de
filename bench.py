#!/usr/bin/env python
"""Headline benchmark (BASELINE config 2): LJ 4096-atom NPT Metropolis MC,
vmapped 8x8 (P,T) replica grid on one chip; metric = attempted MC moves/sec.

Target (BASELINE.md): >= 1.0e8 attempted moves/sec/chip.
Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Uses the dense (ghost + MXU matmul) sampler — on this TPU stack dynamic
gathers run at ~0.06 G elem/s and every lax.scan iteration carries a
~0.4 ms floor, so trial energies are computed as batched matmuls against a
ghost-extended position set (docs/tpu_notes.md, sampler/dense.py).

Timing protocol (docs/tpu_notes.md §0, corrected in round 2):
block_until_ready LIES before the first device readback on this stack
(returns without waiting), so the bench forces ONE readback after
warmup+equilibration — which also switches the process into its honest
(and faster) execution regime — and then times n2-n1 chunks between two
readback barriers. Verified by A/B in fresh processes: post-readback
chunk times are stable (4.7 s/chunk) while pre-readback "timings" are
unawaited-enqueue fiction.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# persistent compile cache: repeat bench invocations skip the ~2-4 min
# compile (verified not to affect correctness or timing on this stack)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, "/root/repo")

from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops import cells as cells_ops
from neuralmelting_tpu.ops import ghosts as GH
from neuralmelting_tpu.sampler import dense as DS
from neuralmelting_tpu.sampler.state import ensemble_init

SWEEPS_PER_CHUNK = 10
BASELINE_TARGET = 1.0e8


def main():
    pot = LJCut.create()
    # 4 * (16*8*8) = 4096 atoms exactly (non-cubic fcc supercell)
    pos, box = make_supercell("fcc", 2.0 ** (2.0 / 3.0), (16, 8, 8))
    n = len(pos)
    npress, ntemp = 8, 8
    r = npress * ntemp
    t_grid = jnp.tile(jnp.linspace(0.7, 1.3, ntemp), npress)
    p_grid = jnp.repeat(jnp.linspace(1.0, 8.0, npress), ntemp)

    states = ensemble_init(pot, pos, box, 1234, t_grid, p_grid,
                           dpos0=0.11, dvol_frac0=0.002, dt0=0.005)
    cellcfg = cells_ops.make_cell_config(box, pot.rc_host, stride=4,
                                         dpos_cap=0.25)
    shell = pot.rc_host + 0.4
    gcap = GH.suggest_gcap(n, box, shell)
    gms = DS.build_ensemble_ghosts(states, shell, gcap)
    npasses = max(1, -(-n // cellcfg.ncells_total))

    sweep = DS.make_dense_sweep_fn(1.0, 1.0, cellcfg,
                                   npasses=npasses, nvol=1)
    vsweep = jax.vmap(sweep, in_axes=(None, None, 0, 0))
    table = jnp.asarray(cellcfg.active_table)

    @jax.jit
    def chunk(states, gms, pot, table):
        def body(carry, _):
            s, g, d = carry
            s, g, ds = vsweep(pot, table, s, g)
            d = d | jnp.max(ds)
            stale = jax.vmap(lambda gg: GH.needs_rebuild(gg, pot.rc))(g)
            g = jax.lax.cond(
                jnp.any(stale),
                lambda: jax.vmap(
                    lambda gg, b: GH.rewrap_rebuild(gg, b, shell, gcap)
                )(g, s.box),
                lambda: g)
            return (s, g, d), None

        (states, gms, diag), _ = jax.lax.scan(
            body, (states, gms, jnp.zeros((), jnp.int32)), None,
            length=SWEEPS_PER_CHUNK)
        return states, gms, diag

    # warmup/compile + equilibrate (block may lie pre-readback; the first
    # readback below drains everything enqueued so far)
    states, gms, diag = chunk(states, gms, pot, table)
    jax.block_until_ready(states.pos)

    n1, n2 = 2, 6
    for _ in range(n1):
        states, gms, diag = chunk(states, gms, pot, table)
    ntp_a = states.ntp + 0          # device-side counter snapshot
    ntv_a = states.ntv + 0
    _ = float(jnp.sum(states.pos))  # REQUIRED: drains the queue and makes
    t1 = time.perf_counter()        # all later barriers honest (notes §0)
    for _ in range(n2 - n1):
        states, gms, diag = chunk(states, gms, pot, table)
    _ = float(jnp.sum(states.pos))  # closing readback barrier
    t2 = time.perf_counter()

    # ---- timed region over; full readbacks now allowed ----
    diag_v = int(diag)
    sweeps_total = int(states.sweep[0])
    attempted = int(jnp.sum(states.ntp - ntp_a) + jnp.sum(states.ntv - ntv_a))
    dt_chunk = (t2 - t1) / (n2 - n1)
    rate = attempted / (t2 - t1)
    print(json.dumps({
        "metric": "mc_attempted_moves_per_sec_per_chip",
        "value": rate,
        "unit": "moves/s",
        "vs_baseline": rate / BASELINE_TARGET,
        "detail": {
            "natoms": n, "replicas": r,
            "sweeps_per_chunk": SWEEPS_PER_CHUNK,
            "attempted_moves": attempted,
            "sec_per_chunk": dt_chunk,
            "sweeps_total": sweeps_total,
            "diag": diag_v,
            "engine": "dense-mxu-ghost",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
