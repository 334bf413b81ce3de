#!/usr/bin/env python
"""Headline benchmark (BASELINE config 2): LJ 4096-atom NPT Metropolis MC,
vmapped 8x8 (P,T) replica grid on one chip; metric = attempted MC moves/sec.

Target (BASELINE.md): >= 1.0e8 attempted moves/sec/chip.
Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.ops import cells as cells_ops
from neuralmelting_tpu.ops import neighbors as NB
from neuralmelting_tpu.parallel import ensemble as ENS
from neuralmelting_tpu.sampler import checkerboard as CB
from neuralmelting_tpu.sampler.state import ensemble_init

N_SWEEPS = 50
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
    cellcfg = cells_ops.make_cell_config(box, float(pot.rc), stride=4,
                                         dpos_cap=0.25)
    nls, cap = ENS.build_ensemble_nl(pot, states, skin=0.4)
    npasses = CB.default_npasses(n, cellcfg)

    aux = ENS.build_ensemble_aux(pot, states, nls)
    sweep = CB.make_cb_sweep_fn(1.0, 1.0, cellcfg,
                                npasses=npasses, nvol=1)
    vsweep = jax.vmap(sweep, in_axes=(None, None, 0, 0, 0))
    table = jnp.asarray(cellcfg.active_table)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def run_chunk(states, nls, aux, pot, table):
        rlist = pot.rc + 0.4
        vbuild = jax.vmap(lambda p, b: NB.build(p, b, rlist, cap))
        vstale = jax.vmap(
            lambda nl, p, b: NB.needs_rebuild(nl, p, b, pot.rc))

        def body(carry, _):
            s, nl, ax = carry
            s, ax, _ = vsweep(pot, table, s, nl, ax)
            stale = vstale(nl, s.pos, s.box)
            nl = jax.lax.cond(jnp.any(stale),
                              lambda: vbuild(s.pos, s.box),
                              lambda: nl)
            return (s, nl, ax), None

        (states, nls, aux), _ = jax.lax.scan(body, (states, nls, aux), None,
                                             length=N_SWEEPS)
        return states, nls, aux

    def tries(states):
        return int(jnp.sum(states.ntp) + jnp.sum(states.ntv)
                   + jnp.sum(states.nth))

    # warmup/compile + equilibrate off the lattice
    states, nls, aux = run_chunk(states, nls, aux, pot, table)
    jax.block_until_ready(states.pos)

    t0 = tries(states)
    start = time.perf_counter()
    states, nls, aux = run_chunk(states, nls, aux, pot, table)
    jax.block_until_ready(states.pos)
    dt = time.perf_counter() - start

    attempted = tries(states) - t0
    rate = attempted / dt
    print(json.dumps({
        "metric": "mc_attempted_moves_per_sec_per_chip",
        "value": rate,
        "unit": "moves/s",
        "vs_baseline": rate / BASELINE_TARGET,
        "detail": {
            "natoms": n, "replicas": r, "sweeps": N_SWEEPS,
            "attempted_moves": attempted, "seconds": dt,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
