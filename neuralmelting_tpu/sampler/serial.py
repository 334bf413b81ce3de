"""Serial-compatible NPT Metropolis sweep.

Reproduces the reference's move-by-move semantics (SURVEY.md §3.1
``gen_sample``): one sweep = N attempts; each attempt draws its move type
against cumulative probabilities (p_pos, p_vol, p_hmc), then runs a
single-particle displacement, a volume trial, or an HMC trajectory. This is
the golden-file path (BASELINE config 1) — the high-throughput path is
``neuralmelting_tpu.sampler.checkerboard``.

RNG contract (replicated exactly by refimpl/cpu_ref.py): per sweep,
``keys = split(state.key, N+1)``; ``keys[0]`` becomes the next state key;
attempt ``a`` uses ``kt, km = split(keys[1+a])`` for its type draw and move.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from neuralmelting_tpu.sampler import moves


def make_sweep_fn(kb, p2e, backend, ppos, pvol, nstps, mass):
    """Build ``sweep(pot, state) -> state`` for one serial sweep of N
    attempts. ``pot`` is a traced argument (docs/tpu_notes.md §1)."""

    def attempt(pot, state, key):
        kt, km = jax.random.split(key)
        u = jax.random.uniform(kt, (), jnp.float32)
        mtype = jnp.where(u < ppos, 0, jnp.where(u < ppos + pvol, 1, 2))
        state = jax.lax.switch(
            mtype,
            [
                lambda s: moves.position_move(pot, kb, backend, s, km),
                lambda s: moves.volume_move(pot, kb, p2e, backend, s, km),
                lambda s: moves.hmc_move(pot, kb, backend, s, km, nstps, mass),
            ],
            state,
        )
        return state, None

    def sweep(pot, state):
        n = state.pos.shape[0]
        keys = jax.random.split(state.key, n + 1)
        state = state.replace(key=keys[0])
        state, _ = jax.lax.scan(lambda s, k: attempt(pot, s, k),
                                state, keys[1:])
        return state.replace(sweep=state.sweep + 1)

    return sweep
