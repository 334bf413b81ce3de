"""Adaptive step-size control (SURVEY.md §2.4 'Adaptive step sizes').

Every ``mod`` sweeps each of dpos/dvol/dt is multiplied by ``factor`` if its
window acceptance ratio exceeds its target, divided by ``factor`` otherwise
(the reference's exact factors are unrecorded — SURVEY.md flags them [LOW] —
so the factor is a config knob, default 1.0625). Branchless `where`
arithmetic keeps this fused inside the sampling scan.
"""

from __future__ import annotations

import jax.numpy as jnp


def _adapt_one(d, nacc, ntry, target, factor, lo, hi):
    ratio = nacc.astype(jnp.float32) / jnp.maximum(ntry, 1).astype(jnp.float32)
    scaled = jnp.where(ratio > target, d * factor, d / factor)
    d_new = jnp.where(ntry > 0, scaled, d)
    return jnp.clip(d_new, lo, hi)


def adapt_step_sizes(state, targets=(0.5, 0.5, 0.5), factor=1.0625):
    """Returns state with updated dpos/dvol/dt and zeroed window counters."""
    tp, tv, th = targets
    boxmin = jnp.min(state.box)
    vol = jnp.prod(state.box)
    dpos = _adapt_one(state.dpos, state.nap, state.ntp, tp, factor,
                      1e-5 * boxmin, 0.25 * boxmin)
    dvol = _adapt_one(state.dvol, state.nav, state.ntv, tv, factor,
                      1e-8 * vol, 0.5 * vol)
    dt = _adapt_one(state.dt, state.nah, state.nth, th, factor,
                    1e-8, 1e3)
    zero = jnp.zeros((), jnp.int32)
    return state.replace(dpos=dpos, dvol=dvol, dt=dt,
                         nap=zero, ntp=zero, nav=zero, ntv=zero,
                         nah=zero, nth=zero)
