"""Ensemble checkpoint/restart.

The reference's only restart story was its append-only text outputs
(SURVEY.md §5). Here the FULL replica-ensemble state — positions, boxes,
RNG keys, step sizes, counters, slot permutation, config — is snapshotted
to a single .npz; any run is restartable bit-exactly from it (BASELINE
"state layout (positions, box, seed)").
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu.sampler.state import MCState

_FIELDS = ("pos", "box", "pe", "virial", "temp", "press",
           "dpos", "dvol", "dt", "nap", "ntp", "nav", "ntv", "nah", "nth",
           "sweep")


def save(path: str, states: MCState, slot_of, config_json: str = "{}",
         extra: dict = None, compress: bool = False):
    """compress=False by default: deflate on ~50 MB of equilibrated f32
    positions buys <10% size for seconds of single-core CPU per save —
    measured as a major contributor to the round-4 northstar's 26x
    orchestration overhead (VERDICT r4 weak #1)."""
    arrays = {f: np.asarray(getattr(states, f)) for f in _FIELDS}
    arrays["key_data"] = np.asarray(jax.random.key_data(states.key))
    arrays["slot_of"] = np.asarray(slot_of)
    for k, v in (extra or {}).items():
        arrays["x_" + k] = np.asarray(v)
    writer = np.savez_compressed if compress else np.savez
    writer(path, config=np.frombuffer(
        config_json.encode(), dtype=np.uint8), **arrays)


def load(path: str):
    """Returns (states, slot_of, config_json, extra_dict)."""
    z = np.load(path)
    kwargs = {f: jnp.asarray(z[f]) for f in _FIELDS}
    kwargs["key"] = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
    states = MCState(**kwargs)
    slot_of = jnp.asarray(z["slot_of"])
    config_json = bytes(z["config"]).decode() if "config" in z else "{}"
    extra = {k[2:]: z[k] for k in z.files if k.startswith("x_")}
    return states, slot_of, config_json, extra
