"""Test harness config: force CPU with 8 virtual devices.

Multi-chip sharding (tempering over the mesh) is tested on a fake 8-device
CPU mesh per SURVEY.md §4.4; the real-TPU path is exercised by bench.py.
This must run before any test module imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The harness environment force-selects an experimental TPU platform via
# sitecustomize + JAX_PLATFORMS=axon; the config update below overrides it
# even after that plugin registered.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
