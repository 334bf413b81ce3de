"""Readback-safe device timing.

On this TPU stack any device->host readback permanently degrades the
process and block_until_ready does not reliably block before the first
readback (docs/tpu_notes.md §0). DeviceTimer encapsulates the safe
protocol used by bench.py: wall-clock spans closed by a forced-readback
barrier, with all diagnostics deferred until `finish()`.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List


class DeviceTimer:
    def __init__(self):
        self._spans: List[Dict[str, Any]] = []
        self._open = None

    def start(self, name: str):
        self._open = (name, time.perf_counter())

    def stop_with_barrier(self, barrier_array):
        """Ends the open span by FORCING completion via a scalar readback.

        Only call once all hot device work that must stay fast has been
        enqueued — the first readback poisons the process.
        """
        import jax.numpy as jnp
        _ = float(jnp.sum(barrier_array))
        name, t0 = self._open
        self._spans.append({"name": name,
                            "seconds": time.perf_counter() - t0})
        self._open = None

    def finish(self) -> List[Dict[str, Any]]:
        return list(self._spans)
