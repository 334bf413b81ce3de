"""Structured JSONL run metrics.

The reference's only observability was its thermo text files and stdout
prints (SURVEY.md §5). The text formats are preserved for physics parity
(io/thermo.py); this logger adds machine-readable JSONL events (moves/sec,
exchange acceptance, rebuild counts, wall time) alongside them.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    """Append-only JSONL event log; no-op when path is None."""

    def __init__(self, path: Optional[str] = None, run_id: str = ""):
        self.path = path
        self.run_id = run_id
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, event: str, **fields):
        if not self.path:
            return
        rec = {"t": round(time.time() - self._t0, 3), "event": event}
        if self.run_id:
            rec["run"] = self.run_id
        rec.update(fields)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    @staticmethod
    def read(path: str):
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
