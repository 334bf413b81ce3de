#!/usr/bin/env python
"""Append an on-chip bench measurement to docs/bench_progression_r4.json.

Mid-round evidence discipline (VERDICT r3 next #9): every valid on-chip
measurement is committed immediately so a tunnel outage at the driver's
end-of-round capture can never zero the round. Reads bench.py's JSON line
on stdin (or as argv[1] path), extracts value/diag, appends with a note.

Usage: python bench.py | python scripts/record_progression.py "note text"
       python scripts/record_progression.py "note" result.json
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
_ROUND = os.environ.get("NM_ROUND", "5")
PATH = os.path.join(HERE, "..", "docs",
                    f"bench_progression_r{_ROUND}.json")


def main():
    note = sys.argv[1] if len(sys.argv) > 1 else ""
    if len(sys.argv) > 2:
        with open(sys.argv[2]) as f:
            text = f.read()
    else:
        text = sys.stdin.read()
    # bench output may have warnings around the JSON line: find it
    rec = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
    assert rec is not None, "no JSON line found in input"
    print(json.dumps(rec))      # passthrough for the console
    if os.path.exists(PATH):
        with open(PATH) as f:
            doc = json.load(f)
    else:
        doc = {
            "what": ("On-chip bench.py measurements during round 4 "
                     "(TPU v5 lite, north-star scale: R=1024 x 4096 "
                     "atoms, cellmc Pallas engine). Committed evidence "
                     "against tunnel outages at the driver's capture "
                     "moment (VERDICT r3 weak #1)."),
            "metric": rec.get("metric",
                              "mc_attempted_moves_per_sec_per_chip"),
            "runs": [],
        }
    detail = rec.get("detail", {})
    doc["runs"].append({
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "value": rec.get("value", 0),
        "diag": detail.get("diag", rec.get("diag")),
        "fast_recip": detail.get("fast_recip"),
        "e2e_moves_per_sec": detail.get("e2e_moves_per_sec"),
        "note": note,
    })
    with open(PATH, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(f"# recorded -> {os.path.normpath(PATH)}", file=sys.stderr)


if __name__ == "__main__":
    main()
