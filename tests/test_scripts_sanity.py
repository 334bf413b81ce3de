"""Sanity tripwires for the unattended entry points (bench.py, scripts/).

These files run on the chip window or at the driver's end-of-round
capture with nobody watching, so a crash there can zero a whole round's
evidence. Round 4 lost two bench attempts to a function-local
``import os`` inside ``bench.py:main`` that shadowed the module-level
import (UnboundLocalError at first use ABOVE the local import) — this
pins the whole class, plus the outage-record contract.
"""

import ast
import glob
import io
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENTRY_POINTS = sorted(
    glob.glob(os.path.join(REPO, "scripts", "*.py"))
    + [os.path.join(REPO, "bench.py"),
       os.path.join(REPO, "__graft_entry__.py")])


@pytest.mark.parametrize("path", ENTRY_POINTS,
                         ids=[os.path.basename(p) for p in ENTRY_POINTS])
def test_no_local_import_shadows_module_import(path):
    """A local ``import x`` anywhere in a function makes ``x`` local to
    the WHOLE function scope, so uses of the module-level ``x`` earlier
    in the function raise UnboundLocalError at runtime."""
    tree = ast.parse(open(path).read(), filename=path)
    mod_names = {a.asname or a.name.split(".")[0]
                 for n in tree.body if isinstance(n, (ast.Import,
                                                      ast.ImportFrom))
                 for a in n.names}
    offenders = []
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        for n in ast.walk(fn):
            if isinstance(n, (ast.Import, ast.ImportFrom)):
                for a in n.names:
                    nm = a.asname or a.name.split(".")[0]
                    if nm in mod_names:
                        offenders.append(f"{fn.name}:{n.lineno} -> {nm}")
    assert not offenders, (
        f"{os.path.basename(path)} has function-local imports shadowing "
        f"module-level imports (UnboundLocalError hazard): {offenders}")


def test_bench_outage_record_is_valid_json(monkeypatch, capsys):
    """bench.py must emit ONE parseable JSON line (with last_good
    context) when the TPU backend is unavailable — the driver records
    whatever main() prints, crash tracebacks included."""
    sys.path.insert(0, REPO)
    import bench
    monkeypatch.setenv("NM_BENCH_WAIT_SECS", "0")
    monkeypatch.setattr(bench, "_port_open", lambda *a, **k: False)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["metric"] == "mc_attempted_moves_per_sec_per_chip"
    assert rec["value"] == 0 and "error" in rec
    # the committed r3/r4 progression files must surface as last_good
    assert rec["last_good"] and rec["last_good"]["value"] > 0
