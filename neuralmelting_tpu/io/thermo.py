""".thrm text format: header + one line per record (SURVEY.md §2.5).

Format (version nm-thrm-1):
    # nm-thrm-1
    # <key> <value>            (one per header item, echoing run parameters)
    # columns: sweep temp press pe ke virial vol accp accv acch dpos dvol dt
    <i> <13 floats in %.9e>
Appending is cheap and the file doubles as a restart record, exactly like
the reference's append-only thermo output (SURVEY.md §5 checkpoint row).
"""

from __future__ import annotations

import io as _io
from typing import Dict, Optional

import numpy as np

from neuralmelting_tpu.io import native

COLUMNS = ("sweep", "temp", "press", "pe", "ke", "virial", "vol",
           "acc_pos", "acc_vol", "acc_hmc", "dpos", "dvol", "dt")

MAGIC = "# nm-thrm-1"


def write_header(f, params: Optional[Dict] = None):
    f.write(MAGIC + "\n")
    for k, v in (params or {}).items():
        f.write(f"# {k} {v}\n")
    f.write("# columns: " + " ".join(COLUMNS) + "\n")


def append_records(f, records: Dict[str, np.ndarray]):
    """records: mapping column -> (nrec,) array (ThermoRecord fields)."""
    cols = [np.asarray(records[c]).reshape(-1) for c in COLUMNS]
    nrec = cols[0].shape[0]
    for r in range(nrec):
        fields = [f"{int(cols[0][r]):d}"]
        fields += [f"{float(c[r]):.9e}" for c in cols[1:]]
        f.write(" ".join(fields) + "\n")


def write(path: str, records: Dict[str, np.ndarray],
          params: Optional[Dict] = None, append: bool = False):
    # native fast path (byte-identical; io/native), Python fallback below
    cols = [np.asarray(records[c], np.float64).reshape(-1) for c in COLUMNS]
    data = np.stack(cols, axis=1)
    hdr = _io.StringIO()
    if not append:
        write_header(hdr, params)
    if native.write_thermo_rows(path, data, hdr.getvalue(), append):
        return
    mode = "a" if append else "w"
    with open(path, mode) as f:
        if not append:
            write_header(f, params)
        append_records(f, records)


def read(path: str):
    """Parse a .thrm file -> (params dict, dict of column arrays)."""
    params = {}
    rows = []
    with open(path) as f:
        first = f.readline().strip()
        if first != MAGIC:
            raise ValueError(f"{path}: not a {MAGIC} file (got {first!r})")
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                body = line[1:].strip()
                if body.startswith("columns:"):
                    continue
                k, _, v = body.partition(" ")
                params[k] = v
            else:
                rows.append([float(x) for x in line.split()])
    if rows:
        arr = np.asarray(rows, np.float64)
    else:
        arr = np.zeros((0, len(COLUMNS)))
    data = {c: arr[:, i] for i, c in enumerate(COLUMNS)}
    data["sweep"] = data["sweep"].astype(np.int64)
    return params, data
