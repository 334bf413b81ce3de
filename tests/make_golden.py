"""Generate the BASELINE config-1 golden files: LJ NPT Metropolis MC,
256 atoms, single (P,T) point, fixed seed, serial-exact sampler on CPU.

Usage: python tests/make_golden.py [outdir]   (default tests/golden/)
"""

import os
import sys

os.environ.setdefault("NM_NATIVE_IO", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from neuralmelting_tpu.io import thermo, traj
from neuralmelting_tpu.models.lattice import make_supercell
from neuralmelting_tpu.models.lj import LJCut
from neuralmelting_tpu.sampler import driver, moves, serial
from neuralmelting_tpu.sampler.state import init_state


def main(outdir):
    pot = LJCut.create()
    pos, box = make_supercell("fcc", 2.0 ** (2.0 / 3.0), 4)  # 256 atoms
    state = init_state(pot, pos, box, jax.random.key(256), temp=0.8,
                       press=2.0, dpos0=0.125, dvol_frac0=0.015625,
                       dt0=0.005)
    sweep = serial.make_sweep_fn(kb=1.0, p2e=1.0,
                                 backend=moves.brute_backend(),
                                 ppos=0.96875, pvol=0.03125, nstps=16,
                                 mass=1.0)
    run = driver.make_run_fn(sweep, kb=1.0, mod=4, nrecords=4)
    state, recs, frames = run(pot, state)

    os.makedirs(outdir, exist_ok=True)
    rows = {c: np.asarray(getattr(recs, c)) for c in thermo.COLUMNS}
    thermo.write(os.path.join(outdir, "config1.thrm"), rows,
                 params={"element": "LJ", "natoms": 256,
                         "config": "baseline-config1 seed=256"})
    traj.write(os.path.join(outdir, "config1.traj"),
               np.asarray(frames[0]), np.asarray(frames[1]),
               sweeps=rows["sweep"].astype(np.int64))
    print(f"golden files written to {outdir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden"))
