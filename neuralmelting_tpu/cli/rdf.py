"""Stage 3 — structural features from parsed trajectories
(reference: lammps_rdf.py; SURVEY.md §2.5).

    python -m neuralmelting_tpu.cli.rdf -i out/remcmc.lj.fcc.4x4x4.parsed.npz
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu.features import rdf_frames, structure_factor, density


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--input", required=True, help="parsed .npz")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--nbins", type=int, default=64)
    ap.add_argument("--cut", type=int, default=0,
                    help="burn-in records to discard")
    args = ap.parse_args(argv)

    z = np.load(args.input)
    pos = z["positions"]        # (npress, ntemp, nrec, N, 3)
    boxes = z["boxes"]          # (npress, ntemp, nrec, 3)
    npress, ntemp, nrec, natoms, _ = pos.shape
    cut = min(args.cut, nrec - 1)
    pos = pos[:, :, cut:]
    boxes = boxes[:, :, cut:]
    rmax = 0.48 * float(boxes.min())

    flat_p = jnp.asarray(pos.reshape(-1, natoms, 3), jnp.float32)
    flat_b = jnp.asarray(boxes.reshape(-1, 3), jnp.float32)
    g = np.asarray(rdf_frames(flat_p, flat_b, args.nbins, rmax))
    g = g.reshape(npress, ntemp, -1, args.nbins)
    g_mean = g.mean(axis=2)                                  # (np, nt, nbins)
    q, sq = structure_factor(jnp.asarray(g_mean.reshape(-1, args.nbins)),
                             jnp.asarray(boxes.mean(axis=2).reshape(-1, 3)),
                             natoms, rmax)
    rho = np.asarray(density(jnp.asarray(boxes), natoms)).mean(axis=2)

    out = args.out or args.input.replace(".parsed.npz", ".rdf.npz")
    np.savez_compressed(out, g=g, g_mean=g_mean,
                        sq=np.asarray(sq).reshape(npress, ntemp, -1),
                        q=np.asarray(q), rho=rho, rmax=rmax,
                        temp=z["temp"][:, :, 0] if "temp" in z else None,
                        press=z["press"][:, :, 0] if "press" in z else None)
    print(f"features -> {out} (g {g.shape}, rmax={rmax:.3f})")


if __name__ == "__main__":
    main()
