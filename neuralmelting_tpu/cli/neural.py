"""Stage 4 — phase classifier + T_m extraction
(reference: lammps_neural.py; SURVEY.md §2.5).

    python -m neuralmelting_tpu.cli.neural -i out/remcmc.lj.fcc.4x4x4.rdf.npz
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu.neural import (get_scaler, PhaseCNN, PhaseMLP,
                                      train_classifier)
from neuralmelting_tpu.neural.train import extreme_t_labels
from neuralmelting_tpu.neural.melt import melting_curve


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--input", required=True, help="rdf .npz")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--scaler", default="tanh",
                    choices=("minmax", "standard", "robust", "tanh"))
    ap.add_argument("--model", default="cnn", choices=("cnn", "mlp"))
    ap.add_argument("--band", type=int, default=0,
                    help="extreme-T training band width (default ntemp//8)")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    z = np.load(args.input, allow_pickle=True)
    g_mean = z["g_mean"]                          # (npress, ntemp, nbins)
    npress, ntemp, nbins = g_mean.shape
    temps = z["temp"] if z["temp"] is not None and z["temp"].ndim else None
    temp_grid = (np.asarray(temps)[0] if temps is not None
                 else np.arange(ntemp, dtype=float))

    band = args.band or max(1, ntemp // 8)
    sc = get_scaler(args.scaler)
    x = sc.fit_transform(jnp.asarray(g_mean.reshape(-1, nbins), jnp.float32))
    mask1, labels1 = extreme_t_labels(ntemp, band)
    mask = jnp.tile(mask1, npress)
    labels = jnp.tile(labels1, npress)
    net = PhaseCNN() if args.model == "cnn" else PhaseMLP()
    res = train_classifier(net, x, mask, labels, jax.random.key(args.seed),
                           epochs=args.epochs, lr=args.lr)
    probs = np.asarray(res.probs).reshape(npress, ntemp)
    tms, widths = melting_curve(temp_grid, probs)

    out = args.out or args.input.replace(".rdf.npz", ".melt.npz")
    np.savez_compressed(out, probs=probs, tm=tms, width=widths,
                        temp=temp_grid,
                        press=(z["press"][:, 0] if z["press"] is not None
                               and np.ndim(z["press"]) else
                               np.arange(npress, dtype=float)),
                        losses=np.asarray(res.losses))
    print(f"T_m per pressure: {tms} -> {out}")


if __name__ == "__main__":
    main()
