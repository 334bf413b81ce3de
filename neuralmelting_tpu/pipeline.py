"""Fused on-device melting-curve pipeline.

The reference ran five scripts connected by text files and pickles
(SURVEY.md §1). Here sampling, featurization, classification, and
melting-point inference run back-to-back on device from one call —
trajectories never leave HBM (BASELINE north star). The staged file-based
flow is still available via neuralmelting_tpu.cli for reference parity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu import runner
from neuralmelting_tpu.config import RunConfig
from neuralmelting_tpu.features import rdf_frames, structure_factor
from neuralmelting_tpu.neural import (get_scaler, PhaseCNN, PhaseMLP,
                                      train_classifier)
from neuralmelting_tpu.neural.train import extreme_t_labels
from neuralmelting_tpu.neural.melt import melting_curve


@dataclasses.dataclass
class MeltingResult:
    press: np.ndarray          # (npress,)
    temp: np.ndarray           # (ntemp,)
    tm: np.ndarray             # (npress,) melting temperatures
    width: np.ndarray          # (npress,) sigmoid widths
    probs: np.ndarray          # (npress, ntemp) P(liquid)
    g_slot: np.ndarray         # (R, nbins) mean g(r) per slot
    sq_slot: np.ndarray        # (R, nq) S(q) per slot
    q: np.ndarray
    rmax: float
    losses: np.ndarray
    xacc: np.ndarray
    diag: int
    classifier: Optional[tuple] = None   # (net, params, fitted scaler)


def slot_order_features(values, hist):
    """Reorder per-replica per-record features into slot order.

    values: (nrec, R, ...); hist: (nrec, R) replica->slot.
    Returns (nrec, R, ...) where axis 1 is the SLOT index.
    """
    hist = np.asarray(hist)
    nrec, r = hist.shape
    out = np.empty_like(np.asarray(values))
    vals = np.asarray(values)
    for k in range(nrec):
        perm = np.argsort(hist[k])   # slot -> replica
        out[k] = vals[k][perm]
    return out


def melting_pipeline(cfg: RunConfig, setfl: Optional[str] = None,
                     nbins: int = 64, scaler: str = "tanh",
                     model: str = "cnn", band: int = 0,
                     epochs: int = 400, lr: float = 2e-3,
                     seed: int = 0, engine: str = "gather",
                     init: str = "lattice",
                     classify_with: Optional[MeltingResult] = None
                     ) -> MeltingResult:
    """init="liquid" pre-melts every replica (runner.liquid_start) so
    the classifier crossing is the refreeze (cooling-leg) estimate; the
    default lattice start gives the heating-leg (superheated) estimate.
    Run both to bracket T_m (docs/VALIDATION.md hysteresis brackets).

    classify_with: REQUIRED for init="liquid" — the heating leg's
    result, whose trained classifier + fitted scaler are applied to
    this run's features. Extreme-temperature labels are only valid on
    a lattice-start run (the bottom band is crystal BY CONSTRUCTION);
    an undercooled liquid that has not refrozen makes the bottom-band
    "solid" label false, and a classifier trained on those labels
    reports an inverted, meaningless crossing (measured: fast-tier
    cooling leg came out ABOVE the heating leg before this guard)."""
    if init == "liquid" and classify_with is None:
        raise ValueError(
            "init='liquid' requires classify_with=<heating-leg result>: "
            "extreme-T labels are invalid on a liquid start (see docstring)")
    setup = runner.setup_run(cfg, setfl, engine=engine)
    box0 = np.asarray(setup.states.box[0])
    rmax = 0.48 * float(box0.min())
    if init == "liquid":
        setup = runner.liquid_start(setup)

    setup, recs, frames, hist, xacc, diag = runner.run_sampling(
        setup, write_files=False, write_traj=True)

    # --- features: g(r) per recorded frame, slot-ordered, burn-in cut
    pos, boxes = frames                          # (nrec, R, N, 3), (nrec, R, 3)
    nrec, r = pos.shape[0], pos.shape[1]
    g = jax.vmap(lambda p, b: rdf_frames(p, b, nbins, rmax))(pos, boxes)
    g_slot = slot_order_features(np.asarray(g), hist)     # (nrec, R, nbins)
    box_slot = slot_order_features(np.asarray(boxes), hist)
    cut = min(cfg.ncut, nrec - 1)
    feats = jnp.asarray(g_slot[cut:].mean(axis=0), jnp.float32)  # (R, nbins)
    box_mean = jnp.asarray(box_slot[cut:].mean(axis=0))

    q, sq = structure_factor(feats, box_mean, setup.natoms, rmax)

    npress, ntemp = len(setup.press), len(setup.temp)
    if classify_with is not None:
        # apply the heating leg's classifier in ITS feature space
        net, params, sc = classify_with.classifier
        x = sc.transform(feats)
        probs = np.asarray(jax.nn.sigmoid(net.apply(params, x)))
        probs = probs.reshape(npress, ntemp)
        losses = np.zeros((0,), np.float32)
        clf = classify_with.classifier
    else:
        # --- classifier with extreme-temperature labels
        if band <= 0:
            band = max(1, ntemp // 8)
        sc = get_scaler(scaler)
        x = sc.fit_transform(feats)
        mask1, labels1 = extreme_t_labels(ntemp, band)
        mask = jnp.tile(mask1, npress)
        labels = jnp.tile(labels1, npress)
        net = PhaseCNN() if model == "cnn" else PhaseMLP()
        res = train_classifier(net, x, mask, labels, jax.random.key(seed),
                               epochs=epochs, lr=lr)
        probs = np.asarray(res.probs).reshape(npress, ntemp)
        losses = np.asarray(res.losses)
        clf = (net, res.params, sc)

    # --- melting temperatures per pressure
    tms, widths = melting_curve(setup.temp, probs)

    return MeltingResult(
        press=setup.press, temp=setup.temp, tm=tms, width=widths,
        probs=probs, g_slot=np.asarray(feats), sq_slot=np.asarray(sq),
        q=np.asarray(q), rmax=rmax, losses=losses,
        xacc=np.asarray(xacc), diag=int(diag), classifier=clf)
