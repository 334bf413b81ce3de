"""Phase classifier + melting-temperature extraction oracles."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from neuralmelting_tpu.neural import (get_scaler, PhaseCNN, PhaseMLP,
                                      train_classifier,
                                      fit_melting_temperature)
from neuralmelting_tpu.neural.train import extreme_t_labels
from neuralmelting_tpu.neural.melt import melting_curve, logistic


def test_scalers():
    x = jnp.asarray(np.random.default_rng(0).normal(3.0, 2.0, (50, 7)))
    mm = get_scaler("minmax").fit_transform(x)
    assert float(mm.min()) >= 0 and float(mm.max()) <= 1
    st = get_scaler("standard").fit_transform(x)
    np.testing.assert_allclose(np.asarray(st).mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st).std(0), 1, atol=1e-4)
    rb = get_scaler("robust").fit_transform(x)
    assert np.isfinite(np.asarray(rb)).all()
    th = get_scaler("tanh").fit_transform(x)
    assert float(th.min()) >= 0 and float(th.max()) <= 1


def test_extreme_t_labels():
    mask, labels = extreme_t_labels(8, 2)
    np.testing.assert_array_equal(np.asarray(mask),
                                  [1, 1, 0, 0, 0, 0, 1, 1])
    np.testing.assert_array_equal(np.asarray(labels),
                                  [0, 0, 0, 0, 0, 0, 1, 1])


def _synthetic_rdf_dataset(npress=2, ntemp=10, nbins=32, seed=0):
    """Fake g(r) features: 'solid' has sharp peaks, 'liquid' smooth; the
    transition point varies with pressure."""
    rng = np.random.default_rng(seed)
    r = np.linspace(0.05, 3.0, nbins)
    solid = np.exp(-((r - 1.1) ** 2) / 0.003) + 0.7 * np.exp(
        -((r - 1.6) ** 2) / 0.004)
    liquid = 0.8 * np.exp(-((r - 1.15) ** 2) / 0.05)
    feats = np.zeros((npress, ntemp, nbins))
    t_melt_true = [4.2, 6.1]  # in "temperature index" units
    temps = np.arange(ntemp, dtype=float)
    for p in range(npress):
        for t in range(ntemp):
            frac = 1 / (1 + np.exp(-(t - t_melt_true[p]) / 0.35))
            feats[p, t] = ((1 - frac) * solid + frac * liquid
                           + 0.02 * rng.normal(size=nbins))
    return temps, jnp.asarray(feats.reshape(-1, nbins), jnp.float32), t_melt_true


@pytest.mark.slow
def test_classifier_recovers_melting_point():
    npress, ntemp = 2, 10
    temps, feats, t_true = _synthetic_rdf_dataset(npress, ntemp)
    scaler = get_scaler("tanh")
    x = scaler.fit_transform(feats)
    mask1, labels1 = extreme_t_labels(ntemp, 2)
    mask = jnp.tile(mask1, npress)
    labels = jnp.tile(labels1, npress)
    model = PhaseMLP(widths=(32, 16))
    res = train_classifier(model, x, mask, labels, jax.random.key(0),
                           epochs=400, lr=3e-3)
    assert float(res.losses[-1]) < 0.1
    probs = np.asarray(res.probs).reshape(npress, ntemp)
    tms, _ = melting_curve(temps, probs)
    np.testing.assert_allclose(tms, t_true, atol=0.6)


@pytest.mark.slow
def test_cnn_shape():
    model = PhaseCNN(features=(8, 16), dense=16)
    x = jnp.zeros((5, 64))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (5,)


def test_sigmoid_fit_exact():
    t = jnp.linspace(0.0, 10.0, 21)
    probs = logistic(t, 6.3, 0.8)
    tm, w = fit_melting_temperature(t, probs)
    np.testing.assert_allclose(float(tm), 6.3, atol=0.01)
    np.testing.assert_allclose(float(w), 0.8, rtol=0.05)


def test_sigmoid_fit_noisy():
    rng = np.random.default_rng(3)
    t = jnp.linspace(0.5, 2.5, 16)
    probs = jnp.clip(logistic(t, 1.4, 0.12)
                     + 0.05 * jnp.asarray(rng.normal(size=16)), 0, 1)
    tm, w = fit_melting_temperature(t, probs)
    np.testing.assert_allclose(float(tm), 1.4, atol=0.08)

def test_crossing_resolved_censors_no_crossing_rows():
    """A row that never spans 0.5 (e.g. an undercooled liquid that never
    refroze on-grid) must be flagged unresolved — the round-5 LJ cooling
    leg fitted NEGATIVE reduced temperatures from exactly such rows."""
    from neuralmelting_tpu.neural.melt import crossing_resolved
    t = np.linspace(0.55, 1.55, 32)
    good = np.asarray(logistic(jnp.asarray(t), 0.9, 0.05))   # real crossing
    all_liquid = np.full(32, 0.97)                           # no crossing
    all_solid = np.full(32, 0.03)
    probs = np.stack([good, all_liquid, all_solid])
    tms, _ = melting_curve(t, probs)
    resolved = crossing_resolved(t, probs, tms)
    assert resolved.tolist() == [True, False, False]
    # an in-grid tm computed from a non-spanning row is still censored
    assert not crossing_resolved(t, all_solid[None], np.array([1.0]))[0]
