"""Melting-temperature extraction: sigmoid fit of P(liquid) vs T.

Reference: per pressure, scipy curve_fit of a logistic to the classifier's
mean liquid probability across temperatures; its midpoint is T_m
(SURVEY.md §2.5). We fit the same logistic with a damped Gauss-Newton in
jnp (host scipy optional fallback), so the full melting curve extraction
can stay on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def logistic(t, tm, w):
    return 1.0 / (1.0 + jnp.exp(-(t - tm) / w))


def fit_melting_temperature(temps, probs, iters: int = 60):
    """Fit P(liquid)(T) = logistic((T - Tm)/w). Returns (tm, w).

    temps: (ntemp,); probs: (ntemp,) in [0,1].
    """
    temps = jnp.asarray(temps, jnp.float32)
    probs = jnp.asarray(probs, jnp.float32)
    # init: Tm at the 0.5 crossing (linear interp), w ~ grid spacing scale
    tm0 = temps[jnp.argmin(jnp.abs(probs - 0.5))]
    w0 = 0.25 * (temps[-1] - temps[0]) / max(len(temps) - 1, 1) * 4.0

    def residual(p):
        tm, lw = p
        return logistic(temps, tm, jnp.exp(lw)) - probs

    jac = jax.jacfwd(residual)

    def gn_step(p, _):
        r = residual(p)
        j = jac(p)                      # (ntemp, 2)
        jtj = j.T @ j + 1e-4 * jnp.eye(2)
        step = jnp.linalg.solve(jtj, j.T @ r)
        return p - step, jnp.sum(r * r)

    p0 = jnp.array([tm0, jnp.log(w0)])
    p, hist = jax.lax.scan(gn_step, p0, None, length=iters)
    tm, lw = p
    return tm, jnp.exp(lw)


def melting_curve(temps, probs_grid):
    """T_m per pressure row. probs_grid: (npress, ntemp) mean P(liquid)."""
    tms = []
    widths = []
    for row in np.asarray(probs_grid):
        tm, w = fit_melting_temperature(np.asarray(temps), row)
        tms.append(float(tm))
        widths.append(float(w))
    return np.asarray(tms), np.asarray(widths)


def crossing_resolved(temps, probs_grid, tms):
    """Per-row mask: did the data actually RESOLVE a 0.5 crossing?

    A logistic fit to a probability row that never spans 0.5 (e.g. an
    undercooled liquid that never refroze anywhere on the scanned grid,
    so P(liquid) ~ 1 at every T) has no crossing inside the data; the
    Gauss-Newton iterations then extrapolate T_m arbitrarily far outside
    the grid (negative reduced temperatures were observed on the LJ
    north-star cooling leg, round 5). Such a fit is a CENSORED
    observation — "the crossing, if any, lies outside [T_min, T_max]" —
    not an estimate, and must not enter brackets as a number.

    Resolved requires both (a) the row's probabilities span 0.5 and
    (b) the fitted midpoint lies inside the scanned grid (padded by one
    grid spacing, since a crossing in the outermost interval fits
    slightly outside).
    """
    temps = np.asarray(temps, np.float64)
    pad = (temps[-1] - temps[0]) / max(len(temps) - 1, 1)
    grid = np.asarray(probs_grid, np.float64)
    tms = np.asarray(tms, np.float64)
    spans = (grid.min(axis=1) < 0.5) & (grid.max(axis=1) > 0.5)
    in_grid = (tms >= temps[0] - pad) & (tms <= temps[-1] + pad)
    return spans & in_grid
