"""Chebyshev-series EAM for the Pallas kernels: gather-free, sqrt-free.

The cubic-spline tables (models/eam.py) are exact but each evaluation
gathers a coefficient row by bin index — the op this TPU stack runs three
orders of magnitude below HBM speed, and one Mosaic cannot express at all
for per-lane indices. This module refits the three EAM functions as
global Chebyshev series evaluated by Clenshaw recurrence (pure FMAs):

    phi_u(u)  ~ phi(sqrt(u))      on u in [r_lo^2, rc^2]   (u = r^2!)
    rho_u(u)  ~ f_rho(sqrt(u))    on u in [r_lo^2, rc^2]
    F_q(q)    ~ F(q^2)            on q = sqrt(rho) in [0, sqrt(rho_hi)]

(F is fit in q = sqrt(rho): physical embedding functions behave like
-A*sqrt(rho) near zero density, which a polynomial in rho cannot touch —
the q-variable makes F_q analytic and the fit drops from ~0.14 eV max
error to the requested tolerance.)

Working in u = r^2 removes the sqrt from the hot path entirely. Below
r_lo (chosen where phi reaches ~50 eV) the series is clamped flat: a pair
that close carries beta*E >> 100, so every such trial is rejected and the
missing repulsive slope is unobservable to Metropolis MC.

Degrees are chosen adaptively to hit ``tol`` (default 1e-5 eV — three
orders below kT at melting); the achieved max errors are recorded on the
dataclass so runs can report exactly which potential they sampled. The
kernels sample the CHEBYSHEV potential self-consistently (increments,
totals, virials all from the same series), so there is no drift between
incremental and record energetics; the fit error is a tiny, documented
perturbation of the tabulated potential, not a sampling bias.

``tol`` is also the EAM kernel's #1 throughput lever (docs/tpu_notes.md
§7): ~76% of sweep-kernel ops are Clenshaw terms of the two pair series,
and their degree-vs-error curve is algebraic (the source tables are C^2
cubic splines, so NO variable change reaches spectral convergence — the
r-basis refit was measured at the same 37 terms as the u-basis). The
spline tables cap out near max-degree 37 at ~6e-5 eV; relaxing tol to
2e-4 eV cuts phi/rho to ~21 terms. Set NM_EAM_TOL to override the
default without touching call sites; the sampled potential's actual max
fit errors are always on ``fit_err``.

Derivative series (d/du, scaled to the fit interval) provide the virial:
r dphi/dr = 2u phi_u'(u), and the embedding part (F'_i + F'_j) 2u rho_u'.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import struct
from numpy.polynomial import chebyshev as C

from neuralmelting_tpu.models.eam import EAMAlloy, spline_eval


@struct.dataclass
class EAMCheb:
    """Chebyshev EAM (traced pytree; series ride as jit arguments)."""
    rc: jnp.ndarray          # () cutoff
    u_lo: jnp.ndarray        # () fit floor in u = r^2
    u_hi: jnp.ndarray        # () = rc^2
    rho_hi: jnp.ndarray      # () embedding fit ceiling (in rho)
    q_lo: jnp.ndarray        # () embedding fit floor (in q = sqrt(rho))
    c_phi: jnp.ndarray       # (dp+1,) phi(sqrt u)
    c_phid: jnp.ndarray      # (dp+1,) d/du of phi series (zero-padded)
    c_rho: jnp.ndarray       # (dr+1,) f_rho(sqrt u)
    c_rhod: jnp.ndarray      # (dr+1,)
    c_f: jnp.ndarray         # (df+1,) F(q^2), q = sqrt(rho)
    c_fd: jnp.ndarray        # (df+1,) dF/dq series
    rc_host: float = struct.field(pytree_node=False, default=6.0)
    fit_err: tuple = struct.field(pytree_node=False, default=())

    @property
    def kind(self) -> str:
        return "eam-cheb"


def _fit(fn, a, b, tol, max_deg=30, samples=4000):
    """Least-squares Chebyshev fit of fn on [a, b] to max-error tol."""
    x = np.linspace(a, b, samples)
    y = fn(x)
    for deg in range(8, max_deg + 1, 2):
        t = 2.0 * (x - a) / (b - a) - 1.0
        c = C.chebfit(t, y, deg)
        err = float(np.max(np.abs(C.chebval(t, c) - y)))
        if err < tol:
            return c, err
    return c, err


def _der(c, a, b):
    """Series of d/dx on [a, b] (chain rule for the interval map)."""
    d = C.chebder(c) * (2.0 / (b - a))
    return np.concatenate([d, [0.0]])


def from_spline(eam: EAMAlloy, tol: float = None,
                phi_cap: float = 50.0) -> EAMCheb:
    """Refit an EAMAlloy's spline tables as Chebyshev series.

    tol: max fit error target in eV (series degrees adapt to it; see
    module docstring). None -> $NM_EAM_TOL if set, else 2e-4 — the
    production default adopted in round 5: +28% kernel throughput over
    the old 1e-5 request (which the spline tables can't meet anyway;
    fits maxed out at 37 terms / ~6e-5 eV), with the config-3 T_m
    moving 0.3% (1766.3 K vs 1771.9 K, inside the 0.4% cross-engine
    agreement band; tol=5e-4 measured at +46% but 0.95% T_m shift and
    was declined). Pass tol=1e-5 explicitly for max-fidelity oracles."""
    if tol is None:
        import os
        tol = float(os.environ.get("NM_EAM_TOL", "2e-4"))
    rc = float(eam.rc_host)
    dr = float(np.asarray(eam.dr))
    drho = float(np.asarray(eam.drho))
    nr = eam.rho_coef.shape[1] + 1
    nrho = eam.f_coef.shape[1] + 1

    def sp(coef, dx):
        return lambda x: np.asarray(spline_eval(coef, dx,
                                                jnp.asarray(x))[0])

    rphi = sp(eam.rphi_coef, dr)
    frho = sp(eam.rho_coef, dr)
    femb = sp(eam.f_coef, drho)

    # r_lo: where phi = rphi/r crosses phi_cap (scan from rc down)
    rr = np.linspace(0.05 * rc, rc, 2000)
    phi = rphi(rr) / rr
    above = np.nonzero(phi > phi_cap)[0]
    r_lo = rr[above[-1] + 1] if len(above) else rr[0]
    a, b = float(r_lo) ** 2, rc * rc

    c_phi, e_phi = _fit(lambda u: rphi(np.sqrt(u)) / np.sqrt(u), a, b,
                        tol, max_deg=36)
    c_rho, e_rho = _fit(lambda u: frho(np.sqrt(u)), a, b, tol)
    rho_hi = (nrho - 1) * drho
    q_hi = float(np.sqrt(rho_hi))
    # floor the fit at 2% of the table range: natural cubic splines of the
    # sqrt-like embedding wiggle in the first grid intervals near rho=0,
    # and bulk densities never come near that corner (clamped below q_lo)
    q_lo = 0.141 * q_hi          # rho_lo = 2% of rho_hi
    c_f, e_f = _fit(lambda q: femb(q * q), q_lo, q_hi, tol, max_deg=36)

    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return EAMCheb(
        rc=f32(rc), u_lo=f32(a), u_hi=f32(b), rho_hi=f32(rho_hi),
        q_lo=f32(q_lo),
        c_phi=f32(c_phi), c_phid=f32(_der(c_phi, a, b)),
        c_rho=f32(c_rho), c_rhod=f32(_der(c_rho, a, b)),
        c_f=f32(c_f), c_fd=f32(_der(c_f, q_lo, q_hi)),
        rc_host=rc,
        fit_err=(float(e_phi), float(e_rho), float(e_f)))


def cheb_eval(c, a, b, x):
    """Clenshaw evaluation of a Chebyshev series on [a, b] (jnp; the same
    recurrence the kernel runs — reference implementation for tests).
    Clamps x into [a, b]: below-range pairs are impossibly repulsive and
    rejected regardless, above-range is masked by the cutoff."""
    x = jnp.clip(x, a, b)
    t = 2.0 * (x - a) / (b - a) - 1.0
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for k in range(c.shape[0] - 1, 0, -1):
        b1, b2 = 2.0 * t * b1 - b2 + c[k], b1
    return t * b1 - b2 + c[0]
