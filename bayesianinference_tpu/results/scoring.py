"""Proper scoring rules and calibration checks for predictive laws.

Beyond-reference subsystem: the reference stops at producing
``predictiveDistribution`` objects (BayesianStatistics.wl:1373-1483)
and leaves their evaluation to the user.  Production forecasting needs
the standard verification toolkit (Gneiting & Raftery 2007):

* :func:`crps` — continuous ranked probability score, with the CLOSED
  FORM for Gaussian mixtures (Grimit et al. 2006) that every
  :class:`~..dists.pointwise.PointwiseMixture`-of-Normals predictive
  (GP, BLR, regression predictives) hits — one [S, S] batched matmul
  shape per point, no sampling noise — and an energy-form Monte Carlo
  estimator for anything else.
* :func:`log_score` — negative predictive log density.
* :func:`pit` — probability integral transform values (uniform iff
  calibrated); :func:`interval_coverage` — empirical central-interval
  coverage + mean width at requested levels.
* :func:`dawid_sebastiani_score` — the (mean, variance)-only score for
  quick dashboards.

All scores are "smaller is better" and vectorized over query points.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm as _norm

from ..dists.pointwise import PointwiseMixture
from ..dists.scalar import Normal

__all__ = [
    "crps",
    "crps_gaussian_mixture",
    "crps_ensemble",
    "log_score",
    "pit",
    "interval_coverage",
    "dawid_sebastiani_score",
]


def _f(x):
    return jnp.asarray(x, jnp.result_type(jnp.asarray(x).dtype, float))


def _a(m, s):
    """E|X| for X ~ N(m, s^2):  m (2 Phi(m/s) - 1) + 2 s phi(m/s)."""
    z = m / s
    return m * (2.0 * _norm.cdf(z) - 1.0) + 2.0 * s * _norm.pdf(z)


def crps_gaussian_mixture(log_weights, locs, scales, y) -> jnp.ndarray:
    """Exact CRPS of a Gaussian mixture (Grimit et al. 2006 eq. 5).

    ``log_weights`` [S]; ``locs``/``scales`` [S, m]; ``y`` [m].
    Returns per-point CRPS [m]:

        CRPS = sum_i w_i A(y - mu_i, s_i) -
               (1/2) sum_ij w_i w_j A(mu_i - mu_j, sqrt(s_i^2 + s_j^2))
    """
    log_weights = _f(log_weights)
    locs, scales, y = _f(locs), _f(scales), _f(y)
    w = jax.nn.softmax(log_weights)  # [S]
    term1 = jnp.einsum("s,sm->m", w, _a(y[None, :] - locs, scales))
    dm = locs[:, None, :] - locs[None, :, :]  # [S, S, m]
    ds = jnp.sqrt(scales[:, None, :] ** 2 + scales[None, :, :] ** 2)
    term2 = jnp.einsum("i,j,ijm->m", w, w, _a(dm, ds))
    return term1 - 0.5 * term2


def crps_ensemble(samples, y) -> jnp.ndarray:
    """Energy-form CRPS estimator from draws: ``samples`` [k, m], ``y``
    [m] -> [m].  E|X - y| - E|X - X'|/2 with the unbiased k(k-1)
    pairing, computed from SORTED samples in O(k log k) per point
    (sum_{i<j}(x_(j) - x_(i)) = sum_i (2i - k - 1) x_(i)) instead of the
    O(k^2 m) pairwise array."""
    samples, y = _f(samples), _f(y)
    k = samples.shape[0]
    t1 = jnp.mean(jnp.abs(samples - y[None, :]), axis=0)
    s = jnp.sort(samples, axis=0)
    coef = 2.0 * jnp.arange(1, k + 1, dtype=s.dtype) - k - 1  # [k]
    t2 = 2.0 * jnp.einsum("k,km->m", coef, s) / (k * (k - 1))
    return t1 - 0.5 * t2


def crps(
    predictive,
    y,
    *,
    key=None,
    num_samples: int = 256,
) -> jnp.ndarray:
    """Per-point CRPS of a predictive law at observations ``y`` [m].

    A :class:`PointwiseMixture` with a Normal component uses the exact
    Gaussian-mixture closed form; any other distribution (or mixture
    component family) falls back to the energy-form estimator with
    ``num_samples`` draws (pass ``key``)."""
    if isinstance(predictive, PointwiseMixture) and isinstance(
        predictive.component, Normal
    ):
        return crps_gaussian_mixture(
            predictive.log_weights,
            predictive.component.loc,
            predictive.component.scale,
            y,
        )
    if key is None:
        raise ValueError(
            "no closed form for this predictive; pass key= for the "
            "sample-based CRPS estimator"
        )
    samples = predictive.sample(key, (num_samples,))
    return crps_ensemble(samples, y)


def log_score(predictive, y) -> jnp.ndarray:
    """Negative predictive log density per point (strictly proper)."""
    return -predictive.log_prob(_f(y))


def pit(predictive, y) -> jnp.ndarray:
    """Probability integral transform F(y) per point — uniform on (0, 1)
    iff the predictive is calibrated (check with a histogram or a KS
    statistic)."""
    return predictive.cdf(_f(y))


def interval_coverage(predictive, y, levels=(0.5, 0.9)):
    """Empirical central-interval coverage and mean width.

    Returns ``{level: (coverage, mean_width)}`` — calibrated forecasts
    have coverage ~ level; width is the sharpness (smaller is better
    SUBJECT to calibration)."""
    y = _f(y)
    out = {}
    for level in levels:
        alpha = 0.5 * (1.0 - level)
        lo = predictive.quantile(alpha)
        hi = predictive.quantile(1.0 - alpha)
        cover = jnp.mean(((y >= lo) & (y <= hi)).astype(y.dtype))
        out[float(level)] = (cover, jnp.mean(hi - lo))
    return out


def dawid_sebastiani_score(predictive, y) -> jnp.ndarray:
    """DSS = log var + (y - mean)^2 / var per point — the
    moment-only proper score (cheap; no density/cdf needed)."""
    y = _f(y)
    mu = jnp.asarray(predictive.mean())
    var = jnp.asarray(predictive.variance())
    return jnp.log(var) + (y - mu) ** 2 / var
