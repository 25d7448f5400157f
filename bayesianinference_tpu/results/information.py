"""Information criteria from weighted posterior samples.

WAIC (widely applicable information criterion, Watanabe 2010) estimated
from any weighted posterior sample — nested-sampling output included —
via importance-weighted pointwise quantities.  Complements the exact log
evidences the engines already produce (logZ compares models under their
priors; WAIC estimates out-of-sample predictive fit).  No counterpart in
the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.numerics import log_zero, logsumexp

__all__ = ["WAICResult", "waic"]


@dataclasses.dataclass(frozen=True)
class WAICResult:
    """elpd = lppd - p_waic per data point; waic = -2 sum elpd."""

    waic: float
    elpd: float  # sum over data points
    p_waic: float  # effective number of parameters
    se: float  # standard error of waic (sqrt(n var) scaling)
    pointwise_elpd: jnp.ndarray  # [n]

    def __repr__(self):
        return (
            f"WAIC {self.waic:.2f} ± {self.se:.2f} "
            f"(elpd {self.elpd:.2f}, p_waic {self.p_waic:.2f})"
        )


def waic(result, pointwise_loglike: Callable) -> WAICResult:
    """WAIC from a weighted posterior sample.

    ``result``: a NestedSamplingResult or WeightedSamples (anything with
    ``points`` and normalized weights via ``posterior_samples()`` /
    ``normalized_weights()``).  ``pointwise_loglike(theta) -> [n]`` maps
    one parameter vector to the per-observation log-likelihood vector
    (NOT the sum); it is vmapped over the posterior samples.

    lppd_i  = log sum_s w_s p(y_i | theta_s)        (importance-weighted)
    p_i     = Var_w[log p(y_i | theta_s)]
    elpd_i  = lppd_i - p_i;   WAIC = -2 sum_i elpd_i
    """
    from ..engines.evidence import NestedSamplingResult

    if isinstance(result, NestedSamplingResult):
        result = result.posterior_samples()
    thetas = jnp.asarray(result.points)
    w = jnp.asarray(result.normalized_weights())

    ll = jax.vmap(pointwise_loglike)(thetas)  # [S, n]
    if ll.ndim != 2:
        raise ValueError(
            "pointwise_loglike(theta) must return the [n] per-observation "
            f"log-likelihood vector, got shape {ll.shape[1:]}"
        )
    # log weights with zero-weight samples mapped to the per-dtype
    # sentinel (a 1e-300 clamp underflows to 0 in f32 — CLAUDE.md rule)
    log_w = jnp.where(
        w > 0, jnp.log(jnp.where(w > 0, w, 1.0)), log_zero(w.dtype)
    )[:, None]
    lppd = logsumexp(log_w + ll, axis=0)  # [n]
    mu = jnp.sum(w[:, None] * ll, axis=0)
    p_w = jnp.sum(w[:, None] * (ll - mu) ** 2, axis=0)
    elpd_i = lppd - p_w
    n = elpd_i.shape[0]
    waic_val = -2.0 * jnp.sum(elpd_i)
    se = 2.0 * jnp.sqrt(n * jnp.var(elpd_i))
    return WAICResult(
        waic=float(waic_val),
        elpd=float(jnp.sum(elpd_i)),
        p_waic=float(jnp.sum(p_w)),
        se=float(se),
        pointwise_elpd=elpd_i,
    )
