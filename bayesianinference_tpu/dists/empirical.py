"""Empirical, kernel-density and parameter-mixture distributions.

Replaces the reference's ``EmpiricalDistribution`` (the posterior object,
BayesianStatistics.wl:1256-1264), ``SmoothKernelDistribution`` on weighted
data (the visualisation KDEs, BayesianVisualisations.wl:39-139) and
``ParameterMixtureDistribution`` (the Laplace predictive,
LaplaceApproximation.wl:528-561).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.numerics import LOG2PI, logsumexp
from ..core.precise import log_precise
from .base import Distribution, dist_dataclass

__all__ = ["Empirical", "GaussianKDE", "ParameterMixture"]



def _f(x):
    return jnp.asarray(x, jnp.result_type(jnp.asarray(x).dtype, float))


@dist_dataclass
class Empirical(Distribution):
    """Weighted empirical distribution over points [n, d]."""

    points: jnp.ndarray  # [n, d]
    log_weights: jnp.ndarray  # [n]

    @property
    def event_shape(self):
        return (jnp.shape(self.points)[-1],)

    def _norm_logw(self):
        lw = _f(self.log_weights)
        return lw - logsumexp(lw)

    def sample(self, key, shape=()):
        idx = jax.random.categorical(key, self._norm_logw(), shape=shape)
        return _f(self.points)[idx]

    def mean(self):
        w = jnp.exp(self._norm_logw())
        return jnp.einsum("n,nd->d", w, _f(self.points))

    def variance(self):
        w = jnp.exp(self._norm_logw())
        p = _f(self.points)
        mu = jnp.einsum("n,nd->d", w, p)
        return jnp.einsum("n,nd->d", w, (p - mu) ** 2)

    def covariance(self):
        w = jnp.exp(self._norm_logw())
        p = _f(self.points)
        mu = jnp.einsum("n,nd->d", w, p)
        c = p - mu
        return jnp.einsum("n,ni,nj->ij", w, c, c)

    def to_weighted_samples(self):
        """Convert to the core container (the
        ``empiricalDistributionToWeightedData`` direction, BU:453-456)."""
        from ..core.containers import WeightedSamples

        return WeightedSamples(
            points=jnp.asarray(self.points), log_weights=_f(self.log_weights)
        )

    @staticmethod
    def from_weighted_samples(ws) -> "Empirical":
        return Empirical(points=ws.points, log_weights=ws.log_weights)

    def cdf(self, x):
        """Marginal-wise empirical CDF at x [d] (or batched [..., d])."""
        w = jnp.exp(self._norm_logw())
        p = _f(self.points)
        le = p <= jnp.expand_dims(_f(x), -2)  # [..., n, d]
        return jnp.einsum("n,...nd->...d", w, le.astype(w.dtype))


def silverman_bandwidth(points, weights=None):
    """Silverman's rule per dimension for weighted samples [n, d]."""
    p = _f(points)
    n, d = p.shape
    if weights is None:
        w = jnp.full((n,), 1.0 / n, p.dtype)
    else:
        w = _f(weights) / jnp.sum(_f(weights))
    n_eff = 1.0 / jnp.sum(w**2)
    mu = jnp.einsum("n,nd->d", w, p)
    sd = jnp.sqrt(jnp.einsum("n,nd->d", w, (p - mu) ** 2))
    return sd * (4.0 / ((d + 2.0) * n_eff)) ** (1.0 / (d + 4.0))


@dist_dataclass
class GaussianKDE(Distribution):
    """Weighted Gaussian kernel density estimate over [n, d] points with a
    diagonal bandwidth [d] — the analogue of ``SmoothKernelDistribution`` on
    ``WeightedData`` (BayesianVisualisations.wl:50-120)."""

    points: jnp.ndarray  # [n, d]
    log_weights: jnp.ndarray  # [n]
    bandwidth: jnp.ndarray  # [d]

    @staticmethod
    def fit(points, log_weights=None) -> "GaussianKDE":
        p = _f(points)
        if p.ndim == 1:
            p = p[:, None]  # [n] samples -> [n, 1], NOT one n-dim point
        n = p.shape[0]
        lw = (
            jnp.zeros((n,), p.dtype) if log_weights is None else _f(log_weights)
        )
        bw = silverman_bandwidth(p, jnp.exp(lw - logsumexp(lw)))
        return GaussianKDE(points=p, log_weights=lw, bandwidth=bw)

    @property
    def event_shape(self):
        return (jnp.shape(self.points)[-1],)

    def _norm_logw(self):
        lw = _f(self.log_weights)
        return lw - logsumexp(lw)

    def log_prob(self, x):
        x = _f(x)
        p = _f(self.points)
        h = _f(self.bandwidth)
        z = (jnp.expand_dims(x, -2) - p) / h  # [..., n, d]
        d = p.shape[-1]
        ker = -0.5 * jnp.sum(z * z, axis=-1) - 0.5 * d * LOG2PI - jnp.sum(
            log_precise(h)
        )
        return logsumexp(self._norm_logw() + ker, axis=-1)

    def sample(self, key, shape=()):
        k1, k2 = jax.random.split(key)
        idx = jax.random.categorical(k1, self._norm_logw(), shape=shape)
        base = _f(self.points)[idx]
        noise = jax.random.normal(k2, base.shape, base.dtype) * _f(self.bandwidth)
        return base + noise

    def mean(self):
        w = jnp.exp(self._norm_logw())
        return jnp.einsum("n,nd->d", w, _f(self.points))


@dataclasses.dataclass(frozen=True)
class ParameterMixture(Distribution):
    """Continuous mixture: theta ~ param_dist, x | theta ~ build(theta)
    (``ParameterMixtureDistribution``, LaplaceApproximation.wl:528-561).

    ``log_prob`` is estimated by Monte-Carlo marginalization over
    ``num_quadrature`` fixed draws (deterministic given ``seed``)."""

    param_dist: Distribution
    build: Callable  # theta -> Distribution
    num_quadrature: int = 128
    seed: int = 0

    def _thetas(self):
        key = jax.random.PRNGKey(self.seed)
        return self.param_dist.sample(key, (self.num_quadrature,))

    def log_prob(self, x):
        thetas = self._thetas()
        lps = jax.vmap(lambda th: self.build(th).log_prob(x))(thetas)
        return logsumexp(lps, axis=0) - log_precise(float(self.num_quadrature))

    def sample(self, key, shape=()):
        k1, k2 = jax.random.split(key)
        n = int(jnp.prod(jnp.asarray(shape or (1,))))
        thetas = self.param_dist.sample(k1, (n,))
        keys = jax.random.split(k2, n)
        out = jax.vmap(lambda th, k: self.build(th).sample(k))(thetas, keys)
        # per-draw shape comes from the built distribution's actual output
        # (scalar families with batched params draw a whole batch per theta)
        return (
            out.reshape(tuple(shape) + out.shape[1:]) if shape else out[0]
        )


jax.tree_util.register_pytree_node(
    ParameterMixture,
    lambda p: ((p.param_dist,), (p.build, p.num_quadrature, p.seed)),
    lambda aux, ch: ParameterMixture(ch[0], aux[0], aux[1], aux[2]),
)
