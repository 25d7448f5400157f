"""Pointwise mixture over a batch of prediction points.

The reference's posterior predictives are *lists* of
``MixtureDistribution`` objects, one per input point
(``predictiveDistribution``, BayesianStatistics.wl:1437-1483;
``predictFromGaussianProcess``, BayesianGaussianProcess.wl:343-376).  On
TPU we keep the whole batch as one object: S mixture components x m query
points, everything vectorized over the point axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.numerics import logsumexp
from .base import Distribution, bisect_icdf, dist_dataclass

__all__ = ["PointwiseMixture"]


@dist_dataclass
class PointwiseMixture(Distribution):
    """Mixture with weights [S] whose component is a scalar Distribution
    with parameters of shape [S, m] (S components at each of m points).

    ``log_prob``/``cdf``/``mean``/... map [.., m] -> [.., m]; ``quantile``
    gives per-point quantiles (the percentile bands of regressionPlot1D,
    BayesianVisualisations.wl:303-388); ``sample`` draws one component per
    (draw, point).
    """

    log_weights: jnp.ndarray  # [S]
    component: Distribution  # scalar family, params [S, m]

    @property
    def num_points(self):
        leaf = jax.tree_util.tree_leaves(self.component)[0]
        return jnp.shape(leaf)[-1]

    def _norm_logw(self):
        lw = jnp.asarray(self.log_weights, jnp.result_type(float))
        return lw - logsumexp(lw)

    def log_prob(self, x):
        x = jnp.asarray(x)
        comp_lp = self.component.log_prob(x[..., None, :])  # [.., S, m]
        return logsumexp(
            self._norm_logw()[:, None] + comp_lp, axis=-2
        )

    def cdf(self, x):
        x = jnp.asarray(x)
        w = jnp.exp(self._norm_logw())
        comp_cdf = self.component.cdf(x[..., None, :])  # [.., S, m]
        return jnp.einsum("s,...sm->...m", w, comp_cdf)

    def quantile(self, q):
        """Per-point quantiles; ``q`` scalar -> [m], or [k] -> [k, m]."""
        q = jnp.asarray(q, jnp.result_type(float))
        m = self.num_points
        scalar = q.ndim == 0
        qq = jnp.broadcast_to(q.reshape(-1, 1), (max(1, q.size), m))
        lo = jnp.full((qq.shape[0], m), -1e10)
        hi = jnp.full((qq.shape[0], m), 1e10)
        out = bisect_icdf(self.cdf, qq, lo, hi)
        return out[0] if scalar else out

    def mean(self):
        w = jnp.exp(self._norm_logw())
        return jnp.einsum("s,sm->m", w, jnp.asarray(self.component.mean()))

    def variance(self):
        w = jnp.exp(self._norm_logw())
        m_ = jnp.asarray(self.component.mean())
        v_ = jnp.asarray(self.component.variance())
        mu = jnp.einsum("s,sm->m", w, m_)
        return jnp.einsum("s,sm->m", w, v_ + m_**2) - mu**2

    def sample(self, key, shape=()):
        k1, k2 = jax.random.split(key)
        m = self.num_points
        idx = jax.random.categorical(
            k1, self._norm_logw(), shape=tuple(shape) + (m,)
        )  # [.., m] independent component choice per point
        cols = jnp.arange(m)
        comp = jax.tree_util.tree_map(
            lambda p: jnp.asarray(p)[idx, cols], self.component
        )
        return comp.sample(k2)
