"""Normal-inverse-gamma and normal-inverse-Wishart joint distributions.

From-scratch equivalents of the reference's custom distribution objects
``normalInverseGammaDistribution`` (BayesianConjugatePriors.wl:28-65) and
``normalInverseWishartDistribution`` (BayesianConjugatePriors.wl:153-229),
including their marginals, samplers and log-densities.  These are structured
joints over (mean, variance) / (mean vector, covariance matrix), so they use
a two-argument API rather than the flat-array :class:`Distribution` one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import dist_dataclass
from .multivariate import InverseWishart, MultivariateNormal, MultivariateT
from .scalar import InverseGamma, Normal, StudentT

__all__ = ["NormalInverseGamma", "NormalInverseWishart"]


def _f(x):
    return jnp.asarray(x, jnp.result_type(jnp.asarray(x).dtype, float))


@dist_dataclass
class NormalInverseGamma:
    """NIG(mu0, lam, beta, nu):
    var ~ InverseGamma(nu, beta);  mean | var ~ Normal(mu0, sqrt(var/lam)).

    Parameter order matches the reference's
    ``normalInverseGammaDistribution[mu0, lam, beta, nu]`` (CP:28-65)."""

    mu0: jnp.ndarray = 0.0
    lam: jnp.ndarray = 1.0
    beta: jnp.ndarray = 1.0
    nu: jnp.ndarray = 1.0

    def marginal_mean(self) -> StudentT:
        """StudentT(mu0, sqrt(beta/(nu*lam)), 2 nu)  (CP:32-35)."""
        return StudentT(
            df=2.0 * _f(self.nu),
            loc=_f(self.mu0),
            scale=jnp.sqrt(_f(self.beta) / (_f(self.nu) * _f(self.lam))),
        )

    def marginal_variance(self) -> InverseGamma:
        """InverseGamma(nu, beta)  (CP:36-37)."""
        return InverseGamma(a=_f(self.nu), b=_f(self.beta))

    def log_prob(self, mean, var):
        """Joint log-density (CP:52-58)."""
        var = _f(var)
        cond = Normal(loc=_f(self.mu0), scale=jnp.sqrt(var / _f(self.lam)))
        return cond.log_prob(_f(mean)) + self.marginal_variance().log_prob(var)

    def sample(self, key, shape=()):
        """(CP:42-51): draw var first, then mean given var."""
        k1, k2 = jax.random.split(key)
        var = self.marginal_variance().sample(k1, shape)
        z = jax.random.normal(k2, jnp.shape(var), dtype=_f(var).dtype)
        mean = _f(self.mu0) + jnp.sqrt(var / _f(self.lam)) * z
        return mean, var


@dist_dataclass
class NormalInverseWishart:
    """NIW(mu0, lam, psi, nu):
    Sigma ~ InverseWishart(nu, psi);  mu | Sigma ~ MVN(mu0, Sigma/lam)
    (BayesianConjugatePriors.wl:153-229)."""

    mu0: jnp.ndarray  # [d]
    lam: jnp.ndarray  # scalar
    psi: jnp.ndarray  # [d, d]
    nu: jnp.ndarray  # scalar

    @property
    def dim(self):
        return jnp.shape(self.mu0)[-1]

    def marginal_mean(self) -> MultivariateT:
        """MultivariateT(nu - d + 1, mu0, psi / (lam (nu - d + 1)))
        (CP:160-170)."""
        d = self.dim
        df = _f(self.nu) - d + 1.0
        return MultivariateT(
            df=df, loc=_f(self.mu0), shape_matrix=_f(self.psi) / (_f(self.lam) * df)
        )

    def marginal_cov(self) -> InverseWishart:
        return InverseWishart(df=_f(self.nu), scale=_f(self.psi))

    def log_prob(self, mean, cov):
        cov = _f(cov)
        cond = MultivariateNormal(mean_=_f(self.mu0), cov=cov / _f(self.lam))
        return cond.log_prob(_f(mean)) + self.marginal_cov().log_prob(cov)

    def sample(self, key, shape=()):
        k1, k2 = jax.random.split(key)
        cov = self.marginal_cov().sample(k1, shape)
        L = jnp.linalg.cholesky(cov / _f(self.lam))
        z = jax.random.normal(k2, tuple(shape) + (self.dim,), dtype=L.dtype)
        mean = _f(self.mu0) + jnp.einsum("...ij,...j->...i", L, z)
        return mean, cov
