"""Scalar (univariate) distribution families.

From-scratch JAX implementations of the families the reference exercises via
Wolfram built-ins (NormalDistribution, StudentTDistribution, GammaDistribution,
InverseGammaDistribution, ExponentialDistribution, PoissonDistribution,
LogNormalDistribution, CauchyDistribution, UniformDistribution,
BernoulliDistribution, LaplaceDistribution, BetaDistribution — used across
BayesianStatistics.wl, BayesianConjugatePriors.wl:28-295,
ExponentialFamilyDefinitions.wl:108-189, LaplaceApproximation.wl:466-477).

All log-densities are written in gammaln form — the lesson of the reference's
``replaceFactorials`` (BayesianUtilities.wl:425-443) — and masked to the
distribution's support via the finite log-zero sentinel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from ..core.numerics import LOG2PI, log_zero, xlogy
from ..core.precise import (
    gammaln_precise,
    log1p_precise,
    log_precise,
    log_precise_norm,
)
from .base import Distribution, dist_dataclass

__all__ = [
    "Normal",
    "Uniform",
    "LogUniform",
    "Exponential",
    "Gamma",
    "InverseGamma",
    "Beta",
    "StudentT",
    "Cauchy",
    "HalfCauchy",
    "LogNormal",
    "Laplace",
    "Poisson",
    "Bernoulli",
    "Binomial",
    "Weibull",
    "Logistic",
    "ChiSquared",
    "Gumbel",
    "Pareto",
    "NegativeBinomial",
    "Geometric",
]

_LOGPI = 1.1447298858494002


def _f(x):
    return jnp.asarray(x, jnp.result_type(jnp.asarray(x).dtype, float))


@dist_dataclass
class Normal(Distribution):
    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def log_prob(self, x):
        x, loc, scale = _f(x), _f(self.loc), _f(self.scale)
        z = (x - loc) / scale
        logp = -0.5 * (z * z + LOG2PI) - log_precise_norm(scale)
        return self._mask_support(x, logp)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            shape, jnp.shape(self.loc), jnp.shape(self.scale)
        )
        z = jax.random.normal(key, shape, dtype=jnp.result_type(float))
        return _f(self.loc) + _f(self.scale) * z

    def cdf(self, x):
        return jsp.ndtr((_f(x) - _f(self.loc)) / _f(self.scale))

    def icdf(self, q):
        return _f(self.loc) + _f(self.scale) * jsp.ndtri(_f(q))

    def mean(self):
        return _f(self.loc)

    def variance(self):
        return _f(self.scale) ** 2

    def entropy(self):
        return 0.5 * (1.0 + LOG2PI) + log_precise(_f(self.scale))


@dist_dataclass
class Uniform(Distribution):
    low: jnp.ndarray = 0.0
    high: jnp.ndarray = 1.0

    def support(self):
        return (_f(self.low), _f(self.high))

    def log_prob(self, x):
        x = _f(x)
        logp = jnp.broadcast_to(
            -log_precise(_f(self.high) - _f(self.low)), jnp.shape(x)
        )
        return self._mask_support(x, logp)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            shape, jnp.shape(self.low), jnp.shape(self.high)
        )
        u = jax.random.uniform(key, shape, dtype=jnp.result_type(float))
        return _f(self.low) + (_f(self.high) - _f(self.low)) * u

    def cdf(self, x):
        lo, hi = _f(self.low), _f(self.high)
        return jnp.clip((_f(x) - lo) / (hi - lo), 0.0, 1.0)

    def icdf(self, q):
        return _f(self.low) + (_f(self.high) - _f(self.low)) * _f(q)

    def mean(self):
        return 0.5 * (_f(self.low) + _f(self.high))

    def variance(self):
        return (_f(self.high) - _f(self.low)) ** 2 / 12.0


@dist_dataclass
class LogUniform(Distribution):
    """Normalized 1/x density on [low, high] — the reference's
    "ScaleParameter" ignorance prior (BayesianStatistics.wl:35-43)."""

    low: jnp.ndarray = 1e-3
    high: jnp.ndarray = 1e3

    def support(self):
        return (_f(self.low), _f(self.high))

    def log_prob(self, x):
        x = _f(x)
        lo, hi = _f(self.low), _f(self.high)
        safe_x = jnp.where(x > 0, x, 1.0)
        logp = -log_precise(safe_x) - log_precise(log_precise(hi) - log_precise(lo))
        return self._mask_support(x, logp)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            shape, jnp.shape(self.low), jnp.shape(self.high)
        )
        u = jax.random.uniform(key, shape, dtype=jnp.result_type(float))
        lo, hi = _f(self.low), _f(self.high)
        return jnp.exp(log_precise(lo) + u * (log_precise(hi) - log_precise(lo)))

    def cdf(self, x):
        lo, hi = _f(self.low), _f(self.high)
        x = jnp.clip(_f(x), lo, hi)
        return (log_precise(x) - log_precise(lo)) / (log_precise(hi) - log_precise(lo))

    def icdf(self, q):
        lo, hi = _f(self.low), _f(self.high)
        return jnp.exp(log_precise(lo) + _f(q) * (log_precise(hi) - log_precise(lo)))


@dist_dataclass
class Exponential(Distribution):
    rate: jnp.ndarray = 1.0

    def support(self):
        return (0.0, jnp.inf)

    def log_prob(self, x):
        x, rate = _f(x), _f(self.rate)
        logp = log_precise_norm(rate) - rate * x
        return self._mask_support(x, logp)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(shape, jnp.shape(self.rate))
        e = jax.random.exponential(key, shape, dtype=jnp.result_type(float))
        return e / _f(self.rate)

    def cdf(self, x):
        return -jnp.expm1(-_f(self.rate) * jnp.maximum(_f(x), 0.0))

    def icdf(self, q):
        return -log1p_precise(-_f(q)) / _f(self.rate)

    def mean(self):
        return 1.0 / _f(self.rate)

    def variance(self):
        return 1.0 / _f(self.rate) ** 2


@dist_dataclass
class Gamma(Distribution):
    """Gamma(shape a, rate b): p(x) = b^a x^(a-1) e^(-bx) / Gamma(a)."""

    a: jnp.ndarray = 1.0
    rate: jnp.ndarray = 1.0

    def support(self):
        return (0.0, jnp.inf)

    def log_prob(self, x):
        x, a, b = _f(x), _f(self.a), _f(self.rate)
        safe_x = jnp.where(x > 0, x, 1.0)
        logp = (
            a * log_precise_norm(b)
            + (a - 1.0) * log_precise(safe_x)
            - b * x
            - gammaln_precise(a)
        )
        # open support (x = 0 boundary -> sentinel, not the safe-point value)
        return jnp.where(x > 0, self._mask_support(x, logp), log_zero(logp.dtype))

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(shape, jnp.shape(self.a), jnp.shape(self.rate))
        g = jax.random.gamma(key, _f(self.a), shape, dtype=jnp.result_type(float))
        return g / _f(self.rate)

    def cdf(self, x):
        return jsp.gammainc(_f(self.a), _f(self.rate) * jnp.maximum(_f(x), 0.0))

    def mean(self):
        return _f(self.a) / _f(self.rate)

    def variance(self):
        return _f(self.a) / _f(self.rate) ** 2


@dist_dataclass
class InverseGamma(Distribution):
    """InverseGamma(a, b): p(x) = b^a x^(-a-1) e^(-b/x) / Gamma(a).

    Matches Wolfram's InverseGammaDistribution[a, b] used for the error
    variance in conjugate regression (BayesianLinearRegression.wl:240-249,
    BayesianConjugatePriors.wl:38-44)."""

    a: jnp.ndarray = 1.0
    b: jnp.ndarray = 1.0

    def support(self):
        return (0.0, jnp.inf)

    def log_prob(self, x):
        x, a, b = _f(x), _f(self.a), _f(self.b)
        safe_x = jnp.where(x > 0, x, 1.0)
        logp = (
            a * log_precise_norm(b)
            - (a + 1.0) * log_precise(safe_x)
            - b / safe_x
            - gammaln_precise(a)
        )
        # open support (x = 0 boundary -> sentinel)
        return jnp.where(x > 0, self._mask_support(x, logp), log_zero(logp.dtype))

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(shape, jnp.shape(self.a), jnp.shape(self.b))
        g = jax.random.gamma(key, _f(self.a), shape, dtype=jnp.result_type(float))
        return _f(self.b) / g

    def cdf(self, x):
        x = _f(x)
        safe_x = jnp.where(x > 0, x, 1.0)
        c = jsp.gammaincc(_f(self.a), _f(self.b) / safe_x)
        return jnp.where(x > 0, c, 0.0)

    def mean(self):
        a = _f(self.a)
        return jnp.where(a > 1, _f(self.b) / (a - 1.0), jnp.nan)

    def variance(self):
        a, b = _f(self.a), _f(self.b)
        return jnp.where(a > 2, b**2 / ((a - 1.0) ** 2 * (a - 2.0)), jnp.nan)


@dist_dataclass
class Beta(Distribution):
    a: jnp.ndarray = 1.0
    b: jnp.ndarray = 1.0

    def support(self):
        return (0.0, 1.0)

    def log_prob(self, x):
        x, a, b = _f(x), _f(self.a), _f(self.b)
        sx = jnp.clip(x, 1e-38, 1.0 - 1e-7)
        logp = (
            (a - 1.0) * log_precise(sx)
            + (b - 1.0) * log1p_precise(-sx)
            - (
                gammaln_precise(a)
                + gammaln_precise(b)
                - gammaln_precise(a + b)
            )
        )
        # open support on both ends (boundary density is 0/inf by a, b)
        inside = jnp.logical_and(x > 0, x < 1)
        return jnp.where(inside, self._mask_support(x, logp), log_zero(logp.dtype))

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(shape, jnp.shape(self.a), jnp.shape(self.b))
        return jax.random.beta(key, _f(self.a), _f(self.b), shape,
                               dtype=jnp.result_type(float))

    def cdf(self, x):
        return jsp.betainc(_f(self.a), _f(self.b), jnp.clip(_f(x), 0.0, 1.0))

    def mean(self):
        a, b = _f(self.a), _f(self.b)
        return a / (a + b)

    def variance(self):
        a, b = _f(self.a), _f(self.b)
        return a * b / ((a + b) ** 2 * (a + b + 1.0))


@dist_dataclass
class StudentT(Distribution):
    """StudentT(df, loc, scale) — the conjugate-regression marginal
    (BayesianLinearRegression.wl:81-106, BayesianConjugatePriors.wl:32-35)."""

    df: jnp.ndarray = 1.0
    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def log_prob(self, x):
        x, v, loc, s = _f(x), _f(self.df), _f(self.loc), _f(self.scale)
        z = (x - loc) / s
        logp = (
            gammaln_precise(0.5 * (v + 1.0))
            - gammaln_precise(0.5 * v)
            - 0.5 * log_precise_norm(v)
            - 0.5 * _LOGPI
            - log_precise_norm(s)
            - 0.5 * (v + 1.0) * log1p_precise(z * z / v)
        )
        return self._mask_support(x, logp)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            shape, jnp.shape(self.df), jnp.shape(self.loc), jnp.shape(self.scale)
        )
        k1, k2 = jax.random.split(key)
        v = _f(self.df)
        z = jax.random.normal(k1, shape, dtype=jnp.result_type(float))
        g = jax.random.gamma(k2, 0.5 * v, shape, dtype=jnp.result_type(float))
        chi2 = 2.0 * g  # chi^2_v = Gamma(v/2, rate 1/2)
        return _f(self.loc) + _f(self.scale) * z * jnp.sqrt(v / chi2)

    def cdf(self, x):
        v = _f(self.df)
        z = (_f(x) - _f(self.loc)) / _f(self.scale)
        w = v / (v + z * z)
        tail = 0.5 * jsp.betainc(0.5 * v, 0.5, w)
        return jnp.where(z >= 0, 1.0 - tail, tail)

    def mean(self):
        v = _f(self.df)
        return jnp.where(v > 1, _f(self.loc) * jnp.ones_like(v), jnp.nan)

    def variance(self):
        v = _f(self.df)
        return jnp.where(v > 2, _f(self.scale) ** 2 * v / (v - 2.0), jnp.nan)


@dist_dataclass
class Cauchy(Distribution):
    """Cauchy(loc, scale) — the reference's default hyperprior
    (LaplaceApproximation.wl:466-477) and the crude domain-sampling
    distribution (BayesianUtilities.wl:366-372)."""

    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def log_prob(self, x):
        x, loc, s = _f(x), _f(self.loc), _f(self.scale)
        z = (x - loc) / s
        logp = -_LOGPI - log_precise_norm(s) - log1p_precise(z * z)
        return self._mask_support(x, logp)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            shape, jnp.shape(self.loc), jnp.shape(self.scale)
        )
        u = jax.random.uniform(
            key, shape, minval=1e-7, maxval=1.0 - 1e-7,
            dtype=jnp.result_type(float),
        )
        return self.icdf(u)

    def cdf(self, x):
        z = (_f(x) - _f(self.loc)) / _f(self.scale)
        return 0.5 + jnp.arctan(z) / jnp.pi

    def icdf(self, q):
        return _f(self.loc) + _f(self.scale) * jnp.tan(jnp.pi * (_f(q) - 0.5))


@dist_dataclass
class HalfCauchy(Distribution):
    scale: jnp.ndarray = 1.0

    def support(self):
        return (0.0, jnp.inf)

    def log_prob(self, x):
        x, s = _f(x), _f(self.scale)
        z = x / s
        logp = (
            log_precise(2.0) - _LOGPI - log_precise_norm(s)
            - log1p_precise(z * z)
        )
        return self._mask_support(x, logp)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(shape, jnp.shape(self.scale))
        u = jax.random.uniform(key, shape, dtype=jnp.result_type(float))
        return self.icdf(u)

    def cdf(self, x):
        return 2.0 / jnp.pi * jnp.arctan(jnp.maximum(_f(x), 0.0) / _f(self.scale))

    def icdf(self, q):
        return _f(self.scale) * jnp.tan(0.5 * jnp.pi * _f(q))


@dist_dataclass
class LogNormal(Distribution):
    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def support(self):
        return (0.0, jnp.inf)

    def log_prob(self, x):
        x, mu, s = _f(x), _f(self.loc), _f(self.scale)
        safe_x = jnp.where(x > 0, x, 1.0)
        z = (log_precise(safe_x) - mu) / s
        logp = (
            -0.5 * (z * z + LOG2PI)
            - log_precise_norm(s)
            - log_precise(safe_x)
        )
        # open support (the x = 0 boundary density is 0 -> sentinel)
        return jnp.where(x > 0, self._mask_support(x, logp), log_zero(logp.dtype))

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            shape, jnp.shape(self.loc), jnp.shape(self.scale)
        )
        z = jax.random.normal(key, shape, dtype=jnp.result_type(float))
        return jnp.exp(_f(self.loc) + _f(self.scale) * z)

    def cdf(self, x):
        x = _f(x)
        safe_x = jnp.where(x > 0, x, 1.0)
        c = jsp.ndtr((log_precise(safe_x) - _f(self.loc)) / _f(self.scale))
        return jnp.where(x > 0, c, 0.0)

    def icdf(self, q):
        return jnp.exp(_f(self.loc) + _f(self.scale) * jsp.ndtri(_f(q)))

    def mean(self):
        return jnp.exp(_f(self.loc) + 0.5 * _f(self.scale) ** 2)

    def variance(self):
        s2 = _f(self.scale) ** 2
        return (jnp.exp(s2) - 1.0) * jnp.exp(2.0 * _f(self.loc) + s2)


@dist_dataclass
class Laplace(Distribution):
    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def log_prob(self, x):
        x, loc, s = _f(x), _f(self.loc), _f(self.scale)
        logp = -jnp.abs(x - loc) / s - log_precise_norm(2.0 * s)
        return self._mask_support(x, logp)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            shape, jnp.shape(self.loc), jnp.shape(self.scale)
        )
        u = jax.random.uniform(
            key, shape, minval=-0.5 + 1e-7, maxval=0.5 - 1e-7,
            dtype=jnp.result_type(float),
        )
        return _f(self.loc) - _f(self.scale) * jnp.sign(u) * log1p_precise(
            -2.0 * jnp.abs(u)
        )

    def cdf(self, x):
        z = (_f(x) - _f(self.loc)) / _f(self.scale)
        return jnp.where(z < 0, 0.5 * jnp.exp(z), 1.0 - 0.5 * jnp.exp(-z))

    def mean(self):
        return _f(self.loc)

    def variance(self):
        return 2.0 * _f(self.scale) ** 2


@dist_dataclass
class Poisson(Distribution):
    rate: jnp.ndarray = 1.0

    def support(self):
        return (0.0, jnp.inf)

    def log_prob(self, x):
        x, lam = _f(x), _f(self.rate)
        logp = xlogy(x, lam) - lam - gammaln_precise(x + 1.0)
        nonneg_int = (x >= 0) & (x == jnp.floor(x))
        lz = log_zero(logp.dtype)
        return jnp.where(nonneg_int & jnp.isfinite(logp), logp, lz)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(shape, jnp.shape(self.rate))
        return jax.random.poisson(key, _f(self.rate), shape).astype(
            jnp.result_type(float)
        )

    def mean(self):
        return _f(self.rate)

    def variance(self):
        return _f(self.rate)


@dist_dataclass
class Bernoulli(Distribution):
    """Bernoulli over {0,1}; parameterized by probability ``p`` — the
    logistic-regression likelihood of the Iris config (README.md:48-52)."""

    p: jnp.ndarray = 0.5

    def support(self):
        return (0.0, 1.0)

    def log_prob(self, x):
        x, p = _f(x), _f(self.p)
        logp = xlogy(x, p) + xlogy(1.0 - x, 1.0 - p)
        valid = (x == 0) | (x == 1)
        lz = log_zero(logp.dtype)
        return jnp.where(valid & jnp.isfinite(logp), logp, lz)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(shape, jnp.shape(self.p))
        return jax.random.bernoulli(key, _f(self.p), shape).astype(
            jnp.result_type(float)
        )

    def mean(self):
        return _f(self.p)

    def variance(self):
        p = _f(self.p)
        return p * (1.0 - p)


@dist_dataclass
class BernoulliLogits(Distribution):
    """Bernoulli parameterized by logits — numerically preferred for the
    Laplace logistic-regression path (stable log-sigmoid forms)."""

    logits: jnp.ndarray = 0.0

    def support(self):
        return (0.0, 1.0)

    def log_prob(self, x):
        x, l = _f(x), _f(self.logits)
        # log sigma(l) = -softplus(-l); log(1-sigma(l)) = -softplus(l)
        logp = -x * jax.nn.softplus(-l) - (1.0 - x) * jax.nn.softplus(l)
        valid = (x == 0) | (x == 1)
        lz = log_zero(logp.dtype)
        return jnp.where(valid, logp, lz)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(shape, jnp.shape(self.logits))
        return jax.random.bernoulli(
            key, jax.nn.sigmoid(_f(self.logits)), shape
        ).astype(jnp.result_type(float))

    def mean(self):
        return jax.nn.sigmoid(_f(self.logits))


@dist_dataclass
class Binomial(Distribution):
    n: jnp.ndarray = 1.0
    p: jnp.ndarray = 0.5

    def support(self):
        return (0.0, _f(self.n))

    def log_prob(self, x):
        x, n, p = _f(x), _f(self.n), _f(self.p)
        logp = (
            gammaln_precise(n + 1.0)
            - gammaln_precise(x + 1.0)
            - gammaln_precise(n - x + 1.0)
            + xlogy(x, p)
            + xlogy(n - x, 1.0 - p)
        )
        valid = (x >= 0) & (x <= n) & (x == jnp.floor(x))
        lz = log_zero(logp.dtype)
        return jnp.where(valid & jnp.isfinite(logp), logp, lz)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(shape, jnp.shape(self.n), jnp.shape(self.p))
        return jax.random.binomial(key, _f(self.n), _f(self.p), shape).astype(
            jnp.result_type(float)
        )

    def mean(self):
        return _f(self.n) * _f(self.p)

    def variance(self):
        p = _f(self.p)
        return _f(self.n) * p * (1.0 - p)


__all__.append("BernoulliLogits")


@dist_dataclass
class Weibull(Distribution):
    """Weibull(shape k, scale lam): p(x) = (k/lam)(x/lam)^(k-1) e^-(x/lam)^k
    (WeibullDistribution[k, lam])."""

    k: jnp.ndarray = 1.0
    scale: jnp.ndarray = 1.0

    def support(self):
        return (0.0, jnp.inf)

    def log_prob(self, x):
        x, k, lam = _f(x), _f(self.k), _f(self.scale)
        safe = jnp.where(x > 0, x, 1.0)
        z = safe / lam
        logp = log_precise_norm(k / lam) + (k - 1.0) * log_precise(z) - z**k
        # open support: the x=0 boundary density is 0/inf depending on k;
        # map it to the sentinel rather than evaluating at the safe point
        return jnp.where(x > 0, self._mask_support(x, logp), log_zero(logp.dtype))

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            shape, jnp.shape(self.k), jnp.shape(self.scale)
        )
        u = jax.random.uniform(
            key, shape, dtype=jnp.result_type(float), minval=1e-12,
            maxval=1.0 - 1e-12,
        )
        return self.icdf(u)

    def cdf(self, x):
        z = jnp.maximum(_f(x), 0.0) / _f(self.scale)
        return -jnp.expm1(-(z ** _f(self.k)))

    def icdf(self, q):
        return _f(self.scale) * (-log1p_precise(-_f(q))) ** (1.0 / _f(self.k))

    def mean(self):
        k = _f(self.k)
        return _f(self.scale) * jnp.exp(gammaln_precise(1.0 + 1.0 / k))

    def variance(self):
        k, lam = _f(self.k), _f(self.scale)
        g1 = jnp.exp(gammaln_precise(1.0 + 1.0 / k))
        g2 = jnp.exp(gammaln_precise(1.0 + 2.0 / k))
        return lam**2 * (g2 - g1**2)


@dist_dataclass
class Logistic(Distribution):
    """LogisticDistribution[mu, s]."""

    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def log_prob(self, x):
        z = (_f(x) - _f(self.loc)) / _f(self.scale)
        logp = -z - 2.0 * jax.nn.softplus(-z) - log_precise_norm(_f(self.scale))
        return self._mask_support(_f(x), logp)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            shape, jnp.shape(self.loc), jnp.shape(self.scale)
        )
        u = jax.random.uniform(
            key, shape, dtype=jnp.result_type(float), minval=1e-12,
            maxval=1.0 - 1e-12,
        )
        return self.icdf(u)

    def cdf(self, x):
        return jax.nn.sigmoid((_f(x) - _f(self.loc)) / _f(self.scale))

    def icdf(self, q):
        q = _f(q)
        return _f(self.loc) + _f(self.scale) * (log_precise(q) - log1p_precise(-q))

    def mean(self):
        return _f(self.loc)

    def variance(self):
        return (_f(self.scale) * jnp.pi) ** 2 / 3.0


@dist_dataclass
class ChiSquared(Distribution):
    """ChiSquareDistribution[df] == Gamma(df/2, rate 1/2)."""

    df: jnp.ndarray = 1.0

    def support(self):
        return (0.0, jnp.inf)

    def _gamma(self):
        return Gamma(a=0.5 * _f(self.df), rate=0.5)

    def log_prob(self, x):
        return self._gamma().log_prob(x)

    def sample(self, key, shape=()):
        return self._gamma().sample(key, shape)

    def cdf(self, x):
        return self._gamma().cdf(x)

    def mean(self):
        return _f(self.df)

    def variance(self):
        return 2.0 * _f(self.df)


@dist_dataclass
class Gumbel(Distribution):
    """Gumbel / ExtremeValueDistribution[mu, beta] (max form)."""

    loc: jnp.ndarray = 0.0
    scale: jnp.ndarray = 1.0

    def log_prob(self, x):
        z = (_f(x) - _f(self.loc)) / _f(self.scale)
        logp = -(z + jnp.exp(-z)) - log_precise_norm(_f(self.scale))
        return self._mask_support(_f(x), logp)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            shape, jnp.shape(self.loc), jnp.shape(self.scale)
        )
        g = jax.random.gumbel(key, shape, dtype=jnp.result_type(float))
        return _f(self.loc) + _f(self.scale) * g

    def cdf(self, x):
        z = (_f(x) - _f(self.loc)) / _f(self.scale)
        return jnp.exp(-jnp.exp(-z))

    def icdf(self, q):
        return _f(self.loc) - _f(self.scale) * log_precise(-log_precise(_f(q)))

    def mean(self):
        return _f(self.loc) + _f(self.scale) * 0.5772156649015329

    def variance(self):
        return (jnp.pi * _f(self.scale)) ** 2 / 6.0


@dist_dataclass
class Pareto(Distribution):
    """ParetoDistribution[xmin, alpha]: p(x) = a xmin^a / x^(a+1), x >= xmin."""

    xmin: jnp.ndarray = 1.0
    alpha: jnp.ndarray = 1.0

    def support(self):
        return (_f(self.xmin), jnp.inf)

    def log_prob(self, x):
        x, m, a = _f(x), _f(self.xmin), _f(self.alpha)
        safe = jnp.where(x > 0, x, 1.0)
        logp = (
            log_precise_norm(a) + a * log_precise_norm(m)
            - (a + 1.0) * log_precise(safe)
        )
        return self._mask_support(x, logp)

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(
            shape, jnp.shape(self.xmin), jnp.shape(self.alpha)
        )
        u = jax.random.uniform(key, shape, dtype=jnp.result_type(float))
        return self.icdf(u)

    def cdf(self, x):
        r = _f(self.xmin) / jnp.maximum(_f(x), _f(self.xmin))
        return 1.0 - r ** _f(self.alpha)

    def icdf(self, q):
        return _f(self.xmin) * (1.0 - _f(q)) ** (-1.0 / _f(self.alpha))

    def mean(self):
        a = _f(self.alpha)
        return jnp.where(a > 1, a * _f(self.xmin) / (a - 1.0), jnp.inf)

    def variance(self):
        a, m = _f(self.alpha), _f(self.xmin)
        v = m**2 * a / ((a - 1.0) ** 2 * (a - 2.0))
        return jnp.where(a > 2, v, jnp.inf)


@dist_dataclass
class NegativeBinomial(Distribution):
    """NegativeBinomialDistribution[r, p]: number of failures before the
    r-th success; P(x) = C(x+r-1, x) p^r (1-p)^x."""

    r: jnp.ndarray = 1.0
    p: jnp.ndarray = 0.5

    def support(self):
        return (0.0, jnp.inf)

    def log_prob(self, x):
        x, r, p = _f(x), _f(self.r), _f(self.p)
        logp = (
            gammaln_precise(x + r)
            - gammaln_precise(r)
            - gammaln_precise(x + 1.0)
            + r * log_precise_norm(p)
            + xlogy(x, 1.0 - p)
        )
        is_int = x == jnp.floor(x)
        return jnp.where(
            is_int, self._mask_support(x, logp), log_zero(logp.dtype)
        )

    def sample(self, key, shape=()):
        # Gamma-Poisson mixture: lam ~ Gamma(r, p/(1-p)), x ~ Poisson(lam)
        shape = jnp.broadcast_shapes(
            shape, jnp.shape(self.r), jnp.shape(self.p)
        )
        k1, k2 = jax.random.split(key)
        r, p = _f(self.r), _f(self.p)
        lam = jax.random.gamma(key=k1, a=r, shape=shape) * (1.0 - p) / p
        return jax.random.poisson(k2, lam, shape).astype(jnp.result_type(float))

    def mean(self):
        r, p = _f(self.r), _f(self.p)
        return r * (1.0 - p) / p

    def variance(self):
        r, p = _f(self.r), _f(self.p)
        return r * (1.0 - p) / p**2


@dist_dataclass
class Geometric(Distribution):
    """GeometricDistribution[p]: failures before the first success;
    P(x) = p (1-p)^x, x = 0, 1, 2, ..."""

    p: jnp.ndarray = 0.5

    def support(self):
        return (0.0, jnp.inf)

    def log_prob(self, x):
        x, p = _f(x), _f(self.p)
        logp = log_precise_norm(p) + xlogy(x, 1.0 - p)
        is_int = x == jnp.floor(x)
        return jnp.where(
            is_int, self._mask_support(x, logp), log_zero(logp.dtype)
        )

    def sample(self, key, shape=()):
        shape = jnp.broadcast_shapes(shape, jnp.shape(self.p))
        u = jax.random.uniform(
            key, shape, dtype=jnp.result_type(float), minval=1e-12
        )
        return jnp.floor(log_precise(u) / log1p_precise(-_f(self.p)))

    def mean(self):
        return (1.0 - _f(self.p)) / _f(self.p)

    def variance(self):
        return (1.0 - _f(self.p)) / _f(self.p) ** 2


@dist_dataclass
class Categorical(Distribution):
    """Categorical over {0, ..., k-1} parameterized by logits [..., k]
    (unnormalized log-probabilities) — the multi-class extension of
    :class:`BernoulliLogits` for softmax regression models.  The
    reference's classification example is binary only (README.md:48-52);
    this generalizes it."""

    logits: jnp.ndarray  # [..., k]

    def support(self):
        return (0.0, jnp.shape(self.logits)[-1] - 1.0)

    def log_prob(self, x):
        x, l = _f(x), _f(self.logits)
        k = l.shape[-1]
        logp_all = jax.nn.log_softmax(l, axis=-1)
        batch = jnp.broadcast_shapes(jnp.shape(x), logp_all.shape[:-1])
        logp_all = jnp.broadcast_to(logp_all, batch + (k,))
        xi = jnp.clip(x.astype(jnp.int32), 0, k - 1)
        xi = jnp.broadcast_to(xi, batch)
        logp = jnp.take_along_axis(logp_all, xi[..., None], axis=-1)[..., 0]
        valid = (x >= 0) & (x <= k - 1) & (x == jnp.floor(x))
        return jnp.where(
            valid & jnp.isfinite(logp), logp, log_zero(logp.dtype)
        )

    def sample(self, key, shape=()):
        l = _f(self.logits)
        out_shape = tuple(shape) + l.shape[:-1]
        return jax.random.categorical(key, l, axis=-1, shape=out_shape).astype(
            jnp.result_type(float)
        )

    def _probs(self):
        return jax.nn.softmax(_f(self.logits), axis=-1)

    def mean(self):
        p = self._probs()
        i = jnp.arange(p.shape[-1], dtype=p.dtype)
        return jnp.sum(p * i, axis=-1)

    def variance(self):
        p = self._probs()
        i = jnp.arange(p.shape[-1], dtype=p.dtype)
        m = jnp.sum(p * i, axis=-1)
        return jnp.sum(p * i * i, axis=-1) - m * m


__all__.append("Categorical")
