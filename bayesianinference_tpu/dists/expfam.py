"""Exponential-family abstraction: natural parameters, log-partition,
conjugate updating and predictive densities.

From-scratch equivalent of ``ExponentialFamilyDefinitions.wl`` (EF:21-105
framework; EF:108-189 instances).  A family is described by callables; the
canonical density is  h(x) * exp(eta . T(x) - A(eta))  and the conjugate
prior over eta is  exp(eta . chi - nu * A(eta) - B(chi, nu))  where
B = log_conjugate_partition.  The posterior update is
(chi, nu) -> (chi + sum_i T(x_i), nu + n)  and the predictive density is
the partition ratio with (chi + T(x), nu + 1)  (EF:84-97).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from ..core.numerics import LOG2PI
from ..core.precise import exp_precise, gammaln_precise, log_precise

__all__ = [
    "ExponentialFamily",
    "EXPONENTIAL",
    "NORMAL",
    "POISSON",
    "LOG_NORMAL",
    "GAMMA",
    "INVERSE_GAMMA",
    "GAMMA_FIXED_SHAPE",
    "conjugate_update",
]



def _f(x):
    return jnp.asarray(x, jnp.result_type(jnp.asarray(x).dtype, float))


@dataclasses.dataclass(frozen=True)
class ExponentialFamily:
    """An exponential family in natural coordinates (EF:21-105)."""

    name: str
    natural_parameters: Callable  # standard params -> eta [k]
    log_partition: Callable  # eta [k] -> A(eta)
    log_base_measure: Callable  # x -> log h(x)
    sufficient_statistic: Callable  # x -> T(x) [k]
    natural_parameter_count: int
    # B(chi, nu): normalizer of the conjugate prior; None if not closed-form
    log_conjugate_partition: Optional[Callable] = None
    # eta -> bool: the natural-parameter region where A(eta) is finite
    # (``naturalParametersAssumptions``/``naturalParametersRegion``,
    # EF:99-105); None means all of R^k
    natural_parameter_support: Optional[Callable] = None
    # standard-parameter region check (``parametersRegion``, EF:99-105)
    parameter_support: Optional[Callable] = None

    def log_pdf(self, x, eta):
        """Canonical log-density  (``cannonicalPDF``, EF:60-66)."""
        t = self.sufficient_statistic(x)
        dot = jnp.sum(jnp.asarray(eta) * jnp.asarray(t), axis=-1)
        return self.log_base_measure(x) + dot - self.log_partition(eta)

    def log_conjugate_kernel(self, eta, chi, nu):
        """log of  exp(eta . chi - nu A(eta))  (``conjugateKernel``, EF:68-74)."""
        dot = jnp.sum(jnp.asarray(eta) * jnp.asarray(chi), axis=-1)
        return dot - _f(nu) * self.log_partition(eta)

    def log_conjugate_pdf(self, eta, chi, nu):
        """Normalized conjugate-prior log-density (``conjugatePDF``, EF:76-82)."""
        if self.log_conjugate_partition is None:
            raise NotImplementedError(
                f"no closed-form conjugate partition for {self.name}"
            )
        return self.log_conjugate_kernel(eta, chi, nu) - self.log_conjugate_partition(
            chi, nu
        )

    def log_predictive_pdf(self, x, chi, nu):
        """Posterior-predictive log-density as a partition ratio
        (``predictivePDF``, EF:84-97)."""
        if self.log_conjugate_partition is None:
            raise NotImplementedError(
                f"no closed-form conjugate partition for {self.name}"
            )
        t = self.sufficient_statistic(x)
        chi1 = jnp.asarray(chi) + jnp.asarray(t)
        return (
            self.log_base_measure(x)
            + self.log_conjugate_partition(chi1, _f(nu) + 1.0)
            - self.log_conjugate_partition(chi, nu)
        )


def conjugate_update(family: ExponentialFamily, chi, nu, data):
    """(chi, nu) -> (chi + sum T(x_i), nu + n): the conjugate posterior update."""
    data = jnp.asarray(data)
    t = family.sufficient_statistic(data)  # [n, k]
    t = jnp.atleast_2d(t)
    return jnp.asarray(chi) + jnp.sum(t, axis=0), _f(nu) + t.shape[0]


# ---------------------------------------------------------------------------
# Instances (EF:108-189)
# ---------------------------------------------------------------------------

EXPONENTIAL = ExponentialFamily(
    name="Exponential",
    # ExponentialDistribution[lambda]: eta = -lambda (EF:108-121)
    natural_parameters=lambda lam: jnp.stack([-_f(lam)], axis=-1),
    log_partition=lambda eta: -log_precise(-jnp.asarray(eta)[..., 0]),
    log_base_measure=lambda x: jnp.zeros_like(_f(x)),
    sufficient_statistic=lambda x: jnp.stack([_f(x)], axis=-1),
    natural_parameter_count=1,
    natural_parameter_support=lambda eta: jnp.asarray(eta)[..., 0] < 0,
    parameter_support=lambda lam: _f(lam) > 0,
    # int exp(eta chi + nu log(-eta)) deta over eta<0 = Gamma(nu+1)/chi^(nu+1)
    log_conjugate_partition=lambda chi, nu: gammaln_precise(_f(nu) + 1.0)
    - (_f(nu) + 1.0) * log_precise(jnp.asarray(chi)[..., 0]),
)


def _normal_nat(mu, var):
    mu, var = _f(mu), _f(var)
    return jnp.stack([mu / var, -0.5 / var], axis=-1)


def _normal_logpart(eta):
    e1 = jnp.asarray(eta)[..., 0]
    e2 = jnp.asarray(eta)[..., 1]
    return -(e1 * e1) / (4.0 * e2) - 0.5 * log_precise(-2.0 * e2)


def _nig_log_partition(chi, nu):
    """Normalizer of the Normal conjugate prior in *natural* coordinates
    (the NIG normalizer; closed form of EF:125-156):

      B(chi, nu) = int exp(eta . chi - nu A(eta)) d eta
                 = sqrt(2 pi / nu) / 2 * Gamma(a) / b^a

    with  a = nu/2 + 3/2,  b = (chi2 - chi1^2 / nu) / 2,  obtained by the
    substitution eta1 = mu/v, eta2 = -1/(2v) (Jacobian 1/(2 v^3)), a Gaussian
    integral over mu, and a Gamma integral over v.  Requires chi2 > chi1^2/nu
    (always true for chi accumulated from real data).
    """
    chi = jnp.asarray(chi)
    c1, c2 = chi[..., 0], chi[..., 1]
    nu = _f(nu)
    a = 0.5 * nu + 1.5
    b = 0.5 * (c2 - c1 * c1 / nu)
    return (
        0.5 * log_precise(2.0 * jnp.pi / nu)
        - log_precise(2.0)
        + gammaln_precise(a)
        - a * log_precise(b)
    )


NORMAL = ExponentialFamily(
    name="Normal",
    natural_parameters=lambda mu, var: _normal_nat(mu, var),
    log_partition=_normal_logpart,
    log_base_measure=lambda x: jnp.full(jnp.shape(_f(x)), -0.5 * LOG2PI),
    sufficient_statistic=lambda x: jnp.stack([_f(x), _f(x) ** 2], axis=-1),
    natural_parameter_count=2,
    log_conjugate_partition=_nig_log_partition,
    natural_parameter_support=lambda eta: jnp.asarray(eta)[..., 1] < 0,
    parameter_support=lambda mu, var: _f(var) > 0,
)

POISSON = ExponentialFamily(
    name="Poisson",
    # eta = log lambda (EF:160-165)
    natural_parameters=lambda lam: jnp.stack([log_precise(_f(lam))], axis=-1),
    log_partition=lambda eta: exp_precise(jnp.asarray(eta)[..., 0]),
    log_base_measure=lambda x: -gammaln_precise(_f(x) + 1.0),
    sufficient_statistic=lambda x: jnp.stack([_f(x)], axis=-1),
    natural_parameter_count=1,
    # int exp(eta chi - nu e^eta) deta = Gamma(chi)/nu^chi
    log_conjugate_partition=lambda chi, nu: gammaln_precise(jnp.asarray(chi)[..., 0])
    - jnp.asarray(chi)[..., 0] * log_precise(_f(nu)),
    natural_parameter_support=lambda eta: jnp.isfinite(
        jnp.asarray(eta)[..., 0]
    ),
    parameter_support=lambda lam: _f(lam) > 0,
)

LOG_NORMAL = ExponentialFamily(
    name="LogNormal",
    # Normal family on log x with extra 1/x base measure (EF:168-173)
    natural_parameters=lambda mu, var: _normal_nat(mu, var),
    log_partition=_normal_logpart,
    log_base_measure=lambda x: -0.5 * LOG2PI - log_precise(_f(x)),
    sufficient_statistic=lambda x: jnp.stack(
        [log_precise(_f(x)), log_precise(_f(x)) ** 2], axis=-1
    ),
    natural_parameter_count=2,
    log_conjugate_partition=_nig_log_partition,
)

GAMMA = ExponentialFamily(
    name="Gamma",
    # GammaDistribution[k, theta] (shape/scale): eta = (k - 1, -1/theta),
    # T(x) = (log x, x), A = logGamma(eta1 + 1) - (eta1 + 1) log(-eta2),
    # h = 1 (EF:176-181).  No closed-form conjugate partition exists (the
    # reference defines none either): conjugate_update still accumulates
    # (chi, nu) exactly; normalized conjugate/predictive densities raise.
    natural_parameters=lambda k, theta: jnp.stack(
        [_f(k) - 1.0, -1.0 / _f(theta)], axis=-1
    ),
    log_partition=lambda eta: gammaln_precise(jnp.asarray(eta)[..., 0] + 1.0)
    - (jnp.asarray(eta)[..., 0] + 1.0) * log_precise(-jnp.asarray(eta)[..., 1]),
    log_base_measure=lambda x: jnp.zeros(jnp.shape(_f(x))),
    sufficient_statistic=lambda x: jnp.stack([log_precise(_f(x)), _f(x)], axis=-1),
    natural_parameter_count=2,
    natural_parameter_support=lambda eta: jnp.logical_and(
        jnp.asarray(eta)[..., 0] > -1.0, jnp.asarray(eta)[..., 1] < 0
    ),
    parameter_support=lambda k, theta: jnp.logical_and(
        _f(k) > 0, _f(theta) > 0
    ),
)

INVERSE_GAMMA = ExponentialFamily(
    name="InverseGamma",
    # InverseGammaDistribution[a, b]: eta = (-a - 1, -b),
    # T(x) = (log x, 1/x), A = logGamma(-eta1 - 1) - (-eta1 - 1) log(-eta2),
    # h = 1 (EF:184-189).  As for Gamma, no closed-form conjugate partition.
    natural_parameters=lambda a, b: jnp.stack(
        [-_f(a) - 1.0, -_f(b)], axis=-1
    ),
    log_partition=lambda eta: gammaln_precise(-jnp.asarray(eta)[..., 0] - 1.0)
    - (-jnp.asarray(eta)[..., 0] - 1.0) * log_precise(-jnp.asarray(eta)[..., 1]),
    log_base_measure=lambda x: jnp.zeros(jnp.shape(_f(x))),
    sufficient_statistic=lambda x: jnp.stack(
        [log_precise(_f(x)), 1.0 / _f(x)], axis=-1
    ),
    natural_parameter_count=2,
    natural_parameter_support=lambda eta: jnp.logical_and(
        jnp.asarray(eta)[..., 0] < -1.0, jnp.asarray(eta)[..., 1] < 0
    ),
    parameter_support=lambda a, b: jnp.logical_and(_f(a) > 0, _f(b) > 0),
)

GAMMA_FIXED_SHAPE = ExponentialFamily(
    name="GammaFixedShape",
    # Gamma with known shape alpha, unknown rate: eta = -beta, T = x,
    # A = -alpha log(-eta); conjugate partition = Gamma(alpha nu + 1)/chi^(.)
    # (the tractable sub-case of EF:176-181's two-parameter Gamma instance).
    natural_parameters=lambda alpha, beta: jnp.stack([-_f(beta)], axis=-1),
    log_partition=None,  # set per-alpha via bind_gamma_shape
    log_base_measure=None,
    sufficient_statistic=lambda x: jnp.stack([_f(x)], axis=-1),
    natural_parameter_count=1,
)


def bind_gamma_shape(alpha) -> ExponentialFamily:
    """Instantiate the fixed-shape Gamma family for a concrete alpha."""
    alpha = _f(alpha)
    return dataclasses.replace(
        GAMMA_FIXED_SHAPE,
        log_partition=lambda eta: -alpha * log_precise(-jnp.asarray(eta)[..., 0]),
        log_base_measure=lambda x: (alpha - 1.0) * log_precise(_f(x))
        - gammaln_precise(alpha),
        log_conjugate_partition=lambda chi, nu: gammaln_precise(alpha * _f(nu) + 1.0)
        - (alpha * _f(nu) + 1.0) * log_precise(jnp.asarray(chi)[..., 0]),
    )


__all__.append("bind_gamma_shape")
