"""Laplace-marginalized latent likelihoods: exactness on conditionally
Gaussian models, IFT gradients, vmap batching, and engine integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.models import define_inference_problem
from bayesianinference_tpu.models.marginalize import marginalize_latents

# Eight-schools structure: y_j ~ N(z_j, s_j^2), z_j ~ N(mu, tau^2).
# The exact marginal is y_j ~ N(mu, s_j^2 + tau^2) — Laplace is EXACT
# here (conditionally Gaussian latents), the canonical oracle.
Y8 = jnp.asarray([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
S8 = jnp.asarray([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def _joint8(theta, z):
    mu, log_tau = theta[0], theta[1]
    tau = jnp.exp(log_tau)
    lik = jnp.sum(d.Normal(z, S8).log_prob(Y8))
    prior = jnp.sum(d.Normal(mu, tau).log_prob(z))
    return lik + prior


def _exact8(theta):
    mu, log_tau = theta[0], theta[1]
    var = S8**2 + jnp.exp(2.0 * log_tau)
    return jnp.sum(d.Normal(mu, jnp.sqrt(var)).log_prob(Y8))


def test_exact_on_conditionally_gaussian():
    marg = marginalize_latents(_joint8, latent_dim=8)
    for theta in ([5.0, 1.5], [0.0, 0.0], [-3.0, 2.5]):
        th = jnp.asarray(theta)
        np.testing.assert_allclose(
            float(marg.log_density(th)), float(_exact8(th)), rtol=1e-8
        )


def test_ift_gradients_match_exact():
    """jax.grad through the collapsed likelihood must equal the gradient
    of the exact marginal — the re-attached Newton step carries the
    implicit dz*/dtheta."""
    marg = marginalize_latents(_joint8, latent_dim=8)
    th = jnp.asarray([4.0, 1.2])
    g_got = jax.grad(marg.log_density)(th)
    g_want = jax.grad(_exact8)(th)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_want), rtol=1e-6, atol=1e-8
    )


def test_hessian_over_theta():
    """With refine_steps=2 even the theta-Hessian matches the exact
    marginal's (enables Laplace-over-theta on collapsed models)."""
    marg = marginalize_latents(_joint8, latent_dim=8, refine_steps=2)
    th = jnp.asarray([4.0, 1.2])
    h_got = jax.hessian(marg.log_density)(th)
    h_want = jax.hessian(_exact8)(th)
    np.testing.assert_allclose(
        np.asarray(h_got), np.asarray(h_want), rtol=1e-4, atol=1e-6
    )


def test_latent_posterior_moments_exact():
    """Conditional q(z | y, theta) = N(z*, H^-1) equals the closed-form
    normal-normal posterior per school."""
    marg = marginalize_latents(_joint8, latent_dim=8)
    th = jnp.asarray([5.0, 1.5])
    z_hat, cov = marg.latent_posterior(th)
    tau2 = float(jnp.exp(2.0 * th[1]))
    s2 = np.asarray(S8) ** 2
    w = tau2 / (tau2 + s2)
    np.testing.assert_allclose(
        np.asarray(z_hat),
        w * np.asarray(Y8) + (1 - w) * float(th[0]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.diagonal(cov)), w * s2, rtol=1e-6
    )
    # off-diagonals vanish: schools are conditionally independent
    off = np.asarray(cov) - np.diag(np.diagonal(np.asarray(cov)))
    assert np.max(np.abs(off)) < 1e-8


def test_vmap_and_jit():
    marg = marginalize_latents(_joint8, latent_dim=8)
    thetas = jnp.asarray([[5.0, 1.5], [0.0, 0.5], [2.0, 2.0], [-1.0, 1.0]])
    batched = jax.jit(jax.vmap(marg.log_density))(thetas)
    singles = jnp.stack([marg.log_density(t) for t in thetas])
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(singles), rtol=1e-7
    )


def test_non_gaussian_latent_vs_quadrature():
    """One Poisson count with a log-normal latent rate:
    y ~ Poisson(exp(z)), z ~ N(theta, 0.5^2).  Laplace is approximate;
    it must land within 1% of a 200-node Gauss-Hermite quadrature of the
    true marginal, and the mode must satisfy stationarity."""
    y = 7.0

    def joint(theta, z):
        return float(0) + (
            d.Poisson(jnp.exp(z[0])).log_prob(y)
            + d.Normal(theta[0], 0.5).log_prob(z[0])
        )

    marg = marginalize_latents(joint, latent_dim=1)
    th = jnp.asarray([1.5])
    got = float(marg.log_density(th))

    # Gauss-Hermite oracle for int Poisson(y|e^z) N(z; th, .5^2) dz
    nodes, weights = np.polynomial.hermite_e.hermegauss(200)
    z = 1.5 + 0.5 * nodes
    from scipy import stats as sps

    vals = sps.poisson.logpmf(int(y), np.exp(z))
    want = np.log(np.sum(np.exp(vals) * weights) / np.sqrt(2 * np.pi))
    assert abs(got - want) < 0.01 * abs(want) + 0.01

    z_hat, _ = marg.latent_posterior(th)
    g = jax.grad(lambda zz: joint(th, zz))(z_hat)
    assert float(jnp.max(jnp.abs(g))) < 1e-4


def test_data_argument_threading():
    """joint(theta, z, data) form: swapping data changes the result and
    matches re-binding by closure."""

    def joint(theta, z, data):
        lik = jnp.sum(d.Normal(z, S8).log_prob(data))
        return lik + jnp.sum(d.Normal(theta[0], jnp.exp(theta[1])).log_prob(z))

    marg = marginalize_latents(joint, latent_dim=8)
    th = jnp.asarray([5.0, 1.5])
    a = float(marg.log_density(th, Y8))
    b = float(marg.log_density(th, Y8 + 1.0))
    assert a != b
    np.testing.assert_allclose(a, float(_exact8(th)), rtol=1e-8)


def test_engine_integration_eight_schools():
    """The collapsed likelihood drives a full engine: direct quadrature
    posterior over (mu, log tau) matches the same quadrature on the
    exact marginal to 1e-6 in log evidence."""
    from bayesianinference_tpu.engines import direct_posterior_distribution

    marg = marginalize_latents(_joint8, latent_dim=8)

    def make(loglike):
        return define_inference_problem(
            parameters=[("mu", -15.0, 25.0), ("log_tau", -2.0, 3.5)],
            log_likelihood=loglike,
            prior_distribution=[d.Uniform(-15.0, 25.0), d.Uniform(-2.0, 3.5)],
            validate=False,
        )

    post_c = direct_posterior_distribution(
        problem=make(marg.log_density), num_points=48
    )
    post_e = direct_posterior_distribution(
        problem=make(_exact8), num_points=48
    )
    np.testing.assert_allclose(
        float(post_c.log_evidence),
        float(post_e.log_evidence),
        rtol=1e-6,
    )


def test_failed_solve_returns_sentinel():
    """A joint density that is NaN everywhere must come back as the
    finite log-zero sentinel, not NaN (guarded-density convention)."""

    def joint(theta, z):
        return jnp.nan * (theta[0] + z[0])

    marg = marginalize_latents(joint, latent_dim=1, newton_steps=3)
    v = float(marg.log_density(jnp.asarray([1.0])))
    assert np.isfinite(v) and v < -1e250
