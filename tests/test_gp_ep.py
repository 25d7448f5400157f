"""Expectation propagation for latent GPs (ops/gp_ep.py).

Oracles: (1) at n=3 the EP logZ must sit CLOSER to the exact marginal
(tensor-product Gauss-Hermite over the latent f) than the Laplace logZ,
and within a tight absolute tolerance — the classic probit result;
(2) the stable-form posterior moments must match dense formulas with
explicit inverses at the converged sites; (3) the stationary custom-VJP
hyperparameter gradient must match central finite differences; (4) the
EP fixed point must satisfy the moment-matching conditions (tilted and
approximate marginal moments agree per site); (5) the classifier
surface with method="ep" must agree with method="laplace" predictions
on a well-determined problem.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu.core.numerics import is_log_zero
from bayesianinference_tpu.engines.gp_classify import (
    define_gp_classifier,
    predict_from_gp_classifier,
)
from bayesianinference_tpu.ops.gp_ep import (
    gp_ep_latent_moments,
    gp_ep_log_marginal,
    gp_ep_state,
)
from bayesianinference_tpu.ops.gp_kernels import covariance_matrix, se_kernel
from bayesianinference_tpu.ops.gp_laplace import (
    bernoulli_logit_likelihood,
    bernoulli_probit_likelihood,
    gp_laplace_log_marginal,
    poisson_log_likelihood,
)

ALL_LIKS = [
    bernoulli_logit_likelihood(),
    bernoulli_probit_likelihood(),
    poisson_log_likelihood(),
]


def _toy(n=14, seed=0, counts=False):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, size=(n, 1)), axis=0))
    k = covariance_matrix(se_kernel(2.0, 1.0), x, 1e-8)
    f = jnp.asarray(np.linalg.cholesky(np.asarray(k)) @ rng.normal(size=n))
    if counts:
        y = jnp.asarray(rng.poisson(np.exp(np.asarray(f))), jnp.float64)
    else:
        y = jnp.asarray(
            (rng.uniform(size=n) < 1 / (1 + np.exp(-np.asarray(f)))).astype(
                float
            )
        )
    return x, y, k


def _exact_logz_gh(k, y, lik, order=60):
    """Exact marginal at n=3 by tensor Gauss-Hermite over f ~ N(0, K)."""
    from scipy.special import logsumexp as sp_logsumexp

    nodes, weights = np.polynomial.hermite_e.hermegauss(order)
    l = np.linalg.cholesky(np.asarray(k))
    g1, g2, g3 = np.meshgrid(nodes, nodes, nodes, indexing="ij")
    zs = np.stack([g1.ravel(), g2.ravel(), g3.ravel()], axis=-1)
    fs = zs @ l.T
    lw = np.log(weights) - 0.5 * np.log(2 * np.pi)
    iw = np.add.outer(np.add.outer(lw, lw), lw).ravel()
    lpf = jax.vmap(jax.vmap(lik.log_prob, in_axes=(0, 0)), in_axes=(0, None))
    ll = np.asarray(jnp.sum(lpf(jnp.asarray(fs), y), axis=-1))
    return sp_logsumexp(iw + ll) - 3 * sp_logsumexp(lw)


@pytest.mark.parametrize(
    "lik", ALL_LIKS[:2], ids=lambda l: l.name
)
def test_ep_logz_beats_laplace_near_exact_tiny_n(lik):
    x = jnp.asarray([[-1.0], [0.2], [1.4]])
    y = jnp.asarray([0.0, 1.0, 1.0])
    k = covariance_matrix(se_kernel(1.5, 1.0), x, 1e-8)
    exact = _exact_logz_gh(k, y, lik)
    ep = float(gp_ep_log_marginal(k, y, lik))
    lap = float(gp_laplace_log_marginal(k, y, lik))
    assert abs(ep - exact) < 0.01, (ep, exact)
    assert abs(ep - exact) < abs(lap - exact), (ep, lap, exact)


def test_ep_logz_poisson_tiny_n():
    lik = poisson_log_likelihood()
    x = jnp.asarray([[-1.0], [0.2], [1.4]])
    y = jnp.asarray([0.0, 2.0, 4.0])
    k = covariance_matrix(se_kernel(1.2, 1.0), x, 1e-8)
    exact = _exact_logz_gh(k, y, lik)
    ep = float(gp_ep_log_marginal(k, y, lik))
    assert abs(ep - exact) < 0.03, (ep, exact)


@pytest.mark.parametrize("lik", ALL_LIKS, ids=lambda l: l.name)
def test_ep_posterior_matches_dense_formulas(lik):
    """Stable-form mu/sigma2 vs (K^-1 + S)^-1 with explicit inverses."""
    x, y, k = _toy(seed=1, counts=lik.name == "poisson_log")
    state = gp_ep_state(k, y, lik)
    kn = np.asarray(k)
    s = np.diag(np.asarray(state.tau))
    cov = np.linalg.inv(np.linalg.inv(kn) + s)
    mu = cov @ np.asarray(state.nu)
    np.testing.assert_allclose(np.asarray(state.mu), mu, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(state.sigma2), np.diag(cov), atol=1e-8
    )


def test_ep_fixed_point_moment_matching():
    """At convergence, each tilted marginal's mean/variance equals the
    approximate posterior marginal's (the EP defining property)."""
    lik = bernoulli_logit_likelihood()
    x, y, k = _toy(seed=2)
    state = gp_ep_state(k, y, lik, maxiter=200, tol=1e-12)
    tau_cav = 1.0 / np.asarray(state.sigma2) - np.asarray(state.tau)
    nu_cav = np.asarray(state.mu) / np.asarray(state.sigma2) - np.asarray(
        state.nu
    )
    mu_cav, s2_cav = nu_cav / tau_cav, 1.0 / tau_cav
    # tilted moments by brute-force 1-D quadrature per site
    zs = np.linspace(-12, 12, 40001)
    for i in range(y.shape[0]):
        f = mu_cav[i] + np.sqrt(s2_cav[i]) * zs
        dens = np.exp(
            np.asarray(
                jax.vmap(lik.log_prob, in_axes=(0, None))(
                    jnp.asarray(f), y[i]
                )
            )
            - 0.5 * zs**2
        )
        z0 = np.trapezoid(dens, f)
        m1 = np.trapezoid(f * dens, f) / z0
        m2 = np.trapezoid(f**2 * dens, f) / z0
        np.testing.assert_allclose(float(state.mu[i]), m1, atol=5e-6)
        np.testing.assert_allclose(
            float(state.sigma2[i]), m2 - m1**2, atol=5e-6
        )


@pytest.mark.parametrize("lik", ALL_LIKS, ids=lambda l: l.name)
def test_ep_hyperparameter_gradient_matches_finite_differences(lik):
    x, y, _ = _toy(seed=3, counts=lik.name == "poisson_log")

    def logml(theta):
        k = covariance_matrix(
            se_kernel(jnp.exp(theta[0]), jnp.exp(theta[1])), x, 1e-8
        )
        return gp_ep_log_marginal(k, y, lik, maxiter=200, tol=1e-13)

    theta0 = jnp.asarray([0.4, -0.3])
    g = jax.grad(logml)(theta0)
    eps = 1e-5
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (float(logml(theta0 + e)) - float(logml(theta0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=5e-4, atol=1e-7)


def test_ep_latent_moments_match_dense_formulas():
    lik = bernoulli_probit_likelihood()
    x, y, k = _toy(seed=4)
    xq = jnp.asarray([[-2.5], [0.1], [2.2]])
    kern = se_kernel(2.0, 1.0)
    kc = kern.matrix(x, xq)
    kqd = kern.diag(xq) + 1e-8
    mu, var = gp_ep_latent_moments(k, y, lik, kc, kqd)
    state = gp_ep_state(k, y, lik)
    kn, kcn = np.asarray(k), np.asarray(kc)
    s_inv = np.diag(1.0 / np.asarray(state.tau))
    mu_site = np.asarray(state.nu) / np.asarray(state.tau)
    a = np.linalg.solve(kn + s_inv, mu_site)
    np.testing.assert_allclose(np.asarray(mu), kcn.T @ a, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(var),
        np.asarray(kqd) - np.diag(kcn.T @ np.linalg.solve(kn + s_inv, kcn)),
        atol=1e-7,
    )


def test_classifier_surface_with_ep_method():
    rng = np.random.default_rng(5)
    n = 50
    x = np.sort(rng.uniform(-3, 3, size=(n, 1)), axis=0)
    p = 1 / (1 + np.exp(-3.0 * np.sin(1.5 * x[:, 0])))
    y = (rng.uniform(size=n) < p).astype(float)

    def build(method):
        return define_gp_classifier(
            x,
            y,
            lambda th: se_kernel(th[0] ** 2, th[1]),
            parameters=[("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
            method=method,
            prior_distribution=["scale", "scale"],
            validate=False,
        )

    prob_ep = build("ep")
    # sentinel guard on absurd hyperparameters
    assert bool(
        is_log_zero(prob_ep.log_likelihood(jnp.asarray([jnp.nan, 1.0])))
    )
    # jit + vmap over hyperparameter batches (the engine hot path)
    thetas = jnp.asarray([[1.5, 1.0], [0.5, 0.4]])
    vals = jax.jit(jax.vmap(prob_ep.log_likelihood))(thetas)
    assert bool(jnp.all(jnp.isfinite(vals)))
    theta = jnp.asarray([1.7, 0.8])  # plausible hyperparameters
    xq = np.linspace(-3, 3, 21)[:, None]
    pred_ep = predict_from_gp_classifier(theta, prob_ep, xq)
    pm = np.asarray(pred_ep.mean)
    assert pm.shape == (21,) and np.all((pm >= 0) & (pm <= 1))
    # EP and Laplace class probabilities agree closely at the same theta
    prob_lap = build("laplace")
    pred_lap = predict_from_gp_classifier(theta, prob_lap, xq)
    np.testing.assert_allclose(pm, np.asarray(pred_lap.mean), atol=0.06)
    with pytest.raises(ValueError, match="method"):
        build("nope")
