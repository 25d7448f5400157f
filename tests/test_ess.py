"""Elliptical slice sampling (ops/ess.py + engines.gp_classify latents).

Oracles: (1) with a GAUSSIAN likelihood the latent posterior is exact —
N(K(K+s^2 I)^-1 y, K - K(K+s^2 I)^-1 K) — and the pooled ESS draws must
reproduce its mean and marginal variances; (2) with a constant
likelihood ESS must leave the N(0, K) prior invariant; (3) the
engine-level sampler on a Bernoulli-logit GP must land near the Laplace
mode with healthy move counts; (4) ``latent_draws_at`` conditional
means must match the closed-form GP posterior mean under oracle (1).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinference_tpu.engines.gp_classify import (
    define_gp_classifier,
    latent_draws_at,
    sample_gp_latents,
)
from bayesianinference_tpu.ops.ess import ess_sample, run_ess_chain
from bayesianinference_tpu.ops.gp_kernels import covariance_matrix, se_kernel
from bayesianinference_tpu.ops.gp_laplace import (
    gp_laplace_mode,
    latent_likelihood,
)


def _setup(n=12, seed=3, sigma=0.5):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, size=(n, 1)), axis=0))
    k = covariance_matrix(se_kernel(1.5, 1.0), x, 1e-10)
    f_true = jnp.asarray(np.linalg.cholesky(np.asarray(k)) @ rng.normal(size=n))
    y = f_true + sigma * jnp.asarray(rng.normal(size=n))
    return x, k, y


def _gaussian_posterior(k, y, sigma):
    n = y.shape[0]
    a = np.linalg.solve(np.asarray(k) + sigma**2 * np.eye(n), np.asarray(y))
    mean = np.asarray(k) @ a
    cov = np.asarray(k) - np.asarray(k) @ np.linalg.solve(
        np.asarray(k) + sigma**2 * np.eye(n), np.asarray(k)
    )
    return mean, cov


def test_ess_matches_exact_gaussian_posterior():
    sigma = 0.5
    x, k, y = _setup()
    mean_ex, cov_ex = _gaussian_posterior(k, y, sigma)
    chol = jnp.linalg.cholesky(k)

    def log_lik(f):
        return -0.5 * jnp.sum(((y - f) / sigma) ** 2)

    num_chains, num_samples = 48, 192

    def one(key):
        d, _ = ess_sample(
            key, jnp.zeros_like(y), log_lik, chol, num_samples,
            burn_in=96, thin=2,
        )
        return d

    draws = jax.vmap(one)(jax.random.split(jax.random.key(0), num_chains))
    pooled = np.asarray(draws).reshape(-1, y.shape[0])

    sd = np.sqrt(np.diag(cov_ex))
    # MC error on the pooled mean: generous because thinned draws correlate
    assert np.all(np.abs(pooled.mean(0) - mean_ex) < 0.15 * sd + 0.02)
    assert np.allclose(pooled.var(0), np.diag(cov_ex), rtol=0.25, atol=5e-3)


def test_ess_prior_invariance():
    x, k, _ = _setup(n=6, seed=5)
    chol = jnp.linalg.cholesky(k)
    const = lambda f: jnp.asarray(0.0, f.dtype)

    def one(key):
        d, _ = ess_sample(
            key, jnp.zeros((6,), k.dtype), const, chol, 128,
            burn_in=32, thin=1,
        )
        return d

    draws = jax.vmap(one)(jax.random.split(jax.random.key(1), 64))
    pooled = np.asarray(draws).reshape(-1, 6)
    assert np.allclose(pooled.mean(0), 0.0, atol=0.12)
    assert np.allclose(
        np.cov(pooled.T), np.asarray(k), rtol=0.3, atol=0.08
    )


def test_ess_always_moves_and_counts_evals():
    x, k, y = _setup(n=8, seed=7)
    chol = jnp.linalg.cholesky(k)

    def log_lik(f):
        return -0.5 * jnp.sum((y[:8] - f) ** 2)

    state = run_ess_chain(
        jax.random.key(2), jnp.zeros((8,), k.dtype), log_lik, chol, 50
    )
    assert int(state.moved) == 50  # ESS never rejects within the bound
    assert int(state.evals) >= 51  # init + >= 1 proposal per move
    assert np.isfinite(float(state.log_lik))


def test_sample_gp_latents_bernoulli():
    rng = np.random.default_rng(11)
    n = 10
    x = np.sort(rng.uniform(-2, 2, size=(n, 1)), axis=0)
    y = (rng.uniform(size=n) < 0.5).astype(float)
    problem = define_gp_classifier(
        x, y,
        lambda th: se_kernel(th[0], th[1]),
        [("ell", 0.1, 10.0), ("amp", 0.1, 10.0)],
        likelihood="bernoulli_logit",
        validate=False,
    )
    theta = jnp.asarray([1.0, 1.0])
    out = sample_gp_latents(
        jax.random.key(3), problem, theta, 64,
        num_chains=8, burn_in=64, thin=1,
    )
    assert out.draws.shape == (8, 64, n)
    assert np.all(np.isfinite(np.asarray(out.draws)))
    assert np.all(np.asarray(out.moved) >= 120)  # ~128 updates per chain

    model = problem.metadata["gp_classifier"]
    k = model._k(theta)
    f_hat, _ = gp_laplace_mode(k, jnp.asarray(y), model.likelihood, 50)
    pooled = np.asarray(out.draws).reshape(-1, n)
    # the exact posterior mean of a log-concave likelihood sits near the
    # Laplace mode; bound the gap by the prior scale
    assert np.all(np.abs(pooled.mean(0) - np.asarray(f_hat)) < 0.5)


def test_latent_draws_at_matches_gp_posterior_mean():
    sigma = 0.4
    x, k, y = _setup(n=12, seed=13, sigma=sigma)
    lik = latent_likelihood(
        lambda f, yy: -0.5 * ((yy - f) / sigma) ** 2, lambda f: f, "gauss"
    )
    problem = define_gp_classifier(
        x, np.asarray(y),
        lambda th: se_kernel(1.5, 1.0),
        [("dummy", 0.1, 10.0)],
        likelihood=lik,
        jitter=1e-10,
        validate=False,
    )
    theta = jnp.asarray([1.0])
    out = sample_gp_latents(
        jax.random.key(4), problem, theta, 128,
        num_chains=16, burn_in=96, thin=2,
    )
    xq = jnp.asarray([[-1.7], [0.3], [2.1]])
    mu_q = latent_draws_at(problem, theta, out.draws, xq)
    assert mu_q.shape == (16, 128, 3)

    # closed form: E[f*] = k*^T (K + s^2 I)^{-1} y
    kernel = se_kernel(1.5, 1.0)
    k_cross = np.asarray(kernel.matrix(x, xq))
    a = np.linalg.solve(
        np.asarray(k) + sigma**2 * np.eye(12), np.asarray(y)
    )
    exact = k_cross.T @ a
    got = np.asarray(mu_q).reshape(-1, 3).mean(0)
    assert np.all(np.abs(got - exact) < 0.1)

    # colored joint draws at the queries have the conditional spread
    fq = latent_draws_at(
        problem, theta, out.draws, xq, key=jax.random.key(5)
    )
    assert fq.shape == (16, 128, 3)
    assert np.asarray(fq).std(axis=(0, 1)).min() > np.asarray(
        mu_q
    ).std(axis=(0, 1)).min()
