"""Pathfinder engine: conjugate-posterior oracle, low-rank covariance
recovery, importance-weight calibration, serving conventions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines import pathfinder_fit
from bayesianinference_tpu.models import define_inference_problem


def _conjugate_problem_and_truth(n_obs=40, seed=1):
    rng = np.random.default_rng(seed)
    data = rng.normal(1.2, 1.0, n_obs)
    tau0, mu0 = 3.0, 0.0
    problem = define_inference_problem(
        parameters=[("mu", -10.0, 10.0)],
        likelihood=lambda th: d.Normal(th[0], 1.0),
        data=jnp.asarray(data),
        prior_distribution=[d.Normal(mu0, tau0)],
        validate=False,
    )
    post_prec = 1 / tau0**2 + n_obs
    post_mean = (mu0 / tau0**2 + data.sum()) / post_prec
    post_sd = post_prec**-0.5
    cov = tau0**2 * np.ones((n_obs, n_obs)) + np.eye(n_obs)
    log_z = st.multivariate_normal(np.full(n_obs, mu0), cov).logpdf(data)
    return problem, post_mean, post_sd, log_z


def test_pathfinder_conjugate_oracle(key):
    problem, post_mean, post_sd, log_z = _conjugate_problem_and_truth()
    r = pathfinder_fit(problem, key)
    # IS identity integrates the evidence almost exactly for Gaussians
    np.testing.assert_allclose(float(r.log_evidence_is), log_z, atol=0.02)
    # ELBO lower-bounds logZ (MC slack) and is tight here
    assert float(r.elbo) < log_z + 0.05
    assert float(r.elbo) > log_z - 0.2, (float(r.elbo), log_z)
    # weighted posterior moments
    w = np.asarray(r.samples.normalized_weights())
    pts = np.asarray(r.samples.points)[:, 0]
    m = float(w @ pts)
    sd = float(np.sqrt(w @ (pts - m) ** 2))
    np.testing.assert_allclose(m, post_mean, atol=0.03)
    np.testing.assert_allclose(sd, post_sd, rtol=0.15)
    # pooled weights are well behaved for an exactly-Gaussian target
    assert float(r.pareto_k) < 0.7
    # per-path diagnostics have the advertised shapes
    assert r.elbo_per_path.shape == (r.num_paths,)
    assert r.best_iteration.shape == (r.num_paths,)


def test_pathfinder_recovers_correlation(key):
    # d=2 < 2*history exercises the reduced-QR branch of the factor
    rho = 0.9
    cov = np.asarray([[1.0, rho], [rho, 1.0]])
    mvn = d.MultivariateNormal(jnp.zeros(2), jnp.asarray(cov))
    problem = define_inference_problem(
        parameters=[("a", -8.0, 8.0), ("b", -8.0, 8.0)],
        log_likelihood=lambda th: mvn.log_prob(th),
        validate=False,
    )
    r = pathfinder_fit(problem, key, num_paths=6)
    w = np.asarray(r.samples.normalized_weights())
    pts = np.asarray(r.samples.points)
    m = w @ pts
    c = (pts - m).T @ (w[:, None] * (pts - m))
    np.testing.assert_allclose(m, 0.0, atol=0.05)
    np.testing.assert_allclose(c, cov, atol=0.08)
    # flat improper prior: Z = integral of the normalized density = 1
    np.testing.assert_allclose(float(r.log_evidence_is), 0.0, atol=0.05)


def test_pathfinder_higher_dim_scales(key):
    dd = 20
    sds = np.linspace(0.5, 3.0, dd)
    locs = np.arange(dd) * 0.1
    problem = define_inference_problem(
        parameters=[(f"x{i}", -50.0, 50.0) for i in range(dd)],
        log_likelihood=lambda th: jnp.sum(
            d.Normal(jnp.asarray(locs, th.dtype), jnp.asarray(sds)).log_prob(th)
        ),
        validate=False,
    )
    r = pathfinder_fit(problem, key, maxiter=80, history=10)
    w = np.asarray(r.samples.normalized_weights())
    pts = np.asarray(r.samples.points)
    m = w @ pts
    sd = np.sqrt(np.sum(w[:, None] * (pts - m) ** 2, axis=0))
    assert np.abs(m - locs).max() < 0.25
    assert np.abs(sd / sds - 1).max() < 0.15
    np.testing.assert_allclose(float(r.log_evidence_is), 0.0, atol=0.15)


def test_pathfinder_respects_box_and_serves(key):
    problem, *_ = _conjugate_problem_and_truth()
    r = pathfinder_fit(problem, key, num_paths=4, num_draws_per_path=128)
    pts = np.asarray(r.samples.points)
    assert np.all(pts >= np.asarray(problem.lower))
    assert np.all(pts <= np.asarray(problem.upper))
    # engine-agnostic posterior_samples convention (predictives etc.)
    ps = r.posterior_samples(jax.random.PRNGKey(9), 500)
    assert ps.points.shape == (500, 1)
    assert np.allclose(np.asarray(ps.log_weights), 0.0)
    # predictive consumption through the shared front-end
    from bayesianinference_tpu.results import predictive_distribution

    pred = predictive_distribution(
        r.posterior_samples(jax.random.PRNGKey(10), 200),
        lambda th: d.Normal(th[0], 1.0),
    )
    x = pred.sample(jax.random.PRNGKey(11), (1000,))
    assert np.isfinite(np.asarray(x)).all()


def test_pathfinder_options(key):
    problem, post_mean, _, _ = _conjugate_problem_and_truth()
    # raw (unsmoothed) weights
    r = pathfinder_fit(problem, key, psis_smooth=False, num_paths=2)
    assert not np.isfinite(float(r.pareto_k))
    assert np.isfinite(np.asarray(r.samples.log_weights)).all()
    # explicit initial points, shape-checked
    inits = jnp.asarray([[0.0], [2.0]])
    r2 = pathfinder_fit(problem, key, num_paths=2, initial_points=inits)
    w = np.asarray(r2.samples.normalized_weights())
    m = float(w @ np.asarray(r2.samples.points)[:, 0])
    np.testing.assert_allclose(m, post_mean, atol=0.05)
    with pytest.raises(ValueError):
        pathfinder_fit(problem, key, num_paths=3, initial_points=inits)


def test_hmc_pathfinder_init(key):
    """starting_points="pathfinder" seeds HMC chains near the posterior,
    so a SHORT warmup already yields calibrated moments."""
    from bayesianinference_tpu.engines import hmc_sample

    problem, post_mean, post_sd, _ = _conjugate_problem_and_truth()
    r = hmc_sample(
        problem, key, num_chains=4, num_samples=250, num_warmup=100,
        num_leapfrog=8, starting_points="pathfinder",
    )
    draws = np.asarray(r.samples).reshape(-1)
    np.testing.assert_allclose(draws.mean(), post_mean, atol=0.05)
    np.testing.assert_allclose(draws.std(), post_sd, rtol=0.25)
    with pytest.raises(ValueError):
        hmc_sample(problem, key, starting_points="bogus")
    with pytest.raises(ValueError):
        hmc_sample(
            lambda th: -jnp.sum(th**2), key, starting_points="pathfinder"
        )
