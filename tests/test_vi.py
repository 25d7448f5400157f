"""ADVI engine: conjugate-posterior oracles, ELBO bound sharpness,
family comparison, serving contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines import advi_fit
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
    # exact log evidence: marginal of y ~ N(mu0*1, tau0^2 J + I)
    cov = tau0**2 * np.ones((n_obs, n_obs)) + np.eye(n_obs)
    log_z = st.multivariate_normal(np.full(n_obs, mu0), cov).logpdf(data)
    return problem, data, post_mean, post_sd, log_z


def test_advi_conjugate_posterior_and_elbo(key):
    problem, _, post_mean, post_sd, log_z = _conjugate_problem_and_truth()
    r = advi_fit(problem, key, num_steps=3000, learning_rate=0.02)
    # the posterior is far from the box bounds, so the z-space Gaussian
    # maps to a near-Gaussian x-space posterior: mean/sd recovered
    samples = np.asarray(r.sample(jax.random.PRNGKey(5), 20000))[:, 0]
    np.testing.assert_allclose(samples.mean(), post_mean, atol=0.02)
    np.testing.assert_allclose(samples.std(), post_sd, rtol=0.1)
    # ELBO lower-bounds logZ and is tight (Gaussian posterior)
    elbo = float(r.elbo)
    assert elbo < log_z + 0.02  # MC slack
    assert elbo > log_z - 0.1, (elbo, log_z)
    # log_prob integrates the density it samples: MC cross-entropy check
    lps = np.asarray(r.log_prob(jnp.asarray(samples[:2000])[:, None]))
    assert np.all(np.isfinite(lps))
    # fitted density at the posterior mean exceeds density 2 sd away
    lp_mean = float(r.log_prob(jnp.asarray([post_mean])))
    lp_tail = float(r.log_prob(jnp.asarray([post_mean + 2 * post_sd])))
    assert lp_mean > lp_tail


@pytest.mark.slow
def test_advi_fullrank_recovers_correlation(key):
    # strongly correlated 2-D Gaussian likelihood; flat prior
    rho = 0.9
    cov = np.asarray([[1.0, rho], [rho, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))

    problem = define_inference_problem(
        parameters=[("a", -8.0, 8.0), ("b", -8.0, 8.0)],
        log_likelihood=lambda th: -0.5 * th @ prec @ th,
        prior_distribution=["location", "location"],
        validate=False,
    )
    mf = advi_fit(problem, key, family="meanfield", num_steps=3000)
    fr = advi_fit(problem, key, family="fullrank", num_steps=3000)
    # fullrank bound dominates meanfield on a correlated target
    assert float(fr.elbo) > float(mf.elbo) + 0.3, (
        float(fr.elbo),
        float(mf.elbo),
    )
    s = np.asarray(fr.sample(jax.random.PRNGKey(2), 20000))
    got_rho = np.corrcoef(s.T)[0, 1]
    np.testing.assert_allclose(got_rho, rho, atol=0.06)
    # meanfield cannot represent it
    s_mf = np.asarray(mf.sample(jax.random.PRNGKey(2), 20000))
    assert abs(np.corrcoef(s_mf.T)[0, 1]) < 0.2


def test_advi_bounded_scale_parameter(key):
    # posterior on a scale parameter: all samples respect the box
    rng = np.random.default_rng(0)
    data = rng.normal(0.0, 0.7, 60)
    problem = define_inference_problem(
        parameters=[("sigma", 0.05, 5.0)],
        likelihood=lambda th: d.Normal(0.0, th[0]),
        data=jnp.asarray(data),
        prior_distribution=["scale"],
        validate=False,
    )
    r = advi_fit(problem, key, num_steps=1500)
    s = np.asarray(r.sample(jax.random.PRNGKey(1), 5000))[:, 0]
    assert s.min() > 0.05 and s.max() < 5.0
    np.testing.assert_allclose(s.mean(), 0.7, atol=0.1)


def test_advi_serving_cache(key):
    from bayesianinference_tpu.engines.vi import _advi_program

    data = jnp.asarray(np.random.default_rng(0).normal(1.0, 1.0, 25))
    problem = define_inference_problem(
        parameters=[("mu", -10.0, 10.0)],
        likelihood=lambda th: d.Normal(th[0], 1.0),
        data=data,
        prior_distribution=[d.Normal(0.0, 3.0)],
        validate=False,
    )
    r1 = advi_fit(problem, key, num_steps=300)
    n = _advi_program._cache_size()
    r2 = advi_fit(problem.with_data(data + 0.5), key, num_steps=300)
    assert _advi_program._cache_size() == n, "ADVI retraced on fresh data"
    m1 = float(np.asarray(r1.sample(jax.random.PRNGKey(1), 4000)).mean())
    m2 = float(np.asarray(r2.sample(jax.random.PRNGKey(1), 4000)).mean())
    assert 0.2 < m2 - m1 < 0.8


def test_advi_rejects_unknown_family(key):
    problem = define_inference_problem(
        parameters=[("x", -1.0, 1.0)],
        log_likelihood=lambda th: -0.5 * jnp.sum(th**2),
        prior_distribution=["location"],
        validate=False,
    )
    with pytest.raises(ValueError, match="family"):
        advi_fit(problem, key, family="flow")
