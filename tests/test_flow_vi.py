"""Normalizing-flow VI: conjugate oracle, banana-posterior capacity vs
Gaussian families, PSIS evidence accuracy, flow invertibility, serving
cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines import advi_fit, flow_vi_fit
from bayesianinference_tpu.engines.flow_vi import (
    _flow_forward,
    _flow_inverse,
    _init_flow,
)
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


def test_flow_conjugate_posterior_and_evidence(key):
    problem, post_mean, post_sd, log_z = _conjugate_problem_and_truth()
    r = flow_vi_fit(problem, key, num_steps=2000)
    s = np.asarray(r.sample(jax.random.PRNGKey(5), 20000))[:, 0]
    np.testing.assert_allclose(s.mean(), post_mean, atol=0.02)
    np.testing.assert_allclose(s.std(), post_sd, rtol=0.1)
    # ELBO bounds logZ; the PSIS importance estimate nails it
    assert float(r.elbo) < log_z + 0.02
    assert float(r.elbo) > log_z - 0.1
    assert float(r.pareto_k) < 0.7, float(r.pareto_k)
    np.testing.assert_allclose(float(r.log_evidence), log_z, atol=0.03)
    # fitted density is a real density: peak beats tail
    assert float(r.log_prob(jnp.asarray([post_mean]))) > float(
        r.log_prob(jnp.asarray([post_mean + 2 * post_sd]))
    )


@pytest.fixture(scope="module")
def banana_problem():
    """Curved 2-D posterior no Gaussian family can fit tightly."""

    def ll(th):
        return -0.5 * (th[0] ** 2 / 4.0 + 4.0 * (th[1] - th[0] ** 2 / 2.0) ** 2)

    problem = define_inference_problem(
        parameters=[("a", -6.0, 6.0), ("b", -4.0, 12.0)],
        log_likelihood=ll,
        prior_distribution=["location", "location"],
        validate=False,
    )
    # dense-grid quadrature oracle for logZ (f64, 1e-8-ish)
    xs = np.linspace(-6, 6, 2001)
    ys = np.linspace(-4, 12, 2001)
    xx, yy = np.meshgrid(xs, ys, indexing="ij")
    f = np.exp(-0.5 * (xx**2 / 4.0 + 4.0 * (yy - xx**2 / 2.0) ** 2))
    integral = np.trapezoid(np.trapezoid(f, ys, axis=1), xs)
    log_z = np.log(integral) - np.log(12.0 * 16.0)  # location prior 1/vol
    return problem, log_z


@pytest.mark.slow
def test_flow_beats_gaussian_families_on_banana(key, banana_problem):
    problem, log_z = banana_problem
    fr = advi_fit(problem, key, family="fullrank", num_steps=3000)
    fl = flow_vi_fit(problem, key, num_steps=4000, learning_rate=2e-3)
    # capacity: the flow's bound dominates the best Gaussian bound
    assert float(fl.elbo) > float(fr.elbo) + 0.2, (
        float(fl.elbo),
        float(fr.elbo),
    )
    # and the PSIS evidence estimate is sharp
    assert float(fl.pareto_k) < 0.7, float(fl.pareto_k)
    np.testing.assert_allclose(float(fl.log_evidence), log_z, atol=0.05)
    # the samples actually live on the curve
    s = np.asarray(fl.sample(jax.random.PRNGKey(3), 20000))
    resid = s[:, 1] - s[:, 0] ** 2 / 2.0
    np.testing.assert_allclose(resid.std(), 0.5, rtol=0.2)
    np.testing.assert_allclose(s[:, 0].std(), 2.0, rtol=0.2)


def test_flow_forward_inverse_roundtrip():
    keyp = jax.random.PRNGKey(0)
    for dim in (1, 2, 5):
        params = _init_flow(keyp, dim, 4, 16, jnp.float64)
        # perturb so the flow is NOT the identity
        params = jax.tree_util.tree_map(
            lambda a: a
            + 0.1 * jax.random.normal(jax.random.PRNGKey(1), a.shape, a.dtype),
            params,
        )
        z = jax.random.normal(jax.random.PRNGKey(2), (64, dim), jnp.float64)
        x, ld_f = _flow_forward(params, z, dim)
        z_back, ld_i = _flow_inverse(params, x, dim)
        np.testing.assert_allclose(np.asarray(z_back), np.asarray(z), atol=1e-9)
        np.testing.assert_allclose(np.asarray(ld_i), np.asarray(ld_f), atol=1e-9)


def test_flow_respects_box_and_scale(key):
    rng = np.random.default_rng(0)
    data = rng.normal(0.0, 0.7, 60)
    problem = define_inference_problem(
        parameters=[("sigma", 0.05, 5.0)],
        likelihood=lambda th: d.Normal(0.0, th[0]),
        data=jnp.asarray(data),
        prior_distribution=["scale"],
        validate=False,
    )
    r = flow_vi_fit(problem, key, num_steps=1500)
    s = np.asarray(r.sample(jax.random.PRNGKey(1), 5000))[:, 0]
    assert s.min() > 0.05 and s.max() < 5.0
    np.testing.assert_allclose(s.mean(), 0.7, atol=0.1)


def test_flow_serving_cache(key):
    from bayesianinference_tpu.engines.flow_vi import _flow_vi_program

    data = jnp.asarray(np.random.default_rng(0).normal(1.0, 1.0, 25))
    problem = define_inference_problem(
        parameters=[("mu", -10.0, 10.0)],
        likelihood=lambda th: d.Normal(th[0], 1.0),
        data=data,
        prior_distribution=[d.Normal(0.0, 3.0)],
        validate=False,
    )
    r1 = flow_vi_fit(problem, key, num_steps=300)
    n = _flow_vi_program._cache_size()
    r2 = flow_vi_fit(problem.with_data(data + 0.5), key, num_steps=300)
    assert _flow_vi_program._cache_size() == n, "flow VI retraced on fresh data"
    m1 = float(np.asarray(r1.sample(jax.random.PRNGKey(1), 4000)).mean())
    m2 = float(np.asarray(r2.sample(jax.random.PRNGKey(1), 4000)).mean())
    assert 0.2 < m2 - m1 < 0.8


def test_hmc_flow_seeding(key, banana_problem):
    """starting_points="flow" hands HMC posterior-typical seeds on the
    curved target."""
    from bayesianinference_tpu.engines import hmc_sample

    problem, _ = banana_problem
    res = hmc_sample(
        problem,
        key,
        num_chains=8,
        num_samples=50,
        num_warmup=100,
        num_leapfrog=16,
        starting_points="flow",
    )
    draws = np.asarray(res.samples).reshape(-1, 2)
    assert np.isfinite(draws).all()
    resid = draws[:, 1] - draws[:, 0] ** 2 / 2.0
    assert abs(resid.mean()) < 0.3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="starting_points"):
        hmc_sample(problem, key, num_chains=2, starting_points="bogus")
