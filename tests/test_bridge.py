"""Bridge-sampling evidence: conjugate oracle, engine cross-checks,
draw-container front-ends."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines import bridge_sampling_evidence
from bayesianinference_tpu.models import define_inference_problem


def _conjugate_problem(n_obs=40, seed=1, tau0=3.0):
    rng = np.random.default_rng(seed)
    data = rng.normal(1.2, 1.0, n_obs)
    problem = define_inference_problem(
        parameters=[("mu", -10.0, 10.0)],
        likelihood=lambda th: d.Normal(th[0], 1.0),
        data=jnp.asarray(data),
        prior_distribution=[d.Normal(0.0, tau0)],
        validate=False,
    )
    cov = tau0**2 * np.ones((n_obs, n_obs)) + np.eye(n_obs)
    log_z = st.multivariate_normal(np.zeros(n_obs), cov).logpdf(data)
    post_prec = 1 / tau0**2 + n_obs
    post = (data.sum() / post_prec, post_prec**-0.5)
    return problem, log_z, post


def test_bridge_conjugate_oracle():
    problem, log_z, (pm, ps) = _conjugate_problem()
    rng = np.random.default_rng(7)
    draws = (pm + ps * rng.normal(size=4000))[:, None]
    r = bridge_sampling_evidence(problem, jnp.asarray(draws))
    assert bool(r.converged)
    assert int(r.num_iterations) < 20
    np.testing.assert_allclose(float(r.log_evidence), log_z, atol=5e-3)
    # the error diagnostic is small and positive at this draw count
    assert 0.0 < float(r.relative_error) < 0.01
    # SE alias
    assert float(r.standard_error) == float(r.relative_error)


def test_bridge_from_hmc_and_pathfinder(key):
    from bayesianinference_tpu.engines import hmc_sample, pathfinder_fit

    problem, log_z, _ = _conjugate_problem()
    h = hmc_sample(
        problem, key, num_chains=4, num_samples=400, num_warmup=200,
        num_leapfrog=8,
    )
    # the raw [chains, samples, d] stack and the result object agree
    r_arr = bridge_sampling_evidence(problem, h.samples, key)
    r_res = bridge_sampling_evidence(problem, h, key)
    np.testing.assert_allclose(
        float(r_arr.log_evidence), float(r_res.log_evidence), atol=1e-9
    )
    np.testing.assert_allclose(float(r_res.log_evidence), log_z, atol=0.05)

    pf = pathfinder_fit(problem, key, num_paths=4)
    r_pf = bridge_sampling_evidence(problem, pf, key)
    np.testing.assert_allclose(float(r_pf.log_evidence), log_z, atol=0.05)


def test_bridge_from_weighted_ns_result(key, shared_ns):
    """Bridge on resampled NS output agrees with NS's own logZ — two
    estimators with unrelated error mechanisms."""
    problem, _, _, res = shared_ns
    r = bridge_sampling_evidence(problem, res, key)
    ns_log_z = float(res.log_evidence.mean)
    ns_se = float(res.log_evidence.standard_error)
    assert abs(float(r.log_evidence) - ns_log_z) < 3 * ns_se + 0.05


def test_bridge_bounded_scale_parameter(key):
    """A posterior pressed against a box edge (scale parameter) rides
    the bijection warp; oracle = 1-D Gauss-Legendre quadrature."""
    rng = np.random.default_rng(3)
    data = rng.normal(0.0, 0.7, 50)
    problem = define_inference_problem(
        parameters=[("sigma", 0.05, 4.0)],
        likelihood=lambda th: d.Normal(0.0, th[0]),
        data=jnp.asarray(data),
        prior_distribution=["scale"],
        validate=False,
    )
    # quadrature evidence over the box (log-uniform normalized prior)
    from numpy.polynomial.legendre import leggauss

    xg, wg = leggauss(400)
    sig = 0.5 * (xg + 1) * (4.0 - 0.05) + 0.05
    wq = wg * 0.5 * (4.0 - 0.05)
    loglike = np.array(
        [st.norm(0, s).logpdf(data).sum() for s in sig]
    )
    logprior = -np.log(sig) - np.log(np.log(4.0 / 0.05))
    log_z = np.log(np.sum(wq * np.exp(loglike + logprior - loglike.max()))) + loglike.max()
    # exact posterior draws by inverse-CDF on the quadrature grid
    dens = np.exp(loglike + logprior - (loglike + logprior).max()) * wq
    cdf = np.cumsum(dens) / dens.sum()
    u = rng.uniform(size=3000)
    draws = np.interp(u, cdf, sig)[:, None]
    r = bridge_sampling_evidence(problem, jnp.asarray(draws), key)
    np.testing.assert_allclose(float(r.log_evidence), log_z, atol=0.02)


def test_bridge_validation(key):
    problem, *_ = _conjugate_problem()
    with pytest.raises(ValueError):
        bridge_sampling_evidence(problem, jnp.zeros((4, 1)), key)
    with pytest.raises(ValueError):
        bridge_sampling_evidence(problem, jnp.zeros((100,)), key)
