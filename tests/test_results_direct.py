import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.core import (
    inverse_matrix_block_inverse,
    matrix_block_inverse,
)
from bayesianinference_tpu.engines import (
    direct_posterior_distribution,
    evidence_sampling,
    nested_sampling,
)
from bayesianinference_tpu.models import define_inference_problem
from bayesianinference_tpu.results import (
    calculation_report,
    predictive_distribution,
    regression_predictive_distribution,
)


def test_matrix_block_inverse(rng):
    a = rng.normal(size=(6, 6))
    m = a @ a.T + 6 * np.eye(6)
    cols = jnp.asarray([1, 3, 4])
    got = np.asarray(matrix_block_inverse(jnp.asarray(m), cols))
    want = np.linalg.inv(m)[np.ix_([1, 3, 4], [1, 3, 4])]
    np.testing.assert_allclose(got, want, rtol=1e-9)
    got2 = np.asarray(inverse_matrix_block_inverse(jnp.asarray(m), cols))
    np.testing.assert_allclose(got2, np.linalg.inv(want), rtol=1e-9)


def test_direct_posterior_conjugate_oracle(rng):
    """Quadrature evidence on a 2-D model vs the exact conjugate value."""
    from bayesianinference_tpu.engines import bayesian_linear_regression
    from bayesianinference_tpu.engines.conjugate import BLRParameters

    y = rng.normal(size=12) * 0.8 + 0.4
    prior = BLRParameters(
        b=jnp.zeros(1), lam=jnp.eye(1), lam_inv=jnp.eye(1),
        v=jnp.asarray(2.0), nu=jnp.asarray(4.0),
    )
    exact = bayesian_linear_regression(
        jnp.zeros((12, 1)), jnp.asarray(y), basis=(), prior=prior
    )
    dp = direct_posterior_distribution(
        parameters=[("mu", -6.0, 6.0), ("var", 1e-3, 30.0)],
        log_likelihood=lambda th: jnp.sum(
            d.Normal(th[0], jnp.sqrt(th[1])).log_prob(jnp.asarray(y))
        ),
        log_prior=lambda th: (
            d.Normal(0.0, jnp.sqrt(th[1])).log_prob(th[0])
            + d.InverseGamma(2.0, 1.0).log_prob(th[1])
        ),
        num_points=200,
    )
    np.testing.assert_allclose(
        float(dp.log_evidence), float(exact.log_evidence), rtol=1e-6
    )
    # posterior mean of mu close to the conjugate posterior mean
    np.testing.assert_allclose(
        float(dp.mean()[0]), float(exact.posterior_parameters.b[0]), atol=1e-3
    )
    # log_pdf normalization: re-integrating exp(log_pdf) over grid = 1
    total = float(
        jnp.exp(
            jax.scipy.special.logsumexp(
                dp.log_quad_weights + jax.vmap(dp.log_pdf)(dp.nodes)
            )
        )
    )
    np.testing.assert_allclose(total, 1.0, rtol=1e-8)
    s = dp.sample(jax.random.PRNGKey(0), (5000,))
    assert s.shape == (5000, 2)
    np.testing.assert_allclose(
        s.mean(0)[0], float(dp.mean()[0]), atol=0.05
    )


def _tiny_ns_result(key):
    problem = define_inference_problem(
        parameters=[("mu", -5.0, 5.0), ("sigma", 0.1, 5.0)],
        likelihood=lambda th: d.Normal(th[0], th[1]),
        data=jax.random.normal(key, (30,)) * 1.2 + 0.5,
        prior_distribution=["location", "scale"],
    )
    res = nested_sampling(
        problem, key, sample_pool_size=60, max_iterations=600,
        min_iterations=50, monte_carlo_steps=50,
    )
    return problem, res


@pytest.mark.slow
def test_predictive_and_report(key):
    problem, res = _tiny_ns_result(key)
    pred = predictive_distribution(res, lambda th: d.Normal(th[0], th[1]))
    x = np.linspace(-3, 4, 11)
    lp = np.asarray(pred.log_prob(jnp.asarray(x)))
    assert np.all(np.isfinite(lp))
    # predictive mean == crude-weighted posterior mean of mu (same weights)
    np.testing.assert_allclose(
        float(pred.mean()), float(res.posterior_samples().mean()[0]), atol=1e-9
    )
    # ML and MAP variants are single-component
    ml = predictive_distribution(res, lambda th: d.Normal(th[0], th[1]),
                                 mode="MaximumLikelihood")
    assert ml.num_components == 1
    map_ = predictive_distribution(res, lambda th: d.Normal(th[0], th[1]),
                                   mode="MAP")
    assert map_.num_components == 1

    # regression-style predictive over inputs
    xq = jnp.linspace(-1, 1, 5)[:, None]
    rpred = regression_predictive_distribution(
        res, lambda th, xx: d.Normal(th[0] + 0.0 * xx[:, 0], th[1]), xq
    )
    assert np.asarray(rpred.mean()).shape == (5,)

    # report arrays
    rep = calculation_report(res)
    n = res.total_samples
    assert rep.skilling_log_x.shape == (n,)
    assert rep.evidence_progression.shape == (n,)
    assert np.all(np.diff(rep.evidence_progression) >= -1e-12)
    assert rep.concentration_fit_coefficients is not None
    panels = rep.panels()
    assert set(panels) == {
        "Skilling's plot", "Posterior concentration", "Evidence",
        "LogLikelihood", "Acceptance rate",
    }
    # acceptance rates present for dead points
    acc = rep.acceptance_rates
    assert acc is not None and np.isfinite(acc).sum() > 0


def test_vector_output_regression_predictive(rng):
    """2-output regression predictive (the reference's multivariate
    generating-distribution form, BS:1445-1466): the PointwiseMixture
    log-density, mean and samples match an explicit per-point scipy
    mixture computed from the same posterior draws."""
    from types import SimpleNamespace

    S, m = 6, 4
    thetas = jnp.asarray(rng.normal(size=(S, 3)) * [0.5, 0.5, 0.1] + [1.0, -1.0, 1.0])
    logw = jnp.asarray(rng.normal(size=(S,)))
    fake = SimpleNamespace(
        points=thetas,
        crude_log_posterior_weights=logw,
        log_likelihoods=jnp.arange(S, dtype=float),
        log_priors=jnp.zeros(S),
    )
    xq = jnp.linspace(-1.0, 1.0, m)[:, None]

    def builder(th, xx):
        loc = jnp.stack([th[0] * xx[:, 0], th[1] * xx[:, 0] ** 2], axis=-1)
        cov = th[2] ** 2 * jnp.eye(2)  # per-theta constant, unbatched over m
        return d.MultivariateNormal(loc, cov)

    pred = regression_predictive_distribution(fake, builder, xq)
    assert pred.event_shape == (2,)
    assert pred.num_points == m

    y = jnp.asarray(rng.normal(size=(m, 2)))
    got_lp = np.asarray(pred.log_prob(y))
    got_mean = np.asarray(pred.mean())

    w = np.exp(np.asarray(logw - jax.scipy.special.logsumexp(logw)))
    th = np.asarray(thetas)
    x = np.asarray(xq)[:, 0]
    for j in range(m):
        dens = sum(
            w[s]
            * st.multivariate_normal.pdf(
                np.asarray(y)[j],
                [th[s, 0] * x[j], th[s, 1] * x[j] ** 2],
                th[s, 2] ** 2 * np.eye(2),
            )
            for s in range(S)
        )
        np.testing.assert_allclose(got_lp[j], np.log(dens), rtol=1e-9)
        mean_j = sum(
            w[s] * np.asarray([th[s, 0] * x[j], th[s, 1] * x[j] ** 2])
            for s in range(S)
        )
        np.testing.assert_allclose(got_mean[j], mean_j, rtol=1e-9)

    # MC agreement of the sampler with the analytic per-point mean
    samp = pred.sample(jax.random.PRNGKey(0), (20000,))
    assert samp.shape == (20000, m, 2)
    np.testing.assert_allclose(
        np.asarray(samp).mean(axis=0), got_mean, atol=0.05
    )
    # scalar-output API still rejects multivariate cdf/quantile cleanly
    with pytest.raises(NotImplementedError):
        pred.cdf(y)


def test_heterogeneous_mixture_matches_scipy(key):
    """Mixed StudentT + Normal mixture (MixtureDistribution over an
    arbitrary component list, BS:1431-1434): logpdf/cdf/moments vs scipy,
    sampler moments, and jit/pytree round-trip."""
    m = d.HeterogeneousMixture(
        log_weights=jnp.log(jnp.asarray([0.3, 0.7])),
        components=(
            d.StudentT(df=4.0, loc=1.0, scale=2.0),
            d.Normal(-1.0, 0.5),
        ),
    )
    xs = np.linspace(-5, 8, 41)
    np.testing.assert_allclose(
        np.asarray(m.log_prob(jnp.asarray(xs))),
        np.log(
            0.3 * st.t.pdf(xs, 4, 1, 2) + 0.7 * st.norm.pdf(xs, -1, 0.5)
        ),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(m.cdf(jnp.asarray(xs))),
        0.3 * st.t.cdf(xs, 4, 1, 2) + 0.7 * st.norm.cdf(xs, -1, 0.5),
        rtol=1e-12,
    )
    np.testing.assert_allclose(float(m.mean()), 0.3 * 1.0 + 0.7 * -1.0)
    s = np.asarray(m.sample(key, (100000,)))
    np.testing.assert_allclose(s.mean(), float(m.mean()), atol=0.03)
    np.testing.assert_allclose(s.var(), float(m.variance()), rtol=0.05)
    # under jit (pytree flatten/unflatten round-trip)
    np.testing.assert_allclose(
        float(jax.jit(lambda mm, x: mm.log_prob(x))(m, 0.5)),
        float(m.log_prob(0.5)),
    )
    with pytest.raises(ValueError, match="event shape"):
        d.HeterogeneousMixture(
            log_weights=jnp.zeros(2),
            components=(
                d.Normal(0.0, 1.0),
                d.MultivariateNormal(jnp.zeros(2), jnp.eye(2)),
            ),
        )


def test_posterior_predictive_check(key, shared_ns):
    """PPC on a well-specified model gives a central p-value; on a
    misspecified statistic (variance of overdispersed data under a
    fixed-variance model) it flags misfit with p near 0."""
    import jax

    from bayesianinference_tpu import dists as d
    from bayesianinference_tpu.engines.nested_sampling import nested_sampling
    from bayesianinference_tpu.models import define_inference_problem
    from bayesianinference_tpu.results import posterior_predictive_check

    rng = np.random.default_rng(0)
    # well-specified part: the shared standard run (data ~ N(1.2, 1))
    _, data, _, res = shared_ns
    builder = lambda th: d.Normal(th[0], 1.0)

    t_obs, t_rep, p = posterior_predictive_check(
        res, builder, data, lambda y: jnp.mean(y), jax.random.PRNGKey(1),
        num_replicates=400,
    )
    assert t_rep.shape == (400,)
    assert 0.05 < float(p) < 0.95  # mean is well captured

    # overdispersed observed data vs the sigma=1 model: the variance
    # statistic must reject
    bad = jnp.asarray(rng.normal(0.7, 2.5, size=60))  # sigma 2.5 vs model 1
    problem2 = define_inference_problem(
        parameters=[("mu", -5.0, 5.0)],
        log_likelihood=lambda th: jnp.sum(d.Normal(th[0], 1.0).log_prob(bad)),
        prior_distribution=["location"],
        validate=False,
    )
    res2 = nested_sampling(
        problem2, key, sample_pool_size=80, max_iterations=600,
        post_process_sampling_runs=8,
    )
    _, _, p2 = posterior_predictive_check(
        res2, builder, bad, lambda y: jnp.var(y), jax.random.PRNGKey(2),
        num_replicates=400,
    )
    assert float(p2) < 0.01, float(p2)


def test_direct_with_data_serving_reuses_program(rng):
    """Direct quadrature on a data-carrying problem compiles once per
    (callables, shapes): with_data re-fits hit the same program."""
    from bayesianinference_tpu.engines.direct import _direct_eval_program

    # num_points=149 / 41 observations are unique to this test, so the
    # first fit MUST add a cache entry no matter which tests ran before
    # (equal-looking problems elsewhere in the suite can share program
    # identity, which made the old 150/40 shapes order-dependent)
    pb = define_inference_problem(
        parameters=[("mu", -5.0, 5.0)],
        likelihood=lambda th: d.Normal(th[0], 1.0),
        data=jnp.asarray(rng.normal(1.0, 1.0, 41)),
        prior_distribution=["location"],
    )
    size0 = _direct_eval_program._cache_size()
    d1 = direct_posterior_distribution(problem=pb, num_points=149)
    size1 = _direct_eval_program._cache_size()
    d2 = direct_posterior_distribution(
        problem=pb.with_data(jnp.asarray(rng.normal(-1.5, 1.0, 41))),
        num_points=149,
    )
    assert _direct_eval_program._cache_size() == size1 > size0
    assert abs(float(d1.mean()[0]) - 1.0) < 0.5
    assert abs(float(d2.mean()[0]) + 1.5) < 0.5


def test_predictive_from_smc_and_hmc_results(key):
    """predictive_distribution accepts ANY engine's weighted draws: the
    SMC/HMC pools feed the same mixture machinery as NS results."""
    from bayesianinference_tpu.engines import hmc_sample, smc_sampler

    problem = define_inference_problem(
        parameters=[("mu", -5.0, 5.0), ("sigma", 0.1, 5.0)],
        log_likelihood=lambda th: jnp.sum(
            d.Normal(th[0], th[1]).log_prob(jnp.asarray([0.4, 0.6, 0.5, 0.7]))
        ),
        prior_distribution=["location", "scale"],
        validate=False,
    )
    smc = smc_sampler(problem, key, n_particles=200, num_runs=2, mcmc_steps=8)
    pred = predictive_distribution(smc, lambda th: d.Normal(th[0], th[1]))
    assert np.isfinite(float(pred.log_prob(jnp.asarray(0.5))))
    # equal-weight pool: predictive mean == pooled posterior mean of mu
    np.testing.assert_allclose(
        float(pred.mean()), float(smc.posterior_samples().mean()[0]),
        atol=1e-9,
    )
    # ML mode works (SMC carries per-particle log-likelihoods)
    ml = predictive_distribution(
        smc, lambda th: d.Normal(th[0], th[1]), mode="MaximumLikelihood"
    )
    assert ml.num_components == 1

    hmc = hmc_sample(
        problem, key, num_chains=4, num_samples=50, num_warmup=60,
        num_leapfrog=8,
    )
    pred_h = predictive_distribution(hmc, lambda th: d.Normal(th[0], th[1]))
    assert np.isfinite(float(pred_h.log_prob(jnp.asarray(0.5))))
    # HMC draws carry no log-likelihoods: ML/MAP modes give clear errors
    with pytest.raises(ValueError, match="log-likelihood"):
        predictive_distribution(
            hmc, lambda th: d.Normal(th[0], th[1]), mode="MaximumLikelihood"
        )
    with pytest.raises(ValueError, match="MAP"):
        predictive_distribution(
            hmc, lambda th: d.Normal(th[0], th[1]), mode="MAP"
        )
    with pytest.raises(TypeError, match="posterior_samples"):
        predictive_distribution(3.0, lambda th: d.Normal(th[0], th[1]))
