"""Regression tests for defects found in the round-1 code review."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.models import define_inference_problem
from bayesianinference_tpu.engines import (
    bayesian_linear_regression,
    load_ns_run,
    nested_sampling,
)


def test_one_parameter_problem_with_default_prior(key):
    """dim=1 problems must work with the default (improper) prior and with
    a scalar prior distribution."""
    data = jax.random.normal(key, (20,)) + 1.0
    p = define_inference_problem(
        parameters=[("mu", -5.0, 5.0)],
        likelihood=lambda th: d.Normal(th[0], 1.0),
        data=data,
    )
    assert float(p.guarded_log_prior(jnp.asarray([0.0]))) == 0.0
    # scalar prior distribution over the single parameter
    p2 = define_inference_problem(
        parameters=[("mu", -5.0, 5.0)],
        likelihood=lambda th: d.Normal(th[0], 1.0),
        data=data,
        prior_distribution=d.Normal(0.0, 2.0),
    )
    lp = p2.guarded_log_prior(jnp.asarray([0.5]))
    assert lp.shape == ()
    np.testing.assert_allclose(float(lp), st.norm(0, 2).logpdf(0.5), rtol=1e-9)
    # scalar prior + multiple params must be rejected
    with pytest.raises(ValueError, match="scalar prior"):
        define_inference_problem(
            parameters=[("a", -1.0, 1.0), ("b", -1.0, 1.0)],
            log_likelihood=lambda th: 0.0,
            prior_distribution=d.Normal(0.0, 1.0),
            validate=False,
        )


def test_blr_predictive_1d_inputs(rng):
    """1-D query arrays must give one prediction per query point."""
    x = rng.uniform(-2, 2, size=40)
    y = 2.0 * x + 1.0 + 0.1 * rng.normal(size=40)
    res = bayesian_linear_regression(jnp.asarray(x), jnp.asarray(y), degree=1)
    xq = jnp.linspace(-1, 1, 5)
    pred = res.predictive_distribution(xq)
    assert pred.mean().shape == (5,)
    np.testing.assert_allclose(
        np.asarray(pred.mean()), 2.0 * np.asarray(xq) + 1.0, atol=0.1
    )
    under = res.underlying_value_distribution(xq)
    assert under.mean().shape == (5,)


def test_kde_1d_samples(key):
    """GaussianKDE.fit on a 1-D sample vector must treat it as n points."""
    s = jax.random.normal(key, (500,))
    kde = d.GaussianKDE.fit(s)
    assert kde.points.shape == (500, 1)
    lp = float(kde.log_prob(jnp.asarray([[0.0]]))[0])
    assert abs(lp - st.norm(0, 1).logpdf(0.0)) < 0.2


def test_regression_predictive_1d_inputs(key):
    from bayesianinference_tpu.results import regression_predictive_distribution

    x = jnp.linspace(-2, 2, 25)
    y = 1.5 * x + 0.3 * jax.random.normal(key, (25,))
    problem = define_inference_problem(
        parameters=[("a", -5.0, 5.0), ("sigma", 0.05, 3.0)],
        log_likelihood=lambda th: jnp.sum(
            d.Normal(th[0] * x, th[1]).log_prob(y)
        ),
        prior_distribution=["location", "scale"],
        validate=False,
    )
    res = nested_sampling(
        problem, key, sample_pool_size=40, max_iterations=300,
        min_iterations=40, monte_carlo_steps=30,
    )
    pred = regression_predictive_distribution(
        res, lambda th, xx: d.Normal(th[0] * xx[:, 0], th[1]),
        jnp.linspace(-1, 1, 7),  # 1-D inputs
    )
    assert pred.mean().shape == (7,)


def test_checkpoint_every_respected(tmp_path, key):
    """checkpoint_every must not be silently extended by min_iterations."""
    problem = define_inference_problem(
        parameters=[("x", -5.0, 5.0), ("y", -5.0, 5.0)],
        log_likelihood=lambda th: jnp.sum(d.Normal(0.0, 1.0).log_prob(th)),
        prior_distribution=["location", "location"],
        validate=False,
    )
    path = tmp_path / "seg.npz"
    res = nested_sampling(
        problem, key, sample_pool_size=30, max_iterations=60,
        min_iterations=60, monte_carlo_steps=20,
        checkpoint_path=path, checkpoint_every=10,
    )
    # the run completed the full 60 iterations across segments
    run = load_ns_run(path)
    assert int(run.state.iteration) - 1 == 60
    assert res.generated_nested_samples == 60


def test_report_evidence_progression_log_space(key):
    """Evidence progression must survive |logZ| beyond float range."""
    from bayesianinference_tpu.engines.evidence import evidence_sampling
    from bayesianinference_tpu.results import calculation_report

    n, nd = 10, 30
    # logL around -1000: exp() underflows in linear space
    logl = jnp.sort(jax.random.normal(key, (n + nd,))) - 1000.0
    pts = jnp.arange(n + nd, dtype=jnp.float64)[:, None]
    res = evidence_sampling(
        points=pts, log_likelihoods=logl, sample_pool_size=n, key=key,
        num_runs=20,
    )
    rep = calculation_report(res)
    assert np.all(np.isfinite(rep.evidence_progression))
    np.testing.assert_allclose(
        rep.evidence_progression[-1], float(res.crude_log_evidence), atol=1e-6
    )
