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


def test_regression_predictive_1d_inputs(regression_ns):
    from bayesianinference_tpu.results import regression_predictive_distribution

    _, res, x, y = regression_ns
    pred = regression_predictive_distribution(
        res, lambda th, xx: d.Normal(th[0] * xx[:, 0] + th[1], th[2]),
        jnp.linspace(-1, 1, 7),  # 1-D inputs
    )
    assert pred.mean().shape == (7,)


@pytest.mark.slow
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


def test_find_mode_pinned_bound_dimension():
    """lo == hi pins a parameter; the bijection must hold it fixed instead
    of producing NaN (round-2 review finding)."""
    from bayesianinference_tpu.engines.laplace import find_mode

    f = lambda x: -((x[0] - 3.0) ** 2) - (x[1] - 3.0) ** 2
    mode, val = find_mode(
        f,
        jnp.asarray([[0.5, 0.0]]),
        lower=jnp.asarray([0.5, -5.0]),
        upper=jnp.asarray([0.5, 5.0]),
    )
    np.testing.assert_allclose(np.asarray(mode), [0.5, 3.0], atol=1e-4)
    assert np.isfinite(float(val))


def test_generative_model_input_as_node():
    """An input variable that is ALSO a model node (its density ignored,
    value given) must work — validation permits it (round-2 review)."""
    from bayesianinference_tpu import dists as d
    from bayesianinference_tpu.dists.combinators import ConditionalProduct
    from bayesianinference_tpu.models import generative_model_problem

    model = ConditionalProduct(
        [
            ("x", lambda v: d.Normal(0.0, 1.0)),
            ("mu", lambda v: d.Normal(0.0, 2.0)),
            ("y", lambda v: d.Normal(v["mu"] + v["x"], 1.0)),
        ]
    )
    xval = jnp.asarray([0.3, -0.2])
    yval = jnp.asarray([1.0, 0.5])
    problem = generative_model_problem(
        model, data={"y": yval}, parameters=[("mu", -9.0, 9.0)],
        inputs={"x": xval},
    )
    th = jnp.asarray([0.7])
    want_ll = float(jnp.sum(d.Normal(0.7 + xval, 1.0).log_prob(yval)))
    want_lp = float(d.Normal(0.0, 2.0).log_prob(0.7))
    np.testing.assert_allclose(float(problem.log_likelihood(th)), want_ll, rtol=1e-12)
    np.testing.assert_allclose(float(problem.log_prior(th)), want_lp, rtol=1e-12)


def test_coordinate_bounds_grid_1d_input():
    """A 1-D x array is n points in one dimension, not one n-D point."""
    from bayesianinference_tpu.engines.gp import coordinate_bounds_grid

    g = coordinate_bounds_grid(jnp.linspace(0.0, 1.0, 50), 10)
    assert g.shape == (10, 1)
    np.testing.assert_allclose(float(g[0, 0]), 0.0)
    np.testing.assert_allclose(float(g[-1, 0]), 1.0)


def test_sharded_pool_ns_rejects_oversized_num_delete(key):
    from bayesianinference_tpu import dists as d
    from bayesianinference_tpu.models import define_inference_problem
    from bayesianinference_tpu.parallel.sharded_pool_ns import (
        sharded_pool_nested_sampling,
    )

    problem = define_inference_problem(
        parameters=[("x", -1.0, 1.0)],
        log_likelihood=lambda th: jnp.sum(d.Normal(0.0, 1.0).log_prob(th)),
        prior_distribution=["location"],
        validate=False,
    )
    with pytest.raises(ValueError, match="survivors"):
        sharded_pool_nested_sampling(
            problem, key, sample_pool_size=16, num_delete=8
        )


def test_degenerate_conjugate_data_returns_sentinel():
    """Constant data (sample variance 0) and collinear multivariate data
    (singular covariance) must map to the finite log-zero sentinel, not
    inf or a silently wrong finite evidence — the guarded-density
    contract the stats-form refactor must preserve."""
    import numpy as np

    from bayesianinference_tpu.engines.conjugate import (
        multinormal_conjugate_model,
        normal_conjugate_model,
    )

    r = normal_conjugate_model(jnp.asarray([3.0, 3.0, 3.0, 3.0]))
    assert float(r.log_evidence) < -1e250

    t = jnp.linspace(0.0, 1.0, 10)
    collinear = jnp.stack([t, 2.0 * t], axis=1)
    r2 = multinormal_conjugate_model(collinear)
    assert float(r2.log_evidence) < -1e250

    dup = jnp.ones((6, 2))
    r3 = multinormal_conjugate_model(dup)
    assert float(r3.log_evidence) < -1e250

    # non-degenerate data still gives finite sensible evidence
    rng = np.random.default_rng(0)
    ok = normal_conjugate_model(jnp.asarray(rng.normal(size=20)))
    assert np.isfinite(float(ok.log_evidence))


def test_sharded_blr_nonfinite_basis_on_padding():
    """Padded rows are masked with where, so a basis function that is
    non-finite at zero (log) must not poison the psum statistics when n
    is not divisible by the mesh."""
    import numpy as np

    from bayesianinference_tpu.engines.conjugate import (
        bayesian_linear_regression,
    )
    from bayesianinference_tpu.parallel import (
        make_mesh,
        sharded_bayesian_linear_regression,
    )

    rng = np.random.default_rng(1)
    n = 13  # pads to 16 with 3 zero rows
    x = jnp.asarray(rng.uniform(0.5, 2.0, (n, 1)))
    y = jnp.asarray(0.3 + 0.7 * np.log(np.asarray(x)[:, 0]) + 0.01 * rng.normal(size=n))
    basis = (lambda v: jnp.log(v[..., 0]),)
    mesh = make_mesh(("data",))
    dense = bayesian_linear_regression(x, y, basis=basis)
    shard = sharded_bayesian_linear_regression(x, y, mesh, basis=basis)
    np.testing.assert_allclose(
        float(shard.log_evidence), float(dense.log_evidence), rtol=1e-9
    )


def test_rhat_stuck_disagreeing_chains_is_inf():
    import numpy as np

    from bayesianinference_tpu.results import gelman_rubin

    stuck = np.stack([np.zeros(100), np.ones(100)])
    assert gelman_rubin(stuck) == np.inf
    # identical constant chains legitimately report 1
    same = np.zeros((2, 100))
    assert gelman_rubin(same) == 1.0


def test_summary_quantile_headers_distinct():
    import numpy as np

    from bayesianinference_tpu.core.containers import WeightedSamples
    from bayesianinference_tpu.results import summary

    ws = WeightedSamples(
        points=jnp.linspace(0, 1, 50)[:, None],
        log_weights=jnp.zeros(50),
    )
    t = summary(ws, quantiles=(0.975, 0.98))
    header = str(t).splitlines()[0]
    assert "q97.5" in header and "q98" in header


def test_generative_problem_is_engine_agnostic(key):
    """generative_model_problem returns a plain InferenceProblem: the
    sampling engines (NS, HMC) consume it as readily as Laplace, and the
    logZ matches the conjugate closed form."""
    import scipy.stats as st

    from bayesianinference_tpu import dists as d
    from bayesianinference_tpu.dists.combinators import ConditionalProduct
    from bayesianinference_tpu.engines import hmc_sample, nested_sampling
    from bayesianinference_tpu.models import generative_model_problem

    rng = np.random.default_rng(2)
    scale, prior_scale, n = 1.0, 3.0, 20
    y = jnp.asarray(rng.normal(0.7, scale, size=n))
    model = ConditionalProduct(
        [
            ("mu", lambda v: d.Normal(0.0, prior_scale)),
            ("y", lambda v: d.Normal(v["mu"], scale)),
        ]
    )
    problem = generative_model_problem(
        model, data={"y": y}, parameters=[("mu", -12.0, 12.0)]
    )
    cov = scale**2 * np.eye(n) + prior_scale**2
    exact = st.multivariate_normal(np.zeros(n), cov).logpdf(np.asarray(y))

    res = nested_sampling(problem, key, sample_pool_size=150)
    zerr = max(float(res.log_evidence.standard_error), 1e-3)
    assert abs(float(res.log_evidence.mean) - exact) < 5 * zerr

    prec_post = 1.0 / prior_scale**2 + n / scale**2
    mean_post = float(np.sum(np.asarray(y)) / scale**2 / prec_post)
    hmc = hmc_sample(
        problem, key, num_chains=4, num_samples=200, num_warmup=120,
        num_leapfrog=8,
    )
    mu_hat = float(hmc.posterior_samples().mean()[0])
    assert abs(mu_hat - mean_post) < 0.15, (mu_hat, mean_post)
