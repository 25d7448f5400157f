import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.models import define_inference_problem
from bayesianinference_tpu.engines import nested_sampling
from bayesianinference_tpu.utils import (
    NestedSamplingOptions,
    check_traceable,
    dependency_data,
    distribution_dimension,
    model_graph,
)


def test_model_graph():
    g = model_graph(
        edges=[("alpha", "w"), ("w", "y"), ("x", "y")],
        inputs=["x"],
        outputs=["y"],
    )
    assert g.is_acyclic()
    assert g.topological_order().index("alpha") < g.topological_order().index("y")
    g.validate_dependencies()
    dep = dependency_data(g)
    assert dep["y"]["ancestors"] == frozenset({"alpha", "w", "x"})
    assert dep["alpha"]["descendants"] == frozenset({"w", "y"})


def test_model_graph_rejects_cycles_and_bad_deps():
    g = model_graph(edges=[("a", "b"), ("b", "a")])
    assert not g.is_acyclic()
    with pytest.raises(ValueError, match="cyclic"):
        g.validate_dependencies()
    g2 = model_graph(edges=[("w", "x")], inputs=["x"], outputs=["y"])
    with pytest.raises(ValueError, match="independent"):
        g2.validate_dependencies()
    g3 = model_graph(edges=[("y", "w")], inputs=[], outputs=["y"])
    with pytest.raises(ValueError, match="cannot depend on dependent"):
        g3.validate_dependencies()


def test_check_traceable():
    ok = check_traceable(lambda x: x * 2, (jnp.ones(3),))
    assert ok
    import numpy as _np

    def bad(x):
        return _np.sum(_np.asarray(x))  # host round-trip breaks tracing

    with pytest.warns(UserWarning, match="not jit-traceable"):
        assert not check_traceable(bad, (jnp.ones(3),))


def test_distribution_dimension():
    assert distribution_dimension(d.Normal(0.0, 1.0)) == 1
    assert (
        distribution_dimension(
            d.MultivariateNormal(jnp.zeros(3), jnp.eye(3))
        )
        == 3
    )


def test_options_defaults():
    opts = NestedSamplingOptions()
    assert opts.sample_pool_size == 100
    assert opts.max_iterations == 10000
    assert opts.monte_carlo_steps == 200
    assert opts.termination_fraction == 0.01
    kw = opts.loop_kwargs()
    assert kw["num_delete"] == 1


@pytest.mark.slow
def test_gbm_time_series_regression(key):
    """BASELINE config 5: geometric-Brownian-motion time-series regression
    (the README's worked example) — y(t) ~ LogNormal(log S0 +
    (mu - sigma^2/2) t, sigma sqrt(t)); recover (mu, sigma) and check the
    regression predictive."""
    mu_true, sigma_true, s0 = 0.3, 0.25, 1.0
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0.05, 3.0, size=120))
    w = rng.normal(size=120) * np.sqrt(t)
    y = s0 * np.exp((mu_true - sigma_true**2 / 2) * t + sigma_true * w)

    def gen_dist(th, times):
        mu, sigma = th[0], th[1]
        tt = times[:, 0]
        return d.LogNormal(
            loc=jnp.log(s0) + (mu - sigma**2 / 2) * tt,
            scale=sigma * jnp.sqrt(tt),
        )

    problem = define_inference_problem(
        parameters=[("mu", -2.0, 2.0), ("sigma", 0.01, 2.0)],
        likelihood=gen_dist,
        data=jnp.asarray(y),
        independent_variables=jnp.asarray(t)[:, None],
        prior_distribution=["location", "scale"],
    )
    res = nested_sampling(
        problem, key, sample_pool_size=100, max_iterations=1000,
        monte_carlo_steps=80,
    )
    est = np.asarray(res.parameter_expected_values.mean)
    err = np.asarray(res.parameter_expected_values.standard_error)
    # posterior concentrates near the truth
    np.testing.assert_allclose(est, [mu_true, sigma_true], atol=0.15)
    assert np.all(err < 0.1)
    # regression predictive at new times brackets the true median path
    from bayesianinference_tpu.results import regression_predictive_distribution

    tq = np.linspace(0.2, 2.5, 12)[:, None]
    pred = regression_predictive_distribution(res, gen_dist, jnp.asarray(tq))
    med = np.asarray(pred.quantile(0.5))
    true_median = s0 * np.exp((mu_true - sigma_true**2 / 2) * tq[:, 0])
    np.testing.assert_allclose(med, true_median, rtol=0.2)
    lo = np.asarray(pred.quantile(0.05))
    hi = np.asarray(pred.quantile(0.95))
    assert np.all(lo < true_median) and np.all(true_median < hi)
