"""Seeded cross-engine fuzz: random 1-D problems where three independent
evidence routes must agree.

For each generated problem (random data scale/size, random prior widths),
the direct Gauss-Legendre quadrature logZ (exact to machine tolerance in
1-D) is the oracle; nested sampling must land within its own reported
error bars (x5) and the Laplace approximation within the usual
O(1/n_data) distance for a unimodal posterior.  Complements the fixed
oracle tests with randomized coverage of the problem-definition surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines.direct import direct_posterior_distribution
from bayesianinference_tpu.engines.laplace import laplace_posterior_fit
from bayesianinference_tpu.engines.nested_sampling import nested_sampling
from bayesianinference_tpu.models import define_inference_problem


def _random_problem(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(8, 40))
    loc = float(rng.uniform(-2.0, 2.0))
    scale = float(rng.uniform(0.4, 2.0))
    data = jnp.asarray(rng.normal(loc, scale, size=n))
    prior_scale = float(rng.uniform(2.0, 8.0))
    bound = 12.0

    problem = define_inference_problem(
        parameters=[("mu", -bound, bound)],
        log_likelihood=lambda th: jnp.sum(
            d.Normal(th[0], scale).log_prob(data)
        ),
        log_prior=lambda th: jnp.sum(
            d.Normal(0.0, prior_scale).log_prob(th)
        ),  # proper prior; box much wider than the mass
        validate=False,
    )
    return problem, data, scale, prior_scale


@pytest.mark.parametrize(
    "seed",
    [
        11,
        pytest.param(23, marks=pytest.mark.slow),
        pytest.param(47, marks=pytest.mark.slow),
    ],
)
def test_three_engines_agree_on_random_problem(seed):
    problem, data, scale, prior_scale = _random_problem(seed)

    # closed form: x_i | mu ~ N(mu, scale), mu ~ N(0, prior_scale)
    import scipy.stats as st

    n = data.shape[0]
    cov = scale**2 * np.eye(n) + prior_scale**2
    exact = st.multivariate_normal(np.zeros(n), cov).logpdf(np.asarray(data))

    dp = direct_posterior_distribution(problem=problem, num_points=256)
    assert abs(float(dp.log_evidence) - exact) < 1e-6

    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(seed))
    # Gaussian posterior: Laplace is exact up to optimizer tolerance
    assert abs(float(fit.log_evidence) - exact) < 1e-5

    res = nested_sampling(
        problem,
        jax.random.PRNGKey(seed),
        sample_pool_size=100,
        monte_carlo_steps=60,
        max_iterations=1500,
        post_process_sampling_runs=32,
    )
    err = max(float(res.log_evidence.standard_error), 1e-3)
    z = abs(float(res.log_evidence.mean) - exact) / err
    assert z < 5.0, (float(res.log_evidence.mean), exact, err)
