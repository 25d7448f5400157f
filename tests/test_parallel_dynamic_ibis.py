"""Mesh forms of dynamic NS and IBIS (parallel/parallel_dynamic_ns.py,
parallel/parallel_ibis.py) on the virtual 8-device CPU mesh.

Oracles follow the suite convention: conjugate/quadrature closed forms,
plus cross-engine agreement with the single-device engines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines.ibis import ibis_sampler
from bayesianinference_tpu.models import define_inference_problem
from bayesianinference_tpu.parallel import (
    parallel_dynamic_nested_sampling,
    parallel_ibis,
)


@pytest.fixture(scope="module")
def normal_mean_setup():
    rng = np.random.default_rng(3)
    data = jnp.asarray(rng.normal(0.8, 1.0, size=40))
    sigma, tau = 1.0, 2.0
    problem = define_inference_problem(
        parameters=[("mu", -10.0, 10.0)],
        log_likelihood=lambda th: jnp.sum(
            d.Normal(th[0], sigma).log_prob(data)
        ),
        prior_distribution=d.Product((d.Normal(0.0, tau),)),
        validate=False,
    )

    def pointwise(th, y):
        return d.Normal(th[0], sigma).log_prob(y)

    n = data.shape[0]
    post_var = 1.0 / (1.0 / tau**2 + n / sigma**2)
    post_mean = post_var * float(jnp.sum(data)) / sigma**2
    grid = np.linspace(-10, 10, 4001)
    ll = np.asarray(
        jax.vmap(lambda m: jnp.sum(d.Normal(m, sigma).log_prob(data)))(
            jnp.asarray(grid)
        )
    )
    lp = np.asarray(d.Normal(0.0, tau).log_prob(jnp.asarray(grid)))
    from scipy.special import logsumexp as sp_lse

    log_z = float(sp_lse(ll + lp) + np.log(grid[1] - grid[0]))
    return problem, pointwise, data, post_mean, post_var, log_z


def test_parallel_ibis_oracle(normal_mean_setup):
    problem, pointwise, data, post_mean, post_var, log_z = normal_mean_setup
    res = parallel_ibis(
        problem, pointwise, data, jax.random.PRNGKey(1),
        n_particles=2048, batch_size=5, mcmc_steps=15,
    )
    assert abs(float(res.log_evidence) - log_z) < 0.25, (
        float(res.log_evidence), log_z,
    )
    # prequential increments sum to the evidence exactly
    np.testing.assert_allclose(
        float(jnp.sum(res.log_predictives)), float(res.log_evidence),
        rtol=1e-6,
    )
    # posterior moments from the (sharded, re-fetched) particles
    w = np.exp(np.asarray(res.log_weights))
    w /= w.sum()
    mu_hat = float((w * np.asarray(res.particles[:, 0])).sum())
    var_hat = float(
        (w * (np.asarray(res.particles[:, 0]) - mu_hat) ** 2).sum()
    )
    assert abs(mu_hat - post_mean) < 4 * np.sqrt(post_var / 500)
    assert abs(var_hat / post_var - 1.0) < 0.25
    resampled = np.asarray(res.resampled)
    assert resampled.any()
    assert np.nanmean(np.asarray(res.acceptance_history)) > 0.1
    # cross-engine agreement with the single-device IBIS (same config,
    # independent randomness): both estimate the same logZ
    ref = ibis_sampler(
        problem, pointwise, data, jax.random.PRNGKey(2),
        n_particles=2048, batch_size=5, mcmc_steps=15,
    )
    assert abs(float(res.log_evidence) - float(ref.log_evidence)) < 0.25


def test_parallel_ibis_validation(normal_mean_setup):
    problem, pointwise, data, *_ = normal_mean_setup
    with pytest.raises(ValueError, match="multiple"):
        parallel_ibis(
            problem, pointwise, data, jax.random.PRNGKey(0),
            n_particles=1001,
        )


def test_parallel_dynamic_ns_validates_num_delete(normal_mean_setup):
    # round-4 ADVICE: this front-end feeds _ns_loop_jit via shard_map,
    # bypassing nested_sampling_loop's checks — it must reject
    # num_delete >= min(pool, batch) up front, not deep in the trace
    problem, *_ = normal_mean_setup
    with pytest.raises(ValueError, match="num_delete"):
        parallel_dynamic_nested_sampling(
            problem, jax.random.PRNGKey(0),
            sample_pool_size=48, batch_size=16, num_delete=16,
        )


def test_parallel_dynamic_ns_oracle(normal_mean_setup):
    problem, _, data, post_mean, post_var, log_z = normal_mean_setup
    res = parallel_dynamic_nested_sampling(
        problem,
        jax.random.PRNGKey(5),
        sample_pool_size=48,
        num_batches=8,  # one stage on the 8-device runs mesh
        monte_carlo_steps=40,
        post_process_sampling_runs=50,
    )
    se = float(res.log_evidence.standard_error)
    z = (float(res.log_evidence.mean) - log_z) / se
    assert abs(z) < 4.0, (float(res.log_evidence.mean), log_z, z)
    w = np.exp(np.asarray(res.crude_log_posterior_weights))
    x = np.asarray(res.points)[:, 0]
    mean = float(w @ x)
    assert abs(mean - post_mean) < 4 * np.sqrt(post_var)
    assert res.num_likelihood_evals > 0 and res.iterations > 0
