"""Seeded cross-engine fuzz: random 1-D problems where five independent
routes must agree.

For each generated problem (random data scale/size, random prior widths),
the direct Gauss-Legendre quadrature logZ (exact to machine tolerance in
1-D) is the oracle; nested sampling must land within its own reported
error bars (x5), the Laplace approximation within the usual O(1/n_data)
distance for a unimodal posterior, tempered SMC within its replicate
error bars, the ADVI ELBO lower-bounds (and nearly attains) the exact
logZ, and HMC recovers the closed-form posterior mean.  Complements the
fixed oracle tests with randomized coverage of the problem surface.
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
def test_engines_agree_on_random_problem(seed):
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

    # tempered SMC: an independent fourth evidence route
    from bayesianinference_tpu.engines import advi_fit, hmc_sample, smc_sampler

    smc = smc_sampler(
        problem, jax.random.PRNGKey(seed + 1), n_particles=300, num_runs=4,
        mcmc_steps=10,
    )
    sem = max(float(smc.log_evidence.standard_error), 5e-3)
    zs = abs(float(smc.log_evidence.mean) - exact) / sem
    assert zs < 6.0, (float(smc.log_evidence.mean), exact, sem)

    # ADVI: the ELBO lower-bounds logZ and is tight for this Gaussian
    # posterior (up to MC/optimizer noise)
    vi = advi_fit(problem, jax.random.PRNGKey(seed + 2), num_steps=600)
    elbo = float(vi.elbo)
    assert elbo < exact + 0.1, (elbo, exact)
    assert exact - elbo < 0.5, (elbo, exact)

    # HMC: the posterior mean of mu has a closed form
    prec_post = 1.0 / prior_scale**2 + n / scale**2
    mean_post = float(np.sum(np.asarray(data)) / scale**2 / prec_post)
    hmc = hmc_sample(
        problem, jax.random.PRNGKey(seed + 3), num_chains=4,
        num_samples=250, num_warmup=150, num_leapfrog=8,
    )
    mu_hat = float(hmc.posterior_samples().mean()[0])
    mc_err = float(np.sqrt(1.0 / prec_post)) / np.sqrt(50.0)  # ~ESS floor
    assert abs(mu_hat - mean_post) < 6.0 * mc_err, (mu_hat, mean_post)
