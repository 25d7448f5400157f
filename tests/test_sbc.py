"""Simulation-based calibration harness tests.

A correctly implemented pipeline produces uniform ranks FOR ANY model
(Talts et al. 2018), so the harness itself is tested against pipelines
whose calibration status is known exactly: the conjugate normal-normal
posterior (calibrated by construction) and a deliberately
under-dispersed corruption of it (must be flagged)."""

import jax
import jax.numpy as jnp
import pytest

from bayesianinference_tpu.dists import NormalInverseGamma
from bayesianinference_tpu.engines.conjugate import normal_conjugate_model
from bayesianinference_tpu.results import (
    SBCResult,
    sbc_ranks,
    sbc_uniformity_pvalues,
)

N_DATA = 8  # observations per synthetic dataset
L = 9  # posterior draws per replication


def _prior_sample(k):
    return jax.random.normal(k, (1,))


def _simulate(k, theta):
    return theta[0] + jax.random.normal(k, (N_DATA,))


def _exact_posterior_draws(scale_factor):
    # mu ~ N(0,1), y_i ~ N(mu, 1)  =>  mu | y ~ N(n ybar/(n+1), 1/(n+1))
    def draws(k, data):
        post_mean = jnp.sum(data) / (N_DATA + 1.0)
        post_sd = scale_factor / jnp.sqrt(N_DATA + 1.0)
        return post_mean + post_sd * jax.random.normal(k, (L, 1))

    return draws


def test_calibrated_pipeline_uniform_ranks():
    res = sbc_ranks(
        jax.random.PRNGKey(0),
        prior_sample=_prior_sample,
        simulate=_simulate,
        posterior_draws=_exact_posterior_draws(1.0),
        num_replications=256,
        vectorized=True,
        param_names=("mu",),
    )
    assert res.ranks.shape == (256, 1)
    assert res.num_draws == L
    assert int(res.ranks.min()) >= 0 and int(res.ranks.max()) <= L
    p = res.uniformity_pvalues()
    assert p.shape == (1,)
    assert float(p[0]) > 0.005


def test_underdispersed_pipeline_flagged():
    res = sbc_ranks(
        jax.random.PRNGKey(0),
        prior_sample=_prior_sample,
        simulate=_simulate,
        posterior_draws=_exact_posterior_draws(0.35),
        num_replications=256,
        vectorized=True,
    )
    # ranks pile up at 0 and L (posterior too narrow around its mean)
    assert float(res.uniformity_pvalues()[0]) < 1e-3


def test_host_loop_matches_vectorized():
    kwargs = dict(
        prior_sample=_prior_sample,
        simulate=_simulate,
        posterior_draws=_exact_posterior_draws(1.0),
        num_replications=16,
    )
    key = jax.random.PRNGKey(7)
    a = sbc_ranks(key, vectorized=True, **kwargs)
    b = sbc_ranks(key, vectorized=False, **kwargs)
    assert jnp.array_equal(a.ranks, b.ranks)
    assert jnp.allclose(a.thetas, b.thetas)
    assert a.num_draws == b.num_draws == L


def test_conjugate_engine_end_to_end():
    """The REAL conjugate engine is calibrated: theta=(mean, var) from
    the NIG prior, data simulated from it, the fitted NIG posterior's
    draws ranked — both parameters must come back uniform."""
    prior = NormalInverseGamma(mu0=0.5, lam=2.0, beta=1.5, nu=3.0)
    n = 10

    def prior_sample(k):
        m, v = prior.sample(k)
        return jnp.stack([m, v])

    def simulate(k, theta):
        return theta[0] + jnp.sqrt(theta[1]) * jax.random.normal(k, (n,))

    def posterior_draws(k, data):
        fit = normal_conjugate_model(data, prior=prior)
        m, v = fit.posterior.sample(k, (L,))
        return jnp.stack([m, v], axis=-1)

    res = sbc_ranks(
        jax.random.PRNGKey(3),
        prior_sample=prior_sample,
        simulate=simulate,
        posterior_draws=posterior_draws,
        num_replications=200,
        vectorized=True,
        param_names=("mean", "var"),
    )
    p = res.uniformity_pvalues()
    assert p.shape == (2,)
    assert float(p.min()) > 0.005, p


def test_uniformity_pvalue_exact_uniform():
    # a perfectly balanced rank table: every level appears equally often
    levels = 10
    ranks = jnp.tile(jnp.arange(levels), 30)[:, None]
    p = sbc_uniformity_pvalues(ranks, num_draws=levels - 1)
    assert float(p[0]) > 0.999


def test_theta_from_draws_and_validation():
    with pytest.raises(ValueError):
        sbc_ranks(
            jax.random.PRNGKey(0),
            prior_sample=_prior_sample,
            simulate=_simulate,
            posterior_draws=_exact_posterior_draws(1.0),
            num_replications=0,
        )
    # draws carry an extra column; the extractor selects the comparable one
    def draws_padded(k, data):
        d = _exact_posterior_draws(1.0)(k, data)
        return jnp.concatenate([jnp.zeros_like(d), d], axis=-1)

    res = sbc_ranks(
        jax.random.PRNGKey(5),
        prior_sample=_prior_sample,
        simulate=_simulate,
        posterior_draws=draws_padded,
        num_replications=64,
        vectorized=True,
        theta_from_draws=lambda row: row[1:],
    )
    assert res.ranks.shape == (64, 1)
    assert float(res.uniformity_pvalues()[0]) > 0.005


def test_sbc_rank_plot_renders(tmp_path):
    from bayesianinference_tpu import viz

    res = sbc_ranks(
        jax.random.PRNGKey(1),
        prior_sample=_prior_sample,
        simulate=_simulate,
        posterior_draws=_exact_posterior_draws(1.0),
        num_replications=100,
        vectorized=True,
        param_names=("mu",),
    )
    fig = viz.sbc_rank_plot(res)
    out = tmp_path / "sbc.png"
    fig.savefig(out, dpi=50)
    assert out.stat().st_size > 1000
    import matplotlib.pyplot as plt

    plt.close("all")


def test_histogram_counts_sum_to_replications():
    res = sbc_ranks(
        jax.random.PRNGKey(2),
        prior_sample=_prior_sample,
        simulate=_simulate,
        posterior_draws=_exact_posterior_draws(1.0),
        num_replications=80,
        vectorized=True,
    )
    edges, counts = res.histogram(0)
    assert counts.sum() == 80
    assert isinstance(res, SBCResult)
