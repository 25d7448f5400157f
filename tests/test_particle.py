"""Particle filter + PMMH (ops/particle.py + engines/particle.py).

Oracles: (1) on a linear-Gaussian SSM the particle likelihood estimate
must agree with the EXACT Kalman log-likelihood within Monte-Carlo
error, and the filter means must track the Kalman filter means; (2)
the PMMH posterior over one parameter must match the exact-likelihood
grid posterior (quadrature over the Kalman logL) in mean and sd; (3) a
stochastic-volatility model (genuinely non-Gaussian) runs end to end
and recovers plausible parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu.engines.particle import pmmh_sample
from bayesianinference_tpu.ops.kalman import (
    LGSSM,
    kalman_filter,
    kalman_log_likelihood,
    kalman_sample,
)
from bayesianinference_tpu.ops.particle import (
    ParticleModel,
    particle_filter,
    particle_forecast,
    particle_log_likelihood,
)


def _ar1_lgssm(phi=0.85, q=0.3, r=0.4):
    return LGSSM(
        transition=jnp.asarray([[phi]]),
        transition_noise=jnp.asarray([[q**2]]),
        observation=jnp.asarray([[1.0]]),
        observation_noise=jnp.asarray([[r**2]]),
        initial_mean=jnp.zeros(1),
        initial_cov=jnp.asarray([[q**2 / (1 - phi**2)]]),
    )


def _ar1_particle_model(phi=0.85, q=0.3, r=0.4):
    sd0 = jnp.sqrt(q**2 / (1 - phi**2))

    def init(key, p):
        return sd0 * jax.random.normal(key, (p, 1))

    def trans(key, particles, t):
        return phi * particles + q * jax.random.normal(
            key, particles.shape, particles.dtype
        )

    def obs_lp(particles, y_t, t):
        z = (y_t[0] - particles[:, 0]) / r
        return -0.5 * z**2 - jnp.log(r) - 0.5 * jnp.log(2 * jnp.pi)

    return ParticleModel(init, trans, obs_lp)


@pytest.fixture(scope="module")
def ar1_data():
    model = _ar1_lgssm()
    _, y = kalman_sample(jax.random.PRNGKey(0), model, 150)
    return model, y


def test_pf_matches_kalman_likelihood(ar1_data):
    model, y = ar1_data
    exact = float(kalman_log_likelihood(model, y[:, 0]))
    pmod = _ar1_particle_model()
    ests = np.asarray(
        jax.vmap(
            lambda k: particle_log_likelihood(pmod, y, 4096, k)
        )(jax.random.split(jax.random.PRNGKey(1), 16))
    )
    # unbiased in p-space => log estimates cluster just below exact;
    # with 4096 particles the spread is tiny
    assert abs(ests.mean() - exact) < 0.25, (ests.mean(), exact)
    assert ests.std() < 0.3
    # filter means track the Kalman filter means
    res = particle_filter(pmod, y, 4096, jax.random.PRNGKey(2))
    kf = kalman_filter(model, y[:, 0])
    np.testing.assert_allclose(
        np.asarray(res.filter_means[:, 0]),
        np.asarray(kf.filtered_means[:, 0]),
        atol=0.08,
    )
    assert np.all(np.asarray(res.ess) > 100)


def test_resampling_thresholds(ar1_data):
    _, y = ar1_data
    pmod = _ar1_particle_model()
    # never resampling degenerates (tiny terminal ESS); always is fine
    never = particle_filter(
        pmod, y, 512, jax.random.PRNGKey(3), ess_threshold=0.0
    )
    always = particle_filter(
        pmod, y, 512, jax.random.PRNGKey(3), ess_threshold=1.0
    )
    assert float(never.ess[-1]) < 20
    assert float(always.ess[-1]) > 100
    assert np.isfinite(float(never.log_likelihood))
    assert np.isfinite(float(always.log_likelihood))


def test_pmmh_smoke(ar1_data):
    """Fast shape/accept sanity for the non-slow suite; the statistical
    oracle runs in the slow-marked grid test below."""
    _, y = ar1_data

    def builder(th):
        return _ar1_particle_model(phi=th[0])

    res = pmmh_sample(
        builder, y[:60],
        parameters=[("phi", 0.3, 0.99)],
        key=jax.random.PRNGKey(7),
        num_particles=128, num_samples=40, num_warmup=40, num_chains=2,
    )
    assert res.samples.shape == (2, 40, 1)
    assert np.all(np.isfinite(np.asarray(res.samples)))
    assert np.all(np.isfinite(np.asarray(res.log_likelihoods)))
    assert res.points.shape == (80, 1)
    assert np.all(np.asarray(res.proposal_scales) > 0)


def test_pmmh_mesh_sharded_chains_match_single_device(ar1_data):
    """Chains sharded over the 8-device CPU mesh must reproduce the
    single-device run exactly (same per-chain keys, no collectives)."""
    from bayesianinference_tpu.parallel.sharding import make_mesh

    _, y = ar1_data

    def builder(th):
        return _ar1_particle_model(phi=th[0])

    kwargs = dict(
        parameters=[("phi", 0.3, 0.99)], key=jax.random.PRNGKey(8),
        num_particles=64, num_samples=20, num_warmup=20, num_chains=8,
    )
    r1 = pmmh_sample(builder, y[:40], **kwargs)
    r8 = pmmh_sample(
        builder, y[:40], mesh=make_mesh(("chains",)), **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(r8.samples), np.asarray(r1.samples), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(r8.acceptance_rate), np.asarray(r1.acceptance_rate)
    )
    with pytest.raises(ValueError, match="multiple"):
        pmmh_sample(
            builder, y[:40], parameters=[("phi", 0.3, 0.99)],
            key=jax.random.PRNGKey(8), num_particles=32,
            num_samples=4, num_warmup=4, num_chains=3,
            mesh=make_mesh(("chains",)),
        )


@pytest.mark.slow
def test_pmmh_matches_exact_grid_posterior(ar1_data):
    """Infer the AR coefficient phi with a uniform prior: the PMMH
    posterior must match the exact Kalman-likelihood grid posterior."""
    _, y = ar1_data

    def builder(th):
        return _ar1_particle_model(phi=th[0])

    res = pmmh_sample(
        builder,
        y,
        parameters=[("phi", 0.3, 0.99)],
        key=jax.random.PRNGKey(4),
        num_particles=512,
        num_samples=250,
        num_warmup=250,
        num_chains=8,
    )
    assert res.samples.shape == (8, 250, 1)
    acc = np.asarray(res.acceptance_rate)
    assert np.all(acc > 0.05) and np.all(acc < 0.7), acc
    draws = np.asarray(res.points[:, 0])
    # exact posterior by quadrature over the Kalman likelihood
    grid = np.linspace(0.3, 0.99, 200)
    logl = np.asarray(
        jax.vmap(
            lambda p: kalman_log_likelihood(_ar1_lgssm(phi=p), y[:, 0])
        )(jnp.asarray(grid))
    )
    w = np.exp(logl - logl.max())
    w /= w.sum()
    mean_ref = float((grid * w).sum())
    sd_ref = float(np.sqrt(((grid - mean_ref) ** 2 * w).sum()))
    assert abs(draws.mean() - mean_ref) < 3.0 * sd_ref / np.sqrt(50), (
        draws.mean(), mean_ref, sd_ref,
    )
    assert abs(draws.std() / sd_ref - 1.0) < 0.35, (draws.std(), sd_ref)


@pytest.mark.slow
def test_stochastic_volatility_end_to_end():
    """SV model: h_t = mu + phi (h_{t-1} - mu) + s e_t,
    y_t ~ N(0, exp(h_t)) — no closed-form likelihood exists."""
    rng = np.random.default_rng(5)
    t_len, mu_true, phi_true, s_true = 300, -1.0, 0.95, 0.25
    h = np.zeros(t_len)
    h[0] = mu_true + s_true / np.sqrt(1 - phi_true**2) * rng.normal()
    for t in range(1, t_len):
        h[t] = mu_true + phi_true * (h[t - 1] - mu_true) + s_true * rng.normal()
    y = jnp.asarray(
        (np.exp(h / 2) * rng.normal(size=t_len))[:, None]
    )

    def builder(th):
        mu, phi, s = th[0], th[1], th[2]
        sd0 = s / jnp.sqrt(1 - phi**2)

        def init(key, p):
            return mu + sd0 * jax.random.normal(key, (p, 1))

        def trans(key, particles, t):
            return mu + phi * (particles - mu) + s * jax.random.normal(
                key, particles.shape, particles.dtype
            )

        def obs_lp(particles, y_t, t):
            h = particles[:, 0]
            return -0.5 * (h + y_t[0] ** 2 * jnp.exp(-h)) - 0.5 * jnp.log(
                2 * jnp.pi
            )

        return ParticleModel(init, trans, obs_lp)

    res = pmmh_sample(
        builder,
        y,
        parameters=[("mu", -3.0, 1.0), ("phi", 0.5, 0.995),
                    ("s", 0.05, 1.0)],
        key=jax.random.PRNGKey(6),
        num_particles=512,
        num_samples=300,
        num_warmup=400,
        num_chains=8,
    )
    draws = np.asarray(res.points)
    assert np.all(np.isfinite(draws))
    mu_est, phi_est, s_est = draws.mean(axis=0)
    assert abs(mu_est - mu_true) < 0.6, mu_est
    assert abs(phi_est - phi_true) < 0.1, phi_est
    assert abs(s_est - s_true) < 0.25, s_est


def test_particle_forecast_matches_kalman_predictive(ar1_data):
    """Forecast moments from the particle cloud must match the exact
    Kalman predictive recursions on the AR(1)."""
    model, y = ar1_data
    pmod = _ar1_particle_model()
    horizon = 10
    path = jax.jit(
        lambda k: particle_forecast(pmod, y, horizon, 8192, k)
    )(jax.random.PRNGKey(11))
    assert path.shape == (horizon, 8192, 1)
    # exact predictive: m_{T+h} = phi^h m_T; P_{T+h} recursion
    kf = kalman_filter(model, y[:, 0])
    phi, q = 0.85, 0.3
    m = float(kf.filtered_means[-1, 0])
    p = float(kf.filtered_covs[-1, 0, 0])
    for h in range(horizon):
        m = phi * m
        p = phi**2 * p + q**2
        np.testing.assert_allclose(
            float(path[h].mean()), m, atol=4.0 * np.sqrt(p / 8192) + 0.01
        )
        np.testing.assert_allclose(
            float(path[h].std()), np.sqrt(p), rtol=0.06
        )
