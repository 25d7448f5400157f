"""Scoring rules (results/scoring.py).

Oracles: (1) the Gaussian-mixture CRPS closed form must match the
single-Gaussian textbook formula and a large-sample energy estimator;
(2) the point-mass limit gives |y - x|; (3) PIT of the generating
model is uniform; (4) coverage of the generating model's intervals
matches the level; (5) all scores prefer the true model to a wrong one
(propriety smoke test).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinference_tpu.dists.pointwise import PointwiseMixture
from bayesianinference_tpu.dists.scalar import Normal
from bayesianinference_tpu.results.scoring import (
    crps,
    crps_ensemble,
    crps_gaussian_mixture,
    dawid_sebastiani_score,
    interval_coverage,
    log_score,
    pit,
)


def _mixture(locs, scales, log_w=None):
    locs = jnp.asarray(locs, jnp.float64)
    scales = jnp.asarray(scales, jnp.float64)
    if log_w is None:
        log_w = jnp.zeros(locs.shape[0], jnp.float64)
    return PointwiseMixture(
        log_weights=jnp.asarray(log_w), component=Normal(locs, scales)
    )


def test_single_gaussian_crps_matches_textbook():
    # CRPS(N(mu, s), y) = s [ z (2 Phi(z) - 1) + 2 phi(z) - 1/sqrt(pi) ]
    from scipy.stats import norm

    mu, s = 0.7, 1.3
    for y in (-1.0, 0.7, 2.5):
        z = (y - mu) / s
        ref = s * (
            z * (2 * norm.cdf(z) - 1) + 2 * norm.pdf(z) - 1 / np.sqrt(np.pi)
        )
        got = float(
            crps_gaussian_mixture(
                jnp.zeros(1), jnp.full((1, 1), mu), jnp.full((1, 1), s),
                jnp.asarray([y]),
            )[0]
        )
        np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_mixture_crps_matches_energy_estimator():
    rng = np.random.default_rng(0)
    locs = jnp.asarray(rng.normal(size=(5, 3)))
    scales = jnp.asarray(rng.uniform(0.3, 1.5, size=(5, 3)))
    log_w = jnp.asarray(rng.normal(size=5))
    mix = _mixture(locs, scales, log_w)
    y = jnp.asarray([0.3, -0.8, 1.1])
    exact = np.asarray(crps(mix, y))
    draws = mix.sample(jax.random.PRNGKey(1), (40_000,))
    mc = np.asarray(crps_ensemble(draws, y))
    np.testing.assert_allclose(exact, mc, atol=0.01)


def test_point_mass_limit_is_absolute_error():
    y = jnp.asarray([0.0, 2.0])
    got = crps_gaussian_mixture(
        jnp.zeros(1),
        jnp.asarray([[1.0, 1.0]]),
        jnp.full((1, 2), 1e-9),
        y,
    )
    np.testing.assert_allclose(np.asarray(got), [1.0, 1.0], atol=1e-6)


def test_pit_uniform_and_coverage_calibrated():
    rng = np.random.default_rng(2)
    m = 4000
    mu = jnp.asarray(rng.normal(size=m))
    s = jnp.asarray(rng.uniform(0.5, 2.0, size=m))
    y = jnp.asarray(rng.normal(np.asarray(mu), np.asarray(s)))
    mix = _mixture(mu[None, :], s[None, :])
    u = np.asarray(pit(mix, y))
    assert np.all((u > 0) & (u < 1))
    # uniformity: mean ~ 1/2, var ~ 1/12, KS-ish max deviation small
    assert abs(u.mean() - 0.5) < 0.02
    assert abs(u.var() - 1 / 12) < 0.01
    grid = np.linspace(0.05, 0.95, 19)
    emp = np.asarray([(u <= g).mean() for g in grid])
    assert np.max(np.abs(emp - grid)) < 0.03
    cov = interval_coverage(mix, y, levels=(0.5, 0.9))
    assert abs(float(cov[0.5][0]) - 0.5) < 0.03
    assert abs(float(cov[0.9][0]) - 0.9) < 0.02
    assert float(cov[0.9][1]) > float(cov[0.5][1])


def test_scores_prefer_the_true_model():
    rng = np.random.default_rng(3)
    m = 1500
    y = jnp.asarray(rng.normal(0.0, 1.0, size=m))
    true = _mixture(jnp.zeros((1, m)), jnp.ones((1, m)))
    wrong = _mixture(jnp.full((1, m), 1.5), jnp.full((1, m), 0.4))
    for score in (
        lambda d: crps(d, y),
        lambda d: log_score(d, y),
        lambda d: dawid_sebastiani_score(d, y),
    ):
        assert float(jnp.mean(score(true))) < float(jnp.mean(score(wrong)))


def test_sample_fallback_and_validation():
    import pytest

    from bayesianinference_tpu.dists.scalar import StudentT

    mix = PointwiseMixture(
        log_weights=jnp.zeros(2),
        component=StudentT(
            df=jnp.full((2, 3), 6.0),
            loc=jnp.zeros((2, 3)),
            scale=jnp.ones((2, 3)),
        ),
    )
    y = jnp.asarray([0.0, 0.5, -1.0])
    with pytest.raises(ValueError, match="key"):
        crps(mix, y)
    vals = crps(mix, y, key=jax.random.PRNGKey(0), num_samples=4000)
    # StudentT(6) CRPS is close to (slightly above-ish) the Gaussian's;
    # just check sane magnitude vs the Gaussian closed form
    ref = crps_gaussian_mixture(
        jnp.zeros(1), jnp.zeros((1, 3)), jnp.ones((1, 3)), y
    )
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref), atol=0.12)
