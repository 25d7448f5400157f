"""Bayesian online changepoint detection (ops/bocpd.py +
engines/changepoint.py).

Oracles: under the product-partition model with constant hazard, the
marginal likelihood and the run-length posterior are computable by
EXACT enumeration of all 2^(T-1) segmentations, with segment marginals
from the closed-form NIG / Gamma-Poisson evidence (an independent
formula path from the sequential predictives the filter multiplies).
End-to-end: Laplace infers the hazard rate through the exact
likelihood, and detection localizes a planted mean shift.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import gammaln, logsumexp as sp_logsumexp

from bayesianinference_tpu.core.numerics import is_log_zero
from bayesianinference_tpu.engines import (
    changepoint_probability,
    define_changepoint_model,
    laplace_posterior_fit,
    run_length_posterior,
)
from bayesianinference_tpu.ops import (
    bocpd,
    changepoint_probabilities,
    gaussian_upm,
    poisson_upm,
)

NIG = dict(mu0=0.3, kappa0=2.0, alpha0=1.5, beta0=0.8)
GAM = dict(alpha0=2.0, beta0=1.0)


def _nig_segment_logml(y, mu0, kappa0, alpha0, beta0):
    """Closed-form NIG evidence of one segment (independent of the
    filter's sequential Student-t product)."""
    y = np.asarray(y, float)
    n = y.size
    if n == 0:
        return 0.0
    ybar = y.mean()
    kn = kappa0 + n
    an = alpha0 + 0.5 * n
    bn = (
        beta0
        + 0.5 * np.sum((y - ybar) ** 2)
        + 0.5 * kappa0 * n * (ybar - mu0) ** 2 / kn
    )
    return float(
        gammaln(an)
        - gammaln(alpha0)
        + alpha0 * np.log(beta0)
        - an * np.log(bn)
        + 0.5 * (np.log(kappa0) - np.log(kn))
        - 0.5 * n * np.log(2 * np.pi)
    )


def _poisson_segment_logml(y, alpha0, beta0):
    y = np.asarray(y, float)
    n = y.size
    if n == 0:
        return 0.0
    s = y.sum()
    return float(
        -np.sum(gammaln(y + 1.0))
        + gammaln(alpha0 + s)
        - gammaln(alpha0)
        + alpha0 * np.log(beta0)
        - (alpha0 + s) * np.log(beta0 + n)
    )


def _enumerate(y, h, segment_logml, mask=None, upto=None):
    """Exact (log p(y_{1:T}), run-length posteriors [T, T]) by summing
    all changepoint configurations.  ``mask`` drops points from their
    segment marginal (hazard transitions still count every step)."""
    y = np.asarray(y, float)
    t_total = y.size if upto is None else upto
    obs = np.ones(y.size, bool) if mask is None else np.asarray(mask)
    rl_post = np.zeros((t_total, t_total))
    ll_full = None
    for t in range(1, t_total + 1):
        scores = {}
        for cfg in itertools.product([0, 1], repeat=t - 1):
            # cfg[s] = 1: changepoint between s and s+1 (0-based)
            bounds = [0] + [s + 1 for s in range(t - 1) if cfg[s]] + [t]
            lp = sum(c * np.log(h) + (1 - c) * np.log1p(-h) for c in cfg)
            for a, b in zip(bounds[:-1], bounds[1:]):
                seg = y[a:b][obs[a:b]]
                lp += segment_logml(seg)
            scores[cfg] = lp
        vals = np.array(list(scores.values()))
        tot = sp_logsumexp(vals)
        if t == t_total:
            ll_full = tot
        for cfg, lp in scores.items():
            last_cp = max([0] + [s + 1 for s in range(t - 1) if cfg[s]])
            r = t - 1 - last_cp  # run length after observing y_t
            rl_post[t - 1, r] += np.exp(lp - tot)
    return ll_full, rl_post


@pytest.fixture(scope="module")
def small_series():
    rng = np.random.default_rng(0)
    return np.concatenate(
        [rng.normal(0.0, 1.0, 4), rng.normal(3.0, 0.5, 4)]
    )


def test_gaussian_loglik_matches_enumeration(small_series):
    y, h = small_series, 0.15
    ll_exact, _ = _enumerate(
        y, h, lambda s: _nig_segment_logml(s, **NIG)
    )
    res = bocpd(jnp.asarray(y), gaussian_upm(**NIG), h)
    np.testing.assert_allclose(
        float(res.log_likelihood), ll_exact, rtol=1e-12
    )


def test_run_length_posterior_matches_enumeration(small_series):
    y, h = small_series, 0.15
    _, rl_exact = _enumerate(
        y, h, lambda s: _nig_segment_logml(s, **NIG)
    )
    res = bocpd(jnp.asarray(y), gaussian_upm(**NIG), h)
    got = np.exp(np.asarray(res.log_run_length))
    np.testing.assert_allclose(got, rl_exact, atol=1e-12)


def test_poisson_loglik_matches_enumeration():
    rng = np.random.default_rng(1)
    y = np.concatenate([rng.poisson(2.0, 4), rng.poisson(9.0, 4)]).astype(
        float
    )
    h = 0.1
    ll_exact, rl_exact = _enumerate(
        y, h, lambda s: _poisson_segment_logml(s, **GAM)
    )
    res = bocpd(jnp.asarray(y), poisson_upm(**GAM), h)
    np.testing.assert_allclose(
        float(res.log_likelihood), ll_exact, rtol=1e-12
    )
    np.testing.assert_allclose(
        np.exp(np.asarray(res.log_run_length)), rl_exact, atol=1e-12
    )


def test_masked_loglik_matches_enumeration(small_series):
    y, h = small_series, 0.15
    mask = np.ones(y.size, bool)
    mask[2] = mask[5] = False
    ll_exact, _ = _enumerate(
        y, h, lambda s: _nig_segment_logml(s, **NIG), mask=mask
    )
    res = bocpd(
        jnp.asarray(y), gaussian_upm(**NIG), h, mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        float(res.log_likelihood), ll_exact, rtol=1e-12
    )


def test_truncated_buffer_close_to_exact(small_series):
    y, h = small_series, 0.15
    full = float(
        bocpd(jnp.asarray(y), gaussian_upm(**NIG), h).log_likelihood
    )
    trunc = float(
        bocpd(jnp.asarray(y), gaussian_upm(**NIG), h, r_max=5).log_likelihood
    )
    assert np.isfinite(trunc)
    assert abs(trunc - full) < 0.05 * abs(full), (trunc, full)


def test_detects_planted_mean_shift():
    rng = np.random.default_rng(2)
    y = np.concatenate(
        [rng.normal(0, 1, 60), rng.normal(4, 1, 60)]
    )
    res = bocpd(jnp.asarray(y), gaussian_upm(), hazard=0.02)
    cp = np.asarray(changepoint_probabilities(res))
    # ignore the first step (always a new segment)
    peak = int(np.argmax(cp[1:])) + 1
    assert 55 <= peak <= 65, peak
    assert cp[peak] > 0.3 and cp[peak] > 20 * np.median(cp[1:])


# ---------------------------------------------------------------- engines


@pytest.fixture(scope="module")
def hazard_problem():
    rng = np.random.default_rng(3)
    segs, mus = [], rng.normal(0, 3, 8)
    for m in mus:
        segs.append(rng.normal(m, 1.0, 25))
    y = np.concatenate(segs)  # true hazard ~ 1/25

    def builder(theta):
        return gaussian_upm(mu0=0.0, kappa0=0.2, alpha0=2.0, beta0=2.0), theta[0]

    problem = define_changepoint_model(
        y,
        builder,
        parameters=[("hazard", 1e-3, 0.5)],
        prior_distribution=["scale"],
        validate=False,
    )
    return problem, y


def test_laplace_infers_hazard(hazard_problem):
    problem, _ = hazard_problem
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    h = float(fit.mean[0])
    assert 0.01 < h < 0.15, h  # truth 0.04
    assert np.isfinite(float(fit.log_evidence))


def test_run_length_posterior_and_cp_probability(hazard_problem):
    problem, y = hazard_problem
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    res = run_length_posterior(problem, fit.mean)
    assert res.log_run_length.shape == (y.size, y.size)
    np.testing.assert_allclose(
        np.exp(np.asarray(res.log_run_length)).sum(axis=1),
        np.ones(y.size),
        rtol=1e-8,
    )
    draws = fit.posterior_distribution.sample(jax.random.PRNGKey(1), (5,))
    cp = np.asarray(changepoint_probability(problem, draws))
    assert cp.shape == (y.size,)
    # planted changepoints at 25, 50, ...: detection beats base rate
    hits = [cp[k] for k in range(25, 200, 25)]
    assert np.mean(hits) > 5 * np.median(cp[2:]), (np.mean(hits), np.median(cp))


def test_cp_probability_drops_out_of_support_draws(hazard_problem):
    """A draw with hazard <= 0 (Gaussian posterior leaking past the
    box) must not poison the averaged probabilities."""
    problem, y = hazard_problem
    draws = jnp.asarray([[0.04], [-0.01], [0.05]])
    cp = np.asarray(changepoint_probability(problem, draws))
    assert np.isfinite(cp).all()
    ref = np.asarray(
        changepoint_probability(problem, jnp.asarray([[0.04], [0.05]]))
    )
    np.testing.assert_allclose(cp, ref, rtol=1e-6)


def test_loglik_traceable_and_guarded(hazard_problem):
    problem, _ = hazard_problem
    v, g = jax.jit(jax.value_and_grad(problem.log_likelihood))(
        jnp.asarray([0.05])
    )
    assert np.isfinite(float(v)) and np.isfinite(float(g[0]))
    bad = problem.log_likelihood(jnp.asarray([jnp.nan]))
    assert not bool(jnp.isnan(bad))
