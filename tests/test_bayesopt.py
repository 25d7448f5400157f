"""Bayesian optimization engine: masked-GP exactness, acquisition math,
and end-to-end optimization quality on known functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

from bayesianinference_tpu.engines.bayesopt import (
    BayesOptConfig,
    bayes_optimize,
    bo_init,
    bo_observe,
    bo_suggest,
    log_expected_improvement,
    masked_gp_log_marginal,
    masked_gp_moments,
)
from bayesianinference_tpu.ops.gp_kernels import (
    covariance_matrix,
    gp_log_marginal_likelihood,
    gp_posterior_moments,
    se_kernel,
)


def test_masked_gp_moments_match_dense():
    """Padding slots must not change the posterior: masked moments over a
    [capacity] buffer equal the dense gp_posterior_moments on the valid
    block (identical kernel/nugget), to roundoff."""
    rng = np.random.default_rng(0)
    n, cap, d = 7, 12, 2
    x = rng.uniform(size=(n, d))
    y = np.sin(3 * x[:, 0]) + 0.1 * rng.normal(size=n)
    xq = rng.uniform(size=(5, d))
    ell, var, nug = 0.4, 1.7, 1e-3

    x_pad = np.full((cap, d), 0.33)
    x_pad[:n] = x
    y_pad = np.zeros(cap)
    y_pad[:n] = y
    mask = np.zeros(cap, bool)
    mask[:n] = True

    m_m, s_m = masked_gp_moments(
        x_pad,
        y_pad,
        jnp.asarray(mask),
        xq,
        jnp.log(var),
        jnp.full((d,), jnp.log(ell)),
        jnp.log(nug),
    )
    kern = se_kernel(variance=var, lengthscale=ell)
    m_d, s_d = gp_posterior_moments(
        kern, x, y, xq, nugget=nug, query_nugget=False
    )
    np.testing.assert_allclose(np.asarray(m_m), np.asarray(m_d), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_m), np.asarray(s_d), atol=2e-5)


def test_masked_gp_logml_matches_dense():
    rng = np.random.default_rng(1)
    n, cap = 9, 16
    x = rng.uniform(size=(n, 1))
    y = rng.normal(size=n)
    x_pad = np.full((cap, 1), 0.5)
    x_pad[:n] = x
    y_pad = np.zeros(cap)
    y_pad[:n] = y
    mask = np.zeros(cap, bool)
    mask[:n] = True
    var, ell, nug = 0.8, 0.25, 0.05

    got = masked_gp_log_marginal(
        x_pad,
        y_pad,
        jnp.asarray(mask),
        jnp.log(var),
        jnp.full((1,), jnp.log(ell)),
        jnp.log(nug),
    )
    kern = se_kernel(variance=var, lengthscale=ell)
    k = covariance_matrix(kern, x, nugget=nug)
    want = gp_log_marginal_likelihood(k, y)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_log_ei_matches_closed_form():
    """log EI vs the scipy closed form s*(z Phi(z) + phi(z)), including a
    deep-tail point where the naive form underflows to log(0)."""
    mean = jnp.asarray([1.2, 0.0, -3.0, -30.0])
    std = jnp.asarray([0.5, 1.0, 0.7, 1.0])
    best = 0.3
    got = log_expected_improvement(mean, std, best)
    z = (np.asarray(mean) - best) / np.asarray(std)
    ei = np.asarray(std) * (z * sps.norm.cdf(z) + sps.norm.pdf(z))
    # first three: direct comparison
    np.testing.assert_allclose(
        np.asarray(got[:3]), np.log(ei[:3]), rtol=1e-4
    )
    # deep tail: finite, monotone below the others
    assert np.isfinite(float(got[3])) and float(got[3]) < float(got[2])


def test_bayes_optimize_quadratic_beats_random():
    """2-D quadratic bowl: 8 init + 16 BO steps must land far closer to
    the optimum than a 24-point random search (same total budget)."""
    opt = jnp.asarray([0.3, -0.6])

    def f(x):
        return jnp.sum((x - opt) ** 2)

    lower, upper = jnp.asarray([-2.0, -2.0]), jnp.asarray([2.0, 2.0])
    res = bayes_optimize(
        f,
        lower,
        upper,
        jax.random.PRNGKey(3),
        num_steps=16,
        num_init=8,
        config=BayesOptConfig(num_candidates=256, hyper_steps=6),
    )
    assert res.y_history.shape == (24,)
    # random-search baseline at the same budget
    xs = jax.random.uniform(
        jax.random.PRNGKey(99), (24, 2), minval=-2.0, maxval=2.0
    )
    y_rand = float(jnp.min(jax.vmap(f)(xs)))
    assert float(res.y_best) < 0.25 * y_rand
    assert float(res.y_best) < 0.02
    # history bookkeeping: best is the min of the history
    np.testing.assert_allclose(
        float(res.y_best), float(jnp.min(res.y_history)), rtol=1e-6
    )
    assert bool(jnp.all(res.state.mask))


def test_ask_tell_agrees_and_improves():
    """The ask/tell front-end drives an external objective: on Branin the
    final best must be within 0.7 of the global minimum (0.3979) after
    6 init + 20 suggestions, and every suggestion stays in the box."""

    def branin(x):
        a, b, c = 1.0, 5.1 / (4 * np.pi**2), 5 / np.pi
        r, s, t = 6.0, 10.0, 1 / (8 * np.pi)
        return (
            a * (x[1] - b * x[0] ** 2 + c * x[0] - r) ** 2
            + s * (1 - t) * np.cos(x[0])
            + s
        )

    lower = jnp.asarray([-5.0, 0.0])
    upper = jnp.asarray([10.0, 15.0])
    key = jax.random.PRNGKey(7)
    state, x_init = bo_init(lower, upper, capacity=26, key=key, num_init=6)
    for i in range(6):
        state = bo_observe(state, x_init[i], branin(np.asarray(x_init[i])))
    cfg = BayesOptConfig(num_candidates=256, hyper_steps=6)
    for i in range(20):
        state, x_next = bo_suggest(state, jax.random.PRNGKey(100 + i), cfg)
        xn = np.asarray(x_next)
        assert np.all(xn >= np.asarray(lower) - 1e-6)
        assert np.all(xn <= np.asarray(upper) + 1e-6)
        state = bo_observe(state, x_next, branin(xn))
    x_best, y_best = state.best(minimize=True)
    assert int(state.n) == 26
    assert float(y_best) < 0.3979 + 0.7


@pytest.mark.slow
def test_pinned_nugget_on_deterministic_objective():
    """Six-Hump Camel with the surrogate noise pinned (nugget=1e-6):
    36 evaluations must reach within 0.05 of the global optimum -1.0316
    — with a LEARNED nugget the same budget stalls around -0.84, so this
    guards the deterministic-objective mode end to end."""

    def camel(x):
        x1, x2 = x[0], x[1]
        return (
            (4.0 - 2.1 * x1**2 + x1**4 / 3.0) * x1**2
            + x1 * x2
            + (-4.0 + 4.0 * x2**2) * x2**2
        )

    res = bayes_optimize(
        camel,
        jnp.asarray([-2.0, -1.0]),
        jnp.asarray([2.0, 1.0]),
        jax.random.PRNGKey(0),
        num_steps=28,
        num_init=8,
        config=BayesOptConfig(nugget=1e-6),
    )
    assert float(res.y_best) < -1.0316 + 0.05


@pytest.mark.slow
def test_maximize_convention():
    """config.minimize=False maximizes: a concave bump's peak is found."""

    def f(x):
        return -jnp.sum(x**2) + 2.0

    res = bayes_optimize(
        f,
        jnp.asarray([-1.0]),
        jnp.asarray([1.0]),
        jax.random.PRNGKey(11),
        num_steps=10,
        num_init=6,
        config=BayesOptConfig(
            minimize=False, num_candidates=128, hyper_steps=4
        ),
    )
    assert float(res.y_best) > 1.95
    np.testing.assert_allclose(
        float(res.y_best), float(jnp.max(res.y_history)), rtol=1e-6
    )


@pytest.mark.slow
def test_acquisition_variants_run():
    def f(x):
        return jnp.sum(x**2)

    for acq in ("ucb", "thompson"):
        res = bayes_optimize(
            f,
            jnp.asarray([-1.0, -1.0]),
            jnp.asarray([1.0, 1.0]),
            jax.random.PRNGKey(5),
            num_steps=6,
            num_init=5,
            config=BayesOptConfig(
                acquisition=acq, num_candidates=96, hyper_steps=3,
            ),
        )
        assert np.isfinite(float(res.y_best))


def test_bo_init_validation():
    with pytest.raises(ValueError):
        bo_init(
            jnp.zeros(2), jnp.ones(2), capacity=4, key=jax.random.PRNGKey(0),
            num_init=6,
        )
    with pytest.raises(ValueError):
        bo_init(
            jnp.zeros(2), jnp.ones(2), capacity=8, key=jax.random.PRNGKey(0),
            num_init=1,
        )
