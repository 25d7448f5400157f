"""Student-t process (ops/t_process.py + engines/t_process.py).

Oracles: (1) the logML must match scipy's multivariate_t logpdf exactly;
(2) nu -> inf must recover the GP logML and predictive; (3) the
closed-form (K, y, nu) gradient must match finite differences; (4) the
predictive conditional must match a brute-force partitioned-MVT check
via scipy on the joint; (5) end-to-end: problem + engines + pointwise
StudentT predictive mixture, with the sentinel contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import multivariate_t

from bayesianinference_tpu.core.numerics import is_log_zero
from bayesianinference_tpu.engines.laplace import laplace_posterior_fit
from bayesianinference_tpu.engines.t_process import (
    define_t_process,
    predict_from_t_process,
)
from bayesianinference_tpu.ops.gp_kernels import (
    covariance_matrix,
    gp_log_marginal_likelihood,
    gp_posterior_moments,
    se_kernel,
)
from bayesianinference_tpu.ops.t_process import (
    tp_log_marginal_likelihood,
    tp_posterior_moments,
)


def _toy(n=12, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, size=(n, 1)), axis=0))
    k = covariance_matrix(se_kernel(2.0, 1.0), x, 0.05)
    y = jnp.asarray(
        np.linalg.cholesky(np.asarray(k)) @ rng.standard_t(df=4, size=n)
    )
    return x, y, k


def test_logml_matches_scipy_multivariate_t():
    x, y, k = _toy()
    for nu in (1.5, 4.0, 25.0):
        ours = float(tp_log_marginal_likelihood(k, y, nu))
        ref = multivariate_t(
            loc=np.zeros(y.shape[0]), shape=np.asarray(k), df=nu
        ).logpdf(np.asarray(y))
        np.testing.assert_allclose(ours, ref, rtol=1e-12)
    # mean argument shifts y
    m = jnp.full(y.shape, 0.7)
    ours = float(tp_log_marginal_likelihood(k, y, 4.0, mean=m))
    ref = multivariate_t(
        loc=np.full(y.shape[0], 0.7), shape=np.asarray(k), df=4.0
    ).logpdf(np.asarray(y))
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_large_nu_recovers_gp():
    x, y, k = _toy(seed=1)
    tp = float(tp_log_marginal_likelihood(k, y, 1e7))
    gp = float(gp_log_marginal_likelihood(k, y))
    np.testing.assert_allclose(tp, gp, rtol=1e-5)
    kern = se_kernel(2.0, 1.0)
    xq = jnp.asarray([[-2.0], [0.3], [2.5]])
    m_tp, s_tp, df = tp_posterior_moments(kern, x, y, xq, 1e7, nugget=0.05)
    m_gp, s_gp = gp_posterior_moments(kern, x, y, xq, nugget=0.05)
    np.testing.assert_allclose(np.asarray(m_tp), np.asarray(m_gp), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_tp), np.asarray(s_gp), rtol=1e-4)
    assert float(df) == pytest.approx(1e7 + y.shape[0])


def test_gradient_matches_finite_differences():
    x, y, _ = _toy(seed=2)

    def logml(theta):
        k = covariance_matrix(
            se_kernel(jnp.exp(theta[0]), jnp.exp(theta[1])), x, 0.05
        )
        return tp_log_marginal_likelihood(k, y, jnp.exp(theta[2]))

    theta0 = jnp.asarray([0.4, -0.3, 1.2])  # nu = e^1.2 ~ 3.3
    g = jax.grad(logml)(theta0)
    eps = 1e-6
    for i in range(3):
        e = jnp.zeros(3).at[i].set(eps)
        fd = (float(logml(theta0 + e)) - float(logml(theta0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=2e-5, atol=1e-9)
    # dy gradient too
    k = covariance_matrix(se_kernel(2.0, 1.0), x, 0.05)
    gy = jax.grad(lambda yy: tp_log_marginal_likelihood(k, yy, 4.0))(y)
    for i in (0, 5):
        e = jnp.zeros_like(y).at[i].set(eps)
        fd = (
            float(tp_log_marginal_likelihood(k, y + e, 4.0))
            - float(tp_log_marginal_likelihood(k, y - e, 4.0))
        ) / (2 * eps)
        np.testing.assert_allclose(float(gy[i]), fd, rtol=1e-5, atol=1e-9)


def test_predictive_conditional_consistency():
    """The TP conditional must make joint = marginal x conditional hold
    for the MVT density at an arbitrary query value."""
    nu = 4.0
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, size=(8, 1)), axis=0))
    xq = jnp.asarray([[0.55]])
    kern = se_kernel(1.7, 0.9)
    x_all = jnp.concatenate([x, xq], axis=0)
    k_all = covariance_matrix(kern, x_all, 0.05)
    y = jnp.asarray(np.linalg.cholesky(np.asarray(k_all))[:8, :8] @
                    rng.normal(size=8))
    m, s, df = tp_posterior_moments(kern, x, y, xq, nu, nugget=0.05)
    # scalar StudentT conditional density at a probe value
    from scipy.stats import t as student_t

    y_star = 0.8
    cond = student_t(df=float(df), loc=float(m[0]), scale=float(s[0])).logpdf(
        y_star
    )
    joint = multivariate_t(
        loc=np.zeros(9), shape=np.asarray(k_all), df=nu
    ).logpdf(np.concatenate([np.asarray(y), [y_star]]))
    marg = multivariate_t(
        loc=np.zeros(8), shape=np.asarray(k_all)[:8, :8], df=nu
    ).logpdf(np.asarray(y))
    np.testing.assert_allclose(cond, joint - marg, rtol=1e-10)


def test_end_to_end_problem_and_prediction():
    rng = np.random.default_rng(4)
    n = 30
    x = np.sort(rng.uniform(-3, 3, size=(n, 1)), axis=0)
    y = np.sin(1.3 * x[:, 0]) + 0.1 * rng.standard_t(df=3, size=n)
    problem = define_t_process(
        x,
        y,
        lambda th: se_kernel(th[0] ** 2, th[1]),
        parameters=[("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
        nu=3.0,
        nugget_builder=lambda th: 0.02,
        prior_distribution=["scale", "scale"],
        validate=False,
    )
    # sentinel on absurd hyperparameters
    assert bool(
        is_log_zero(problem.log_likelihood(jnp.asarray([jnp.nan, 1.0])))
    )
    # jit + vmap hot path
    thetas = jnp.asarray([[1.5, 1.0], [0.7, 0.5]])
    vals = jax.jit(jax.vmap(problem.log_likelihood))(thetas)
    assert bool(jnp.all(jnp.isfinite(vals)))
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    xq = np.linspace(-3, 3, 25)[:, None]
    pred = predict_from_t_process(fit.mean, problem, xq)
    mu = np.asarray(pred.mean())
    assert mu.shape == (25,)
    assert np.corrcoef(mu, np.sin(1.3 * xq[:, 0]))[0, 1] > 0.95
    # quantiles available (StudentT mixture)
    q = np.asarray(pred.quantile(0.95))
    assert q.shape == (25,) and np.all(q > mu)
    # integer query -> coordinate grid; array of draws path
    pred2 = predict_from_t_process(
        fit.mean[None, :].repeat(3, axis=0), problem, 11
    )
    assert np.asarray(pred2.mean()).shape == (11,)


def test_variance_inflation_tracks_surprise():
    """The TP predictive scale carries the global surprise factor
    (nu + beta)/(nu + n): surprising data (beta >> n) inflates the GP
    width, well-fit data (beta << n) shrinks it — the Shah et al.
    adaptive-uncertainty property the GP cannot express."""
    nu = 3.0
    rng = np.random.default_rng(7)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, size=(12, 1)), axis=0))
    kern = se_kernel(2.0, 1.0)
    k = covariance_matrix(kern, x, 0.05)
    xq = jnp.asarray([[0.3], [1.1]])
    l = np.linalg.cholesky(np.asarray(k))
    z = rng.normal(size=12)
    _, s_gp = gp_posterior_moments(kern, x, jnp.asarray(l @ z), xq, nugget=0.05)
    for scale, expect_wider in [(4.0, True), (0.1, False)]:
        y = jnp.asarray(l @ (scale * z))
        beta = float(z @ z) * scale**2
        _, s_tp, _ = tp_posterior_moments(kern, x, y, xq, nu, nugget=0.05)
        # the Gaussian conditional width is data-independent; rescale the
        # GP to the same y (its width is identical for any y)
        factor = np.sqrt((nu + beta) / (nu + 12))
        np.testing.assert_allclose(
            np.asarray(s_tp), factor * np.asarray(s_gp), rtol=1e-10
        )
        assert (np.all(np.asarray(s_tp) > np.asarray(s_gp))) == expect_wider


def test_inferred_nu_end_to_end():
    rng = np.random.default_rng(6)
    n = 25
    x = np.sort(rng.uniform(-2, 2, size=(n, 1)), axis=0)
    y = np.sin(1.5 * x[:, 0]) + 0.15 * rng.standard_t(df=3, size=n)
    problem = define_t_process(
        x,
        y,
        lambda th: se_kernel(th[0] ** 2, th[1]),
        parameters=[
            ("amp", 0.05, 10.0),
            ("ls", 0.1, 5.0),
            ("nu", 1.0, 50.0),
        ],
        nu=lambda th: th[2],
        nugget_builder=lambda th: 0.02,
        prior_distribution=["scale", "scale", "location"],
        validate=False,
    )
    g = jax.grad(problem.log_likelihood)(jnp.asarray([1.5, 0.8, 4.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    # nu <= 0 through the callable hits the sentinel, not NaN
    bad = problem.log_likelihood(jnp.asarray([1.5, 0.8, -1.0]))
    assert bool(is_log_zero(bad))


def test_validation_errors():
    with pytest.raises(ValueError, match="kernel"):
        define_t_process(
            np.zeros((3, 1)), np.zeros(3), None,
            parameters=[("a", 0.0, 1.0)], validate=False,
        )
    with pytest.raises(ValueError, match="nu must be positive"):
        define_t_process(
            np.zeros((3, 1)), np.zeros(3),
            lambda th: se_kernel(1.0, th[0]),
            parameters=[("ls", 0.1, 5.0)], nu=-2.0, validate=False,
        )
