"""Multi-output coregionalized GP (ops/mogp.py + engines/mogp.py).

Oracles: (1) with B = I and equal noise the joint logML must equal the
SUM of independent single-output GP logMLs; (2) scipy MVN logpdf parity
for a random dense config incl. a missing-data mask; (3) the
cross-learning property: an output unobserved on half the domain is
predicted there from a correlated output (a single-output GP reverts to
the prior); (4) posterior moments match dense formulas; (5) end-to-end
engine fit with sentinel guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import multivariate_normal

from bayesianinference_tpu.core.numerics import is_log_zero
from bayesianinference_tpu.engines.laplace import laplace_posterior_fit
from bayesianinference_tpu.engines.mogp import (
    define_multi_output_gp,
    predict_from_multi_output_gp,
)
from bayesianinference_tpu.ops.gp_kernels import (
    covariance_matrix,
    gp_log_marginal_likelihood,
    gp_posterior_moments,
    se_kernel,
)
from bayesianinference_tpu.ops.mogp import (
    coregional_matrix,
    mogp_covariance,
    mogp_log_marginal_likelihood,
    mogp_posterior_moments,
)


def _data(n=12, t=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, size=(n, 1)), axis=0))
    y = rng.normal(size=(n, t))
    return x, y, rng


def test_identity_b_reduces_to_independent_gps():
    x, y, _ = _data(n=10, t=3)
    kern = se_kernel(1.5, 0.9)
    b = jnp.eye(3)
    noise = jnp.full((3,), 0.1)
    joint = float(
        mogp_log_marginal_likelihood(
            kern, b, x, jnp.asarray(y.T.reshape(-1)), noise, jitter=1e-10
        )
    )
    indep = sum(
        float(
            gp_log_marginal_likelihood(
                covariance_matrix(kern, x, 0.1 + 1e-10), jnp.asarray(y[:, t])
            )
        )
        for t in range(3)
    )
    np.testing.assert_allclose(joint, indep, rtol=1e-10)


def test_logml_matches_scipy_dense_and_masked():
    x, y, rng = _data(n=9, t=2, seed=1)
    kern = se_kernel(1.2, 0.7)
    b = coregional_matrix(jnp.asarray([1.0, 0.8]), jnp.asarray([0.2, 0.3]))
    noise = jnp.asarray([0.05, 0.15])
    cov = np.asarray(mogp_covariance(kern, b, x, noise, jitter=1e-8))
    y_flat = y.T.reshape(-1)
    ref = multivariate_normal(mean=np.zeros(18), cov=cov).logpdf(y_flat)
    got = float(
        mogp_log_marginal_likelihood(
            kern, b, x, jnp.asarray(y_flat), noise, jitter=1e-8
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-9)
    # masked: drop 5 random flat entries
    keep = np.sort(rng.choice(18, size=13, replace=False)).astype(np.int32)
    ref_m = multivariate_normal(
        mean=np.zeros(13), cov=cov[np.ix_(keep, keep)]
    ).logpdf(y_flat[keep])
    got_m = float(
        mogp_log_marginal_likelihood(
            kern, b, x, jnp.asarray(y_flat[keep]), noise,
            observed_idx=jnp.asarray(keep), jitter=1e-8,
        )
    )
    np.testing.assert_allclose(got_m, ref_m, rtol=1e-9)


def test_posterior_moments_match_dense_formulas():
    x, y, _ = _data(n=8, t=2, seed=2)
    kern = se_kernel(1.4, 0.8)
    b = coregional_matrix(jnp.asarray([[1.0], [0.7]]), jnp.asarray([0.1, 0.2]))
    noise = jnp.asarray([0.05, 0.05])
    xq = jnp.asarray([[-1.2], [0.4]])
    mean, std = mogp_posterior_moments(
        kern, b, x, jnp.asarray(y.T.reshape(-1)), xq, noise, jitter=1e-8
    )
    # dense reference
    cov = np.asarray(mogp_covariance(kern, b, x, noise, jitter=1e-8))
    kq = np.asarray(kern.matrix(x, xq))
    bn = np.asarray(b)
    cross = np.einsum("ts,ij->tisj", bn, kq).reshape(16, 4)
    prior = np.kron(np.diag(bn), np.asarray(kern.diag(xq)))
    sol = np.linalg.solve(cov, y.T.reshape(-1))
    mean_ref = (cross.T @ sol).reshape(2, 2).T
    var_ref = prior - np.einsum(
        "if,ij,jg->fg", cross, np.linalg.inv(cov), cross
    ).diagonal()
    np.testing.assert_allclose(np.asarray(mean), mean_ref, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(std) ** 2,
        var_ref.reshape(2, 2).T,
        atol=1e-9,
    )


def test_cross_output_transfer_fills_the_gap():
    """Output 2 = 0.9-correlated copy of output 1, observed only at
    x < 0; in x > 0 the MOGP predicts it from output 1 while a
    single-output GP reverts toward the prior mean."""
    rng = np.random.default_rng(3)
    n = 40
    x = np.sort(rng.uniform(-2, 2, size=(n, 1)), axis=0)
    f = np.sin(1.7 * x[:, 0])
    y1 = f + 0.05 * rng.normal(size=n)
    y2 = 0.9 * f + 0.05 * rng.normal(size=n)
    y = np.stack([y1, y2], axis=-1)
    observed = np.ones((n, 2), bool)
    observed[x[:, 0] > 0, 1] = False  # output 2 missing on the right

    kern = se_kernel(1.0, 0.8)
    b = coregional_matrix(
        jnp.asarray([[1.0], [0.9]]), jnp.asarray([0.01, 0.01])
    )
    flat_mask = observed.T.reshape(-1)
    idx = jnp.asarray(np.nonzero(flat_mask)[0].astype(np.int32))
    y_obs = jnp.asarray(y.T.reshape(-1)[np.asarray(flat_mask)])
    xq = jnp.asarray(x[x[:, 0] > 0])
    mean, std = mogp_posterior_moments(
        kern, b, x, y_obs, xq, jnp.asarray([0.05**2, 0.05**2]),
        observed_idx=idx,
    )
    truth = 0.9 * np.sin(1.7 * np.asarray(xq[:, 0]))
    err_mogp = float(np.sqrt(np.mean((np.asarray(mean[:, 1]) - truth) ** 2)))
    # single-output GP on output 2's observed half only
    m1, _ = gp_posterior_moments(
        kern, jnp.asarray(x[x[:, 0] <= 0]), jnp.asarray(y2[x[:, 0] <= 0]),
        xq, nugget=0.05**2,
    )
    err_single = float(np.sqrt(np.mean((np.asarray(m1) - truth) ** 2)))
    assert err_mogp < 0.15, err_mogp
    assert err_mogp < 0.5 * err_single, (err_mogp, err_single)


def test_engine_end_to_end_with_missing_data():
    rng = np.random.default_rng(4)
    n = 25
    x = np.sort(rng.uniform(-2, 2, size=(n, 1)), axis=0)
    f = np.sin(1.5 * x[:, 0])
    y = np.stack(
        [f + 0.1 * rng.normal(size=n), 0.7 * f + 0.1 * rng.normal(size=n)],
        axis=-1,
    )
    y[rng.choice(n, 5, replace=False), 1] = np.nan  # missing via NaN

    problem = define_multi_output_gp(
        x, y,
        lambda th: se_kernel(th[0] ** 2, th[1]),
        lambda th: coregional_matrix(th[2:4], jnp.asarray([0.01, 0.01])),
        parameters=[
            ("amp", 0.05, 5.0), ("ls", 0.1, 5.0),
            ("b1", -3.0, 3.0), ("b2", -3.0, 3.0), ("sig", 0.02, 2.0),
        ],
        noise_builder=lambda th: th[4] ** 2,
        prior_distribution=["scale", "scale", "location", "location",
                            "scale"],
        validate=False,
    )
    theta0 = jnp.asarray([1.0, 0.8, 1.0, 0.7, 0.1])
    assert np.isfinite(float(problem.log_likelihood(theta0)))
    assert bool(
        is_log_zero(
            problem.log_likelihood(theta0.at[0].set(jnp.nan))
        )
    )
    g = jax.grad(problem.log_likelihood)(theta0)
    assert np.all(np.isfinite(np.asarray(g)))
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    assert np.isfinite(float(fit.log_evidence))
    xq = np.linspace(-2, 2, 7)[:, None]
    mix = predict_from_multi_output_gp(fit.mean, problem, xq)
    mu = np.asarray(mix.mean()).reshape(2, 7).T
    assert mu.shape == (7, 2)
    # learned cross-correlation: output-2 predictions track 0.7 sin
    assert np.corrcoef(mu[:, 1], 0.7 * np.sin(1.5 * xq[:, 0]))[0, 1] > 0.9


def test_validation_errors():
    x = np.zeros((4, 1))
    with pytest.raises(ValueError, match="T >= 2"):
        define_multi_output_gp(
            x, np.zeros((4, 1)), lambda th: se_kernel(1.0, th[0]),
            lambda th: jnp.eye(1), parameters=[("ls", 0.1, 5.0)],
            validate=False,
        )
    with pytest.raises(ValueError, match="no observed"):
        define_multi_output_gp(
            x, np.full((4, 2), np.nan), lambda th: se_kernel(1.0, th[0]),
            lambda th: jnp.eye(2), parameters=[("ls", 0.1, 5.0)],
            validate=False,
        )
    with pytest.raises(ValueError, match="flagged observed"):
        define_multi_output_gp(
            x, np.full((4, 2), np.nan), lambda th: se_kernel(1.0, th[0]),
            lambda th: jnp.eye(2), parameters=[("ls", 0.1, 5.0)],
            observed=np.ones((4, 2), bool), validate=False,
        )


def test_kronecker_path_matches_dense():
    """The Saatci eigendecomposition logML must equal the dense path to
    near machine precision, value AND gradient."""
    from bayesianinference_tpu.ops.mogp import mogp_log_marginal_kronecker

    x, y, rng = _data(n=11, t=3, seed=7)
    kern = se_kernel(1.3, 0.8)
    a = jnp.asarray(rng.normal(size=(3, 2)))
    d = jnp.asarray([0.3, 0.2, 0.4])
    s2 = 0.07

    def dense(av):
        b = coregional_matrix(av, d)
        return mogp_log_marginal_likelihood(
            kern, b, x, jnp.asarray(y.T.reshape(-1)),
            jnp.full((3,), s2), jitter=1e-8,
        )

    def kron(av):
        b = coregional_matrix(av, d)
        return mogp_log_marginal_kronecker(
            kern, b, x, jnp.asarray(y), s2, jitter=1e-8
        )

    # the two paths place the 1e-8 jitter differently (joint diagonal
    # vs Kx, scaled through lamB), so agreement is at the jitter level
    np.testing.assert_allclose(float(kron(a)), float(dense(a)), rtol=1e-6)
    g_d = np.asarray(jax.grad(dense)(a))
    g_k = np.asarray(jax.grad(kron)(a))
    np.testing.assert_allclose(g_k, g_d, rtol=1e-4, atol=1e-7)
    # engine dispatch + validation
    problem = define_multi_output_gp(
        x, y, lambda th: se_kernel(th[0] ** 2, th[1]),
        lambda th: coregional_matrix(th[2:5].reshape(3, 1), d),
        parameters=[("amp", 0.05, 5.0), ("ls", 0.1, 5.0),
                    ("b1", -3.0, 3.0), ("b2", -3.0, 3.0),
                    ("b3", -3.0, 3.0)],
        noise_builder=lambda th: s2,
        method="kronecker",
        prior_distribution=["scale"] * 2 + ["location"] * 3,
        validate=False, jitter=1e-8,
    )
    problem_d = define_multi_output_gp(
        x, y, lambda th: se_kernel(th[0] ** 2, th[1]),
        lambda th: coregional_matrix(th[2:5].reshape(3, 1), d),
        parameters=[("amp", 0.05, 5.0), ("ls", 0.1, 5.0),
                    ("b1", -3.0, 3.0), ("b2", -3.0, 3.0),
                    ("b3", -3.0, 3.0)],
        noise_builder=lambda th: s2,
        prior_distribution=["scale"] * 2 + ["location"] * 3,
        validate=False, jitter=1e-8,
    )
    th0 = jnp.asarray([1.1, 0.8, 1.0, 0.5, -0.4])
    np.testing.assert_allclose(
        float(problem.log_likelihood(th0)),
        float(problem_d.log_likelihood(th0)),
        rtol=1e-6,
    )
    # sentinel on absurd theta
    assert bool(is_log_zero(problem.log_likelihood(th0.at[0].set(jnp.nan))))
    # kronecker + missing data refuses
    y_miss = y.copy()
    y_miss[0, 0] = np.nan
    with pytest.raises(ValueError, match="kronecker"):
        define_multi_output_gp(
            x, y_miss, lambda th: se_kernel(1.0, th[0]),
            lambda th: jnp.eye(3), parameters=[("ls", 0.1, 5.0)],
            method="kronecker", validate=False,
        )
