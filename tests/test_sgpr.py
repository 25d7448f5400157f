"""Sparse GP (collapsed Titsias bound, ops/sgpr.py + engines/sparse_gp.py).

Oracles: at z = x the bound equals the dense Cholesky logML exactly and
the sparse predictive equals the dense predictive moments; for m < n the
bound is a LOWER bound; the mesh-sharded bound (non-multiple-of-8 row
count, exercising the padding mask) matches the single-device value to
f64 roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.core.numerics import is_log_zero
from bayesianinference_tpu.engines import (
    define_sparse_gaussian_process,
    laplace_posterior_fit,
    optimize_sparse_gp,
    predict_from_gaussian_process,
    select_inducing_points,
)
from bayesianinference_tpu.ops import sgpr_bound, sgpr_predict, sgpr_state
from bayesianinference_tpu.ops.gp_kernels import (
    covariance_matrix,
    gp_log_marginal_likelihood,
    gp_posterior_moments,
    se_kernel,
)
from bayesianinference_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def gp_data():
    rng = np.random.default_rng(3)
    n, dim = 150, 2
    x = jnp.asarray(rng.normal(size=(n, dim)))
    k = se_kernel(variance=1.3, lengthscale=0.8)
    sig2 = 0.05
    kmat = covariance_matrix(k, x, sig2)
    y = jnp.asarray(np.linalg.cholesky(np.asarray(kmat)) @ rng.normal(size=n))
    return x, y, k, sig2, kmat


def test_bound_exact_at_full_inducing(gp_data):
    x, y, k, sig2, kmat = gp_data
    exact = float(gp_log_marginal_likelihood(kmat, y))
    got = float(sgpr_bound(k, x, y, x, sig2, jitter=1e-12))
    np.testing.assert_allclose(got, exact, rtol=1e-9)


def test_bound_is_lower_bound_and_monotone(gp_data):
    """More inducing points can only tighten the collapsed bound
    (Titsias 2009, monotonicity in the inducing set)."""
    x, y, k, sig2, kmat = gp_data
    exact = float(gp_log_marginal_likelihood(kmat, y))
    prev = -np.inf
    for m in (10, 40, 150):
        z = select_inducing_points(x, m)
        b = float(sgpr_bound(k, x, y, z, sig2, jitter=1e-12))
        assert b <= exact + 1e-8
        assert b >= prev - 1e-8, (m, b, prev)
        prev = b
    # near-saturated well before m = n on smooth SE data
    assert abs(prev - exact) < 1e-6 * abs(exact)


def test_predictive_matches_dense_at_full_inducing(gp_data):
    x, y, k, sig2, _ = gp_data
    rng = np.random.default_rng(5)
    xq = jnp.asarray(rng.normal(size=(9, x.shape[1])))
    st = sgpr_state(k, x, y, x, sig2, jitter=1e-12)
    m_s, s_s = sgpr_predict(k, st, x, xq, noise_variance=sig2)
    m_d, s_d = gp_posterior_moments(k, x, y, xq, nugget=sig2)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_d), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_d), atol=1e-7)


def test_sentinel_on_bad_hyperparameters(gp_data):
    x, y, k, _ = gp_data[:4]
    assert bool(is_log_zero(sgpr_bound(k, x, y, x[::4], -0.5)))
    # absurd lengthscale makes K_mm numerically rank-1 => chol fails
    k_bad = se_kernel(variance=1.0, lengthscale=1e12)
    assert bool(is_log_zero(sgpr_bound(k_bad, x, y, x[::4], 0.05, jitter=0.0)))


def test_select_inducing_points_properties(gp_data):
    x = gp_data[0]
    z = select_inducing_points(x, 20)
    assert z.shape == (20, x.shape[1])
    # farthest-point selection never repeats a point
    assert np.unique(np.asarray(z), axis=0).shape[0] == 20
    zr = select_inducing_points(x, 20, method="random", key=jax.random.PRNGKey(1))
    assert np.unique(np.asarray(zr), axis=0).shape[0] == 20
    # m >= n returns the data itself
    assert select_inducing_points(x, x.shape[0] + 5).shape == x.shape
    with pytest.raises(ValueError, match="unknown inducing selection"):
        select_inducing_points(x, 5, method="kmeanz")


def _sgpr_problem(x, y, mesh=None):
    return define_sparse_gaussian_process(
        x,
        y,
        lambda th: se_kernel(variance=th[0], lengthscale=th[1]),
        parameters=[("v", 0.05, 20.0), ("l", 0.05, 20.0), ("s2", 1e-3, 2.0)],
        nugget_builder=lambda th: th[2],
        inducing=32,
        prior_distribution=["scale", "scale", "scale"],
        validate=False,
        jitter=1e-10,
    )


def test_problem_laplace_fit_recovers_hyperparameters(gp_data):
    """End-to-end: SGPR problem -> Laplace fit; the MAP noise variance
    lands near the generating sigma^2 = 0.05 and the predictive through
    the shared predict_from_gaussian_process front-end is calibrated."""
    x, y, k, sig2, _ = gp_data
    problem = _sgpr_problem(x, y)
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    v, l, s2 = np.asarray(fit.mean)
    assert 0.02 < s2 < 0.15, fit.mean
    assert 0.3 < l < 2.5, fit.mean

    thetas = fit.posterior_distribution.sample(jax.random.PRNGKey(7), (64,))
    mix = predict_from_gaussian_process(thetas, problem, x[:40])
    mean = np.asarray(mix.mean())
    resid = mean - np.asarray(y[:40])
    sd = np.sqrt(np.asarray(mix.variance()))
    # 95%-ish coverage of the training points by the predictive
    assert np.mean(np.abs(resid) < 2.5 * sd) > 0.85


def test_scalar_noise_enforced(gp_data):
    x, y = gp_data[:2]
    problem = define_sparse_gaussian_process(
        x,
        y,
        lambda th: se_kernel(lengthscale=th[0]),
        parameters=[("l", 0.05, 20.0)],
        nugget_builder=lambda th: jnp.full((3,), 0.1),  # vector: invalid
        inducing=16,
        prior_distribution=["scale"],
        validate=False,
    )
    with pytest.raises(ValueError, match="SCALAR noise variance"):
        problem.log_likelihood(jnp.asarray([1.0]))


def test_optimize_sparse_gp_tightens_bound(gp_data):
    """Adam over (hypers, z) from m = 12 random-ish inducing points: the
    bound improves monotonically-ish, ends ABOVE the fixed-z bound at the
    same hyperparameters (moving z can only help), stays below the dense
    logML, and the returned problem carries the optimized z."""
    x, y, k, sig2, kmat = gp_data
    problem = define_sparse_gaussian_process(
        x,
        y,
        lambda th: se_kernel(variance=th[0], lengthscale=th[1]),
        parameters=[("v", 0.05, 20.0), ("l", 0.05, 20.0), ("s2", 1e-3, 2.0)],
        nugget_builder=lambda th: th[2],
        inducing=12,
        prior_distribution=["scale", "scale", "scale"],
        validate=False,
        jitter=1e-10,
    )
    opt = optimize_sparse_gp(problem, steps=250, learning_rate=0.03)
    theta = jnp.asarray(opt.theta)
    # lower-bound property holds vs the dense logML at the SAME theta
    # (comparing against the generating theta would be wrong: the ML-II
    # optimum may exceed the generating hyperparameters' logML)
    kmat_opt = covariance_matrix(
        se_kernel(variance=theta[0], lengthscale=theta[1]), x, theta[2]
    )
    exact_at_theta = float(gp_log_marginal_likelihood(kmat_opt, y))
    fixed_z_bound = float(problem.log_likelihood(theta))
    final = float(opt.bound)
    assert final <= exact_at_theta + 1e-6, (final, exact_at_theta)
    assert final > fixed_z_bound + 0.5, (final, fixed_z_bound)
    assert final > float(opt.bound_trace[0]) + 1.0
    # the returned problem evaluates the bound at the optimized z
    np.testing.assert_allclose(
        float(opt.problem.log_likelihood(theta)), final, rtol=1e-6
    )
    assert opt.z.shape == (12, x.shape[1])
    # hyperparameters land near the generating values
    v, l, s2 = np.asarray(theta)
    assert 0.01 < s2 < 0.3 and 0.2 < l < 3.0, theta


def test_optimize_fixed_inducing(gp_data):
    """optimize_inducing=False leaves z untouched and still improves the
    hyperparameters."""
    x, y = gp_data[:2]
    problem = define_sparse_gaussian_process(
        x,
        y,
        lambda th: se_kernel(variance=th[0], lengthscale=th[1]),
        parameters=[("v", 0.05, 20.0), ("l", 0.05, 20.0), ("s2", 1e-3, 2.0)],
        nugget_builder=lambda th: th[2],
        inducing=16,
        prior_distribution=["scale", "scale", "scale"],
        validate=False,
    )
    z0 = (problem.metadata["gaussian_process"]).z
    opt = optimize_sparse_gp(
        problem, steps=120, learning_rate=0.05, optimize_inducing=False
    )
    np.testing.assert_array_equal(np.asarray(opt.z), np.asarray(z0))
    assert float(opt.bound) > float(opt.bound_trace[0])


def test_sharded_bound_matches_single_device(gp_data):
    """Data axis over the 8-device CPU mesh; n = 150 is not a multiple
    of 8, so the padding mask is exercised.  Agreement to f64 roundoff,
    and gradients flow through the psums (Laplace/HMC need them)."""
    x, y, k, sig2, _ = gp_data
    mesh = make_mesh(("data",))
    single = _sgpr_problem(x, y)
    sharded = define_sparse_gaussian_process(
        x,
        y,
        lambda th: se_kernel(variance=th[0], lengthscale=th[1]),
        parameters=[("v", 0.05, 20.0), ("l", 0.05, 20.0), ("s2", 1e-3, 2.0)],
        nugget_builder=lambda th: th[2],
        inducing=32,
        prior_distribution=["scale", "scale", "scale"],
        validate=False,
        jitter=1e-10,
        mesh=mesh,
    )
    theta = jnp.asarray([1.3, 0.8, 0.05])
    a = float(single.log_likelihood(theta))
    b = float(jax.jit(sharded.log_likelihood)(theta))
    np.testing.assert_allclose(b, a, rtol=1e-10)
    g1 = jax.grad(single.log_likelihood)(theta)
    g2 = jax.jit(jax.grad(sharded.log_likelihood))(theta)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-8)

    # optimize_sparse_gp on a sharded problem returns a problem whose
    # likelihood is STILL data-sharded and consistent with the final bound
    opt = optimize_sparse_gp(sharded, steps=25, learning_rate=0.05)
    got = float(jax.jit(opt.problem.log_likelihood)(jnp.asarray(opt.theta)))
    np.testing.assert_allclose(got, float(opt.bound), rtol=1e-8)
