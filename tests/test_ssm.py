"""State-space models (ops/kalman.py + engines/ssm.py).

Oracles: an LGSSM's y_{1:T} is jointly Gaussian with moments computable
densely for small T — the filter log-likelihood (sequential AND
parallel, masked and unmasked), RTS smoother marginals, and h-step
forecasts are pinned against exact dense-Gaussian conditioning at
~1e-10.  End-to-end: Laplace + NS recover local-level variances and
agree on the evidence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import multivariate_normal

from bayesianinference_tpu.core.numerics import is_log_zero
from bayesianinference_tpu.engines import (
    define_state_space_model,
    forecast_observations,
    laplace_posterior_fit,
    level_component,
    nested_sampling,
    seasonal_component,
    ar_component,
    smoothed_states,
    structural_lgssm,
    trend_component,
)
from bayesianinference_tpu.ops.kalman import (
    LGSSM,
    kalman_filter,
    kalman_forecast,
    kalman_log_likelihood,
    kalman_sample,
    kalman_smoother,
)


def _dense_moments(model, t_total):
    """Exact joint mean/cov of y_{1:T} by propagating the state joint."""
    f = np.asarray(model.transition)
    q = np.asarray(model.transition_noise)
    h = np.asarray(model.observation)
    r = np.asarray(model.observation_noise)
    c, d = (np.asarray(x) for x in model.offsets())
    ds = f.shape[0]
    mux = np.zeros((t_total, ds))
    mux[0] = np.asarray(model.initial_mean)
    for t in range(1, t_total):
        mux[t] = f @ mux[t - 1] + c
    sx = np.zeros((t_total, ds, t_total, ds))
    sx[0, :, 0, :] = np.asarray(model.initial_cov)
    for t in range(1, t_total):
        for s in range(t):
            sx[t, :, s, :] = f @ sx[t - 1, :, s, :]
            sx[s, :, t, :] = sx[t, :, s, :].T
        sx[t, :, t, :] = f @ sx[t - 1, :, t - 1, :] @ f.T + q
    hb = np.kron(np.eye(t_total), h)
    muy = (mux @ h.T + d).reshape(-1)
    sxf = sx.reshape(t_total * ds, t_total * ds)
    sy = hb @ sxf @ hb.T + np.kron(np.eye(t_total), r)
    return mux, sxf, muy, sy, hb


@pytest.fixture(scope="module")
def random_model():
    rng = np.random.default_rng(0)
    ds, do = 3, 2
    f = jnp.asarray(0.6 * np.eye(ds) + 0.1 * rng.normal(size=(ds, ds)))
    qh = rng.normal(size=(ds, ds))
    q = jnp.asarray(qh @ qh.T / ds + 0.3 * np.eye(ds))
    h = jnp.asarray(rng.normal(size=(do, ds)))
    rh = rng.normal(size=(do, do))
    r = jnp.asarray(rh @ rh.T / do + 0.2 * np.eye(do))
    m0 = jnp.asarray(rng.normal(size=ds))
    p0h = rng.normal(size=(ds, ds))
    p0 = jnp.asarray(p0h @ p0h.T / ds + 0.5 * np.eye(ds))
    c = jnp.asarray(0.1 * rng.normal(size=ds))
    d = jnp.asarray(0.2 * rng.normal(size=do))
    model = LGSSM(f, q, h, r, m0, p0, c, d)
    _, y = kalman_sample(jax.random.PRNGKey(1), model, 12)
    return model, y


def test_loglik_matches_dense_gaussian(random_model):
    model, y = random_model
    t = y.shape[0]
    _, _, muy, sy, _ = _dense_moments(model, t)
    ll_dense = multivariate_normal(mean=muy, cov=sy).logpdf(
        np.asarray(y).reshape(-1)
    )
    for method in ("sequential", "parallel"):
        ll = float(kalman_log_likelihood(model, y, method=method))
        np.testing.assert_allclose(ll, ll_dense, rtol=1e-10)


def test_parallel_filter_equals_sequential(random_model):
    model, y = random_model
    fs = kalman_filter(model, y)
    fp = kalman_filter(model, y, method="parallel")
    np.testing.assert_allclose(
        np.asarray(fp.filtered_means), np.asarray(fs.filtered_means),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(fp.filtered_covs), np.asarray(fs.filtered_covs),
        atol=1e-10,
    )


def test_masked_loglik_marginalizes_missing(random_model):
    model, y = random_model
    t = y.shape[0]
    do = model.obs_dim
    mask = np.ones(t, bool)
    mask[3] = mask[7] = False
    keep = np.repeat(mask, do)
    _, _, muy, sy, _ = _dense_moments(model, t)
    yf = np.asarray(y).reshape(-1)
    ll_dense = multivariate_normal(
        mean=muy[keep], cov=sy[np.ix_(keep, keep)]
    ).logpdf(yf[keep])
    for method in ("sequential", "parallel"):
        ll = float(
            kalman_log_likelihood(
                model, y, mask=jnp.asarray(mask), method=method
            )
        )
        np.testing.assert_allclose(ll, ll_dense, rtol=1e-10)


def test_smoother_matches_dense_conditioning(random_model):
    model, y = random_model
    t = y.shape[0]
    ds = model.state_dim
    mux, sxf, muy, sy, hb = _dense_moments(model, t)
    yf = np.asarray(y).reshape(-1)
    sxy = sxf @ hb.T
    cond_mean = mux.reshape(-1) + sxy @ np.linalg.solve(sy, yf - muy)
    cond_cov = sxf - sxy @ np.linalg.solve(sy, sxy.T)
    cc = cond_cov.reshape(t, ds, t, ds)
    marg = np.stack([cc[i, :, i, :] for i in range(t)])
    sm = kalman_smoother(model, y)
    np.testing.assert_allclose(
        np.asarray(sm.means).reshape(-1), cond_mean, atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(sm.covs), marg, atol=1e-9)


def test_forecast_matches_dense_conditioning(random_model):
    model, y = random_model
    t, steps = y.shape[0], 4
    do = model.obs_dim
    _, _, muy2, sy2, _ = _dense_moments(model, t + steps)
    yf = np.asarray(y).reshape(-1)
    past = np.arange((t + steps) * do) < t * do
    fmean = muy2[~past] + sy2[np.ix_(~past, past)] @ np.linalg.solve(
        sy2[np.ix_(past, past)], yf - muy2[past]
    )
    fcov = sy2[np.ix_(~past, ~past)] - sy2[
        np.ix_(~past, past)
    ] @ np.linalg.solve(sy2[np.ix_(past, past)], sy2[np.ix_(past, ~past)])
    fr = kalman_filter(model, y)
    fm, fv = kalman_forecast(model, fr, steps)
    np.testing.assert_allclose(
        np.asarray(fm).reshape(-1), fmean, atol=1e-9
    )
    fcd = fcov.reshape(steps, do, steps, do)
    marg = np.stack([fcd[i, :, i, :] for i in range(steps)])
    np.testing.assert_allclose(np.asarray(fv), marg, atol=1e-9)


def test_simulation_smoother_joint_posterior(random_model):
    """Draw mean hits E[x|y] exactly; draw covariance (INCLUDING the
    cross-time blocks the RTS marginals cannot give) matches dense
    conditioning to MC error.  The mean-correction construction makes
    draws - m_smooth = x* - E[x|y*], an exact N(0, cond_cov) sample,
    so only the covariance check is statistical."""
    from bayesianinference_tpu.ops.kalman import simulation_smoother

    model, y = random_model
    t = y.shape[0]
    ds = model.state_dim
    mux, sxf, muy, sy, hb = _dense_moments(model, t)
    yf = np.asarray(y).reshape(-1)
    sxy = sxf @ hb.T
    cond_mean = mux.reshape(-1) + sxy @ np.linalg.solve(sy, yf - muy)
    cond_cov = sxf - sxy @ np.linalg.solve(sy, sxy.T)

    n_draws = 4096
    draws = np.asarray(
        simulation_smoother(jax.random.PRNGKey(3), model, y, n_draws)
    ).reshape(n_draws, t * ds)
    sm_mean = np.asarray(kalman_smoother(model, y).means).reshape(-1)

    # exact: every draw's deterministic part is m_smooth
    np.testing.assert_allclose(draws.mean(0), sm_mean, atol=0.2)
    np.testing.assert_allclose(sm_mean, cond_mean, atol=1e-9)
    # statistical: full joint covariance, cross-time terms included
    emp = np.cov(draws.T)
    scale = np.sqrt(np.outer(np.diag(cond_cov), np.diag(cond_cov)))
    np.testing.assert_allclose(emp / scale, cond_cov / scale, atol=0.12)


def test_simulation_smoother_masked_consistency(random_model):
    """With missing steps the draw mean must match the MASKED smoother
    (same conditioning set for data and simulated pseudo-data)."""
    from bayesianinference_tpu.ops.kalman import simulation_smoother

    model, y = random_model
    t = y.shape[0]
    mask = np.ones(t, bool)
    mask[2] = mask[8] = False
    mask = jnp.asarray(mask)
    draws = np.asarray(
        simulation_smoother(jax.random.PRNGKey(5), model, y, 4096, mask=mask)
    )
    sm = np.asarray(kalman_smoother(model, y, mask=mask).means)
    np.testing.assert_allclose(draws.mean(0), sm, atol=0.25)
    # masked times carry MORE path uncertainty than a fully observed run
    full_var = np.asarray(
        simulation_smoother(jax.random.PRNGKey(5), model, y, 4096)
    ).var(0)
    assert draws.var(0)[2].mean() > full_var[2].mean()


def test_structural_components_shapes():
    m = structural_lgssm(
        [
            trend_component(0.1, 0.01),
            seasonal_component(4, 0.05),
            ar_component(jnp.asarray([0.5, -0.2]), 0.3),
        ],
        obs_var=0.2,
    )
    assert m.state_dim == 2 + 3 + 2
    assert m.obs_dim == 1
    # observation reads level + seasonal + AR
    np.testing.assert_array_equal(
        np.asarray(m.observation[0]), [1, 0, 1, 0, 0, 1, 0]
    )
    ll = kalman_log_likelihood(
        m, jnp.asarray(np.random.default_rng(2).normal(size=30))
    )
    assert np.isfinite(float(ll))


@pytest.fixture(scope="module")
def local_level_problem():
    true_level_var, true_obs_var = 0.3, 0.8
    model = structural_lgssm(
        [level_component(true_level_var)], obs_var=true_obs_var
    )
    _, y = kalman_sample(jax.random.PRNGKey(7), model, 400)
    problem = define_state_space_model(
        y[:, 0],
        lambda th: structural_lgssm(
            [level_component(th[0])], obs_var=th[1]
        ),
        parameters=[("level_var", 1e-4, 10.0), ("obs_var", 1e-4, 10.0)],
        prior_distribution=["scale", "scale"],
        validate=False,
    )
    return problem, (true_level_var, true_obs_var)


def test_laplace_recovers_local_level_variances(local_level_problem):
    problem, (lv, ov) = local_level_problem
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    got_lv, got_ov = np.asarray(fit.mean)
    assert 0.3 * lv < got_lv < 3.0 * lv, fit.mean
    assert 0.5 * ov < got_ov < 2.0 * ov, fit.mean
    sm = smoothed_states(problem, fit.mean)
    assert sm.means.shape == (400, 1)
    assert bool(jnp.all(sm.covs[:, 0, 0] > 0))
    fm, fv = forecast_observations(problem, fit.mean, 5)
    assert fm.shape == (5, 1) and fv.shape == (5, 1, 1)
    # forecast variance grows with horizon (random-walk level)
    assert float(fv[-1, 0, 0]) > float(fv[0, 0, 0])


@pytest.mark.slow
def test_sample_state_paths_shapes_and_spread(local_level_problem):
    """Engine-level joint path draws: shape contract, finiteness, and
    the paths bracket the smoothed mean at matching uncertainty."""
    from bayesianinference_tpu.engines import sample_state_paths

    problem, _ = local_level_problem
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    thetas = fit.posterior_distribution.sample(jax.random.PRNGKey(1), (4,))
    paths = sample_state_paths(
        problem, jax.random.PRNGKey(2), thetas, paths_per_theta=8
    )
    assert paths.shape == (4, 8, 400, 1)
    assert np.isfinite(np.asarray(paths)).all()
    # single theta vector -> S=1 batch
    one = sample_state_paths(
        problem, jax.random.PRNGKey(3), fit.mean, paths_per_theta=64
    )
    assert one.shape == (1, 64, 400, 1)
    # draws scatter around the RTS mean with comparable marginal scale
    sm = smoothed_states(problem, fit.mean)
    mean_err = np.abs(
        np.asarray(one[0]).mean(0) - np.asarray(sm.means)
    ).mean()
    typ_sd = float(np.sqrt(np.asarray(sm.covs)).mean())
    assert mean_err < 0.6 * typ_sd


def test_ns_evidence_agrees_with_laplace(local_level_problem):
    problem, _ = local_level_problem
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    res = nested_sampling(
        problem,
        jax.random.PRNGKey(1),
        sample_pool_size=200,
        monte_carlo_steps=60,
        max_iterations=2000,
    )
    lz = res.log_evidence
    assert (
        abs(float(lz.mean) - float(fit.log_evidence))
        < 4 * float(lz.standard_error) + 0.5
    )


def test_guarded_sentinel_on_bad_hyperparameters(local_level_problem):
    problem, _ = local_level_problem
    # negative variance is outside the box -> sentinel via the guard
    val = problem.log_likelihood(jnp.asarray([-1.0, 0.5]))
    assert bool(is_log_zero(val))


def test_loglik_traceable_jit_vmap_grad(local_level_problem):
    problem, _ = local_level_problem
    thetas = jnp.asarray([[0.3, 0.8], [0.1, 1.2], [1.0, 0.5]])
    vals = jax.jit(jax.vmap(problem.log_likelihood))(thetas)
    assert vals.shape == (3,) and bool(jnp.all(jnp.isfinite(vals)))
    g = jax.grad(problem.log_likelihood)(jnp.asarray([0.3, 0.8]))
    assert bool(jnp.all(jnp.isfinite(g)))
