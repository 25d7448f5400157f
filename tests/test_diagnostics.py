"""Convergence diagnostics (results/diagnostics.py) against known chains.

Oracles: i.i.d. chains have ESS ~ n and R-hat ~ 1; an AR(1) chain with
coefficient phi has integrated autocorrelation time (1 + phi) / (1 - phi)
and lag-k autocorrelation phi^k; Kish ESS has closed forms for uniform
and degenerate weights.
"""

import numpy as np
import pytest

from bayesianinference_tpu.results import (
    autocorrelation,
    effective_sample_size,
    gelman_rubin,
    weighted_effective_sample_size,
)


def _ar1(rng, phi, n, m=1):
    x = np.zeros((m, n))
    innov = rng.normal(size=(m, n)) * np.sqrt(1 - phi**2)
    for t in range(1, n):
        x[:, t] = phi * x[:, t - 1] + innov[:, t]
    return x


def test_autocorrelation_iid_and_ar1(rng):
    iid = rng.normal(size=4096)
    rho = autocorrelation(iid, max_lag=20)
    assert rho[0] == 1.0
    assert np.all(np.abs(rho[1:]) < 0.1)

    phi = 0.8
    chain = _ar1(rng, phi, 2**15)[0]
    rho = autocorrelation(chain, max_lag=5)
    np.testing.assert_allclose(rho[1:], phi ** np.arange(1, 6), atol=0.05)


def test_autocorrelation_constant_chain():
    rho = autocorrelation(np.ones(100), max_lag=3)
    np.testing.assert_array_equal(rho, [1.0, 0.0, 0.0, 0.0])


def test_ess_iid_near_n(rng):
    chains = rng.normal(size=(4, 4096))
    ess = effective_sample_size(chains)
    assert 0.75 * 4 * 4096 < ess < 1.35 * 4 * 4096


def test_ess_ar1_matches_theory(rng):
    phi = 0.9
    n, m = 2**14, 4
    chains = _ar1(rng, phi, n, m)
    ess = effective_sample_size(chains)
    tau = (1 + phi) / (1 - phi)  # = 19
    np.testing.assert_allclose(ess, m * n / tau, rtol=0.3)


def test_ess_multiparam_shape(rng):
    chains = rng.normal(size=(2, 512, 3))
    ess = effective_sample_size(chains)
    assert ess.shape == (3,)
    assert np.all(ess > 100)


def test_rhat_converged_vs_shifted(rng):
    good = rng.normal(size=(4, 2048))
    assert abs(gelman_rubin(good) - 1.0) < 0.02

    bad = good + np.arange(4)[:, None] * 3.0  # chains at different levels
    assert gelman_rubin(bad) > 1.5


def test_rhat_split_catches_drift(rng):
    # two chains, both drifting identically: non-split R-hat of the two
    # chains is ~1, split R-hat flags the within-chain drift
    drift = np.linspace(0, 5, 2048)
    chains = drift[None, :] + 0.1 * rng.normal(size=(2, 2048))
    assert gelman_rubin(chains, split=False) < 1.05
    assert gelman_rubin(chains, split=True) > 1.5


def test_rhat_requires_two_chains(rng):
    with pytest.raises(ValueError):
        gelman_rubin(rng.normal(size=(1, 100)), split=False)


def test_kish_ess_closed_forms():
    assert weighted_effective_sample_size(np.ones(50)) == pytest.approx(50.0)
    w = np.zeros(50)
    w[3] = 7.0
    assert weighted_effective_sample_size(w) == pytest.approx(1.0)
    # log form matches the linear form under a huge shift
    lw = np.log(np.asarray([0.5, 0.25, 0.25])) + 800.0
    assert weighted_effective_sample_size(lw, log=True) == pytest.approx(
        weighted_effective_sample_size(np.asarray([0.5, 0.25, 0.25]))
    )


def test_kish_ess_on_ns_result_weights(shared_ns):
    """The NS crude log posterior weights feed straight in (log=True)."""
    _, _, _, res = shared_ns
    ess = weighted_effective_sample_size(
        np.asarray(res.crude_log_posterior_weights), log=True
    )
    n_total = len(np.asarray(res.crude_log_posterior_weights))
    assert 5.0 < ess < n_total


def test_summary_weighted_matches_closed_forms(key):
    """summary() on a weighted sample: exact mean/std/median for a
    hand-built two-atom weighted sample."""
    import jax.numpy as jnp

    from bayesianinference_tpu.core.containers import WeightedSamples
    from bayesianinference_tpu.results import summary

    ws = WeightedSamples(
        points=jnp.asarray([[0.0], [1.0]]),
        log_weights=jnp.log(jnp.asarray([0.25, 0.75])),
    )
    t = summary(ws, param_names=("a",), quantiles=(0.2, 0.5, 0.9))
    row = t.to_dict()["a"]
    assert row.mean == pytest.approx(0.75)
    assert row.std == pytest.approx(np.sqrt(0.25 * 0.75))
    assert row.quantiles == (0.0, 1.0, 1.0)  # weighted CDF inversion
    assert row.ess == pytest.approx(1.0 / (0.25**2 + 0.75**2))
    assert "a" in str(t) and "q50" in str(t)


def test_summary_chains_and_laplace(rng, key):
    import jax
    import jax.numpy as jnp

    from bayesianinference_tpu.results import summary

    chains = rng.normal(1.0, 2.0, size=(4, 2000, 2))
    t = summary(chains, param_names=("x", "y"))
    for r in t.rows:
        assert abs(r.mean - 1.0) < 0.15
        assert abs(r.std - 2.0) < 0.15
        assert r.r_hat < 1.02
        assert r.ess > 1000
        assert abs(r.quantiles[1] - 1.0) < 0.2  # median

    # Laplace: Gaussian closed form quantiles
    from bayesianinference_tpu import dists as d
    from bayesianinference_tpu.engines.laplace import laplace_posterior_fit
    from bayesianinference_tpu.models import define_inference_problem

    problem = define_inference_problem(
        parameters=[("mu", -10.0, 10.0)],
        log_likelihood=lambda th: jnp.sum(
            d.Normal(th[0], 1.0).log_prob(jnp.asarray([0.2, 0.4, 0.3]))
        ),
        log_prior=lambda th: jnp.sum(d.Normal(0.0, 10.0).log_prob(th)),
        validate=False,
    )
    fit = laplace_posterior_fit(problem=problem, key=key)
    tl = summary(fit)
    row = tl.rows[0]
    import scipy.stats as st

    assert row.name == "mu"
    np.testing.assert_allclose(
        row.quantiles[1], row.mean, atol=1e-12
    )  # Gaussian median = mean
    np.testing.assert_allclose(
        row.quantiles[2],
        st.norm(row.mean, row.std).ppf(0.95),
        rtol=1e-9,
    )


def test_summary_ns_result(shared_ns):
    from bayesianinference_tpu.results import summary

    _, _, _, res = shared_ns
    t = summary(res)
    row = t.rows[0]
    assert row.name == "mu"
    # posterior mean of mu for 40 obs ~ N(1.2, 1) under a flat prior
    assert abs(row.mean - 1.2) < 0.5
    assert row.ess > 10


def test_waic_cross_engine_and_pwaic(shared_ns):
    """WAIC from NS samples agrees with WAIC from the direct-quadrature
    posterior grid of the same problem, and p_waic is near the parameter
    count for a well-identified 1-parameter model."""
    import jax
    import jax.numpy as jnp

    from bayesianinference_tpu.core.containers import WeightedSamples
    from bayesianinference_tpu.engines.direct import (
        direct_posterior_distribution,
    )
    from bayesianinference_tpu.results import waic

    problem, data, pointwise, res = shared_ns
    w_ns = waic(res, pointwise)

    dp = direct_posterior_distribution(problem=problem, num_points=512)
    grid = WeightedSamples(
        points=dp.nodes,
        log_weights=dp.log_quad_weights + dp.node_log_density,
    )
    w_grid = waic(grid, pointwise)

    assert abs(w_ns.waic - w_grid.waic) < 1.5, (w_ns, w_grid)
    assert 0.5 < w_grid.p_waic < 2.0  # ~1 effective parameter
    assert w_ns.pointwise_elpd.shape == (40,)
    assert "WAIC" in repr(w_ns)


def test_psis_loo_matches_exact_refit_loo(key):
    """PSIS-LOO against the EXACT leave-one-out predictive of the
    conjugate Normal model: p(y_i | y_-i) is the NIG posterior predictive
    StudentT fit on y_-i — a brute-force n-refit oracle."""
    import jax
    import jax.numpy as jnp

    from bayesianinference_tpu import dists as d
    from bayesianinference_tpu.core.containers import WeightedSamples
    from bayesianinference_tpu.dists.conjugate_structs import (
        NormalInverseGamma,
    )
    from bayesianinference_tpu.engines.conjugate import normal_conjugate_model
    from bayesianinference_tpu.engines.direct import (
        direct_posterior_distribution,
    )
    from bayesianinference_tpu.models import define_inference_problem
    from bayesianinference_tpu.results import psis_loo, waic

    rng = np.random.default_rng(7)
    n = 20
    y = rng.normal(0.8, 1.3, size=n)

    # model: y ~ N(mu, sigma); NIG prior (so the refit oracle is exact)
    prior = NormalInverseGamma(mu0=0.0, lam=0.5, beta=1.0, nu=1.0)

    # exact LOO by n refits
    exact = 0.0
    for i in range(n):
        rest = np.delete(y, i)
        fit = normal_conjugate_model(jnp.asarray(rest), prior=prior)
        exact += float(fit.posterior_predictive.log_prob(jnp.asarray(y[i])))

    # posterior sample via 2-D quadrature on (mu, log sigma^2)
    def pointwise(th):
        return d.Normal(th[0], jnp.sqrt(jnp.exp(th[1]))).log_prob(
            jnp.asarray(y)
        )

    def logprior(th):
        var = jnp.exp(th[1])
        # NIG density in (mu, log var): includes the Jacobian var
        return prior.log_prob(th[0], var) + th[1]

    problem = define_inference_problem(
        parameters=[("mu", -4.0, 5.0), ("logv", -4.0, 4.0)],
        log_likelihood=lambda th: jnp.sum(pointwise(th)),
        log_prior=logprior,
        validate=False,
    )
    dp = direct_posterior_distribution(problem=problem, num_points=160)
    grid = WeightedSamples(
        points=dp.nodes, log_weights=dp.log_quad_weights + dp.node_log_density
    )
    # PSIS assumes draws FROM the posterior: resample the grid to
    # equal-weight posterior draws
    draws = grid.resample(jax.random.PRNGKey(0), 4000)
    ws = WeightedSamples(
        points=draws, log_weights=jnp.zeros(draws.shape[0])
    )

    loo = psis_loo(ws, pointwise)
    assert abs(loo.elpd_loo - exact) < 0.2, (loo.elpd_loo, exact)
    assert np.all(np.asarray(loo.pareto_k) < 0.7)
    assert 0.5 < loo.p_loo < 4.0
    assert "LOO" in repr(loo)
    # LOO <= lppd, and close to WAIC's elpd for this well-behaved model
    w = waic(ws, pointwise)
    assert abs(w.elpd - loo.elpd_loo) < 0.3


def test_psis_loo_flags_sentinel_likelihoods(key):
    """A posterior draw assigning (sentinel) zero density to some y_i
    must flag that observation with khat = inf instead of letting a
    +1e300 importance ratio poison the estimate."""
    import jax.numpy as jnp

    from bayesianinference_tpu import dists as d
    from bayesianinference_tpu.core.containers import WeightedSamples
    from bayesianinference_tpu.results import psis_loo

    # Uniform(0, theta) likelihood: draws with theta < y_i give the
    # sentinel for that observation
    y = jnp.asarray([0.5, 0.9, 2.5])
    thetas = jnp.asarray([[1.0], [2.0], [3.0], [2.8]])
    ws = WeightedSamples(points=thetas, log_weights=jnp.zeros(4))
    pw = lambda th: d.Uniform(0.0, th[0]).log_prob(y)
    loo = psis_loo(ws, pw)
    k = np.asarray(loo.pareto_k)
    assert np.isinf(k[2])  # y=2.5 unsupported under theta in {1, 2}
    assert np.all(np.isfinite(np.asarray(loo.pointwise_elpd)))


def test_model_weights_stacking_matches_grid_oracle(rng):
    """K=2 stacking has a 1-D concave objective: the exponentiated-
    gradient solution must match a brute-force grid argmax."""
    from bayesianinference_tpu.results import model_weights

    n = 200
    # two models with genuinely complementary pointwise fits
    e1 = rng.normal(-1.0, 0.8, size=n)
    e2 = np.where(rng.uniform(size=n) < 0.4, e1 + 1.2, e1 - 0.9)
    w = np.asarray(model_weights([e1, e2], method="stacking"))
    assert w.shape == (2,)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)

    grid = np.linspace(1e-6, 1 - 1e-6, 20001)
    le = np.stack([e1, e2])
    # objective on the grid, stably: log(w e^{e1} + (1-w) e^{e2})
    mx = le.max(axis=0)
    p1, p2 = np.exp(le[0] - mx), np.exp(le[1] - mx)
    vals = np.array([np.sum(np.log(a * p1 + (1 - a) * p2)) for a in grid])
    w_star = grid[np.argmax(vals)]
    assert abs(w[0] - w_star) < 1e-3, (w[0], w_star)


def test_model_weights_dominant_and_symmetric(rng):
    from bayesianinference_tpu.results import model_weights

    n = 100
    base = rng.normal(size=n)
    # model A strictly dominates pointwise -> all stacking weight on A
    w = np.asarray(model_weights([base, base - 2.0], method="stacking"))
    assert w[0] > 0.99
    # identical models -> uniform by symmetry
    w3 = np.asarray(model_weights([base, base, base], method="stacking"))
    np.testing.assert_allclose(w3, 1.0 / 3.0, atol=1e-6)


def test_model_weights_pseudo_bma_forms(rng, key):
    from bayesianinference_tpu.results import model_weights

    n = 50
    e1 = rng.normal(-1.0, 0.1, size=n)
    e2 = e1 - 0.02  # slightly worse
    # plain pseudo-BMA is an exact softmax of the totals
    w = np.asarray(model_weights([e1, e2], method="pseudo-bma"))
    t1, t2 = e1.sum(), e2.sum()
    expect = np.exp([0.0, t2 - t1])
    expect /= expect.sum()
    np.testing.assert_allclose(w, expect, rtol=1e-6)
    # pseudo-BMA+ regularizes toward uniform but keeps the ordering
    wp = np.asarray(
        model_weights([e1, e2], method="pseudo-bma+", key=key)
    )
    np.testing.assert_allclose(wp.sum(), 1.0, atol=1e-6)
    assert wp[0] > wp[1]
    # the bootstrap shrinks the winning weight toward 0.5 (never past
    # the plain softmax)
    assert 0.5 < wp[0] <= w[0] + 1e-9


def test_model_weights_validation(rng):
    import pytest as _pytest

    from bayesianinference_tpu.results import model_weights

    assert np.asarray(model_weights([rng.normal(size=10)])).tolist() == [1.0]
    with _pytest.raises(ValueError, match="non-finite"):
        model_weights([np.array([0.0, np.inf]), np.zeros(2)])
    with _pytest.raises(ValueError, match="unknown method"):
        model_weights([np.zeros(3), np.zeros(3)], method="bma")
