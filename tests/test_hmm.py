"""Hidden Markov models (ops/hmm.py + engines/hmm.py).

Oracles: for small T the marginal likelihood, filtered/smoothed
marginals, MAP path, and the full path posterior are computable by
EXACT enumeration of all K^T hidden paths — every kernel (sequential
AND parallel, masked and unmasked) is pinned against that at ~1e-12.
FFBS draw frequencies match the enumerated path posterior.  End-to-end:
Laplace recovers 2-state Gaussian HMM parameters, NS agrees on the
evidence.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu.core.numerics import is_log_zero
from bayesianinference_tpu.engines import (
    define_hidden_markov_model,
    laplace_posterior_fit,
    most_likely_states,
    nested_sampling,
    regime_probabilities,
    sample_hidden_paths,
)
from bayesianinference_tpu.ops.hmm import (
    HMM,
    hmm_filter,
    hmm_log_likelihood,
    hmm_posterior_sample,
    hmm_sample_states,
    hmm_smoother,
    hmm_viterbi,
    row_stochastic,
)


def _enumerate(hmm, log_obs, mask=None):
    """Exact sums over all K^T paths: (ll, log-filtered [T,K],
    log-smoothed [T,K], MAP path, {path: posterior prob})."""
    pi = np.asarray(hmm.initial_log_probs)
    a = np.asarray(hmm.transition_log_probs)
    b = np.asarray(log_obs)
    t, k = b.shape
    if mask is not None:
        b = b * np.asarray(mask)[:, None]
    joint = {}
    for path in itertools.product(range(k), repeat=t):
        lp = pi[path[0]] + b[0, path[0]]
        for s in range(1, t):
            lp += a[path[s - 1], path[s]] + b[s, path[s]]
        joint[path] = lp
    lps = np.array(list(joint.values()))
    ll = np.logaddexp.reduce(lps)
    post = {p: np.exp(lp - ll) for p, lp in joint.items()}
    smoothed = np.zeros((t, k))
    for p, w in post.items():
        for s in range(t):
            smoothed[s, p[s]] += w
    # filtered marginals: renormalize prefix joints
    filtered = np.zeros((t, k))
    for s in range(t):
        # p(z_s | y_{1:s}) by enumerating prefixes only
        pref_scores = {}
        for prefix in itertools.product(range(k), repeat=s + 1):
            lp = pi[prefix[0]] + b[0, prefix[0]]
            for u in range(1, s + 1):
                lp += a[prefix[u - 1], prefix[u]] + b[u, prefix[u]]
            pref_scores[prefix] = lp
        vals = np.array(list(pref_scores.values()))
        tot = np.logaddexp.reduce(vals)
        for prefix, lp in pref_scores.items():
            filtered[s, prefix[-1]] += np.exp(lp - tot)
    best = max(joint, key=joint.get)
    return ll, filtered, smoothed, np.array(best), post


@pytest.fixture(scope="module")
def small_hmm():
    rng = np.random.default_rng(0)
    k, t = 3, 6
    logits = rng.normal(size=(k, k - 1))
    log_a = np.asarray(row_stochastic(jnp.asarray(logits)))
    pi = rng.dirichlet(np.ones(k))
    hmm = HMM(
        initial_log_probs=jnp.asarray(np.log(pi)),
        transition_log_probs=jnp.asarray(log_a),
    )
    log_obs = jnp.asarray(rng.normal(size=(t, k)))
    return hmm, log_obs


def test_loglik_matches_enumeration(small_hmm):
    hmm, log_obs = small_hmm
    ll_exact, *_ = _enumerate(hmm, log_obs)
    for method in ("sequential", "parallel"):
        ll = float(hmm_log_likelihood(hmm, log_obs, method=method))
        np.testing.assert_allclose(ll, ll_exact, rtol=1e-12)


def test_masked_loglik_matches_enumeration(small_hmm):
    hmm, log_obs = small_hmm
    t = log_obs.shape[0]
    mask = np.ones(t, bool)
    mask[0] = mask[3] = False
    ll_exact, *_ = _enumerate(hmm, log_obs, mask)
    for method in ("sequential", "parallel"):
        ll = float(
            hmm_log_likelihood(
                hmm, log_obs, mask=jnp.asarray(mask), method=method
            )
        )
        np.testing.assert_allclose(ll, ll_exact, rtol=1e-12)


def test_filter_matches_enumeration(small_hmm):
    hmm, log_obs = small_hmm
    _, filtered, *_ = _enumerate(hmm, log_obs)
    for method in ("sequential", "parallel"):
        fr = hmm_filter(hmm, log_obs, method=method)
        np.testing.assert_allclose(
            np.exp(np.asarray(fr.log_filtered)), filtered, atol=1e-12
        )


def test_smoother_matches_enumeration(small_hmm):
    hmm, log_obs = small_hmm
    _, _, smoothed, _, _ = _enumerate(hmm, log_obs)
    g = np.exp(np.asarray(hmm_smoother(hmm, log_obs)))
    np.testing.assert_allclose(g, smoothed, atol=1e-12)


def test_viterbi_matches_enumeration(small_hmm):
    hmm, log_obs = small_hmm
    *_, best, _ = _enumerate(hmm, log_obs)
    np.testing.assert_array_equal(
        np.asarray(hmm_viterbi(hmm, log_obs)), best
    )


def test_ffbs_matches_path_posterior():
    """Empirical FFBS path frequencies vs the enumerated posterior
    (K=2, T=4 -> 16 paths, 40k draws: MC sd per path <~ 0.25%)."""
    rng = np.random.default_rng(1)
    k, t = 2, 4
    hmm = HMM(
        initial_log_probs=jnp.asarray(np.log([0.7, 0.3])),
        transition_log_probs=jnp.asarray(
            np.log([[0.8, 0.2], [0.4, 0.6]])
        ),
    )
    log_obs = jnp.asarray(rng.normal(size=(t, k)))
    *_, post = _enumerate(hmm, log_obs)
    draws = np.asarray(
        hmm_posterior_sample(jax.random.PRNGKey(0), hmm, log_obs, 40000)
    )
    for path, p_exact in post.items():
        freq = np.mean((draws == np.array(path)).all(axis=1))
        assert abs(freq - p_exact) < 0.012, (path, freq, p_exact)


def test_parallel_filter_long_series_stable():
    """T=4096 parallel path stays finite and agrees with sequential
    (the per-element normalization is doing its job)."""
    rng = np.random.default_rng(2)
    k = 4
    hmm = HMM(
        initial_log_probs=jnp.asarray(np.log(np.full(k, 1.0 / k))),
        transition_log_probs=row_stochastic(
            jnp.asarray(rng.normal(size=(k, k - 1)))
        ),
    )
    log_obs = jnp.asarray(rng.normal(size=(4096, k)) - 50.0)
    ll_s = float(hmm_log_likelihood(hmm, log_obs))
    ll_p = float(hmm_log_likelihood(hmm, log_obs, method="parallel"))
    assert np.isfinite(ll_s)
    np.testing.assert_allclose(ll_p, ll_s, rtol=1e-10)


def test_row_stochastic_rows_normalize():
    la = np.asarray(
        row_stochastic(jnp.asarray([[0.3, -1.2], [2.0, 0.1], [0.0, 0.0]]))
    )
    np.testing.assert_allclose(
        np.exp(la).sum(axis=1), np.ones(3), rtol=1e-12
    )


# ---------------------------------------------------------------- engines


@pytest.fixture(scope="module")
def regime_problem():
    """2-state Gaussian HMM: well-separated means, sticky transitions."""
    true = dict(mu0=-2.0, mu1=2.0, p_stay=0.92)
    rng = np.random.default_rng(3)
    t = 300
    z = np.zeros(t, int)
    for s in range(1, t):
        stay = rng.random() < true["p_stay"]
        z[s] = z[s - 1] if stay else 1 - z[s - 1]
    y = np.where(z == 0, true["mu0"], true["mu1"]) + rng.normal(size=t)
    y = jnp.asarray(y)

    def builder(theta):
        mu0, mu1, l01, l10 = theta[0], theta[1], theta[2], theta[3]
        hmm = HMM(
            initial_log_probs=jnp.log(jnp.asarray([0.5, 0.5], theta.dtype)),
            transition_log_probs=row_stochastic(
                jnp.stack([l01, l10])[:, None]
            ),
        )
        mus = jnp.stack([mu0, mu1])
        log_obs = (
            -0.5 * (y[:, None] - mus[None, :]) ** 2
            - 0.5 * jnp.log(2 * jnp.pi)
        )
        return hmm, log_obs

    problem = define_hidden_markov_model(
        builder,
        parameters=[
            ("mu0", -6.0, 0.0),
            ("mu1", 0.0, 6.0),
            ("l01", -6.0, 6.0),
            ("l10", -6.0, 6.0),
        ],
        prior_distribution=["location"] * 4,
        validate=False,
    )
    return problem, true, z


def test_laplace_recovers_regime_parameters(regime_problem):
    problem, true, _ = regime_problem
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    mu0, mu1, l01, l10 = np.asarray(fit.mean)
    assert abs(mu0 - true["mu0"]) < 0.4, fit.mean
    assert abs(mu1 - true["mu1"]) < 0.4, fit.mean
    # row 0 = softmax([l01, 0]): p(0 -> 0) = sigmoid(l01)
    p_stay0 = 1.0 / (1.0 + np.exp(-l01))
    assert 0.8 < p_stay0 <= 0.99, p_stay0


def test_regime_probabilities_track_truth(regime_problem):
    problem, true, z = regime_problem
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    g = np.asarray(regime_probabilities(problem, fit.mean))
    assert g.shape == (300, 2)
    np.testing.assert_allclose(g.sum(axis=1), 1.0, rtol=1e-6)
    acc = np.mean((g[:, 1] > 0.5) == (z == 1))
    assert acc > 0.9, acc
    vit = np.asarray(most_likely_states(problem, fit.mean))
    assert np.mean((vit == 1) == (z == 1)) > 0.9


def test_sample_hidden_paths_shapes(regime_problem):
    problem, _, z = regime_problem
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    thetas = fit.posterior_distribution.sample(jax.random.PRNGKey(1), (3,))
    paths = sample_hidden_paths(
        problem, jax.random.PRNGKey(2), thetas, paths_per_theta=5
    )
    assert paths.shape == (3, 5, 300)
    assert paths.dtype == jnp.int32
    # marginal frequency of regime 1 across draws tracks the truth
    assert abs(float((paths == 1).mean()) - (z == 1).mean()) < 0.15


@pytest.mark.slow
def test_ns_evidence_agrees_with_laplace(regime_problem):
    problem, _, _ = regime_problem
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    res = nested_sampling(
        problem,
        key=jax.random.PRNGKey(1),
        num_living_points=400,
        seed_with_domain_points=False,
    )
    lz_ns = float(res.log_evidence.mean)
    assert abs(lz_ns - float(fit.log_evidence)) < 1.5, (
        lz_ns,
        float(fit.log_evidence),
    )


def test_guarded_sentinel_on_nan_emissions(regime_problem):
    problem, _, _ = regime_problem
    bad = jnp.asarray([jnp.nan, 2.0, 0.0, 0.0])
    lp = problem.log_likelihood(bad)
    assert bool(is_log_zero(lp)) or bool(jnp.isfinite(lp))


def test_loglik_traceable_jit_vmap_grad(regime_problem):
    problem, _, _ = regime_problem
    f = jax.jit(jax.vmap(jax.value_and_grad(problem.log_likelihood)))
    thetas = jnp.asarray(
        [[-2.0, 2.0, -2.4, -2.4], [-1.5, 1.5, -2.0, -2.0]]
    )
    vals, grads = f(thetas)
    assert np.isfinite(np.asarray(vals)).all()
    assert np.isfinite(np.asarray(grads)).all()


def test_sample_states_prior_frequencies():
    """Prior path sampler hits the stationary distribution."""
    hmm = HMM(
        initial_log_probs=jnp.asarray(np.log([0.5, 0.5])),
        transition_log_probs=jnp.asarray(
            np.log([[0.9, 0.1], [0.3, 0.7]])
        ),
    )
    z = np.asarray(hmm_sample_states(jax.random.PRNGKey(0), hmm, 20000))
    # stationary: pi1 = 0.1 / (0.1 + 0.3) = 0.25
    assert abs(z.mean() - 0.25) < 0.03


def test_forecast_matches_matrix_power(regime_problem):
    """Log-domain forecast scan vs dense linear-domain matrix power."""
    from bayesianinference_tpu.engines import forecast_regime_probabilities
    from bayesianinference_tpu.ops.hmm import hmm_filter

    problem, _, _ = regime_problem
    theta = jnp.asarray([-2.0, 2.0, 2.4, 2.4])
    meta = problem.metadata["hidden_markov"]
    hmm, log_obs = meta["model_builder"](theta)
    fr = hmm_filter(hmm, log_obs)
    a = np.exp(np.asarray(hmm.transition_log_probs))
    p = np.exp(np.asarray(fr.log_filtered[-1]))
    expected = np.stack(
        [p @ np.linalg.matrix_power(a, h) for h in range(1, 7)]
    )
    got = np.asarray(forecast_regime_probabilities(problem, theta, 6))
    np.testing.assert_allclose(got, expected, atol=1e-12)
    # long horizon converges to the stationary distribution
    far = np.asarray(forecast_regime_probabilities(problem, theta, 400))[-1]
    evals, evecs = np.linalg.eig(a.T)
    statv = np.real(evecs[:, np.argmax(np.real(evals))])
    statv = statv / statv.sum()
    np.testing.assert_allclose(far, statv, atol=1e-6)


@pytest.mark.slow
def test_hmm_composes_with_parallel_ns_mesh(regime_problem):
    """The HMM likelihood (scan inside scan) shards over the virtual
    8-device runs mesh like any other problem — the new family composes
    with the parallel stack."""
    from bayesianinference_tpu.parallel import (
        make_mesh,
        parallel_nested_sampling,
    )

    problem, _, _ = regime_problem
    mesh = make_mesh(("runs",))
    result = parallel_nested_sampling(
        problem,
        jax.random.PRNGKey(0),
        num_runs=8,
        sample_pool_size=25,
        mesh=mesh,
        max_iterations=600,
        min_iterations=30,
        monte_carlo_steps=40,
    )
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    got = float(result.log_evidence.mean)
    err = float(result.log_evidence.standard_error)
    assert abs(got - float(fit.log_evidence)) < max(4 * err, 2.0), (
        got,
        float(fit.log_evidence),
        err,
    )
