"""Latent-GP Laplace (ops/gp_laplace.py + engines/gp_classify.py).

Oracles: (1) the Newton mode must match a direct multi-start L-BFGS
maximization of the exact latent log posterior; (2) the logML formula
must match the library's OWN generic Laplace evidence
(`laplace_log_evidence`) evaluated with explicit dense K^-1 + W; (3) the
custom-VJP hyperparameter gradient must match central finite
differences; (4) at n=3 the approximation must sit near the EXACT
marginal computed by tensor-product Gauss-Hermite over the latent f.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu.core.numerics import is_log_zero
from bayesianinference_tpu.engines.gp_classify import (
    define_gp_classifier,
    optimize_gp_classifier,
    predict_from_gp_classifier,
)
from bayesianinference_tpu.engines.laplace import (
    find_mode,
    laplace_log_evidence,
    laplace_posterior_fit,
)
from bayesianinference_tpu.ops.gp_kernels import covariance_matrix, se_kernel
from bayesianinference_tpu.ops.gp_laplace import (
    bernoulli_logit_likelihood,
    bernoulli_probit_likelihood,
    gauss_hermite_expectation,
    gp_laplace_latent_moments,
    gp_laplace_log_marginal,
    gp_laplace_mode,
    poisson_log_likelihood,
)

ALL_LIKS = [
    bernoulli_logit_likelihood(),
    bernoulli_probit_likelihood(),
    poisson_log_likelihood(),
]


def _toy(n=14, seed=0, counts=False):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, size=(n, 1)), axis=0))
    k = covariance_matrix(se_kernel(2.0, 1.0), x, 1e-8)
    f = jnp.asarray(
        np.linalg.cholesky(np.asarray(k)) @ rng.normal(size=n)
    )
    if counts:
        y = jnp.asarray(rng.poisson(np.exp(np.asarray(f))), jnp.float64)
    else:
        y = jnp.asarray(
            (rng.uniform(size=n) < 1 / (1 + np.exp(-np.asarray(f)))).astype(
                float
            )
        )
    return x, y, k


def _exact_latent_logpost(k, y, lik):
    """psi(f) = log p(y|f) + log N(f; 0, K) as a plain callable."""
    n = y.shape[0]
    l = jnp.linalg.cholesky(k)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(l)))
    lpf = jax.vmap(lik.log_prob, in_axes=(0, 0))

    def psi(f):
        z = jax.scipy.linalg.solve_triangular(l, f, lower=True)
        return (
            jnp.sum(lpf(f, y))
            - 0.5 * jnp.sum(z * z)
            - 0.5 * (logdet + n * jnp.log(2 * jnp.pi))
        )

    return psi


@pytest.mark.parametrize("lik", ALL_LIKS, ids=lambda l: l.name)
def test_newton_mode_matches_direct_optimization(lik):
    x, y, k = _toy(counts=lik.name == "poisson_log")
    f_hat, a = gp_laplace_mode(k, y, lik)
    # optimize in WHITENED coordinates f = L u (K is ill-conditioned, so
    # L-BFGS stalls in f-space; the whitened posterior is benign)
    l = jnp.linalg.cholesky(k)
    lpf = jax.vmap(lik.log_prob, in_axes=(0, 0))

    def psi_u(u):
        return jnp.sum(lpf(l @ u, y)) - 0.5 * jnp.sum(u * u)

    u_opt, _ = find_mode(psi_u, jnp.zeros((1, y.shape[0])), maxiter=2000)
    np.testing.assert_allclose(
        np.asarray(f_hat), np.asarray(l @ u_opt), atol=1e-6
    )
    # at the mode a = K^{-1} f_hat = grad log p(y | f_hat)
    np.testing.assert_allclose(
        np.asarray(k @ a), np.asarray(f_hat), atol=1e-8
    )


@pytest.mark.parametrize("lik", ALL_LIKS, ids=lambda l: l.name)
def test_logml_matches_generic_laplace_evidence(lik):
    """The GP-specific stable form must equal the library's generic
    Laplace evidence with explicit dense precision K^-1 + W."""
    x, y, k = _toy(seed=1, counts=lik.name == "poisson_log")
    logz = float(gp_laplace_log_marginal(k, y, lik))
    psi = _exact_latent_logpost(k, y, lik)
    f_hat, _ = gp_laplace_mode(k, y, lik)
    d2 = jax.vmap(
        jax.grad(jax.grad(lik.log_prob, argnums=0), argnums=0),
        in_axes=(0, 0),
    )
    w = -d2(f_hat, y)
    precision = jnp.linalg.inv(k) + jnp.diag(w)
    logz_generic = float(laplace_log_evidence(psi(f_hat), precision))
    np.testing.assert_allclose(logz, logz_generic, rtol=1e-7)


@pytest.mark.parametrize("lik", ALL_LIKS, ids=lambda l: l.name)
def test_hyperparameter_gradient_matches_finite_differences(lik):
    x, y, _ = _toy(seed=2, counts=lik.name == "poisson_log")

    def logml(theta):
        k = covariance_matrix(
            se_kernel(jnp.exp(theta[0]), jnp.exp(theta[1])), x, 1e-8
        )
        return gp_laplace_log_marginal(k, y, lik)

    theta0 = jnp.asarray([0.4, -0.3])
    g = jax.grad(logml)(theta0)
    eps = 1e-6
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (float(logml(theta0 + e)) - float(logml(theta0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=2e-5, atol=1e-8)


def test_logml_near_exact_marginal_tiny_n():
    """n=3: exact marginal by tensor Gauss-Hermite over f ~ N(0, K)."""
    lik = bernoulli_logit_likelihood()
    x = jnp.asarray([[-1.0], [0.2], [1.4]])
    y = jnp.asarray([0.0, 1.0, 1.0])
    k = covariance_matrix(se_kernel(1.5, 1.0), x, 1e-8)
    nodes, weights = np.polynomial.hermite_e.hermegauss(60)
    l = np.linalg.cholesky(np.asarray(k))
    g1, g2, g3 = np.meshgrid(nodes, nodes, nodes, indexing="ij")
    zs = np.stack([g1.ravel(), g2.ravel(), g3.ravel()], axis=-1)
    fs = zs @ l.T
    lw = np.log(weights) - 0.5 * np.log(2 * np.pi)
    # total log weight of each tensor node
    iw = np.add.outer(np.add.outer(lw, lw), lw).ravel()
    from scipy.special import logsumexp as sp_logsumexp

    lpf = jax.vmap(
        jax.vmap(lik.log_prob, in_axes=(0, 0)), in_axes=(0, None)
    )
    ll = np.asarray(jnp.sum(lpf(jnp.asarray(fs), y), axis=-1))
    # E_{z~N(0,I)}[p(y | L z)]; hermegauss weights sum to sqrt(2pi) per axis
    log_exact = sp_logsumexp(iw + ll) - 3 * sp_logsumexp(lw)
    logz = float(gp_laplace_log_marginal(k, y, lik))
    assert abs(logz - log_exact) < 0.05, (logz, log_exact)


def test_latent_moments_match_dense_formulas():
    """mu*, var* against the textbook dense forms with explicit inverses."""
    lik = bernoulli_logit_likelihood()
    x, y, k = _toy(seed=3)
    xq = jnp.asarray([[-2.5], [0.1], [2.2]])
    kern = se_kernel(2.0, 1.0)
    kc = kern.matrix(x, xq)
    kqd = kern.diag(xq) + 1e-8
    mu, var = gp_laplace_latent_moments(k, y, lik, kc, kqd)
    f_hat, a = gp_laplace_mode(k, y, lik)
    d2 = jax.vmap(
        jax.grad(jax.grad(lik.log_prob, argnums=0), argnums=0),
        in_axes=(0, 0),
    )
    w = np.diag(np.asarray(-d2(f_hat, y)))
    kn, kcn = np.asarray(k), np.asarray(kc)
    cov = np.linalg.inv(kn + np.linalg.inv(w))
    np.testing.assert_allclose(np.asarray(mu), kcn.T @ np.asarray(a), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(var),
        np.asarray(kqd) - np.diag(kcn.T @ cov @ kcn),
        atol=1e-9,
    )


def test_gauss_hermite_expectation_exact_for_polynomials():
    mu = jnp.asarray([0.5, -1.0])
    var = jnp.asarray([2.0, 0.3])
    # E[f^2] = mu^2 + var, exact for any quadrature order >= 2
    got = gauss_hermite_expectation(lambda f: f**2, mu, var, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(mu**2 + var), rtol=1e-12)
    # E[sigmoid(f)] against brute-force numpy quadrature
    zs = np.linspace(-10, 10, 20001)
    for m, v in [(0.5, 2.0), (-1.0, 0.3)]:
        dens = np.exp(-0.5 * (zs - m) ** 2 / v) / np.sqrt(2 * np.pi * v)
        ref = np.trapezoid(dens / (1 + np.exp(-zs)), zs)
        got = float(
            gauss_hermite_expectation(jax.nn.sigmoid, jnp.asarray(m), jnp.asarray(v))
        )
        np.testing.assert_allclose(got, ref, rtol=1e-8)


@pytest.fixture(scope="module")
def classify_problem():
    rng = np.random.default_rng(5)
    n = 60
    x = np.sort(rng.uniform(-3, 3, size=(n, 1)), axis=0)
    p = 1 / (1 + np.exp(-3.0 * np.sin(1.5 * x[:, 0])))
    y = (rng.uniform(size=n) < p).astype(float)
    problem = define_gp_classifier(
        x,
        y,
        lambda th: se_kernel(th[0] ** 2, th[1]),
        parameters=[("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
        prior_distribution=["scale", "scale"],
        validate=False,
    )
    return problem, x, y


def test_problem_jit_vmap_and_sentinel(classify_problem):
    problem, _, _ = classify_problem
    thetas = jnp.asarray([[1.5, 1.0], [0.5, 0.4], [3.0, 2.0]])
    vals = jax.jit(jax.vmap(problem.log_likelihood))(thetas)
    assert vals.shape == (3,) and bool(jnp.all(jnp.isfinite(vals)))
    # a NaN kernel (absurd hyperparameters) -> guarded sentinel
    assert bool(
        is_log_zero(problem.log_likelihood(jnp.asarray([1.0, jnp.nan])))
    )


def test_end_to_end_laplace_fit_and_prediction(classify_problem):
    problem, x, y = classify_problem
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    assert np.isfinite(float(fit.log_evidence))
    xq = np.linspace(-3, 3, 41)[:, None]
    pred = predict_from_gp_classifier(fit.mean, problem, xq)
    p = np.asarray(pred.mean)
    assert p.shape == (41,) and np.all((p >= 0) & (p <= 1))
    # the latent mixture exposes quantiles at each point
    q = np.asarray(pred.latent.quantile(0.9))
    assert q.shape == (41,)
    # predictions track the true class structure: correlate with the
    # generating probability
    p_true = 1 / (1 + np.exp(-3.0 * np.sin(1.5 * xq[:, 0])))
    assert np.corrcoef(p, p_true)[0, 1] > 0.85
    # posterior-sample-averaged path (array of draws) agrees in shape
    draws = fit.mean[None, :] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), (8, 2)
    )
    pred2 = predict_from_gp_classifier(draws, problem, xq)
    assert np.asarray(pred2.mean).shape == (41,)
    np.testing.assert_allclose(np.asarray(pred2.mean), p, atol=0.1)


def test_type_ii_ml_fit_improves_and_matches_gridded_optimum(classify_problem):
    problem, _, _ = classify_problem
    opt = optimize_gp_classifier(problem, steps=150, learning_rate=0.1)
    theta = np.asarray(opt.theta)
    assert np.all(theta > np.asarray(problem.lower))
    assert np.all(theta < np.asarray(problem.upper))
    # monotone-ish improvement: the final logML beats the first step's
    trace = np.asarray(opt.trace)
    assert float(opt.log_marginal) > trace[0]
    # Adam's optimum is a stationary point: logML gradient ~ 0 there
    g = jax.grad(problem.log_likelihood)(opt.theta)
    assert float(jnp.max(jnp.abs(g))) < 0.3
    # and no grid point on a coarse box grid beats it by more than noise
    amps = np.linspace(0.3, 4.0, 10)
    lss = np.linspace(0.2, 3.0, 10)
    grid = jnp.asarray([[a, l] for a in amps for l in lss])
    vals = jax.vmap(problem.log_likelihood)(grid)
    assert float(opt.log_marginal) >= float(jnp.max(vals)) - 0.1
    with pytest.raises(ValueError, match="define_gp_classifier"):
        from bayesianinference_tpu.models.problem import (
            define_inference_problem,
        )

        optimize_gp_classifier(
            define_inference_problem(
                parameters=[("a", 0.0, 1.0)],
                log_likelihood=lambda th: -jnp.sum(th**2),
                validate=False,
            )
        )


def test_poisson_count_regression_end_to_end():
    rng = np.random.default_rng(9)
    n = 50
    x = np.sort(rng.uniform(-2, 2, size=(n, 1)), axis=0)
    rate = np.exp(1.0 + np.sin(2.0 * x[:, 0]))
    y = rng.poisson(rate).astype(float)
    problem = define_gp_classifier(
        x,
        y,
        lambda th: se_kernel(th[0] ** 2, th[1]),
        parameters=[("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
        likelihood="poisson_log",
        prior_distribution=["scale", "scale"],
        validate=False,
    )
    fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
    pred = predict_from_gp_classifier(fit.mean, problem, x)
    # predicted rates correlate strongly with the generating rates
    assert np.corrcoef(np.asarray(pred.mean), rate)[0, 1] > 0.9


def test_negative_binomial_likelihood_tiny_n_and_scipy():
    from scipy.stats import nbinom

    from bayesianinference_tpu.ops.gp_laplace import (
        negative_binomial_likelihood,
    )

    lik = negative_binomial_likelihood(3.0)
    # scalar log_prob matches scipy's nbinom pmf: r=3, mean mu=e^f,
    # scipy parameterization p = r / (r + mu)
    for f, y in [(0.3, 2.0), (-1.0, 0.0), (1.2, 7.0)]:
        mu = np.exp(f)
        ref = nbinom.logpmf(int(y), 3.0, 3.0 / (3.0 + mu))
        np.testing.assert_allclose(
            float(lik.log_prob(jnp.asarray(f), jnp.asarray(y))), ref,
            rtol=1e-10,
        )
    # log-concavity at a few points (W >= 0)
    d2 = jax.grad(jax.grad(lik.log_prob, argnums=0), argnums=0)
    for f in (-2.0, 0.0, 2.0):
        assert float(d2(jnp.asarray(f), jnp.asarray(5.0))) < 0
    with pytest.raises(ValueError, match="dispersion"):
        negative_binomial_likelihood(-1.0)
    # Laplace logML near the exact tensor-GH marginal at n=3
    x = jnp.asarray([[-1.0], [0.2], [1.4]])
    y = jnp.asarray([0.0, 2.0, 5.0])
    k = covariance_matrix(se_kernel(1.2, 1.0), x, 1e-8)
    from tests.test_gp_ep import _exact_logz_gh

    exact = _exact_logz_gh(k, y, lik)
    logz = float(gp_laplace_log_marginal(k, y, lik))
    assert abs(logz - exact) < 0.05, (logz, exact)


def test_binomial_counts_end_to_end():
    rng = np.random.default_rng(11)
    n = 40
    x = np.sort(rng.uniform(-2, 2, size=(n, 1)), axis=0)
    p = 1 / (1 + np.exp(-2.0 * np.sin(2.0 * x[:, 0])))
    trials = rng.integers(5, 20, size=n)
    succ = rng.binomial(trials, p)
    y = np.stack([succ, trials], axis=-1).astype(float)
    problem = define_gp_classifier(
        x,
        y,
        lambda th: se_kernel(th[0] ** 2, th[1]),
        parameters=[("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
        likelihood="binomial_logit",
        prior_distribution=["scale", "scale"],
        validate=False,
    )
    assert np.isfinite(float(problem.log_likelihood(jnp.asarray([1.5, 0.8]))))
    pred = predict_from_gp_classifier(
        jnp.asarray([1.5, 0.8]), problem, x
    )
    # binomial likelihoods pin the latent well: predictions track p(x)
    assert np.corrcoef(np.asarray(pred.mean), p)[0, 1] > 0.9
    # validation: successes must not exceed trials
    bad = y.copy()
    bad[0, 0] = bad[0, 1] + 1
    with pytest.raises(ValueError, match="successes"):
        define_gp_classifier(
            x, bad, lambda th: se_kernel(1.0, th[0]),
            parameters=[("ls", 0.1, 5.0)], likelihood="binomial_logit",
            validate=False,
        )


def test_bernoulli_target_validation():
    with pytest.raises(ValueError, match="y in"):
        define_gp_classifier(
            np.zeros((3, 1)),
            np.asarray([0.0, 2.0, 1.0]),
            lambda th: se_kernel(1.0, th[0]),
            parameters=[("ls", 0.1, 5.0)],
            validate=False,
        )
    with pytest.raises(ValueError, match="unknown likelihood"):
        define_gp_classifier(
            np.zeros((3, 1)),
            np.asarray([0.0, 1.0, 1.0]),
            lambda th: se_kernel(1.0, th[0]),
            parameters=[("ls", 0.1, 5.0)],
            likelihood="nope",
            validate=False,
        )


def test_gamma_likelihood_scipy_parity_and_fit():
    from scipy.stats import gamma as sp_gamma

    from bayesianinference_tpu.ops.gp_laplace import gamma_log_likelihood

    lik = gamma_log_likelihood(2.5)
    for f, y in [(0.3, 2.0), (-1.0, 0.2), (1.2, 7.0)]:
        # mean exp(f) => scipy scale = exp(f)/a
        ref = sp_gamma.logpdf(y, 2.5, scale=np.exp(f) / 2.5)
        np.testing.assert_allclose(
            float(lik.log_prob(jnp.asarray(f), jnp.asarray(y))), ref,
            rtol=1e-10,
        )
    d2 = jax.grad(jax.grad(lik.log_prob, argnums=0), argnums=0)
    assert float(d2(jnp.asarray(0.5), jnp.asarray(2.0))) < 0
    with pytest.raises(ValueError, match="shape"):
        gamma_log_likelihood(0.0)
    # latent-GP fit on gamma targets recovers the mean surface
    rng = np.random.default_rng(13)
    n = 40
    x = np.sort(rng.uniform(-2, 2, size=(n, 1)), axis=0)
    mean_true = np.exp(0.8 * np.sin(1.5 * x[:, 0]))
    y = rng.gamma(2.5, mean_true / 2.5)
    problem = define_gp_classifier(
        x, y, lambda th: se_kernel(th[0] ** 2, th[1]),
        parameters=[("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
        likelihood=lik, prior_distribution=["scale", "scale"],
        validate=False,
    )
    pred = predict_from_gp_classifier(jnp.asarray([0.9, 0.9]), problem, x)
    assert np.corrcoef(np.asarray(pred.mean), mean_true)[0, 1] > 0.8


def test_ordinal_likelihood_probabilities_and_fit():
    from scipy.special import expit

    from bayesianinference_tpu.ops.gp_laplace import (
        ordinal_logit_likelihood,
    )

    c = np.asarray([-1.0, 0.5, 2.0])
    lik = ordinal_logit_likelihood(c)
    # category probabilities sum to 1 and match the sigmoid differences
    for f in (-2.0, 0.3, 3.0):
        cum = np.concatenate([[0.0], expit(c - f), [1.0]])
        probs_ref = np.diff(cum)
        lps = np.asarray([
            float(lik.log_prob(jnp.asarray(f), jnp.asarray(float(k))))
            for k in range(4)
        ])
        np.testing.assert_allclose(np.exp(lps), probs_ref, rtol=1e-6)
        np.testing.assert_allclose(np.exp(lps).sum(), 1.0, rtol=1e-9)
        # link = expected category
        np.testing.assert_allclose(
            float(lik.link(jnp.asarray(f))),
            (probs_ref * np.arange(4)).sum(),
            rtol=1e-6,
        )
    # log-concavity at a few points/categories
    d2 = jax.grad(jax.grad(lik.log_prob, argnums=0), argnums=0)
    for f in (-1.5, 0.0, 1.5):
        for k in (0.0, 1.0, 2.0, 3.0):
            assert float(d2(jnp.asarray(f), jnp.asarray(k))) <= 1e-10
    with pytest.raises(ValueError, match="increasing"):
        ordinal_logit_likelihood([0.0, 0.0])
    # latent-GP fit: ordered ratings from a smooth latent recover it
    rng = np.random.default_rng(17)
    n = 50
    x = np.sort(rng.uniform(-2, 2, size=(n, 1)), axis=0)
    f_true = 2.0 * np.sin(1.3 * x[:, 0])
    cum = expit(c[None, :] - f_true[:, None])
    u = rng.uniform(size=n)
    y = (u[:, None] > cum).sum(axis=1).astype(float)
    problem = define_gp_classifier(
        x, y, lambda th: se_kernel(th[0] ** 2, th[1]),
        parameters=[("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
        likelihood=lik, prior_distribution=["scale", "scale"],
        validate=False,
    )
    assert np.isfinite(float(problem.log_likelihood(jnp.asarray([1.5, 0.9]))))
    pred = predict_from_gp_classifier(jnp.asarray([1.8, 0.9]), problem, x)
    # expected-category predictions correlate with the latent truth
    assert np.corrcoef(np.asarray(pred.mean), f_true)[0, 1] > 0.9
