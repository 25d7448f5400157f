import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st
from scipy import integrate

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines.conjugate import (
    bayesian_linear_regression,
    design_matrix,
    multinormal_conjugate_model,
    normal_conjugate_model,
    polynomial_basis,
    update_conjugate_model,
)


def _poly_data(rng, n=30, noise=0.5):
    x = rng.uniform(-2, 2, size=(n, 1))
    y = 1.0 + 2.0 * x[:, 0] - 0.5 * x[:, 0] ** 2 + noise * rng.normal(size=n)
    return jnp.asarray(x), jnp.asarray(y)


def test_design_matrix():
    x = jnp.asarray([[1.0], [2.0], [3.0]])
    dm = design_matrix(x, polynomial_basis(2))
    np.testing.assert_allclose(
        np.asarray(dm), [[1, 1, 1], [1, 2, 4], [1, 3, 9]], rtol=1e-12
    )


def test_blr_posterior_parameters(rng):
    x, y = _poly_data(rng)
    res = bayesian_linear_regression(x, y, degree=2)
    # with a weak prior the posterior mean should be near OLS
    dm = np.asarray(design_matrix(x, polynomial_basis(2)))
    ols = np.linalg.lstsq(dm, np.asarray(y), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res.posterior_parameters.b), ols, atol=0.05)
    assert float(res.posterior_parameters.nu) == 30 + 1 / 100


def test_blr_logz_vs_quadrature(rng):
    """Constant-only model: logZ must match 2-D numeric integration."""
    y = rng.normal(size=8) * 0.7 + 0.3
    res = bayesian_linear_regression(
        jnp.zeros((8, 1)), jnp.asarray(y), basis=(), include_constant=True
    )
    lam0, v0, nu0 = 1 / 100, 1 / 100, 1 / 100

    from oracle_utils import normal_nig_log_evidence_quadrature

    log_z = normal_nig_log_evidence_quadrature(
        y, mu0=0.0, lam=lam0, a_ig=nu0 / 2, scale_ig=v0 / 2,
        mu_lo=-6, mu_hi=6, v_lo=1e-4, v_hi=60,
    )
    np.testing.assert_allclose(float(res.log_evidence), log_z, rtol=1e-6)


def test_blr_constant_equals_normal_conjugate(rng):
    """Two independent code paths must give the same logZ for the same
    model: constant-basis BLR(Lambda0=lam, V0=2 beta, Nu0=2 nu) ==
    NIG(mu0=0, lam, beta, nu) normal model."""
    y = rng.normal(size=25) * 1.3 - 0.4
    lam, beta, nu = 0.05, 0.02, 0.03
    blr = bayesian_linear_regression(
        jnp.zeros((25, 1)),
        jnp.asarray(y),
        basis=(),
        include_constant=True,
        prior=None,
    )
    # rebuild with matching explicit prior
    from bayesianinference_tpu.engines.conjugate import BLRParameters

    prior = BLRParameters(
        b=jnp.zeros((1,)),
        lam=jnp.asarray([[lam]]),
        lam_inv=jnp.asarray([[1 / lam]]),
        v=jnp.asarray(2 * beta),
        nu=jnp.asarray(2 * nu),
    )
    blr = bayesian_linear_regression(
        jnp.zeros((25, 1)), jnp.asarray(y), basis=(), prior=prior
    )
    nm = normal_conjugate_model(
        jnp.asarray(y), prior=d.NormalInverseGamma(mu0=0.0, lam=lam, beta=beta, nu=nu)
    )
    np.testing.assert_allclose(
        float(blr.log_evidence), float(nm.log_evidence), rtol=1e-9
    )
    # posterior parameter correspondence
    np.testing.assert_allclose(
        float(blr.posterior_parameters.v) / 2,
        float(nm.posterior.beta),
        rtol=1e-9,
    )


def test_blr_sequential_identity(rng):
    x, y = _poly_data(rng, n=40)
    full = bayesian_linear_regression(x, y, degree=2)
    r1 = bayesian_linear_regression(x[:25], y[:25], degree=2)
    r2 = bayesian_linear_regression(
        x[25:], y[25:], degree=2, prior=r1.posterior_parameters
    )
    np.testing.assert_allclose(
        float(full.log_evidence),
        float(r1.log_evidence) + float(r2.log_evidence),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(full.posterior_parameters.b),
        np.asarray(r2.posterior_parameters.b),
        rtol=1e-8,
    )


def test_blr_predictive(rng, key):
    x, y = _poly_data(rng, n=200, noise=0.3)
    res = bayesian_linear_regression(x, y, degree=2)
    xq = jnp.asarray([[0.5]])
    pred = res.predictive_distribution(xq)
    under = res.underlying_value_distribution(xq)
    truth = 1.0 + 2.0 * 0.5 - 0.5 * 0.25
    assert abs(float(pred.mean()[0]) - truth) < 0.15
    # predictive variance > underlying variance (by the noise term)
    assert float(pred.variance()[0]) > float(under.variance()[0])
    np.testing.assert_allclose(float(pred.variance()[0]) - float(under.variance()[0]),
                               float(res.posterior_parameters.v / res.posterior_parameters.nu)
                               * float(res.posterior_parameters.nu / (res.posterior_parameters.nu - 2)),
                               rtol=1e-6)
    # full posterior ancestral sampling agrees with coefficient marginal
    cp = res.posterior["FullPosterior"]
    s = cp.sample(key, (30_000,))
    np.testing.assert_allclose(
        np.asarray(s["coefficients"]).mean(0),
        np.asarray(res.posterior_parameters.b),
        atol=0.02,
    )


def test_blr_multivariate(rng):
    n = 50
    x = rng.uniform(-1, 1, size=(n, 1))
    b_true = np.array([[1.0, -1.0], [0.5, 2.0]])
    dm = np.concatenate([np.ones((n, 1)), x], axis=1)
    y = dm @ b_true + 0.2 * rng.normal(size=(n, 2))
    res = bayesian_linear_regression(jnp.asarray(x), jnp.asarray(y), degree=1)
    assert res.output_dim == 2
    np.testing.assert_allclose(
        np.asarray(res.posterior_parameters.b), b_true, atol=0.15
    )
    # sequential identity holds in the multivariate path too
    r1 = bayesian_linear_regression(jnp.asarray(x[:30]), jnp.asarray(y[:30]), degree=1)
    r2 = bayesian_linear_regression(
        jnp.asarray(x[30:]), jnp.asarray(y[30:]), degree=1,
        prior=r1.posterior_parameters,
    )
    np.testing.assert_allclose(
        float(res.log_evidence),
        float(r1.log_evidence) + float(r2.log_evidence),
        rtol=1e-8,
    )
    # coefficient posterior is a proper MatrixT
    mt = res.posterior["RegressionCoefficientDistribution"]
    assert np.isfinite(float(mt.log_prob(jnp.asarray(b_true))))
    # predictive at a point
    pred = res.predictive_distribution(jnp.asarray([[0.3]]))
    assert pred.mean().shape == (1, 2)


def test_normal_conjugate_vs_quadrature(rng):
    y = rng.normal(size=6) * 2 + 1
    prior = d.NormalInverseGamma(mu0=0.5, lam=0.2, beta=0.3, nu=0.4)
    res = normal_conjugate_model(jnp.asarray(y), prior=prior)

    from oracle_utils import normal_nig_log_evidence_quadrature

    log_z = normal_nig_log_evidence_quadrature(
        y, mu0=0.5, lam=0.2, a_ig=0.4, scale_ig=0.3,
        mu_lo=-10, mu_hi=10, v_lo=1e-4, v_hi=120,
    )
    np.testing.assert_allclose(float(res.log_evidence), log_z, rtol=1e-6)
    # predictive matches ParameterMixture numerically (CP:132-142)
    t = res.posterior_predictive
    assert isinstance(t, d.StudentT)
    # central region only: the MC ParameterMixture marginalization is noisy
    # in the heavy StudentT tails
    xs = np.linspace(float(t.loc) - 1.5, float(t.loc) + 1.5, 7)
    pm = d.ParameterMixture(
        param_dist=d.InverseGamma(res.posterior.nu, res.posterior.beta),
        build=lambda v: d.Normal(
            res.posterior.mu0, jnp.sqrt(v * (1 + 1 / res.posterior.lam))
        ),
        num_quadrature=16384,
    )
    np.testing.assert_allclose(
        np.asarray(t.log_prob(jnp.asarray(xs))),
        np.asarray(pm.log_prob(jnp.asarray(xs))),
        atol=0.15,
    )


def test_normal_conjugate_sequential(rng):
    y = rng.normal(size=40)
    full = normal_conjugate_model(jnp.asarray(y))
    r1 = normal_conjugate_model(jnp.asarray(y[:15]))
    r2 = update_conjugate_model(r1, jnp.asarray(y[15:]))
    np.testing.assert_allclose(
        float(full.log_evidence), float(r2.log_evidence), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(full.posterior.mu0), float(r2.posterior.mu0), rtol=1e-10
    )


def test_multinormal_conjugate(rng):
    data = rng.multivariate_normal([1.0, -1.0], [[2.0, 0.5], [0.5, 1.0]], size=100)
    res = multinormal_conjugate_model(jnp.asarray(data))
    # posterior mean close to sample mean
    np.testing.assert_allclose(
        np.asarray(res.posterior.mu0), data.mean(0), atol=0.05
    )
    # sequential identity
    r1 = multinormal_conjugate_model(jnp.asarray(data[:40]))
    r2 = update_conjugate_model(r1, jnp.asarray(data[40:]))
    np.testing.assert_allclose(
        float(res.log_evidence), float(r2.log_evidence), rtol=1e-9
    )
    # predictive is a MultivariateT with sane covariance
    pred = res.posterior_predictive
    cov = np.asarray(pred.covariance())
    np.testing.assert_allclose(cov, [[2.0, 0.5], [0.5, 1.0]], rtol=0.35, atol=0.3)


def test_categorical_conjugate_model(key):
    """Dirichlet-Categorical: exact logZ vs the brute-force sum over the
    sequence likelihood integrated against the prior (small case), and
    the sequential-update accumulation identity."""
    import scipy.special as sps

    from bayesianinference_tpu.engines.conjugate import (
        categorical_conjugate_model,
        categorical_conjugate_model_from_counts,
        update_conjugate_model,
    )

    data = jnp.asarray([0, 1, 1, 2, 0, 1, 1, 1, 2, 0])
    r = categorical_conjugate_model(data, num_categories=3)

    # brute force: logZ = log integral prod p_i^{c_i} Dir(p | 1,1,1) dp
    #            = log B(1+c) - log B(1)
    c = np.asarray([3.0, 5.0, 2.0])
    a0 = np.ones(3)

    def log_beta(a):
        return sps.gammaln(a).sum() - sps.gammaln(a.sum())

    np.testing.assert_allclose(
        float(r.log_evidence), log_beta(a0 + c) - log_beta(a0), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(r.posterior.alpha), a0 + c)

    # posterior predictive: (alpha + c) / (sum alpha + n)
    probs = np.exp(
        np.asarray(
            r.posterior_predictive.log_prob(jnp.arange(3.0))
        )
    )
    np.testing.assert_allclose(probs, (a0 + c) / (a0 + c).sum(), rtol=1e-6)

    # counts entry point agrees
    r2 = categorical_conjugate_model_from_counts(jnp.asarray(c))
    np.testing.assert_allclose(
        float(r2.log_evidence), float(r.log_evidence), rtol=1e-12
    )

    # sequential updating accumulates the evidence exactly
    r_first = categorical_conjugate_model(data[:4], num_categories=3)
    r_seq = update_conjugate_model(r_first, data[4:])
    np.testing.assert_allclose(
        float(r_seq.log_evidence), float(r.log_evidence), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(r_seq.posterior.alpha), np.asarray(r.posterior.alpha)
    )

    # Monte-Carlo cross-check of the evidence
    rng = np.random.default_rng(0)
    ps = rng.dirichlet(a0, size=200_000)
    like = np.prod(ps**c, axis=1)
    mc = np.log(like.mean())
    np.testing.assert_allclose(float(r.log_evidence), mc, atol=0.05)


def test_categorical_conjugate_rejects_out_of_range_labels():
    import pytest

    from bayesianinference_tpu.engines.conjugate import (
        categorical_conjugate_model,
    )

    with pytest.raises(ValueError, match="integers in"):
        categorical_conjugate_model(
            jnp.asarray([0.0, 1.0, 7.0]), num_categories=3
        )
    with pytest.raises(ValueError, match="integers in"):
        categorical_conjugate_model(
            jnp.asarray([0.0, -1.0]), num_categories=3
        )
    with pytest.raises(ValueError, match="integers in"):
        categorical_conjugate_model(
            jnp.asarray([0.5, 1.0]), num_categories=3
        )
