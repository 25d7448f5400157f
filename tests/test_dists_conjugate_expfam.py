import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st
from scipy import integrate

from bayesianinference_tpu import dists as d


def test_nig_marginals_and_joint(key):
    nig = d.NormalInverseGamma(mu0=1.0, lam=2.0, beta=3.0, nu=2.5)
    # marginal variance: InverseGamma(nu, beta)
    v = np.linspace(0.3, 8, 11)
    np.testing.assert_allclose(
        np.asarray(nig.marginal_variance().log_prob(v)),
        st.invgamma(2.5, scale=3.0).logpdf(v),
        rtol=1e-9,
    )
    # marginal mean: StudentT(2 nu) located at mu0, scale sqrt(beta/(nu lam))
    m = np.linspace(-4, 6, 11)
    np.testing.assert_allclose(
        np.asarray(nig.marginal_mean().log_prob(m)),
        st.t(5.0, loc=1.0, scale=np.sqrt(3.0 / (2.5 * 2.0))).logpdf(m),
        rtol=1e-9,
    )
    # joint = conditional * marginal
    want = st.norm(1.0, np.sqrt(0.7 / 2.0)).logpdf(0.4) + st.invgamma(
        2.5, scale=3.0
    ).logpdf(0.7)
    np.testing.assert_allclose(float(nig.log_prob(0.4, 0.7)), want, rtol=1e-9)
    # marginal of sampled means must match the analytic StudentT
    mean_s, var_s = nig.sample(key, (300_000,))
    ref = st.t(5.0, loc=1.0, scale=np.sqrt(3.0 / (2.5 * 2.0)))
    np.testing.assert_allclose(np.mean(np.asarray(mean_s)), 1.0, atol=0.01)
    np.testing.assert_allclose(
        np.asarray(var_s).mean(), st.invgamma(2.5, scale=3.0).mean(), rtol=0.05
    )


def test_niw_marginals(key, rng):
    a = rng.normal(size=(3, 3))
    psi = a @ a.T + 3 * np.eye(3)
    niw = d.NormalInverseWishart(
        mu0=jnp.asarray([1.0, -1.0, 0.0]),
        lam=2.0,
        psi=jnp.asarray(psi),
        nu=6.0,
    )
    mean_s, cov_s = niw.sample(key, (50_000,))
    # E[Sigma] = psi / (nu - d - 1) = psi / 2
    np.testing.assert_allclose(
        np.asarray(cov_s).mean(0), psi / 2.0, rtol=0.1, atol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(mean_s).mean(0), [1.0, -1.0, 0.0], atol=0.05
    )
    # marginal mean matches the analytic MultivariateT
    mt = niw.marginal_mean()
    df = 6.0 - 3 + 1
    ref = st.multivariate_t([1.0, -1.0, 0.0], psi / (2.0 * df), df)
    x = rng.normal(size=(6, 3))
    np.testing.assert_allclose(
        np.asarray(mt.log_prob(jnp.asarray(x))), ref.logpdf(x), rtol=1e-9
    )
    # joint log_prob = MVN(mu | mu0, Sigma/lam) + IW(Sigma)
    sig = psi / 4.0
    mu = np.asarray([0.5, 0.0, -0.5])
    want = st.multivariate_normal([1.0, -1.0, 0.0], sig / 2.0).logpdf(
        mu
    ) + st.invwishart(6, psi).logpdf(sig)
    np.testing.assert_allclose(
        float(niw.log_prob(jnp.asarray(mu), jnp.asarray(sig))), want, rtol=1e-8
    )


def test_expfam_canonical_pdfs():
    # canonical log pdf must equal the standard parameterization's
    for fam, dist, std in [
        (d.EXPONENTIAL, st.expon(scale=1 / 1.7), (1.7,)),
        (d.NORMAL, st.norm(0.8, np.sqrt(2.2)), (0.8, 2.2)),
        (d.POISSON, st.poisson(3.1), (3.1,)),
        (d.LOG_NORMAL, st.lognorm(np.sqrt(0.5), scale=np.exp(0.4)), (0.4, 0.5)),
    ]:
        eta = fam.natural_parameters(*std)
        if fam.name == "Poisson":
            x = np.arange(0, 10, dtype=float)
            want = dist.logpmf(x.astype(int))
        else:
            x = np.linspace(0.1, 5, 17)
            want = dist.logpdf(x)
        got = np.asarray(fam.log_pdf(jnp.asarray(x), eta))
        np.testing.assert_allclose(got, want, rtol=1e-8, err_msg=fam.name)


def test_expfam_gamma_fixed_shape():
    fam = d.bind_gamma_shape(3.0)
    eta = fam.natural_parameters(3.0, 2.0)
    x = np.linspace(0.1, 6, 13)
    np.testing.assert_allclose(
        np.asarray(fam.log_pdf(jnp.asarray(x), eta)),
        st.gamma(3.0, scale=0.5).logpdf(x),
        rtol=1e-8,
    )


def test_expfam_conjugate_partition_vs_quadrature():
    """B(chi, nu) formulas vs direct numeric integration over eta."""
    # Exponential family: eta < 0 scalar
    fam = d.EXPONENTIAL
    chi, nu = jnp.asarray([4.0]), 3.0
    num, _ = integrate.quad(
        lambda e: np.exp(e * 4.0 + 3.0 * np.log(-e)), -np.inf, 0
    )
    np.testing.assert_allclose(
        float(fam.log_conjugate_partition(chi, nu)), np.log(num), rtol=1e-6
    )
    # Poisson: eta over R
    fam = d.POISSON
    chi, nu = jnp.asarray([5.0]), 2.0
    num, _ = integrate.quad(
        lambda e: np.exp(e * 5.0 - 2.0 * np.exp(e)), -50, 20
    )
    np.testing.assert_allclose(
        float(fam.log_conjugate_partition(chi, nu)), np.log(num), rtol=1e-6
    )
    # Normal: 2-D integral over (eta1, eta2<0)
    fam = d.NORMAL
    chi = jnp.asarray([3.0, 8.0])
    nu = 4.0

    def integrand(e2, e1):
        a = -(e1**2) / (4 * e2) - 0.5 * np.log(-2 * e2)
        return np.exp(e1 * 3.0 + e2 * 8.0 - nu * a)

    num, _ = integrate.dblquad(integrand, -20, 20, -60, -1e-6)
    np.testing.assert_allclose(
        float(fam.log_conjugate_partition(chi, float(nu))), np.log(num), rtol=1e-4
    )


def test_expfam_predictive_matches_direct(key):
    """Predictive via partition ratio == numeric marginalization (Poisson)."""
    fam = d.POISSON
    data = jnp.asarray([2.0, 4.0, 3.0])
    chi0, nu0 = jnp.asarray([1.0]), 1.0
    chi, nu = d.conjugate_update(fam, chi0, nu0, data)
    np.testing.assert_allclose(np.asarray(chi), [10.0])
    assert float(nu) == 4.0
    # predictive = NegBinomial: p(x) = C(x+chi-1, x) (nu/(nu+1))^chi (1/(nu+1))^x
    from scipy.special import gammaln

    x = np.arange(0, 12, dtype=float)
    got = np.asarray(fam.log_predictive_pdf(jnp.asarray(x), chi, nu))
    r, p = 10.0, 4.0 / 5.0
    want = (
        gammaln(x + r) - gammaln(r) - gammaln(x + 1)
        + r * np.log(p) + x * np.log(1 - p)
    )
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_empirical_and_kde(key, rng):
    pts = jnp.asarray(rng.normal(size=(500, 2)))
    lw = jnp.zeros(500)
    emp = d.Empirical(points=pts, log_weights=lw)
    np.testing.assert_allclose(
        np.asarray(emp.mean()), np.asarray(pts).mean(0), rtol=1e-10
    )
    s = emp.sample(key, (1000,))
    assert s.shape == (1000, 2)

    kde = d.GaussianKDE.fit(pts)
    lp = kde.log_prob(jnp.zeros((1, 2)))
    ref = st.gaussian_kde(np.asarray(pts).T)
    # silverman vs scott bandwidths differ slightly; just check plausibility
    assert np.isfinite(float(lp[0]))
    assert abs(float(lp[0]) - ref.logpdf(np.zeros((2, 1)))[0]) < 0.5


def test_parameter_mixture(key):
    pm = d.ParameterMixture(
        param_dist=d.Normal(0.0, 1.0),
        build=lambda th: d.Normal(th, 1.0),
        num_quadrature=4096,
    )
    # marginal is Normal(0, sqrt(2))
    x = np.linspace(-3, 3, 7)
    got = np.asarray(pm.log_prob(jnp.asarray(x)))
    want = st.norm(0, np.sqrt(2)).logpdf(x)
    np.testing.assert_allclose(got, want, atol=0.1)
    s = np.asarray(pm.sample(key, (100_000,)))
    np.testing.assert_allclose(s.std(), np.sqrt(2), rtol=0.02)


def test_expfam_gamma_and_inverse_gamma_canonical_pdfs():
    """The two remaining reference families (EF:176-189): canonical
    log-densities in natural coordinates must match scipy's standard
    parameterizations."""
    x = np.linspace(0.1, 6, 17)
    # GammaDistribution[k, theta] (shape/scale)
    fam = d.GAMMA
    eta = fam.natural_parameters(2.3, 1.7)
    np.testing.assert_allclose(
        np.asarray(fam.log_pdf(jnp.asarray(x), eta)),
        st.gamma(2.3, scale=1.7).logpdf(x),
        rtol=1e-8,
    )
    assert bool(fam.natural_parameter_support(eta))
    assert not bool(fam.natural_parameter_support(jnp.asarray([-1.5, -1.0])))
    # InverseGammaDistribution[a, b]
    fam = d.INVERSE_GAMMA
    eta = fam.natural_parameters(3.2, 1.4)
    np.testing.assert_allclose(
        np.asarray(fam.log_pdf(jnp.asarray(x), eta)),
        st.invgamma(3.2, scale=1.4).logpdf(x),
        rtol=1e-8,
    )
    assert bool(fam.natural_parameter_support(eta))
    assert not bool(fam.natural_parameter_support(jnp.asarray([-0.5, -1.0])))


def test_expfam_gamma_conjugate_update_and_quadrature_predictive():
    """No closed-form conjugate partition exists for the 2-parameter Gamma
    (the reference defines none, EF:176-181), so the normalized conjugate
    API must raise; the (chi, nu) update itself is exact, and the
    predictive built by numeric quadrature of the conjugate kernel over
    the natural-parameter region must integrate to 1 over x."""
    fam = d.GAMMA
    data = jnp.asarray([1.2, 0.7, 2.5])
    chi0, nu0 = jnp.asarray([0.5, 1.0]), 1.0
    chi, nu = d.conjugate_update(fam, chi0, nu0, data)
    np.testing.assert_allclose(
        np.asarray(chi),
        [0.5 + np.sum(np.log(np.asarray(data))), 1.0 + float(np.sum(data))],
        rtol=1e-12,
    )
    assert float(nu) == 4.0
    with pytest.raises(NotImplementedError):
        fam.log_conjugate_pdf(jnp.asarray([1.0, -1.0]), chi, nu)
    with pytest.raises(NotImplementedError):
        fam.log_predictive_pdf(1.0, chi, nu)

    from scipy.special import gammaln as _gammaln

    def kernel_integral(chi_, nu_):
        # pure-numpy conjugate kernel (same formula as fam.log_partition)
        # so each quadrature evaluation avoids a JAX dispatch
        c1, c2 = float(chi_[0]), float(chi_[1])

        def f(e2, e1):
            a = _gammaln(e1 + 1.0) - (e1 + 1.0) * np.log(-e2)
            return np.exp(e1 * c1 + e2 * c2 - nu_ * a)

        return integrate.dblquad(f, -0.95, 8.0, -30.0, -1e-3)[0]

    # spot-check the numpy kernel against the framework's
    np.testing.assert_allclose(
        float(
            fam.log_conjugate_kernel(jnp.asarray([1.0, -2.0]), chi, float(nu))
        ),
        1.0 * float(chi[0]) + (-2.0) * float(chi[1])
        - float(nu) * float(fam.log_partition(jnp.asarray([1.0, -2.0]))),
        rtol=1e-12,
    )

    denom = kernel_integral(np.asarray(chi), float(nu))

    def predictive(x):
        t = np.array([np.log(x), x])
        return kernel_integral(np.asarray(chi) + t, float(nu) + 1.0) / denom

    xs = np.linspace(1e-3, 12, 40)
    ys = np.asarray([predictive(float(v)) for v in xs])
    total = np.trapezoid(ys, xs)
    np.testing.assert_allclose(total, 1.0, rtol=2e-2)
