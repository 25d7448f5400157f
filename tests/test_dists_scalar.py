import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from bayesianinference_tpu.core import is_log_zero
from bayesianinference_tpu import dists as d

CASES = [
    (d.Normal(loc=1.5, scale=2.0), st.norm(1.5, 2.0), (-5, 8)),
    (d.Uniform(low=-1.0, high=3.0), st.uniform(-1.0, 4.0), (-0.9, 2.9)),
    (d.Exponential(rate=2.5), st.expon(scale=1 / 2.5), (0.01, 4)),
    (d.Gamma(a=3.0, rate=2.0), st.gamma(3.0, scale=1 / 2.0), (0.05, 6)),
    (d.InverseGamma(a=3.0, b=2.0), st.invgamma(3.0, scale=2.0), (0.05, 6)),
    (d.Beta(a=2.0, b=5.0), st.beta(2.0, 5.0), (0.01, 0.99)),
    (d.StudentT(df=4.0, loc=1.0, scale=2.0), st.t(4.0, 1.0, 2.0), (-8, 10)),
    (d.Cauchy(loc=0.5, scale=1.5), st.cauchy(0.5, 1.5), (-10, 10)),
    (d.HalfCauchy(scale=2.0), st.halfcauchy(scale=2.0), (0.01, 10)),
    (d.LogNormal(loc=0.3, scale=0.8), st.lognorm(0.8, scale=np.exp(0.3)), (0.05, 8)),
    (d.Laplace(loc=-1.0, scale=2.0), st.laplace(-1.0, 2.0), (-8, 6)),
    (d.Weibull(k=1.7, scale=2.0), st.weibull_min(1.7, scale=2.0), (0.05, 7)),
    (d.Logistic(loc=0.5, scale=1.2), st.logistic(0.5, 1.2), (-7, 8)),
    (d.ChiSquared(df=5.0), st.chi2(5.0), (0.1, 18)),
    (d.Gumbel(loc=1.0, scale=2.0), st.gumbel_r(1.0, 2.0), (-5, 12)),
    (d.Pareto(xmin=1.5, alpha=5.0), st.pareto(5.0, scale=1.5), (1.55, 12)),
]


@pytest.mark.parametrize("ours,ref,rng_", CASES, ids=lambda c: type(c).__name__)
def test_logpdf_vs_scipy(ours, ref, rng_):
    x = np.linspace(*rng_, 41)
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(x)), ref.logpdf(x), rtol=1e-8, atol=1e-10
    )


@pytest.mark.parametrize("ours,ref,rng_", CASES, ids=lambda c: type(c).__name__)
def test_cdf_vs_scipy(ours, ref, rng_):
    x = np.linspace(*rng_, 17)
    np.testing.assert_allclose(
        np.asarray(ours.cdf(x)), ref.cdf(x), rtol=1e-6, atol=1e-9
    )


@pytest.mark.parametrize("ours,ref,rng_", CASES, ids=lambda c: type(c).__name__)
def test_icdf_roundtrip(ours, ref, rng_):
    q = np.linspace(0.05, 0.95, 10)
    x = np.asarray(ours.icdf(jnp.asarray(q)))
    np.testing.assert_allclose(np.asarray(ours.cdf(x)), q, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("ours,ref,rng_", CASES, ids=lambda c: type(c).__name__)
def test_sampling_moments(ours, ref, rng_, key):
    if isinstance(ours, (d.Cauchy, d.HalfCauchy)):
        pytest.skip("no moments")
    s = np.asarray(ours.sample(key, (200_000,)))
    m_ref, v_ref = ref.stats()
    np.testing.assert_allclose(s.mean(), m_ref, rtol=0.05, atol=0.02)
    np.testing.assert_allclose(s.var(), v_ref, rtol=0.1, atol=0.05)


def test_out_of_support_is_logzero():
    assert bool(is_log_zero(d.Exponential(1.0).log_prob(-1.0)))
    assert bool(is_log_zero(d.Uniform(0.0, 1.0).log_prob(2.0)))
    assert bool(is_log_zero(d.Gamma(2.0, 1.0).log_prob(-0.5)))
    assert bool(is_log_zero(d.Beta(2.0, 2.0).log_prob(1.5)))


def test_poisson_logpmf():
    ref = st.poisson(3.5)
    x = np.arange(0, 15, dtype=float)
    ours = d.Poisson(rate=3.5)
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(x)), ref.logpmf(x.astype(int)), rtol=1e-9
    )
    assert bool(is_log_zero(ours.log_prob(2.5)))
    assert bool(is_log_zero(ours.log_prob(-1.0)))


def test_bernoulli_binomial():
    ref = st.binom(10, 0.3)
    x = np.arange(0, 11, dtype=float)
    ours = d.Binomial(n=10.0, p=0.3)
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(x)), ref.logpmf(x.astype(int)), rtol=1e-9
    )
    b = d.Bernoulli(p=0.2)
    np.testing.assert_allclose(float(b.log_prob(1.0)), np.log(0.2), rtol=1e-12)
    np.testing.assert_allclose(float(b.log_prob(0.0)), np.log(0.8), rtol=1e-12)
    bl = d.BernoulliLogits(logits=0.7)
    p = 1 / (1 + np.exp(-0.7))
    np.testing.assert_allclose(float(bl.log_prob(1.0)), np.log(p), rtol=1e-10)


def test_loguniform():
    lu = d.LogUniform(low=0.1, high=10.0)
    x = np.linspace(0.2, 9.0, 20)
    want = -np.log(x) - np.log(np.log(10.0 / 0.1))
    np.testing.assert_allclose(np.asarray(lu.log_prob(x)), want, rtol=1e-10)
    # integrates to 1
    xs = np.linspace(0.1, 10.0, 100_001)
    total = np.trapezoid(np.exp(np.asarray(lu.log_prob(xs))), xs)
    np.testing.assert_allclose(total, 1.0, rtol=1e-4)


def test_jit_vmap_compatible(key):
    dist = d.Normal(loc=0.0, scale=1.0)

    @jax.jit
    def f(dd, x):
        return dd.log_prob(x)

    x = jnp.linspace(-2, 2, 8)
    np.testing.assert_allclose(f(dist, x), np.asarray(dist.log_prob(x)))
    batched = jax.vmap(lambda mu: d.Normal(loc=mu, scale=1.0).log_prob(0.5))(
        jnp.arange(4.0)
    )
    assert batched.shape == (4,)


DISCRETE_CASES = [
    (d.NegativeBinomial(r=4.0, p=0.35), st.nbinom(4, 0.35)),
    (d.Geometric(p=0.3), st.geom(0.3, loc=-1)),  # scipy geom counts trials
]


@pytest.mark.parametrize("ours,ref", DISCRETE_CASES, ids=lambda c: type(c).__name__)
def test_discrete_logpmf_vs_scipy(ours, ref):
    x = np.arange(0, 25, dtype=float)
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(x)), ref.logpmf(x.astype(int)),
        rtol=1e-7, atol=1e-9,
    )
    # non-integer and negative arguments map to the log-zero sentinel
    assert bool(is_log_zero(ours.log_prob(2.5)))
    assert bool(is_log_zero(ours.log_prob(-1.0)))


@pytest.mark.parametrize("ours,ref", DISCRETE_CASES, ids=lambda c: type(c).__name__)
def test_discrete_sampling_moments(ours, ref, key):
    s = np.asarray(ours.sample(key, (200_000,)))
    m_ref, v_ref = ref.stats()
    np.testing.assert_allclose(s.mean(), m_ref, rtol=0.05)
    np.testing.assert_allclose(s.var(), v_ref, rtol=0.1)
    np.testing.assert_allclose(float(ours.mean()), m_ref, rtol=1e-9)
    np.testing.assert_allclose(float(ours.variance()), v_ref, rtol=1e-9)
