import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.core import is_log_zero


def test_product_logpdf_and_support(key):
    p = d.Product((d.Normal(0.0, 1.0), d.Uniform(-1.0, 2.0), d.Exponential(2.0)))
    x = jnp.asarray([0.5, 0.0, 1.0])
    want = (
        st.norm(0, 1).logpdf(0.5)
        + st.uniform(-1, 3).logpdf(0.0)
        + st.expon(scale=0.5).logpdf(1.0)
    )
    np.testing.assert_allclose(float(p.log_prob(x)), want, rtol=1e-10)
    lo, hi = p.support()
    np.testing.assert_allclose(np.asarray(lo), [-np.inf, -1.0, 0.0])
    np.testing.assert_allclose(np.asarray(hi), [np.inf, 2.0, np.inf])
    s = p.sample(key, (5000,))
    assert s.shape == (5000, 3)
    assert bool(is_log_zero(p.log_prob(jnp.asarray([0.0, 5.0, 1.0]))))
    # batched evaluation
    xs = jnp.zeros((7, 3)) + x
    assert p.log_prob(xs).shape == (7,)


def test_product_is_pytree():
    p = d.Product((d.Normal(0.0, 1.0), d.Uniform(-1.0, 2.0)))
    leaves = jax.tree_util.tree_leaves(p)
    assert len(leaves) == 4

    @jax.jit
    def f(dist, x):
        return dist.log_prob(x)

    assert np.isfinite(float(f(p, jnp.asarray([0.0, 0.0]))))


def test_truncated_normal(key):
    tn = d.Truncated(d.Normal(1.0, 2.0), low=0.0, high=3.0)
    ref = st.truncnorm((0 - 1) / 2, (3 - 1) / 2, loc=1, scale=2)
    x = np.linspace(0.05, 2.95, 21)
    np.testing.assert_allclose(np.asarray(tn.log_prob(x)), ref.logpdf(x), rtol=1e-9)
    assert bool(is_log_zero(tn.log_prob(-0.5)))
    assert bool(is_log_zero(tn.log_prob(3.5)))
    s = np.asarray(tn.sample(key, (100_000,)))
    assert s.min() >= 0 and s.max() <= 3
    np.testing.assert_allclose(s.mean(), ref.mean(), atol=0.01)


def test_truncated_without_closed_icdf(key):
    """Gamma has no closed icdf — exercises the bisection fallback."""
    tg = d.Truncated(d.Gamma(3.0, 2.0), low=0.5, high=4.0)
    s = np.asarray(tg.sample(key, (50_000,)))
    assert s.min() >= 0.5 and s.max() <= 4.0
    # moment check vs scipy truncated gamma via normalization
    g = st.gamma(3.0, scale=0.5)
    z = g.cdf(4.0) - g.cdf(0.5)
    xs = np.linspace(0.5, 4.0, 20_001)
    want_mean = np.trapezoid(xs * g.pdf(xs) / z, xs)
    np.testing.assert_allclose(s.mean(), want_mean, rtol=0.02)


def test_mixture_scalar(key):
    mix = d.Mixture(
        log_weights=jnp.log(jnp.asarray([0.3, 0.7])),
        component=d.Normal(loc=jnp.asarray([-2.0, 3.0]), scale=jnp.asarray([1.0, 0.5])),
    )
    x = np.linspace(-6, 6, 31)
    want = np.log(
        0.3 * st.norm(-2, 1).pdf(x) + 0.7 * st.norm(3, 0.5).pdf(x)
    )
    np.testing.assert_allclose(np.asarray(mix.log_prob(x)), want, rtol=1e-8)
    np.testing.assert_allclose(
        float(mix.mean()), 0.3 * -2 + 0.7 * 3, rtol=1e-10
    )
    want_var = 0.3 * (1 + 4) + 0.7 * (0.25 + 9) - (0.3 * -2 + 0.7 * 3) ** 2
    np.testing.assert_allclose(float(mix.variance()), want_var, rtol=1e-10)
    s = np.asarray(mix.sample(key, (100_000,)))
    np.testing.assert_allclose(s.mean(), float(mix.mean()), atol=0.02)
    # cdf
    np.testing.assert_allclose(
        np.asarray(mix.cdf(x)),
        0.3 * st.norm(-2, 1).cdf(x) + 0.7 * st.norm(3, 0.5).cdf(x),
        rtol=1e-8,
    )


def test_mixture_multivariate(key):
    locs = jnp.asarray([[0.0, 0.0], [4.0, 4.0]])
    covs = jnp.stack([jnp.eye(2), 0.5 * jnp.eye(2)])
    mix = d.Mixture(
        log_weights=jnp.log(jnp.asarray([0.5, 0.5])),
        component=d.MultivariateNormal(mean_=locs, cov=covs),
    )
    x = np.asarray([[0.0, 0.0], [4.0, 4.0], [2.0, 2.0]])
    want = np.log(
        0.5 * st.multivariate_normal([0, 0], np.eye(2)).pdf(x)
        + 0.5 * st.multivariate_normal([4, 4], 0.5 * np.eye(2)).pdf(x)
    )
    got = np.asarray(mix.log_prob(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-8)
    s = mix.sample(key, (200,))
    assert s.shape == (200, 2)


def test_conditional_product():
    # var ~ InverseGamma(3, 2); x | var ~ Normal(0, sqrt(var))
    cp = d.ConditionalProduct(
        [
            ("var", lambda _: d.InverseGamma(3.0, 2.0)),
            ("x", lambda v: d.Normal(0.0, jnp.sqrt(v["var"]))),
        ]
    )
    vals = {"var": jnp.asarray(0.7), "x": jnp.asarray(0.3)}
    want = st.invgamma(3.0, scale=2.0).logpdf(0.7) + st.norm(
        0, np.sqrt(0.7)
    ).logpdf(0.3)
    np.testing.assert_allclose(float(cp.log_prob(vals)), want, rtol=1e-10)
    s = cp.sample(jax.random.PRNGKey(1), (1000,))
    assert s["var"].shape == (1000,) and s["x"].shape == (1000,)
    assert (np.asarray(s["var"]) > 0).all()
    edges = cp.graph()
    assert ("var", "x") in edges


def test_improper_uniform():
    iu = d.ImproperUniform(dim=3)
    assert float(iu.log_prob(jnp.zeros(3))) == 0.0
    assert iu.log_prob(jnp.zeros((5, 3))).shape == (5,)


def test_mixture_quantile_roundtrip():
    """Mixture quantiles (SURVEY hard-part 6: the plotting percentile
    bands) round-trip through the mixture CDF."""
    mix = d.Mixture(
        log_weights=jnp.log(jnp.asarray([0.3, 0.7])),
        component=d.Normal(
            loc=jnp.asarray([-1.0, 2.0]), scale=jnp.asarray([0.5, 1.0])
        ),
    )
    q = jnp.asarray([0.05, 0.5, 0.95])
    x = mix.quantile(q)
    np.testing.assert_allclose(np.asarray(mix.cdf(x)), np.asarray(q), atol=1e-9)
    assert np.all(np.diff(np.asarray(x)) > 0)


class TestCensored:
    """Censored (Tobit) combinator: masses at the bounds, density inside."""

    def test_log_prob_matches_manual_normal(self):
        from scipy.stats import norm

        from bayesianinference_tpu.dists import Censored, Normal

        c = Censored(Normal(0.5, 1.2), low=-1.0, high=2.0)
        # interior = base density
        np.testing.assert_allclose(
            float(c.log_prob(jnp.asarray(0.3))),
            norm.logpdf(0.3, 0.5, 1.2),
            rtol=1e-12,
        )
        # bound masses = tail probabilities
        np.testing.assert_allclose(
            float(c.log_prob(jnp.asarray(-1.0))),
            norm.logcdf(-1.0, 0.5, 1.2),
            rtol=1e-7,
        )
        np.testing.assert_allclose(
            float(c.log_prob(jnp.asarray(2.0))),
            norm.logsf(2.0, 0.5, 1.2),
            rtol=1e-7,
        )
        # total mass: masses + interior integral = 1
        from scipy.integrate import quad

        interior, _ = quad(lambda t: norm.pdf(t, 0.5, 1.2), -1.0, 2.0)
        total = (
            np.exp(float(c.log_prob(jnp.asarray(-1.0))))
            + interior
            + np.exp(float(c.log_prob(jnp.asarray(2.0))))
        )
        np.testing.assert_allclose(total, 1.0, rtol=1e-9)
        # outside [low, high] -> sentinel
        from bayesianinference_tpu.core.numerics import is_log_zero

        assert bool(is_log_zero(c.log_prob(jnp.asarray(2.5))))

    def test_sampling_piles_mass_on_bounds(self):
        from bayesianinference_tpu.dists import Censored, Normal

        c = Censored(Normal(0.0, 1.0), low=-0.5, high=1.0)
        s = np.asarray(c.sample(jax.random.PRNGKey(0), (200_000,)))
        from scipy.stats import norm

        np.testing.assert_allclose(
            (s == -0.5).mean(), norm.cdf(-0.5), atol=0.005
        )
        np.testing.assert_allclose(
            (s == 1.0).mean(), norm.sf(1.0), atol=0.005
        )
        assert np.all((s >= -0.5) & (s <= 1.0))
        # cdf: jumps at the bounds, base cdf inside
        np.testing.assert_allclose(
            float(c.cdf(jnp.asarray(-0.5))), norm.cdf(-0.5), rtol=1e-6
        )
        assert float(c.cdf(jnp.asarray(-0.51))) == 0.0
        assert float(c.cdf(jnp.asarray(1.0))) == 1.0

    def test_tobit_regression_recovers_slope(self):
        """Top-coded linear data: the censored likelihood recovers the
        slope where a naive Gaussian fit is biased low."""
        import numpy as np

        from bayesianinference_tpu.dists import Censored, Normal
        from bayesianinference_tpu.engines.laplace import (
            laplace_posterior_fit,
        )
        from bayesianinference_tpu.models import define_inference_problem

        rng = np.random.default_rng(0)
        n = 300
        x = jnp.asarray(rng.uniform(-2, 2, size=n))
        y_lat = 1.4 * np.asarray(x) + 0.3 + 0.4 * rng.normal(size=n)
        cap = 1.0
        y = jnp.asarray(np.minimum(y_lat, cap))  # top-coded at 1.0

        def make(censored):
            def ll(th):
                base = Normal(th[0] * x + th[1], th[2])
                d = (
                    Censored(base, high=cap)
                    if censored
                    else base
                )
                return jnp.sum(d.log_prob(y))

            return define_inference_problem(
                parameters=[
                    ("a", -5.0, 5.0), ("b", -5.0, 5.0), ("s", 0.05, 3.0)
                ],
                log_likelihood=ll,
                prior_distribution=["location", "location", "scale"],
                validate=False,
            )

        fit_c = laplace_posterior_fit(
            problem=make(True), key=jax.random.PRNGKey(1)
        )
        fit_n = laplace_posterior_fit(
            problem=make(False), key=jax.random.PRNGKey(1)
        )
        a_c, a_n = float(fit_c.mean[0]), float(fit_n.mean[0])
        assert abs(a_c - 1.4) < 0.1, a_c
        assert abs(a_c - 1.4) < abs(a_n - 1.4), (a_c, a_n)
