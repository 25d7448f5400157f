"""SVGP (ops/svgp.py + engines/svgp.py).

Oracles: (1) the ELBO must LOWER-BOUND the exact marginal (tensor
Gauss-Hermite at n=3) and, optimized with M = n inducing at the data,
approach it; (2) the whitened KL must match the dense closed form;
(3) latent moments must match explicit dense algebra; (4) the
full-batch fit must agree with the exact Laplace/EP bridge predictions
on a small problem; (5) minibatch ELBO estimates must be unbiased for
the full-batch ELBO.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu.engines.svgp import (
    fit_svgp,
    predict_from_svgp,
)
from bayesianinference_tpu.ops.gp_kernels import covariance_matrix, se_kernel
from bayesianinference_tpu.ops.gp_laplace import bernoulli_logit_likelihood
from bayesianinference_tpu.ops.svgp import (
    SVGPVariational,
    svgp_elbo,
    svgp_init_variational,
    svgp_kl,
    svgp_latent_moments,
)


def _toy(n=30, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-3, 3, size=(n, 1)), axis=0)
    p = 1 / (1 + np.exp(-3.0 * np.sin(1.5 * x[:, 0])))
    y = (rng.uniform(size=n) < p).astype(float)
    return jnp.asarray(x), jnp.asarray(y)


def test_kl_matches_dense_closed_form():
    rng = np.random.default_rng(1)
    m_dim = 6
    raw = jnp.asarray(rng.normal(size=(m_dim, m_dim)))
    mvec = jnp.asarray(rng.normal(size=m_dim))
    var = SVGPVariational(m=mvec, raw_scale=raw)
    got = float(svgp_kl(var))
    # dense KL(N(m, LL^T) || N(0, I))
    l = np.tril(np.asarray(raw), -1) + np.diag(
        np.log1p(np.exp(np.diagonal(np.asarray(raw))))
    )
    s = l @ l.T
    ref = 0.5 * (
        np.trace(s) + mvec @ mvec - m_dim - np.linalg.slogdet(s)[1]
    )
    np.testing.assert_allclose(got, float(ref), rtol=1e-10)


def test_latent_moments_match_dense_algebra():
    rng = np.random.default_rng(2)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, size=(9, 1)), axis=0))
    z = jnp.asarray(np.linspace(-2, 2, 4)[:, None])
    kern = se_kernel(1.5, 0.8)
    m_dim = 4
    raw = jnp.asarray(rng.normal(size=(m_dim, m_dim)) * 0.3)
    mvec = jnp.asarray(rng.normal(size=m_dim))
    var = SVGPVariational(m=mvec, raw_scale=raw)
    mu, s2 = svgp_latent_moments(kern, x, z, var, jitter=1e-8)
    # dense reference (jitter is RELATIVE to the mean prior variance)
    kzz_raw = np.asarray(kern.matrix(z, z))
    kzz = kzz_raw + 1e-8 * np.mean(np.diagonal(kzz_raw)) * np.eye(4)
    kzx = np.asarray(kern.matrix(z, x))
    lzz = np.linalg.cholesky(kzz)
    a = np.linalg.solve(lzz, kzx)
    lv = np.tril(np.asarray(raw), -1) + np.diag(
        np.log1p(np.exp(np.diagonal(np.asarray(raw))))
    )
    np.testing.assert_allclose(np.asarray(mu), a.T @ np.asarray(mvec),
                               atol=1e-10)
    ref_s2 = (
        np.asarray(kern.diag(x))
        - np.sum(a * a, axis=0)
        + np.sum((lv.T @ a) ** 2, axis=0)
    )
    np.testing.assert_allclose(np.asarray(s2), ref_s2, atol=1e-10)


def test_elbo_lower_bounds_exact_marginal_and_tightens():
    """n=3, M=3 inducing AT the data: the optimized ELBO must sit below
    the exact marginal and get within 0.05 nats of it."""
    from tests.test_gp_ep import _exact_logz_gh

    lik = bernoulli_logit_likelihood()
    x = jnp.asarray([[-1.0], [0.2], [1.4]])
    y = jnp.asarray([0.0, 1.0, 1.0])
    k = covariance_matrix(se_kernel(1.5, 1.0), x, 1e-8)
    exact = _exact_logz_gh(k, y, lik)
    fit = fit_svgp(
        x, y, lambda th: se_kernel(1.5, 1.0), [("dummy", 0.5, 2.0)],
        likelihood="bernoulli_logit", inducing=np.asarray(x),
        optimize_inducing=False, steps=1500, learning_rate=0.03,
        jitter=1e-8, num_quad_points=40,
    )
    elbo = float(fit.elbo)
    assert elbo <= exact + 1e-3, (elbo, exact)
    assert exact - elbo < 0.05, (elbo, exact)


def test_fit_matches_laplace_bridge_predictions():
    x, y = _toy(n=40, seed=3)
    fit = fit_svgp(
        x, y, lambda th: se_kernel(th[0] ** 2, th[1]),
        [("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
        inducing=12, steps=400, learning_rate=0.05,
    )
    assert np.all(np.isfinite(np.asarray(fit.elbo_trace)))
    xq = jnp.asarray(np.linspace(-3, 3, 21)[:, None])
    p_svgp, mu, sd = predict_from_svgp(fit, xq)
    assert np.all((np.asarray(p_svgp) >= 0) & (np.asarray(p_svgp) <= 1))
    # reference: exact Laplace bridge at the SVGP's fitted theta
    from bayesianinference_tpu.engines.gp_classify import (
        define_gp_classifier,
        predict_from_gp_classifier,
    )

    prob = define_gp_classifier(
        np.asarray(x), np.asarray(y),
        lambda th: se_kernel(th[0] ** 2, th[1]),
        parameters=[("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
        validate=False,
    )
    p_ref = predict_from_gp_classifier(fit.theta, prob, np.asarray(xq))
    np.testing.assert_allclose(
        np.asarray(p_svgp), np.asarray(p_ref.mean), atol=0.08
    )


def test_minibatch_elbo_unbiased_and_fit_consistent():
    x, y = _toy(n=60, seed=4)
    kern = se_kernel(2.0, 1.0)
    lik = bernoulli_logit_likelihood()
    z = jnp.asarray(np.linspace(-3, 3, 8)[:, None])
    var = svgp_init_variational(8, x.dtype)
    full = float(svgp_elbo(kern, x, y, z, lik, var))
    # average of per-batch scaled ELBOs over a disjoint partition equals
    # the full ELBO up to the KL (which is identical in each term):
    # E[scaled ell] = full ell, so mean of batch elbos = full elbo
    batches = [slice(0, 20), slice(20, 40), slice(40, 60)]
    vals = [
        float(
            svgp_elbo(kern, x[b], y[b], z, lik, var, data_scale=3.0)
        )
        for b in batches
    ]
    np.testing.assert_allclose(np.mean(vals), full, rtol=1e-10)
    # stochastic fit converges to the same neighborhood as full batch
    fit_fb = fit_svgp(
        x, y, lambda th: se_kernel(th[0] ** 2, th[1]),
        [("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
        inducing=8, steps=300, learning_rate=0.05,
        key=jax.random.PRNGKey(1),
    )
    fit_mb = fit_svgp(
        x, y, lambda th: se_kernel(th[0] ** 2, th[1]),
        [("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
        inducing=8, steps=900, learning_rate=0.05, minibatch=20,
        key=jax.random.PRNGKey(1),
    )
    assert abs(float(fit_fb.elbo) - float(fit_mb.elbo)) < 2.0
    xq = jnp.asarray(np.linspace(-3, 3, 15)[:, None])
    p_fb, _, _ = predict_from_svgp(fit_fb, xq)
    p_mb, _, _ = predict_from_svgp(fit_mb, xq)
    np.testing.assert_allclose(np.asarray(p_fb), np.asarray(p_mb), atol=0.15)


def test_sharded_fit_matches_single_device():
    """8-device CPU mesh: the data-sharded ELBO program must reproduce
    the single-device fit exactly (same init, same full-batch steps)."""
    from bayesianinference_tpu.parallel.sharding import make_mesh

    x, y = _toy(n=50, seed=5)  # 50 pads to 56 over 8 shards
    mesh = make_mesh(("data",))
    kwargs = dict(
        likelihood="bernoulli_logit", inducing=8, steps=120,
        learning_rate=0.05, key=jax.random.PRNGKey(2),
    )
    fit_1 = fit_svgp(x, y, lambda th: se_kernel(th[0] ** 2, th[1]),
                     [("amp", 0.05, 10.0), ("ls", 0.1, 5.0)], **kwargs)
    fit_8 = fit_svgp(x, y, lambda th: se_kernel(th[0] ** 2, th[1]),
                     [("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
                     mesh=mesh, **kwargs)
    np.testing.assert_allclose(
        float(fit_8.elbo), float(fit_1.elbo), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(fit_8.theta), np.asarray(fit_1.theta), rtol=1e-6
    )
    xq = jnp.asarray(np.linspace(-3, 3, 9)[:, None])
    p1, _, _ = predict_from_svgp(fit_1, xq)
    p8, _, _ = predict_from_svgp(fit_8, xq)
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-6)
    with pytest.raises(ValueError, match="mutually exclusive"):
        fit_svgp(x, y, lambda th: se_kernel(1.0, th[0]),
                 [("ls", 0.1, 5.0)], mesh=mesh, minibatch=10)


def test_multiclass_moments_and_kl_reduce_to_per_class():
    """The shared-kernel multiclass moments must equal per-class calls
    of the single-latent function; the summed KL likewise."""
    from bayesianinference_tpu.ops.svgp import (
        svgp_multiclass_latent_moments,
    )

    rng = np.random.default_rng(6)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, size=(7, 1)), axis=0))
    z = jnp.asarray(np.linspace(-2, 2, 4)[:, None])
    kern = se_kernel(1.3, 0.9)
    c, m_dim = 3, 4
    m_all = jnp.asarray(rng.normal(size=(c, m_dim)))
    raw_all = jnp.asarray(rng.normal(size=(c, m_dim, m_dim)) * 0.4)
    mu, s2 = svgp_multiclass_latent_moments(kern, x, z, m_all, raw_all,
                                            jitter=1e-8)
    for ci in range(c):
        var = SVGPVariational(m=m_all[ci], raw_scale=raw_all[ci])
        mu_c, s2_c = svgp_latent_moments(kern, x, z, var, jitter=1e-8)
        np.testing.assert_allclose(np.asarray(mu[:, ci]), np.asarray(mu_c),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(s2[:, ci]), np.asarray(s2_c),
                                   atol=1e-12)


def test_multiclass_fit_separable_three_classes():
    from bayesianinference_tpu.engines.svgp import (
        fit_svgp_multiclass,
        predict_from_svgp_multiclass,
    )

    rng = np.random.default_rng(7)
    n = 150
    x = rng.uniform(-3, 3, size=(n, 2))
    # three angular sectors -> labels with a little noise
    ang = np.arctan2(x[:, 1], x[:, 0])
    y = np.digitize(ang, [-np.pi / 3, np.pi / 3])
    flip = rng.uniform(size=n) < 0.05
    y[flip] = rng.integers(0, 3, size=int(flip.sum()))
    fit = fit_svgp_multiclass(
        x, y, lambda th: se_kernel(th[0] ** 2, th[1]),
        [("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
        inducing=16, steps=400, learning_rate=0.05, num_mc=8,
        key=jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(fit.elbo))
    assert fit.num_classes == 3
    probs, mu, sd = predict_from_svgp_multiclass(fit, x, num_mc=256)
    probs = np.asarray(probs)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-6)
    acc = float(np.mean(np.argmax(probs, axis=-1) == y))
    assert acc > 0.85, acc
    # minibatch path runs and stays finite
    fit_mb = fit_svgp_multiclass(
        x, y, lambda th: se_kernel(th[0] ** 2, th[1]),
        [("amp", 0.05, 10.0), ("ls", 0.1, 5.0)],
        inducing=16, steps=300, learning_rate=0.05, minibatch=50,
        key=jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(fit_mb.elbo))


def test_multiclass_two_class_agrees_with_binary_svgp():
    """C=2 softmax is a reparameterization of Bernoulli-logit on the
    latent DIFFERENCE — trained predictions must agree closely."""
    from bayesianinference_tpu.engines.svgp import (
        fit_svgp_multiclass,
        predict_from_svgp_multiclass,
    )

    x, y = _toy(n=60, seed=8)
    labels = np.asarray(y).astype(int)
    kwargs = dict(inducing=10, steps=500, learning_rate=0.05,
                  key=jax.random.PRNGKey(2))
    fit_bin = fit_svgp(x, y, lambda th: se_kernel(th[0] ** 2, th[1]),
                       [("amp", 0.05, 10.0), ("ls", 0.1, 5.0)], **kwargs)
    fit_mc = fit_svgp_multiclass(
        x, labels, lambda th: se_kernel(th[0] ** 2, th[1]),
        [("amp", 0.05, 10.0), ("ls", 0.1, 5.0)], num_mc=16, **kwargs)
    xq = jnp.asarray(np.linspace(-3, 3, 13)[:, None])
    p_bin, _, _ = predict_from_svgp(fit_bin, xq)
    probs, _, _ = predict_from_svgp_multiclass(fit_mc, xq, num_mc=1024)
    np.testing.assert_allclose(
        np.asarray(probs[:, 1]), np.asarray(p_bin), atol=0.12
    )


def test_hetero_expected_loglik_closed_form_vs_mc():
    """The closed-form E[log N(y; f, e^2g)] must match a Monte-Carlo
    estimate over (f, g) draws."""
    from bayesianinference_tpu.ops.svgp import svgp_hetero_elbo

    rng = np.random.default_rng(9)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, size=(6, 1)), axis=0))
    z = jnp.asarray(np.linspace(-2, 2, 3)[:, None])
    y = jnp.asarray(rng.normal(size=6))
    kern_f, kern_g = se_kernel(1.5, 0.8), se_kernel(0.7, 1.2)
    vf = SVGPVariational(
        m=jnp.asarray(rng.normal(size=3)),
        raw_scale=jnp.asarray(rng.normal(size=(3, 3)) * 0.3),
    )
    vg = SVGPVariational(
        m=jnp.asarray(rng.normal(size=3) * 0.3),
        raw_scale=jnp.asarray(rng.normal(size=(3, 3)) * 0.2),
    )
    elbo = float(
        svgp_hetero_elbo(kern_f, kern_g, x, y, z, vf, vg, jitter=1e-8)
    )
    # MC: draw latent marginals, average log N(y; f, e^{2g})
    mu_f, s2_f = svgp_latent_moments(kern_f, x, z, vf, jitter=1e-8)
    mu_g, s2_g = svgp_latent_moments(kern_g, x, z, vg, jitter=1e-8)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    nmc = 400_000
    f = mu_f + jnp.sqrt(s2_f) * jax.random.normal(k1, (nmc, 6))
    g = mu_g + jnp.sqrt(s2_g) * jax.random.normal(k2, (nmc, 6))
    ll = -0.5 * jnp.log(2 * jnp.pi) - g - 0.5 * (y - f) ** 2 / jnp.exp(
        2 * g
    )
    mc_ell = float(jnp.sum(jnp.mean(ll, axis=0)))
    kl = float(svgp_kl(vf)) + float(svgp_kl(vg))
    np.testing.assert_allclose(elbo, mc_ell - kl, rtol=2e-3)


def test_hetero_fit_recovers_noise_profile():
    from bayesianinference_tpu.engines.svgp import (
        fit_svgp_heteroscedastic,
        predict_from_svgp_heteroscedastic,
    )

    rng = np.random.default_rng(10)
    n = 300
    x = np.sort(rng.uniform(-3, 3, size=(n, 1)), axis=0)
    f_true = np.sin(1.2 * x[:, 0])
    sd_true = 0.05 + 0.5 * (1 + np.tanh(x[:, 0]))  # rises left to right
    y = f_true + sd_true * rng.normal(size=n)
    fit = fit_svgp_heteroscedastic(
        x, y,
        lambda th: se_kernel(th[0] ** 2, th[1]),
        lambda th: se_kernel(th[2] ** 2, th[3]),
        [("amp_f", 0.05, 10.0), ("ls_f", 0.1, 5.0),
         ("amp_g", 0.05, 5.0), ("ls_g", 0.3, 5.0)],
        inducing=20, steps=800, learning_rate=0.03,
        key=jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(fit.elbo))
    mean, total_sd, noise_sd, latent_sd = predict_from_svgp_heteroscedastic(
        fit, x
    )
    # mean tracks the function, noise profile tracks the truth
    assert np.corrcoef(np.asarray(mean), f_true)[0, 1] > 0.95
    assert np.corrcoef(np.asarray(noise_sd), sd_true)[0, 1] > 0.8
    # the noise estimate is quantitatively right at both ends
    left, right = np.asarray(noise_sd)[:30], np.asarray(noise_sd)[-30:]
    assert left.mean() < 0.35 and 0.6 < right.mean() < 1.6
    # total >= latent-only width
    assert np.all(np.asarray(total_sd) >= np.asarray(latent_sd))
    # minibatch path stays finite
    fit_mb = fit_svgp_heteroscedastic(
        x, y,
        lambda th: se_kernel(th[0] ** 2, th[1]),
        lambda th: se_kernel(th[2] ** 2, th[3]),
        [("amp_f", 0.05, 10.0), ("ls_f", 0.1, 5.0),
         ("amp_g", 0.05, 5.0), ("ls_g", 0.3, 5.0)],
        inducing=20, steps=400, learning_rate=0.03, minibatch=100,
        key=jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(fit_mb.elbo))


def test_multiclass_validation():
    from bayesianinference_tpu.engines.svgp import fit_svgp_multiclass

    x = np.zeros((4, 1))
    with pytest.raises(ValueError, match="labels must lie"):
        fit_svgp_multiclass(x, np.asarray([0, 1, 5, 2]),
                            lambda th: se_kernel(1.0, th[0]),
                            [("ls", 0.1, 5.0)], num_classes=3, steps=1)
    with pytest.raises(ValueError, match="at least 2"):
        fit_svgp_multiclass(x, np.zeros(4, int),
                            lambda th: se_kernel(1.0, th[0]),
                            [("ls", 0.1, 5.0)], steps=1)


def test_validation_errors():
    x, y = _toy(n=10)
    with pytest.raises(ValueError, match="unknown likelihood"):
        fit_svgp(x, y, lambda th: se_kernel(1.0, th[0]),
                 [("ls", 0.1, 5.0)], likelihood="nope")
    with pytest.raises(ValueError, match="minibatch"):
        fit_svgp(x, y, lambda th: se_kernel(1.0, th[0]),
                 [("ls", 0.1, 5.0)], minibatch=99)
