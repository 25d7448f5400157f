import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import logsumexp as sp_logsumexp

from bayesianinference_tpu.core import (
    is_log_zero,
    log1mexp,
    log_zero,
    logaddexp,
    logmeanexp,
    logsubexp,
    logsumexp,
    xlogx,
    xlogy,
)


def test_logsumexp_matches_scipy(rng):
    a = rng.normal(size=(50,)) * 10
    np.testing.assert_allclose(logsumexp(a), sp_logsumexp(a), rtol=1e-12)


def test_logsumexp_axis_and_weights(rng):
    a = rng.normal(size=(4, 7))
    b = rng.uniform(0.1, 2.0, size=(4, 7))
    got = logsumexp(a, axis=1, b=b)
    want = sp_logsumexp(a, axis=1, b=b)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_logsumexp_all_logzero():
    lz = float(log_zero(jnp.float64))
    out = logsumexp(jnp.array([lz, lz, lz]))
    assert bool(is_log_zero(out))
    assert np.isfinite(out)


def test_logsumexp_with_some_logzero(rng):
    lz = float(log_zero(jnp.float64))
    a = np.array([0.0, lz, 1.0])
    want = sp_logsumexp([0.0, 1.0])
    np.testing.assert_allclose(logsumexp(a), want, rtol=1e-12)


def test_logaddexp():
    np.testing.assert_allclose(
        logaddexp(jnp.log(2.0), jnp.log(3.0)), np.log(5.0), rtol=1e-12
    )


def test_logsubexp():
    got = logsubexp(jnp.log(5.0), jnp.log(3.0))
    np.testing.assert_allclose(got, np.log(2.0), rtol=1e-10)
    # y <= x gives log-zero, not NaN
    assert bool(is_log_zero(logsubexp(jnp.log(2.0), jnp.log(3.0))))


def test_log1mexp():
    x = jnp.array([-1e-8, -0.1, -1.0, -50.0])
    want = np.log1p(-np.exp(np.asarray(x)))
    np.testing.assert_allclose(log1mexp(x), want, rtol=1e-6)


def test_logmeanexp(rng):
    a = rng.normal(size=(100,))
    np.testing.assert_allclose(
        logmeanexp(a), sp_logsumexp(a) - np.log(100), rtol=1e-12
    )


def test_xlogx_xlogy():
    assert float(xlogx(0.0)) == 0.0
    np.testing.assert_allclose(xlogx(2.0), 2 * np.log(2.0), rtol=1e-12)
    assert float(xlogy(0.0, 0.0)) == 0.0
    assert np.isfinite(float(xlogy(0.0, -1.0)))
    np.testing.assert_allclose(xlogy(3.0, 2.0), 3 * np.log(2.0), rtol=1e-12)


def test_grad_safety():
    import jax

    # gradient through guarded ops at the boundary must not be NaN
    g = jax.grad(lambda x: xlogx(x))(0.0)
    assert np.isfinite(g)


def test_take_posterior_fraction(rng):
    import jax.numpy as jnp
    from bayesianinference_tpu.core import (
        WeightedSamples,
        is_log_zero,
        take_posterior_fraction,
    )

    pts = jnp.asarray(rng.normal(size=(100, 2)))
    lw = jnp.asarray(rng.normal(size=100))
    ws = WeightedSamples(points=pts, log_weights=lw)
    ws2 = take_posterior_fraction(ws, 0.5)
    kept = ~np.asarray(is_log_zero(ws2.log_weights))
    w = np.asarray(ws.normalized_weights())
    # kept samples are exactly the top-weight ones covering >= 50% mass
    order = np.argsort(-w)
    cum = np.cumsum(w[order])
    n_keep = int(np.searchsorted(cum, 0.5) + 1)
    assert kept.sum() == n_keep
    assert set(np.nonzero(kept)[0]) == set(order[:n_keep])
    # kept weights unchanged
    np.testing.assert_allclose(
        np.asarray(ws2.log_weights)[kept], np.asarray(lw)[kept]
    )
