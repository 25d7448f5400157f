"""Oracle tests for core.precise — software-rounded f32 transcendentals.

The module exists because TPU's native f32 ``log``/``exp``/``gammaln``
are approximate (~2.4e3 ulps for log, measured; see the module
docstring), which dominated the on-chip PRECISION.json ``tpu_f32`` logZ
errors.  These tests pin the replacements against f64 numpy/scipy
oracles ON CPU f32 (the implementations are dtype-dispatched, not
platform-dispatched, so CPU exercises the identical compiled graph the
chip runs), plus the edge-case semantics and the custom-JVP derivatives
AD relies on.  Reference accuracy machinery this feeds:
GaussianProcess.wl:161-199, LinearRegression.wl:289-366.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sps

from bayesianinference_tpu.core.precise import (
    exp_precise,
    gammaln_precise,
    log1p_precise,
    log_precise,
)


def max_ulp_err(got_f32, ref_f64):
    """Max |got - ref| measured in units of the f32 spacing at ref."""
    got = np.asarray(got_f32, np.float64)
    ref = np.asarray(ref_f64, np.float64)
    ulp = np.spacing(np.abs(ref).astype(np.float32)).astype(np.float64)
    return float(np.max(np.abs(got - ref) / ulp))


def log_grid():
    rng = np.random.default_rng(0)
    # log-uniform over the bulk of the f32 range + dyadic boundaries
    x = np.exp(rng.uniform(np.log(1e-30), np.log(1e30), 4096))
    # normal-range edges only: denormals defer to the NATIVE log by
    # design (XLA backends may flush them), covered in the edge test
    edges = np.asarray([0.5, 1.0, 2.0, 4.0 / 3.0, 2.0 / 3.0, 1.5e-38, 3e38])
    return np.concatenate([x, edges]).astype(np.float32)


class TestLogPrecise:
    def test_ulp_accuracy_vs_f64(self):
        x = log_grid()
        got = jax.jit(log_precise)(jnp.asarray(x))
        assert max_ulp_err(got, np.log(x.astype(np.float64))) <= 2.5

    def test_edge_semantics_match_native(self):
        x = jnp.asarray([0.0, -1.0, np.inf, np.nan, 1e-42], jnp.float32)
        got = np.asarray(log_precise(x))
        ref = np.asarray(jnp.log(x))
        np.testing.assert_array_equal(got, ref)

    def test_exact_at_one(self):
        assert float(log_precise(jnp.float32(1.0))) == 0.0

    def test_grad_is_reciprocal(self):
        x = jnp.asarray(3.7, jnp.float32)
        g = jax.grad(log_precise)(x)
        np.testing.assert_allclose(float(g), 1.0 / 3.7, rtol=1e-6)

    def test_second_order_ad(self):
        x = jnp.asarray(2.0, jnp.float32)
        h = jax.grad(jax.grad(log_precise))(x)
        np.testing.assert_allclose(float(h), -0.25, rtol=1e-6)


class TestLog1pPrecise:
    def test_tiny_x_no_cancellation(self):
        x = np.asarray([1e-8, -1e-8, 1e-6, 3e-4], np.float32)
        got = np.asarray(log1p_precise(jnp.asarray(x)), np.float64)
        ref = np.log1p(x.astype(np.float64))
        np.testing.assert_allclose(got, ref, rtol=3e-7)

    def test_ulp_accuracy_vs_f64(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(-0.999, 50.0, 4096).astype(np.float32)
        got = jax.jit(log1p_precise)(jnp.asarray(x))
        assert max_ulp_err(got, np.log1p(x.astype(np.float64))) <= 4.0

    def test_edges(self):
        x = jnp.asarray([-1.0, -2.0, np.inf], jnp.float32)
        got = np.asarray(log1p_precise(x))
        assert got[0] == -np.inf and np.isnan(got[1]) and got[2] == np.inf

    def test_grad(self):
        g = jax.grad(log1p_precise)(jnp.asarray(0.5, jnp.float32))
        np.testing.assert_allclose(float(g), 1.0 / 1.5, rtol=1e-6)


class TestExpPrecise:
    def test_ulp_accuracy_vs_f64(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(-80.0, 80.0, 4096).astype(np.float32)
        got = jax.jit(exp_precise)(jnp.asarray(x))
        assert max_ulp_err(got, np.exp(x.astype(np.float64))) <= 2.5

    def test_saturating_and_special(self):
        x = jnp.asarray(
            [-200.0, 200.0, np.inf, -np.inf, np.nan, 0.0], jnp.float32
        )
        got = np.asarray(exp_precise(x))
        assert got[0] == 0.0 and got[1] == np.inf and got[2] == np.inf
        assert got[3] == 0.0 and np.isnan(got[4]) and got[5] == 1.0

    def test_grad_is_self(self):
        x = jnp.asarray(1.3, jnp.float32)
        np.testing.assert_allclose(
            float(jax.grad(exp_precise)(x)),
            float(exp_precise(x)),
            rtol=1e-6,
        )

    def test_roundtrip_with_log(self):
        x = np.exp(np.random.default_rng(3).uniform(-20, 20, 512)).astype(
            np.float32
        )
        rt = np.asarray(
            exp_precise(log_precise(jnp.asarray(x))), np.float64
        )
        # 1-ulp log error at |log x| ~ 46 is a ~4e-6 relative exp error:
        # the bound is ulp(log) * |log x|, not ulp(x)
        np.testing.assert_allclose(rt, x.astype(np.float64), rtol=5e-6)


class TestGammalnPrecise:
    def test_abs_accuracy_positive_axis(self):
        rng = np.random.default_rng(4)
        x = np.concatenate(
            [
                np.exp(rng.uniform(np.log(1e-3), np.log(1e4), 4096)),
                np.asarray([0.5, 1.0, 1.5, 2.0, 8.0, 100.5]),
            ]
        ).astype(np.float32)
        got = np.asarray(
            jax.jit(gammaln_precise)(jnp.asarray(x)), np.float64
        )
        ref = sps.gammaln(x.astype(np.float64))
        # mixed tolerance: ~a few ulp of the RESULT scale where gammaln
        # is large, with an absolute floor near the zeros at x = 1, 2
        # (docstring bound: ~5e-5 max absolute; native TPU is ~3.3e-3)
        tol = 2e-6 * np.maximum(np.abs(ref), 8.0)
        assert np.all(np.abs(got - ref) <= tol)

    def test_integer_factorials_exact_class(self):
        n = np.arange(1, 20, dtype=np.float32)
        got = np.asarray(gammaln_precise(jnp.asarray(n)), np.float64)
        ref = sps.gammaln(n.astype(np.float64))
        np.testing.assert_allclose(got, ref, rtol=3e-6, atol=2e-5)

    def test_nonpositive_falls_back_to_native(self):
        x = jnp.asarray([0.0, -0.5, -3.0], jnp.float32)
        got = np.asarray(gammaln_precise(x))
        ref = np.asarray(jax.scipy.special.gammaln(x))
        np.testing.assert_array_equal(got, ref)

    def test_grad_is_digamma(self):
        x = jnp.asarray(4.2, jnp.float32)
        np.testing.assert_allclose(
            float(jax.grad(gammaln_precise)(x)),
            float(sps.digamma(4.2)),
            rtol=1e-5,
        )


class TestDtypeDispatch:
    """f64 (and any non-f32) must be bitwise the native functions — this
    is what keeps the CPU-x64 oracle suite pinning unchanged math."""

    @pytest.mark.parametrize(
        "precise, native",
        [
            (log_precise, jnp.log),
            (log1p_precise, jnp.log1p),
            (exp_precise, jnp.exp),
            (gammaln_precise, jax.scipy.special.gammaln),
        ],
    )
    def test_f64_bitwise_native(self, precise, native):
        x = jnp.asarray([0.3, 1.0, 7.5, 123.456], jnp.float64)
        assert x.dtype == jnp.float64  # conftest enables x64
        np.testing.assert_array_equal(
            np.asarray(precise(x)), np.asarray(native(x))
        )

    def test_vmap_jit_compose(self):
        f = jax.jit(jax.vmap(lambda t: log_precise(t) + exp_precise(-t)))
        x = jnp.linspace(0.1, 5.0, 64, dtype=jnp.float32)
        ref = np.log(np.asarray(x, np.float64)) + np.exp(
            -np.asarray(x, np.float64)
        )
        np.testing.assert_allclose(np.asarray(f(x), np.float64), ref,
                                   rtol=5e-7, atol=5e-7)
