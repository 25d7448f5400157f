"""Data-sharded conjugate fits must match the dense single-device paths.

The sharded paths reduce sufficient statistics with one psum per
statistic (parallel/sharded_conjugate.py); on the 8-virtual-device CPU
mesh (conftest) with x64 the agreement with the dense implementations is
exact to solver roundoff.  Row counts are deliberately NOT multiples of
8 to exercise the zero-padding mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu.engines.conjugate import (
    BLRParameters,
    bayesian_linear_regression,
    multinormal_conjugate_model,
    normal_conjugate_model,
)
from bayesianinference_tpu.parallel import (
    make_mesh,
    sharded_bayesian_linear_regression,
    sharded_multinormal_conjugate_model,
    sharded_normal_conjugate_model,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("data",))


def test_sharded_blr_univariate_matches_dense(mesh, rng):
    n = 203  # not a multiple of 8: exercises the padding mask
    x = jnp.asarray(rng.uniform(-2.0, 2.0, (n, 1)))
    y = jnp.asarray(
        1.0 - 2.0 * x[:, 0] + 0.5 * x[:, 0] ** 3 + 0.1 * rng.normal(size=n)
    )
    dense = bayesian_linear_regression(x, y, degree=3)
    shard = sharded_bayesian_linear_regression(x, y, mesh, degree=3)
    np.testing.assert_allclose(
        float(shard.log_evidence), float(dense.log_evidence), rtol=1e-9
    )
    np.testing.assert_allclose(
        shard.posterior_parameters.b, dense.posterior_parameters.b, rtol=1e-9
    )
    np.testing.assert_allclose(
        shard.posterior_parameters.v, dense.posterior_parameters.v, rtol=1e-9
    )
    np.testing.assert_allclose(
        shard.posterior_parameters.lam, dense.posterior_parameters.lam, rtol=1e-9
    )
    # the predictive distributions agree too (same parameter set end-to-end)
    xq = jnp.linspace(-2.0, 2.0, 7)[:, None]
    np.testing.assert_allclose(
        shard.predictive_distribution(xq).loc,
        dense.predictive_distribution(xq).loc,
        rtol=1e-9,
    )


def test_sharded_blr_multivariate_matches_dense(mesh, rng):
    n, m = 117, 2
    x = jnp.asarray(rng.uniform(-1.0, 1.0, (n, 3)))
    coef = jnp.asarray(rng.normal(size=(3, m)))
    y = x @ coef + 0.05 * jnp.asarray(rng.normal(size=(n, m)))
    dense = bayesian_linear_regression(x, y)
    shard = sharded_bayesian_linear_regression(x, y, mesh)
    np.testing.assert_allclose(
        float(shard.log_evidence), float(dense.log_evidence), rtol=1e-9
    )
    np.testing.assert_allclose(
        shard.posterior_parameters.b, dense.posterior_parameters.b, rtol=1e-8
    )
    np.testing.assert_allclose(
        shard.posterior_parameters.v, dense.posterior_parameters.v, rtol=1e-8
    )


def test_sharded_blr_custom_prior(mesh, rng):
    n, k = 60, 2  # identity basis on 1 input + constant -> k = 2
    x = jnp.asarray(rng.uniform(-1.0, 1.0, (n, 1)))
    y = jnp.asarray(0.3 + 2.0 * x[:, 0] + 0.1 * rng.normal(size=n))
    eye = jnp.eye(k)
    prior = BLRParameters(
        b=jnp.asarray([0.5, 1.0]),
        lam=eye * 2.0,
        lam_inv=eye / 2.0,
        v=jnp.asarray(0.5),
        nu=jnp.asarray(3.0),
    )
    dense = bayesian_linear_regression(x, y, prior=prior)
    shard = sharded_bayesian_linear_regression(x, y, mesh, prior=prior)
    np.testing.assert_allclose(
        float(shard.log_evidence), float(dense.log_evidence), rtol=1e-9
    )


def test_sharded_normal_model_matches_dense(mesh, rng):
    data = jnp.asarray(rng.normal(1.3, 0.7, size=101))
    dense = normal_conjugate_model(data)
    shard = sharded_normal_conjugate_model(data, mesh)
    np.testing.assert_allclose(
        float(shard.log_evidence), float(dense.log_evidence), rtol=1e-10
    )
    np.testing.assert_allclose(
        float(shard.posterior.mu0), float(dense.posterior.mu0), rtol=1e-10
    )
    np.testing.assert_allclose(
        float(shard.posterior.beta), float(dense.posterior.beta), rtol=1e-10
    )


def test_sharded_multinormal_model_matches_dense(mesh, rng):
    d = 3
    cov = np.asarray([[1.0, 0.4, 0.0], [0.4, 1.2, -0.2], [0.0, -0.2, 0.8]])
    data = jnp.asarray(rng.multivariate_normal(np.arange(d) * 1.0, cov, size=77))
    dense = multinormal_conjugate_model(data)
    shard = sharded_multinormal_conjugate_model(data, mesh)
    np.testing.assert_allclose(
        float(shard.log_evidence), float(dense.log_evidence), rtol=1e-10
    )
    np.testing.assert_allclose(
        shard.posterior.psi, dense.posterior.psi, rtol=1e-9
    )


def test_stats_identity_forms_match_data_forms(rng):
    """The refactored from-stats logZ cores equal the data-looped forms:
    sum log N(x_i | mean, sd) = -n/2 log(2 pi var) - (n-1)/2 at the sample
    (mean, ddof=1 var) — the identity the shards rely on."""
    import scipy.stats as st

    x = rng.normal(0.3, 1.7, size=41)
    mean, var = x.mean(), x.var(ddof=1)
    direct = st.norm(mean, np.sqrt(var)).logpdf(x).sum()
    closed = -0.5 * (len(x) * np.log(2 * np.pi * var) + (len(x) - 1))
    np.testing.assert_allclose(closed, direct, rtol=1e-12)


def test_sharded_categorical_model_matches_dense(mesh, rng):
    from bayesianinference_tpu.engines.conjugate import (
        categorical_conjugate_model,
    )
    from bayesianinference_tpu.parallel import (
        sharded_categorical_conjugate_model,
    )

    data = jnp.asarray(rng.integers(0, 4, size=91).astype(float))
    dense = categorical_conjugate_model(data, num_categories=4)
    shard = sharded_categorical_conjugate_model(data, 4, mesh)
    np.testing.assert_allclose(
        float(shard.log_evidence), float(dense.log_evidence), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(shard.posterior.alpha), np.asarray(dense.posterior.alpha)
    )
    with pytest.raises(ValueError, match="integers in"):
        sharded_categorical_conjugate_model(jnp.asarray([5.0]), 3, mesh)
