"""Rao-Blackwellized particle filter (ops/rbpf.py + PMMH dispatch).

Oracles: (1) with a DEGENERATE nonlinear substate the RBPF is exactly
one Kalman filter — its log-likelihood must equal
``kalman_log_likelihood`` with ZERO Monte Carlo variance; (2) for a
2-regime switching model at small T the exact marginal is a sum of
2^T Kalman likelihoods over enumerated regime paths — the RBPF
estimate must match within MC error AND beat the plain bootstrap
filter's variance at equal particle count (the point of
marginalization).  End-to-end: PMMH auto-dispatches on RBPFModel.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu.engines import pmmh_sample
from bayesianinference_tpu.ops.kalman import LGSSM, kalman_log_likelihood
from bayesianinference_tpu.ops.particle import (
    ParticleModel,
    particle_log_likelihood,
)
from bayesianinference_tpu.ops.rbpf import (
    RBPFModel,
    rbpf_filter,
    rbpf_log_likelihood,
)

# a 2-D linear block used throughout: local level + slope
A2 = jnp.asarray([[1.0, 1.0], [0.0, 1.0]])
Q2 = jnp.diag(jnp.asarray([0.05, 0.01]))
H2 = jnp.asarray([[1.0, 0.0]])
M0 = jnp.zeros(2)
P0 = jnp.eye(2)


def _degenerate_model(r_obs=0.4):
    """Nonlinear substate frozen at zero: RBPF == one Kalman filter."""
    return RBPFModel(
        init_sampler=lambda k, p: jnp.zeros((p, 1)),
        transition_sampler=lambda k, u, t: u,
        linear_init=lambda u: (M0, P0),
        linear_transition=lambda u, t: (A2, jnp.zeros(2), Q2),
        linear_observation=lambda u, t: (
            H2,
            jnp.zeros(1),
            jnp.asarray([[r_obs]]),
        ),
    )


def test_degenerate_rbpf_equals_kalman_exactly():
    lgssm = LGSSM(A2, Q2, H2, jnp.asarray([[0.4]]), M0, P0)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=30))
    ll_exact = float(kalman_log_likelihood(lgssm, y))
    model = _degenerate_model()
    lls = [
        float(rbpf_log_likelihood(model, y, 64, jax.random.PRNGKey(s)))
        for s in range(4)
    ]
    np.testing.assert_allclose(lls, ll_exact, rtol=1e-10)
    # and the filter means match the Kalman moments implicitly (weights
    # stay uniform, every particle identical)
    res = rbpf_filter(model, y, 16, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(res.linear_means)).all()
    np.testing.assert_allclose(np.asarray(res.ess), 16.0, rtol=1e-6)


# ------------------------------------------------ switching-noise model

P_STAY = 0.85
R_BY_REGIME = np.asarray([0.1, 2.5])


def _switching_rbpf():
    def trans(k, u, t):
        stay = jax.random.uniform(k, (u.shape[0], 1)) < P_STAY
        return jnp.where(stay, u, 1.0 - u)

    return RBPFModel(
        init_sampler=lambda k, p: (
            jax.random.uniform(k, (p, 1)) < 0.5
        ).astype(jnp.result_type(float)),
        transition_sampler=trans,
        linear_init=lambda u: (M0, P0),
        linear_transition=lambda u, t: (A2, jnp.zeros(2), Q2),
        linear_observation=lambda u, t: (
            H2,
            jnp.zeros(1),
            jnp.asarray(R_BY_REGIME, u.dtype)[u[0].astype(jnp.int32)].reshape(
                1, 1
            ),
        ),
    )


def _switching_pf():
    """The SAME model as a plain bootstrap filter: particles carry
    (regime, level, slope) and the observation density is pointwise —
    the x-dimensions enter the Monte Carlo."""
    f = jnp.result_type(float)

    def init(k, p):
        k1, k2 = jax.random.split(k)
        regime = (jax.random.uniform(k1, (p, 1)) < 0.5).astype(f)
        x = jax.random.normal(k2, (p, 2))  # m0=0, P0=I
        return jnp.concatenate([regime, x], axis=1)

    def trans(k, u, t):
        k1, k2 = jax.random.split(k)
        stay = jax.random.uniform(k1, (u.shape[0], 1)) < P_STAY
        regime = jnp.where(stay, u[:, :1], 1.0 - u[:, :1])
        eps = jax.random.normal(k2, (u.shape[0], 2)) * jnp.sqrt(
            jnp.diagonal(Q2)
        )
        x = u[:, 1:] @ A2.T + eps
        return jnp.concatenate([regime, x], axis=1)

    def obs(u, y_t, t):
        r = jnp.asarray(R_BY_REGIME, u.dtype)[u[:, 0].astype(jnp.int32)]
        return -0.5 * (y_t - u[:, 1]) ** 2 / r - 0.5 * jnp.log(
            2 * jnp.pi * r
        )

    return ParticleModel(init, trans, obs)


def _exact_switching_ll(y):
    """Sum of Kalman likelihoods over all 2^T enumerated regime paths,
    weighted by the Markov prior — exact for small T.  The regime only
    modulates R, so each path is one time-VARYING Kalman pass, done
    here densely in numpy."""
    y = np.asarray(y)
    t = y.size
    a, q, h = np.asarray(A2), np.asarray(Q2), np.asarray(H2)
    total = []
    for path in itertools.product([0, 1], repeat=t):
        lp = np.log(0.5)
        for s in range(1, t):
            lp += np.log(P_STAY if path[s] == path[s - 1] else 1 - P_STAY)
        m, p = np.zeros(2), np.eye(2)
        for s in range(t):
            if s > 0:
                m = a @ m
                p = a @ p @ a.T + q
            r = R_BY_REGIME[path[s]]
            sv = float((h @ p @ h.T).item()) + r
            e = y[s] - float((h @ m).item())
            lp += -0.5 * e * e / sv - 0.5 * np.log(2 * np.pi * sv)
            k = (p @ h.T / sv).ravel()
            m = m + k * e
            p = p - np.outer(k, h @ p)
        total.append(lp)
    total = np.asarray(total)
    mx = total.max()
    return mx + np.log(np.exp(total - mx).sum())


@pytest.fixture(scope="module")
def switching_data():
    rng = np.random.default_rng(1)
    # simulate from the true switching model
    t = 9
    regime = [0]
    for _ in range(t - 1):
        regime.append(
            regime[-1] if rng.random() < P_STAY else 1 - regime[-1]
        )
    x = rng.normal(size=2)  # x_1 ~ N(0, I), the model's linear_init
    ys = []
    for s in range(t):
        if s > 0:
            x = np.asarray(A2) @ x + rng.normal(size=2) * np.sqrt(
                np.diagonal(Q2)
            )
        ys.append(x[0] + rng.normal() * np.sqrt(R_BY_REGIME[regime[s]]))
    return jnp.asarray(ys)


def test_rbpf_matches_enumerated_switching_likelihood(switching_data):
    y = switching_data
    ll_exact = _exact_switching_ll(y)
    model = _switching_rbpf()
    lls = np.asarray(
        [
            float(rbpf_log_likelihood(model, y, 4096, jax.random.PRNGKey(s)))
            for s in range(6)
        ]
    )
    # unbiased in p-space: mean of exp within MC error of exp(exact)
    np.testing.assert_allclose(lls.mean(), ll_exact, atol=0.05)
    assert lls.std() < 0.08, lls.std()


def test_rbpf_variance_beats_plain_pf(switching_data):
    """Equal particle count: marginalizing the 2 linear dimensions must
    cut the log-likelihood estimator's spread decisively."""
    y = switching_data
    n, p = 12, 512
    lls_rb = np.asarray(
        [
            float(
                rbpf_log_likelihood(
                    _switching_rbpf(), y, p, jax.random.PRNGKey(s)
                )
            )
            for s in range(n)
        ]
    )
    lls_pf = np.asarray(
        [
            float(
                particle_log_likelihood(
                    _switching_pf(), y, p, jax.random.PRNGKey(s)
                )
            )
            for s in range(n)
        ]
    )
    ll_exact = _exact_switching_ll(y)
    assert abs(lls_rb.mean() - ll_exact) < 0.15
    assert lls_rb.std() < 0.5 * lls_pf.std(), (
        lls_rb.std(),
        lls_pf.std(),
    )


@pytest.mark.slow
def test_pmmh_dispatches_rbpf_and_recovers_noise_scale(switching_data):
    """PMMH on an RBPFModel builder: infer the calm-regime noise."""

    def builder(theta):
        base = _switching_rbpf()
        return base._replace(
            linear_observation=lambda u, t: (
                H2,
                jnp.zeros(1),
                jnp.stack([theta[0], jnp.asarray(R_BY_REGIME[1])])[
                    u[0].astype(jnp.int32)
                ].reshape(1, 1),
            )
        )

    res = pmmh_sample(
        builder,
        switching_data,
        parameters=[("r_calm", 0.01, 1.0)],
        key=jax.random.PRNGKey(0),
        num_particles=256,
        num_samples=150,
        num_warmup=150,
        num_chains=4,
    )
    draws = np.asarray(res.samples).reshape(-1)
    assert np.isfinite(draws).all()
    # truth 0.1; T=9 data is weak, accept a broad localization
    assert 0.02 < np.median(draws) < 0.6, np.median(draws)
