"""Nested-sampling bookkeeping math: X-shrinkage schedules, trapezoid
log-weights, entropy — fused vector ops.

Semantics follow the reference exactly (``trapezoidWeigths`` /
``calculateXValues`` / ``calculateEntropy`` / ``calculateWeightsCrude``,
BayesianStatistics.wl:747-831), generalized to batched deletion: when ``k``
worst points are deleted per iteration from a pool of ``n`` live points, the
i-th deletion overall happens with ``m_i = n - ((i-1) mod k)`` points above
the contracting threshold, so the crude shrinkage per deleted point is
``E[-log t_i] = 1/m_i`` (order statistics of uniform volumes; reduces to the
reference's ``X_i = e^{-i/n}`` for k = 1).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.numerics import log_zero, logaddexp, logsubexp

__all__ = [
    "pool_schedule",
    "crude_log_x_deleted",
    "log_x_live_tail",
    "log_trapezoid_weights",
    "entropy_from_weights",
]


def pool_schedule(n_live: int, num_delete: int, capacity: int) -> jnp.ndarray:
    """[capacity] array of effective pool sizes m_i for the i-th deletion."""
    i = jnp.arange(capacity)
    return jnp.asarray(n_live, jnp.result_type(float)) - (i % num_delete)


def crude_log_x_deleted(schedule: jnp.ndarray) -> jnp.ndarray:
    """Deterministic logX for deleted points: logX_i = -sum_{j<=i} 1/m_j
    (``calculateXValues["Log"]`` deleted part, BS:789-790)."""
    return -jnp.cumsum(1.0 / schedule)


def log_x_live_tail(n_live: int, log_x_last_deleted, dtype=None) -> jnp.ndarray:
    """logX of the n final live points, descending:
    log(i/(n+1)) + logX_deleted  for i = n..1 (BS:791-797)."""
    dtype = dtype or jnp.result_type(float)
    i = jnp.arange(n_live, 0, -1, dtype=dtype)
    return jnp.log(i / (n_live + 1.0)) + log_x_last_deleted


def log_trapezoid_weights(log_x: jnp.ndarray, valid=None) -> jnp.ndarray:
    """Trapezoid quadrature log-weights for a *descending* logX sequence
    (``trapezoidWeigths["Log"]``, BS:756-771):

      w_i = (X_{i-1} - X_{i+1}) / 2   with  X_0 := 2 - X_1
      w_m = (X_{m-1} + X_m) / 2       (last point)

    Supports batched input [..., m].  With ``valid`` (boolean [..., m],
    a contiguous prefix mask), the weights are computed as if the valid
    prefix were the whole sequence (invalid slots get log-zero).
    """
    log_x = jnp.asarray(log_x)
    m = log_x.shape[-1]
    lz = log_zero(log_x.dtype)
    log2 = jnp.log(jnp.asarray(2.0, log_x.dtype))

    if valid is None:
        prev = jnp.concatenate(
            [logsubexp(log2, log_x[..., :1]), log_x[..., :-1]], axis=-1
        )
        nxt = jnp.concatenate(
            [log_x[..., 1:], jnp.full_like(log_x[..., :1], lz)], axis=-1
        )
        mid = logsubexp(prev, nxt)  # fine for i < m
        last = logaddexp(log_x[..., -2], log_x[..., -1])
        w = mid.at[..., -1].set(last)
        return w + jnp.log(jnp.asarray(0.5, log_x.dtype))

    # masked variant: the "last valid" index plays the role of m
    valid = jnp.asarray(valid)
    count = jnp.sum(valid, axis=-1)
    idx = jnp.arange(m)
    is_last = idx == (count - 1)[..., None]
    prev = jnp.concatenate(
        [logsubexp(log2, log_x[..., :1]), log_x[..., :-1]], axis=-1
    )
    nxt = jnp.concatenate(
        [log_x[..., 1:], jnp.full_like(log_x[..., :1], lz)], axis=-1
    )
    w_mid = logsubexp(prev, nxt)
    w_last = logaddexp(prev, log_x)  # at the last slot prev = X_{m-1}
    w = jnp.where(is_last, w_last, w_mid)
    w = jnp.where(valid, w + jnp.log(jnp.asarray(0.5, log_x.dtype)), lz)
    return w


def entropy_from_weights(log_weights, log_likelihoods, log_evidence):
    """Information H = sum_i exp(logw_i + logL_i - logZ) * logL_i - logZ
    where logw already includes logL (the reference's
    ``CrudeLogPosteriorWeight``) — (``calculateEntropy``, BS:801-810).
    Degenerate logL (log-zero) contributes 0 to the dot product."""
    lw = jnp.asarray(log_weights)
    ll = jnp.asarray(log_likelihoods)
    lz = log_zero(lw.dtype)
    safe_ll = jnp.where(ll > 0.5 * lz, ll, 0.0)
    return jnp.sum(jnp.exp(lw - log_evidence) * safe_ll, axis=-1) - log_evidence
