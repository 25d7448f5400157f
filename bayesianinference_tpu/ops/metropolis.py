"""Adaptive-Metropolis MCMC kernel.

From-scratch JAX replacement for the reference's use of the undocumented
built-in ``Statistics`MCMC`BuildMarkovChain[{"AdaptiveMetropolis", "Log"}]``
+ ``MarkovChainIterate`` (BayesianStatistics.wl:675, 703, 720-736):
a Haario-style random-walk Metropolis in log-density space whose proposal
covariance is adapted from the running sample mean/covariance after a learn
delay (default 20, matching ``"CovarianceLearnDelay"``, BS:667).

Design notes (TPU-first):
* One chain step is a handful of FMAs + a [d,d] Cholesky; the throughput
  comes from **vmapping the whole kernel over many chains** (nested-sampling
  live points), which batches every matrix op.
* The state is a flat pytree (`AMState`) so `lax.scan` / `lax.while_loop`
  can evolve it on device; the "FullState" seeding of the reference
  (chain seeded at iteration ``t0=10`` with a carried-over mean/cov,
  BS:720-727) maps to constructing the state with ``step=t0``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core.numerics import is_log_zero

__all__ = ["AMState", "am_init", "am_step", "run_chain", "run_chain_adaptive"]

# Haario et al. (2001) optimal scaling and regularization
_SCALING = 2.38**2
_JITTER = 1e-10


class AMState(NamedTuple):
    """Adaptive-Metropolis chain state (the reference's "FullState",
    BS:720-727)."""

    x: jnp.ndarray  # [d] current point
    log_density: jnp.ndarray  # scalar
    mean: jnp.ndarray  # [d] running mean
    cov: jnp.ndarray  # [d, d] running covariance (symmetrized)
    step: jnp.ndarray  # scalar int: number of points absorbed
    accepted: jnp.ndarray  # scalar int: accepted moves since init
    proposed: jnp.ndarray  # scalar int: proposals since init


def am_init(
    x0,
    log_density_fn: Callable,
    mean0=None,
    cov0=None,
    t0: int = 10,
) -> AMState:
    """Seed a chain at ``x0`` with optional carried-over (mean, cov),
    pretending ``t0`` points were already absorbed (BS:720-727)."""
    x0 = jnp.asarray(x0)
    d = x0.shape[-1]
    mean0 = x0 if mean0 is None else jnp.asarray(mean0)
    cov0 = jnp.eye(d, dtype=x0.dtype) if cov0 is None else jnp.asarray(cov0)
    cov0 = 0.5 * (cov0 + jnp.swapaxes(cov0, -1, -2))
    return AMState(
        x=x0,
        log_density=jnp.asarray(log_density_fn(x0)),
        mean=mean0,
        cov=cov0,
        step=jnp.asarray(t0, jnp.int32),
        accepted=jnp.asarray(0, jnp.int32),
        proposed=jnp.asarray(0, jnp.int32),
    )


# Unrolled-Cholesky cutoff.  XLA's batched tiny-matrix cholesky is
# pathological on TPU (245 ms for [32k, 32, 32] — it serializes); the
# unrolled Crout is 3.5 ms at the same shape (70x) and its compile time
# stays a few seconds at d = 32.  Beyond this, prefer the slice kernel,
# whose direction factorization happens once per chain block, not per
# step (monte_carlo_method="slice").
_SMALL_CHOL_MAX_DIM = 32


def small_cholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky-Crout for small static d, batched over leading
    dims as pure elementwise ops.

    XLA's TPU `cholesky` lowers tiny batched factorizations (the [d, d]
    proposal covariances of thousands of vmapped chains) to a serialized
    kernel costing ~milliseconds per call; this unrolled form is a handful
    of fused VPU ops regardless of the batch size.  NaN propagates for
    non-PD inputs (same contract as `jnp.linalg.cholesky`)."""
    d = a.shape[-1]
    rows = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - rows[i][k] * rows[j][k]
            if i == j:
                rows[i][j] = jnp.sqrt(s)
            else:
                rows[i][j] = s / rows[j][j]
    zero = jnp.zeros_like(a[..., 0, 0])
    cols = [
        jnp.stack(
            [rows[i][j] if j <= i else zero for j in range(d)], axis=-1
        )
        for i in range(d)
    ]
    return jnp.stack(cols, axis=-2)


def _cholesky(a):
    if a.shape[-1] <= _SMALL_CHOL_MAX_DIM:
        return small_cholesky(a)
    return jnp.linalg.cholesky(a)


def _proposal_chol(cov, d, learn: jnp.ndarray):
    """Cholesky of the scaled proposal covariance; identity until the learn
    delay has passed."""
    dtype = cov.dtype
    scaled = (_SCALING / d) * cov + _JITTER * jnp.eye(d, dtype=dtype)
    base = jnp.eye(d, dtype=dtype) * jnp.sqrt(_SCALING / d)
    L = _cholesky(scaled)
    L = jnp.where(jnp.isfinite(L).all(), L, base)
    return jnp.where(learn, L, base)


def welford_absorb(mean, cov, step, x):
    """Absorb one point into the running (mean, cov) trajectory statistics
    (the Welford tail shared by the AM step and the adaptive slice chain).
    Returns (mean, cov, step + 1)."""
    t = step + 1
    tf = t.astype(x.dtype)
    delta = x - mean
    mean = mean + delta / tf
    delta2 = x - mean
    cov = cov * ((tf - 1.0) / tf) + jnp.outer(delta, delta2) / tf
    cov = 0.5 * (cov + cov.T)
    return mean, cov, t


def am_step(key, state: AMState, log_density_fn: Callable, learn_delay: int = 20):
    """One Metropolis step + Welford mean/cov update."""
    x, lp = state.x, state.log_density
    d = x.shape[-1]
    k_prop, k_acc = jax.random.split(key)

    learn = state.step >= learn_delay
    L = _proposal_chol(state.cov, d, learn)
    z = jax.random.normal(k_prop, x.shape, x.dtype)
    x_new = x + L @ z

    lp_new = jnp.asarray(log_density_fn(x_new))
    # log-space accept; proposals into log-zero regions always rejected
    log_u = jnp.log(
        jax.random.uniform(k_acc, (), x.dtype, minval=1e-38, maxval=1.0)
    )
    accept = jnp.logical_and(
        jnp.logical_not(is_log_zero(lp_new)), log_u < (lp_new - lp)
    )
    x = jnp.where(accept, x_new, x)
    lp = jnp.where(accept, lp_new, lp)

    mean, cov, t = welford_absorb(state.mean, state.cov, state.step, x)

    return AMState(
        x=x,
        log_density=lp,
        mean=mean,
        cov=cov,
        step=t,
        accepted=state.accepted + accept.astype(jnp.int32),
        proposed=state.proposed + 1,
    )


def run_chain(
    key,
    state: AMState,
    log_density_fn: Callable,
    num_steps: int,
    learn_delay: int = 20,
):
    """Run ``num_steps`` adaptive-Metropolis steps under ``lax.scan``."""

    def body(carry, k):
        return am_step(k, carry, log_density_fn, learn_delay), None

    keys = jax.random.split(key, num_steps)
    state, _ = jax.lax.scan(body, state, keys)
    return state


def run_chain_adaptive(
    key,
    state: AMState,
    log_density_fn: Callable,
    num_steps: int,
    extra_steps: int,
    max_steps: int,
    min_acceptance: float = 0.0,
    max_acceptance: float = 1.0,
    learn_delay: int = 20,
):
    """Run a chain, then keep running blocks of ``extra_steps`` until the
    acceptance rate lies within bounds or ``max_steps`` is reached — the
    bounded restatement of the reference's retry loop
    (``nsMCMC``, BS:729-736; outer ×1.25 retry, BS:990-1004).

    Returns (final_state, acceptance_rate).
    """

    k_init, k_loop = jax.random.split(key)
    state = run_chain(k_init, state, log_density_fn, num_steps, learn_delay)

    def acc_rate(s: AMState):
        return s.accepted.astype(s.x.dtype) / jnp.maximum(
            s.proposed.astype(s.x.dtype), 1.0
        )

    trivial_bounds = min_acceptance <= 0.0 and max_acceptance >= 1.0
    if extra_steps <= 0 or max_steps <= num_steps or trivial_bounds:
        # with the default (0, 1) bounds the retry loop can never fire
        # (BS:848 default "MinMaxAcceptanceRate" -> {0, 1}); skipping it
        # statically removes a vmapped while_loop from the hot path
        return state, acc_rate(state)

    def cond(carry):
        s, k = carry
        r = acc_rate(s)
        bad = jnp.logical_or(r < min_acceptance, r > max_acceptance)
        return jnp.logical_and(bad, s.proposed < max_steps)

    def body(carry):
        s, k = carry
        k, sub = jax.random.split(k)
        s = run_chain(sub, s, log_density_fn, extra_steps, learn_delay)
        return (s, k)

    state, _ = jax.lax.while_loop(cond, body, (state, k_loop))
    return state, acc_rate(state)
