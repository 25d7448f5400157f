"""Random-direction slice sampling kernel.

An alternative chain kernel for nested sampling's constrained-prior moves,
filling the reference's (unused) ``"MonteCarloMethod"`` option slot
(BayesianStatistics.wl:843).  Slice sampling needs no acceptance-rate
tuning and mixes better per likelihood evaluation than random-walk
Metropolis inside hard likelihood constraints — it is the standard kernel
of modern nested-sampling codes (PolyChord; vectorized GPU NS per
PAPERS.md).

One update: pick a random direction from the live-point covariance
(whitened directions), step out an interval to bracket the slice, then
shrink until a point on the slice is found (Neal 2003).  All loops are
bounded ``lax.while_loop``s; everything vmaps over chains.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core.numerics import is_log_zero

__all__ = ["SliceState", "slice_init", "slice_update", "run_slice_chain"]


class SliceState(NamedTuple):
    x: jnp.ndarray  # [d]
    log_density: jnp.ndarray  # scalar
    evals: jnp.ndarray  # scalar int: density evaluations so far
    moved: jnp.ndarray  # scalar int: successful slice moves


def slice_init(x0, log_density_fn: Callable) -> SliceState:
    x0 = jnp.asarray(x0)
    return SliceState(
        x=x0,
        log_density=jnp.asarray(log_density_fn(x0)),
        evals=jnp.asarray(1, jnp.int32),
        moved=jnp.asarray(0, jnp.int32),
    )


def slice_update(
    key,
    state: SliceState,
    log_density_fn: Callable,
    direction_chol: jnp.ndarray,  # [d, d] scale for directions (chol of cov)
    *,
    width: float = 1.0,
    max_stepout: int = 8,
    max_shrink: int = 32,
):
    """One random-direction slice update (step-out + shrinkage)."""
    d = state.x.shape[-1]
    k_dir, k_level, k_lo, k_hi, k_shrink = jax.random.split(key, 5)

    # random whitened direction with covariance-shaped length:
    # |direction| = width * |L z| / |z|
    z = jax.random.normal(k_dir, (d,), state.x.dtype)
    direction = width * (direction_chol @ z) / jnp.maximum(
        jnp.linalg.norm(z), 1e-30
    )

    # slice level: logu = logpi(x) + log U  (U in (0,1])
    logu = state.log_density + jnp.log(
        jax.random.uniform(k_level, (), state.x.dtype, minval=1e-12, maxval=1.0)
    )

    # initial bracket [x + lo*dir, x + hi*dir] with random offset
    u0 = jax.random.uniform(k_lo, (), state.x.dtype)
    lo0, hi0 = -u0, 1.0 - u0

    def on_slice(t, carry_evals):
        lp = log_density_fn(state.x + t * direction)
        return jnp.logical_and(
            jnp.logical_not(is_log_zero(lp)), lp >= logu
        ), lp, carry_evals + 1

    # --- step out ---
    def stepout(bound0, sign):
        def cond(c):
            b, n, inside, _ = c
            return jnp.logical_and(inside, n < max_stepout)

        def body(c):
            b, n, _, ev = c
            b_new = b + sign
            inside, _, ev = on_slice(b_new, ev)
            return b_new, n + 1, inside, ev

        inside0, _, ev = on_slice(bound0, jnp.asarray(0, jnp.int32))
        b, _, _, ev = jax.lax.while_loop(
            cond, body, (bound0, jnp.asarray(0, jnp.int32), inside0, ev)
        )
        return b, ev

    lo, ev_lo = stepout(lo0, -1.0)
    hi, ev_hi = stepout(hi0, +1.0)

    # --- shrinkage ---
    def cond(c):
        x_new, lp_new, lo, hi, n, found, key_ = c
        return jnp.logical_and(jnp.logical_not(found), n < max_shrink)

    def body(c):
        x_new, lp_new, lo, hi, n, _, key_ = c
        key_, sub = jax.random.split(key_)
        t = jax.random.uniform(
            sub, (), state.x.dtype, minval=lo, maxval=hi
        )
        ok, lp, _ = on_slice(t, jnp.asarray(0, jnp.int32))
        lo = jnp.where(jnp.logical_or(ok, t >= 0), lo, t)
        hi = jnp.where(jnp.logical_or(ok, t < 0), hi, t)
        x_cand = state.x + t * direction
        x_new = jnp.where(ok, x_cand, x_new)
        lp_new = jnp.where(ok, lp, lp_new)
        return x_new, lp_new, lo, hi, n + 1, ok, key_

    x_new, lp_new, _, _, n_shrink, found, _ = jax.lax.while_loop(
        cond,
        body,
        (
            state.x,
            state.log_density,
            lo,
            hi,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            k_shrink,
        ),
    )
    evals = state.evals + ev_lo + ev_hi + n_shrink
    return SliceState(
        x=jnp.where(found, x_new, state.x),
        log_density=jnp.where(found, lp_new, state.log_density),
        evals=evals,
        moved=state.moved + found.astype(jnp.int32),
    )


def run_slice_chain(
    key,
    x0,
    log_density_fn: Callable,
    direction_chol,
    num_slices: int,
    *,
    width: float = 1.0,
    max_stepout: int = 8,
    max_shrink: int = 32,
) -> SliceState:
    """``num_slices`` successive random-direction slice updates."""
    state = slice_init(x0, log_density_fn)

    def body(carry, k):
        return (
            slice_update(
                k,
                carry,
                log_density_fn,
                direction_chol,
                width=width,
                max_stepout=max_stepout,
                max_shrink=max_shrink,
            ),
            None,
        )

    state, _ = jax.lax.scan(body, state, jax.random.split(key, num_slices))
    return state
