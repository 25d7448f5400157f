"""Public MCMC chain API.

Equivalent of ``createMCMCChain`` / ``iterateMCMC``
(BayesianStatistics.wl:649-703): build an adaptive-Metropolis chain on the
unnormalized posterior density of an :class:`InferenceProblem` (or any
log-density callable) and iterate it, with thinning, collecting samples.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Union

import jax
import jax.numpy as jnp

from ..core.numerics import as_hashable_fn
from ..models.problem import InferenceProblem
from ..ops.metropolis import (
    AMState,
    am_init,
    run_chain,
    welford_absorb_chol,
)
from ..ops.slice import SliceState, slice_update

__all__ = ["MCMCChain", "create_mcmc_chain", "iterate_mcmc"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MCMCChain:
    state: AMState
    log_density: Callable = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    covariance_learn_delay: int = dataclasses.field(
        default=20, metadata=dict(static=True)
    )
    method: str = dataclasses.field(
        default="adaptive_metropolis", metadata=dict(static=True)
    )
    # set when the chain targets an InferenceProblem: the problem rides
    # through the jitted iteration program as a PYTREE argument, so
    # chains on fresh data (problem.with_data) reuse the compiled scan
    problem: "object" = None

    @property
    def acceptance_rate(self):
        s = self.state
        return s.accepted / jnp.maximum(s.proposed, 1)


def create_mcmc_chain(
    target: Union[InferenceProblem, Callable],
    starting_point,
    *,
    initial_covariance=1.0,
    covariance_learn_delay: int = 20,
    method: str = "adaptive_metropolis",
) -> MCMCChain:
    """Build a chain (``createMCMCChain``, BS:655-697).

    ``initial_covariance`` may be a scalar, a [d] diagonal, or a [d, d]
    matrix (BS:679-686).

    ``method``: ``"adaptive_metropolis"`` (the reference's kernel) or
    ``"slice"`` — random-direction slice sampling whose directions adapt
    to the same Welford running covariance (no acceptance tuning; the
    public form of the NS engine's ``monte_carlo_method="slice"``)."""
    if method not in ("adaptive_metropolis", "slice"):
        raise ValueError(f"unknown method {method!r}")
    x0 = jnp.asarray(starting_point, jnp.result_type(float))
    d = x0.shape[-1]
    problem = None
    if isinstance(target, InferenceProblem):
        problem = target
        log_density = target.log_posterior_density
    else:
        log_density = target
    cov0 = jnp.asarray(initial_covariance, x0.dtype)
    if cov0.ndim == 0:
        cov0 = cov0 * jnp.eye(d, dtype=x0.dtype)
    elif cov0.ndim == 1:
        cov0 = jnp.diag(cov0)
    state = am_init(x0, log_density, cov0=cov0, t0=0)
    return MCMCChain(
        state=state,
        log_density=log_density,
        covariance_learn_delay=covariance_learn_delay,
        method=method,
        problem=problem,
    )


def iterate_mcmc(chain: MCMCChain, key, num_samples: int, thinning: int = 1):
    """Advance the chain, returning ([num_samples, d] samples, new chain) —
    ``MarkovChainIterate``'s ``{n, thinning}`` form (BS:703, 1089).  The
    compiled scan caches on the chain's density identity, so repeated
    iteration of the same chain skips re-tracing."""
    if chain.problem is not None:
        state, samples = _iterate_problem_program(
            chain.state,
            key,
            chain.problem,
            num_samples,
            thinning,
            chain.covariance_learn_delay,
            chain.method,
        )
        return samples, dataclasses.replace(chain, state=state)
    prog = _iterate_program(
        as_hashable_fn(chain.log_density),
        num_samples,
        thinning,
        chain.covariance_learn_delay,
        chain.method,
    )
    state, samples = prog(chain.state, key)
    return samples, dataclasses.replace(chain, state=state)


def _slice_block(key, st: AMState, log_density, num: int, learn_delay: int):
    """``num`` slice updates on an AMState carry.  The direction Cholesky
    for the block is the state's maintained running-covariance factor
    (identity until the learn delay) — no factorization at all, since the
    AM state carries the factor directly.  Every accepted point is
    absorbed back into the Welford statistics via a rank-one factor
    update, so the NEXT block's directions adapt."""
    d = st.x.shape[-1]
    eye = jnp.eye(d, dtype=st.x.dtype)
    learn = st.step >= learn_delay
    L = jnp.where(jnp.isfinite(st.chol).all() & learn, st.chol, eye)

    def one(st, k):
        ss = SliceState(
            x=st.x,
            log_density=st.log_density,
            evals=jnp.asarray(0, jnp.int32),
            moved=jnp.asarray(0, jnp.int32),
        )
        ss = slice_update(k, ss, log_density, L)
        mean, chol, t = welford_absorb_chol(st.mean, st.chol, st.step, ss.x)
        return AMState(
            x=ss.x,
            log_density=ss.log_density,
            mean=mean,
            chol=chol,
            step=t,
            accepted=st.accepted + ss.moved,
            proposed=st.proposed + 1,
        ), None

    st, _ = jax.lax.scan(one, st, jax.random.split(key, num))
    return st


@functools.partial(
    jax.jit,
    static_argnames=("num_samples", "thinning", "learn_delay", "method"),
)
def _iterate_problem_program(
    state, key, problem, num_samples, thinning, learn_delay, method
):
    """Chain iteration with the TARGET PROBLEM as a pytree argument: its
    static fields (the callables) key the jit cache, its traced leaves
    (bounds, data) flow as arguments — chains over fresh same-shape data
    reuse one compiled scan (the serving convention shared with the NS /
    Laplace / direct engines)."""
    log_density = problem.log_posterior_density

    def step(st, k):
        if method == "slice":
            st = _slice_block(k, st, log_density, thinning, learn_delay)
        else:
            st = run_chain(k, st, log_density, thinning, learn_delay)
        return st, st.x

    keys = jax.random.split(key, num_samples)
    return jax.lax.scan(step, state, keys)


@functools.lru_cache(maxsize=32)
def _iterate_program(log_density, num_samples, thinning, learn_delay, method):
    """Jitted scan held in a BOUNDED lru: same-chain iteration skips the
    re-trace; evicted entries release their compiled executables and
    closures.  Unhashable density callables are identity-wrapped."""

    def run(state, key):
        def step(st, k):
            if method == "slice":
                st = _slice_block(k, st, log_density, thinning, learn_delay)
            else:
                st = run_chain(k, st, log_density, thinning, learn_delay)
            return st, st.x

        keys = jax.random.split(key, num_samples)
        return jax.lax.scan(step, state, keys)

    return jax.jit(run)
