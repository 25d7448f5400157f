"""Mesh-parallel nested sampling.

TPU-native replacement for ``parallelNestedSampling``
(BayesianStatistics.wl:1317-1371): R independent runs execute as ONE
``shard_map`` program over a ``runs`` mesh axis (vmapped within each device
when R exceeds the device count), then merge EXACTLY via the X-ordering
argument of ``combineRuns`` (BS:1293-1315).

Because run-merging is statistically exact for nested sampling, sharding a
large live-point pool over the mesh *is* this: 64k live points on 8 devices
= 8 runs x 8k live points, combined — identical posterior-mass bookkeeping
to a monolithic 64k-point run, with zero inter-device traffic inside the
hot loop (the reference's design point, made collective-free).

Each run generates its own starting points (the reference refuses
pre-specified ones for parallel runs, BS:1317-1332).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..engines.evidence import (
    NestedSamplingResult,
    dedup_by_point,
    evidence_sampling,
)
from ..engines.nested_sampling import (
    evals_to_int,
    generate_starting_points,
    nested_sampling_loop,
)
from ..models.problem import InferenceProblem

__all__ = ["parallel_nested_sampling"]


def parallel_nested_sampling(
    problem: InferenceProblem,
    key,
    *,
    num_runs: int = 4,
    sample_pool_size: int = 100,
    mesh: Optional[Mesh] = None,
    post_process_sampling_runs: Optional[int] = 100,
    empirical_posterior_type: str = "Simple",
    **loop_kwargs,
) -> NestedSamplingResult:
    """Run ``num_runs`` independent nested-sampling runs across the mesh
    and combine them exactly.  ``sample_pool_size`` is the pool PER RUN
    (total pool = num_runs * sample_pool_size)."""
    if mesh is None:
        n_dev = len(jax.devices())
        n_use = max(1, min(num_runs, n_dev))
        mesh = Mesh(jax.devices()[:n_use], ("runs",))
    n_shards = mesh.shape["runs"]
    if num_runs % n_shards != 0:
        raise ValueError(
            f"num_runs={num_runs} must be a multiple of the mesh 'runs' "
            f"axis size {n_shards}"
        )

    keys = jax.random.split(key, num_runs)

    def single_run(k):
        k_start, k_loop = jax.random.split(k)
        starts = generate_starting_points(problem, k_start, sample_pool_size)
        run = nested_sampling_loop(problem, starts, k_loop, **loop_kwargs)
        s = run.state
        return (
            s.dead_points,
            s.dead_logl,
            s.dead_logp,
            s.n_dead,
            s.live_points,
            s.live_logl,
            s.live_logp,
            s.num_likelihood_evals,
            s.iteration,
        )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("runs"),
        out_specs=P("runs"),
        check_vma=False,
    )
    def sharded(keys_shard):
        return jax.vmap(single_run)(keys_shard)

    (
        dead_points,
        dead_logl,
        dead_logp,
        n_dead,
        live_points,
        live_logl,
        live_logp,
        evals,
        iters,
    ) = sharded(keys)

    # ---- host-side exact merge (combineRuns, BS:1293-1315) ----
    pts_list, ll_list, lp_list = [], [], []
    for r in range(num_runs):
        nd = int(n_dead[r])
        order = jnp.argsort(live_logl[r], stable=True)
        pts_list.append(
            jnp.concatenate([dead_points[r, :nd], live_points[r][order]])
        )
        ll_list.append(
            jnp.concatenate([dead_logl[r, :nd], live_logl[r][order]])
        )
        lp_list.append(
            jnp.concatenate([dead_logp[r, :nd], live_logp[r][order]])
        )
    pts = jnp.concatenate(pts_list)
    ll = jnp.concatenate(ll_list)
    lp = jnp.concatenate(lp_list)
    # dedup by point exactly as combineRuns does (BS:1294-1297)
    pts, ll, lp = dedup_by_point(pts, ll, lp)
    order = jnp.argsort(ll, stable=True)

    total_pool = num_runs * sample_pool_size
    result = evidence_sampling(
        points=pts[order],
        log_likelihoods=ll[order],
        log_priors=lp[order],
        sample_pool_size=total_pool,
        schedule=None,  # constant combined pool (BS:1307)
        key=jax.random.fold_in(key, 1),
        num_runs=post_process_sampling_runs,
        empirical_posterior_type=empirical_posterior_type,
        param_names=problem.param_names,
    )
    return dataclasses.replace(
        result,
        num_likelihood_evals=evals_to_int(evals),
        iterations=int(jnp.max(iters)) - 1,
    )
