"""Mesh-parallel tempered SMC: replicate ladders sharded over a mesh.

The SMC engine's replicate runs are fully independent (each ladder
carries its own particles, temperatures, and logZ estimate), so the
multi-chip form is collective-free — the exact analogue of
``parallel_nested_sampling``'s runs axis: R ladders execute as ONE
``shard_map`` program over a ``runs`` mesh axis, each device advancing
its block of runs through the engine's flat-chain while_loop.  Per-run
RNG keys are split identically to the single-device path, so a mesh run
reproduces ``smc_sampler``'s output bit-for-bit given the same key.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..engines.smc import (
    SMCConfig,
    SMCResult,
    _smc_ladders,
    prepare_smc_starting_points,
    states_to_result,
)
from ..models.problem import InferenceProblem

__all__ = ["parallel_smc"]


@functools.lru_cache(maxsize=16)
def _parallel_smc_program(mesh, cfg: SMCConfig):
    """R independent ladders as ONE jitted shard_map program, cached per
    (mesh, static config) with the problem as a pytree argument."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("runs"), P("runs"), P()),
        out_specs=P("runs"),
        check_vma=False,
    )
    def sharded(keys_shard, particles_shard, problem):
        # each device advances its own run block in one flat-chain
        # while_loop (shards terminate independently — no cross-device
        # lockstep, since the ladders share nothing)
        return _smc_ladders(problem, particles_shard, keys_shard, cfg)

    return jax.jit(sharded)


def parallel_smc(
    problem: InferenceProblem,
    key,
    *,
    num_runs: int = 8,
    n_particles: int = 1000,
    mesh: Optional[Mesh] = None,
    starting_points=None,
    max_stages: int = 100,
    mcmc_steps: int = 10,
    ess_target: float = 0.5,
    covariance_learn_delay: int = 10,
) -> SMCResult:
    """``num_runs`` independent SMC ladders across the mesh ``runs`` axis;
    same contract (and, per key, the same result) as
    :func:`..engines.smc_sampler`."""
    if mesh is None:
        # largest device count that divides the runs evenly
        n_dev = max(1, min(num_runs, len(jax.devices())))
        n_use = max(d for d in range(1, n_dev + 1) if num_runs % d == 0)
        mesh = Mesh(jax.devices()[:n_use], ("runs",))
    n_shards = mesh.shape["runs"]
    if num_runs % n_shards != 0:
        raise ValueError(
            f"num_runs={num_runs} must be a multiple of the mesh 'runs' "
            f"axis size {n_shards}"
        )
    key = jax.random.PRNGKey(0) if key is None else key
    k_start, k_runs = jax.random.split(key)
    starting_points, n_particles = prepare_smc_starting_points(
        problem, k_start, starting_points, num_runs, n_particles
    )
    cfg = SMCConfig(
        max_stages=max_stages,
        mcmc_steps=mcmc_steps,
        ess_target=float(ess_target),
        covariance_learn_delay=covariance_learn_delay,
    )
    program = _parallel_smc_program(mesh, cfg)
    states = program(
        jax.random.split(k_runs, num_runs), starting_points, problem
    )
    return states_to_result(states, cfg, problem.param_names)
