"""Gradient-based posterior sampling: the HMC engine front-end.

Beyond-reference engine (the reference's samplers are gradient-free,
BS:655-745); see :mod:`..ops.hmc` for the kernel design rationale
(fixed jittered trajectories, windowed warmup, vmapped chains).

Box-bounded problems are sampled in UNCONSTRAINED coordinates through
the shared :func:`..core.transforms.box_bijection` with its log-Jacobian
added to the density — trajectories never hit the support boundary, so
there is no boundary-rejection waste and no sentinel cliffs in the
gradient field.  Extra ``constraint`` predicates (non-box) still guard
by rejection.

Serving convention: the jitted program takes the problem as a PYTREE
argument, so repeated fits on fresh same-shape data
(``problem.with_data``) reuse the compiled program (zero retrace).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.containers import WeightedSamples
from ..core.numerics import as_hashable_fn
from ..core.transforms import box_bijection
from ..models.problem import InferenceProblem
from ..ops.hmc import warmup_and_sample

__all__ = ["HMCResult", "hmc_sample"]


def _run_kernel(
    key,
    z0,
    z_density,
    *,
    num_warmup,
    num_samples,
    num_leapfrog,
    thinning,
    target_accept,
    initial_step_size,
    axis_name,
    dense_mass,
    max_leapfrog,
):
    """Dispatch fixed-length vs ChEES-adaptive trajectories; uniform
    5-tuple return (samples, states, step_size, inv_mass, traj_len) —
    for the fixed kernel the reported trajectory length is the realized
    ``num_leapfrog * step_size``."""
    if num_leapfrog == "auto":
        from ..ops.chees import chees_warmup_and_sample

        return chees_warmup_and_sample(
            key,
            z0,
            z_density,
            num_warmup=num_warmup,
            num_samples=num_samples,
            max_leapfrog=max_leapfrog,
            thinning=thinning,
            target_accept=target_accept,
            initial_step_size=initial_step_size,
            axis_name=axis_name,
            dense_mass=dense_mass,
        )
    z_samples, states, step_size, inv_mass = warmup_and_sample(
        key,
        z0,
        z_density,
        num_warmup=num_warmup,
        num_samples=num_samples,
        num_leapfrog=num_leapfrog,
        thinning=thinning,
        target_accept=target_accept,
        initial_step_size=initial_step_size,
        axis_name=axis_name,
        dense_mass=dense_mass,
    )
    return z_samples, states, step_size, inv_mass, num_leapfrog * step_size


def bijected_warmup_and_sample(
    x0,
    key,
    problem: InferenceProblem,
    *,
    num_warmup,
    num_samples,
    num_leapfrog,
    thinning,
    target_accept,
    initial_step_size,
    axis_name=None,
    dense_mass=False,
    max_leapfrog=256,
):
    """z-space warmup + sampling through the shared box bijection — the
    traced core of both the single-device program and the mesh-sharded
    one (:func:`..parallel.parallel_hmc` passes ``axis_name`` so warmup
    adaptation rides collectives).  ``num_leapfrog="auto"`` learns the
    trajectory length by ChEES ascent (:mod:`..ops.chees`) capped at
    ``max_leapfrog`` steps.  Returns (constrained samples, final
    states, step_size, inv_mass_diag, trajectory_length)."""
    bij = box_bijection(problem.lower, problem.upper)

    def z_density(z):
        x = bij.to_x(z)
        return problem.log_posterior_density(x) + bij.log_jacobian(z)

    z0 = jax.vmap(bij.to_z)(x0)
    z_samples, states, step_size, inv_mass, traj_len = _run_kernel(
        key,
        z0,
        z_density,
        num_warmup=num_warmup,
        num_samples=num_samples,
        num_leapfrog=num_leapfrog,
        thinning=thinning,
        target_accept=target_accept,
        initial_step_size=initial_step_size,
        axis_name=axis_name,
        dense_mass=dense_mass,
        max_leapfrog=max_leapfrog,
    )
    samples = jax.vmap(jax.vmap(bij.to_x))(z_samples)
    return samples, states, step_size, inv_mass, traj_len


def states_to_hmc_result(
    samples, states, step_size, inv_mass, param_names, trajectory_length=None
) -> "HMCResult":
    """Assemble the public result from kernel outputs — shared by the
    single-device front-end and the mesh-parallel one."""
    dtype = samples.dtype
    acc = states.accepted.astype(dtype) / jnp.maximum(
        states.proposed.astype(dtype), 1.0
    )
    return HMCResult(
        samples=samples,
        acceptance_rates=acc,
        divergences=states.divergences,
        step_size=step_size,
        inv_mass_diag=inv_mass,
        param_names=param_names,
        trajectory_length=trajectory_length,
    )


def _meta(default=None):
    return dataclasses.field(default=default, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HMCResult:
    """Output of :func:`hmc_sample`."""

    samples: jnp.ndarray  # [chains, num_samples, d] (constrained space)
    acceptance_rates: jnp.ndarray  # [chains] sampling-phase acceptance
    divergences: jnp.ndarray  # [chains] sampling-phase divergent trajectories
    step_size: jnp.ndarray  # adapted leapfrog step size
    inv_mass_diag: jnp.ndarray  # [d] adapted inverse mass (z-space);
    # the full [d, d] posterior covariance when fitted with dense_mass
    param_names: Tuple[str, ...] = _meta(())
    # realized trajectory time eps*L — ChEES-learned for
    # num_leapfrog="auto", else the fixed product (z-space units)
    trajectory_length: jnp.ndarray = None

    @property
    def num_chains(self) -> int:
        return self.samples.shape[0]

    def posterior_samples(self) -> WeightedSamples:
        """All chains pooled as equal-weight posterior samples."""
        c, n, d = self.samples.shape
        pts = self.samples.reshape(c * n, d)
        return WeightedSamples(
            points=pts, log_weights=jnp.zeros((c * n,), pts.dtype)
        )

    def per_parameter_chains(self, i: int) -> jnp.ndarray:
        """[chains, num_samples] marginal draws of parameter ``i`` — the
        shape the convergence diagnostics consume (``gelman_rubin``,
        ``effective_sample_size``)."""
        return self.samples[..., i]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_warmup",
        "num_samples",
        "num_leapfrog",
        "thinning",
        "target_accept",
        "initial_step_size",
        "dense_mass",
        "max_leapfrog",
    ),
)
def _hmc_problem_program(
    x0,
    key,
    problem: InferenceProblem,
    num_warmup,
    num_samples,
    num_leapfrog,
    thinning,
    target_accept,
    initial_step_size,
    dense_mass,
    max_leapfrog,
):
    return bijected_warmup_and_sample(
        x0,
        key,
        problem,
        num_warmup=num_warmup,
        num_samples=num_samples,
        num_leapfrog=num_leapfrog,
        thinning=thinning,
        target_accept=target_accept,
        initial_step_size=initial_step_size,
        dense_mass=dense_mass,
        max_leapfrog=max_leapfrog,
    )


@functools.lru_cache(maxsize=32)
def _hmc_density_program(
    log_density,
    num_warmup,
    num_samples,
    num_leapfrog,
    thinning,
    target_accept,
    initial_step_size,
    dense_mass,
    max_leapfrog,
):
    """Jitted run for a raw (unbounded) density callable, bounded lru."""

    def run(x0, key):
        return _run_kernel(
            key,
            x0,
            log_density,
            num_warmup=num_warmup,
            num_samples=num_samples,
            num_leapfrog=num_leapfrog,
            thinning=thinning,
            target_accept=target_accept,
            initial_step_size=initial_step_size,
            axis_name=None,
            dense_mass=dense_mass,
            max_leapfrog=max_leapfrog,
        )

    return jax.jit(run)


def hmc_sample(
    target: Union[InferenceProblem, Callable],
    key,
    *,
    num_chains: int = 4,
    num_samples: int = 1000,
    num_warmup: int = 500,
    num_leapfrog: Union[int, str] = 32,
    thinning: int = 1,
    target_accept: float = 0.8,
    starting_points=None,
    initial_step_size: float = 0.1,
    dense_mass: bool = False,
    max_leapfrog: int = 256,
) -> HMCResult:
    """Run ``num_chains`` vmapped HMC chains with windowed warmup.

    ``target`` is an :class:`InferenceProblem` (sampled through the box
    bijection in unconstrained space; starting points default to prior
    draws) or a raw ``log_density(theta)`` callable over R^d (then
    ``starting_points`` [chains, d] is required).

    ``starting_points="pathfinder"`` seeds the chains from a quick
    multi-path Pathfinder fit (:func:`.pathfinder.pathfinder_fit`)
    instead of the prior — posterior-typical initial points, so the
    warmup no longer has to walk in from the prior and ``num_warmup``
    can often be cut several-fold on hard targets (Zhang et al. 2022's
    production use).  ``starting_points="flow"`` does the same with a
    quick RealNVP fit (:func:`.flow_vi.flow_vi_fit`) — prefer it on
    curved targets where Gaussian seeds cluster off the ridge.
    Problem targets only.

    ``num_leapfrog`` is the fixed trajectory length (step size adapts to
    ``target_accept``; the product eps*L should roughly cover the
    posterior scale — raise L for very correlated targets), or
    ``"auto"`` to LEARN the trajectory length during warmup by ChEES
    gradient ascent (:mod:`..ops.chees`; capped at ``max_leapfrog``
    steps per trajectory) — the no-tuning default for unfamiliar
    targets; the learned eps*L is reported as
    :attr:`HMCResult.trajectory_length`.
    ``dense_mass=True`` adapts the FULL posterior covariance as the
    inverse mass (momentum decorrelation) instead of per-coordinate
    variances — prefer it for strongly correlated posteriors at moderate
    d, where it buys what longer trajectories otherwise would.
    Multi-chain outputs feed ``results.diagnostics.gelman_rubin``
    directly via :meth:`HMCResult.per_parameter_chains`."""
    if num_leapfrog != "auto" and (
        not isinstance(num_leapfrog, int) or num_leapfrog < 1
    ):
        raise ValueError(
            f'num_leapfrog must be a positive int or "auto", got '
            f"{num_leapfrog!r}"
        )
    key = jax.random.PRNGKey(0) if key is None else key
    k_start, k_run = jax.random.split(key)

    if isinstance(starting_points, str):
        if starting_points not in ("pathfinder", "flow"):
            raise ValueError(
                f"unknown starting_points {starting_points!r}; expected "
                'an array, "pathfinder", or "flow"'
            )
        if not isinstance(target, InferenceProblem):
            raise ValueError(
                f'starting_points="{starting_points}" needs an '
                "InferenceProblem target"
            )
        k_fit, k_draw = jax.random.split(k_start)
        if starting_points == "pathfinder":
            from .pathfinder import pathfinder_fit

            pf = pathfinder_fit(
                target,
                k_fit,
                num_paths=min(max(num_chains, 4), 8),
                num_draws_per_path=128,
            )
            starting_points = pf.posterior_samples(k_draw, num_chains).points
        else:
            from .flow_vi import flow_vi_fit

            fl = flow_vi_fit(
                target,
                k_fit,
                num_steps=1000,
                final_evidence_samples=256,
            )
            starting_points = fl.sample(k_draw, num_chains)

    if isinstance(target, InferenceProblem):
        if starting_points is None:
            from .nested_sampling import generate_starting_points

            starting_points = generate_starting_points(
                target, k_start, num_chains
            )
        starting_points = jnp.asarray(starting_points)
        if starting_points.shape != (num_chains, target.dim):
            raise ValueError(
                f"starting_points must be [{num_chains}, {target.dim}]"
            )
        samples, states, step_size, inv_mass, traj_len = _hmc_problem_program(
            starting_points,
            k_run,
            target,
            num_warmup,
            num_samples,
            num_leapfrog,
            thinning,
            float(target_accept),
            float(initial_step_size),
            bool(dense_mass),
            int(max_leapfrog),
        )
        names = target.param_names
    else:
        if starting_points is None:
            raise ValueError(
                "raw-density targets need explicit starting_points "
                "[num_chains, d]"
            )
        starting_points = jnp.asarray(
            starting_points, jnp.result_type(float)
        )
        if (
            starting_points.ndim != 2
            or starting_points.shape[0] != num_chains
        ):
            raise ValueError(
                f"starting_points must be [{num_chains}, d], got shape "
                f"{starting_points.shape}"
            )
        prog = _hmc_density_program(
            as_hashable_fn(target),
            num_warmup,
            num_samples,
            num_leapfrog,
            thinning,
            float(target_accept),
            float(initial_step_size),
            bool(dense_mass),
            int(max_leapfrog),
        )
        samples, states, step_size, inv_mass, traj_len = prog(
            starting_points, k_run
        )
        names = tuple(
            f"x{i}" for i in range(starting_points.shape[-1])
        )

    return states_to_hmc_result(
        samples, states, step_size, inv_mass, names, traj_len
    )
