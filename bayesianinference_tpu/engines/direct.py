"""Direct (quadrature) posterior for low-dimensional problems.

From-scratch equivalent of ``directPosteriorDistribution``
(BayesianStatistics.wl:66-131): posterior density = prior x likelihood,
evidence by numerical integration over the parameter box.  The reference
delegates to ``NIntegrate``; here the integral is a tensor-product
Gauss-Legendre rule evaluated as ONE vmapped batch on device — exact for
smooth integrands at modest order, and trivially jit/grad-able.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.numerics import logsumexp
from ..models.problem import InferenceProblem, define_inference_problem

__all__ = ["DirectPosterior", "direct_posterior_distribution", "gauss_legendre_grid"]


def gauss_legendre_grid(lower, upper, num_points: int):
    """Tensor-product Gauss-Legendre nodes/log-weights over a box.

    Returns (nodes [N, d], log_weights [N]) with N = num_points^d."""
    lower = np.atleast_1d(np.asarray(lower, float))
    upper = np.atleast_1d(np.asarray(upper, float))
    d = lower.shape[0]
    x, w = np.polynomial.legendre.leggauss(num_points)
    nodes_1d, logw_1d = [], []
    for i in range(d):
        half = 0.5 * (upper[i] - lower[i])
        mid = 0.5 * (upper[i] + lower[i])
        nodes_1d.append(mid + half * x)
        logw_1d.append(np.log(w * half))
    grids = np.meshgrid(*nodes_1d, indexing="ij")
    nodes = np.stack([g.ravel() for g in grids], axis=-1)
    wgrids = np.meshgrid(*logw_1d, indexing="ij")
    log_weights = sum(g.ravel() for g in wgrids)
    return jnp.asarray(nodes), jnp.asarray(log_weights)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DirectPosterior:
    """Normalized posterior on a quadrature grid — the analogue of the
    reference's ``ProbabilityDistribution`` output (BS:119-126).

    ``log_pdf(theta)`` evaluates the normalized posterior density anywhere;
    moments and sampling use the grid.
    """

    nodes: jnp.ndarray  # [N, d]
    log_quad_weights: jnp.ndarray  # [N]
    node_log_density: jnp.ndarray  # [N] unnormalized log pdf at nodes
    log_evidence: jnp.ndarray
    log_density: Callable = dataclasses.field(
        default=None, metadata=dict(static=True), repr=False
    )

    def log_pdf(self, theta):
        return self.log_density(theta) - self.log_evidence

    def _node_log_mass(self):
        lw = self.log_quad_weights + self.node_log_density - self.log_evidence
        return lw - logsumexp(lw)

    def mean(self):
        w = jnp.exp(self._node_log_mass())
        return jnp.einsum("n,nd->d", w, self.nodes)

    def covariance(self):
        w = jnp.exp(self._node_log_mass())
        mu = jnp.einsum("n,nd->d", w, self.nodes)
        c = self.nodes - mu
        return jnp.einsum("n,ni,nj->ij", w, c, c)

    def variance(self):
        return jnp.diagonal(self.covariance())

    def sample(self, key, shape=()):
        """Grid-cell sampling by inverse CDF (adequate at quadrature
        order).  searchsorted on the weight cumsum is O((n+m) log n);
        ``jax.random.categorical`` would materialize an [m, n] Gumbel
        array (1.6 GB for 5k draws on a 200x200 grid)."""
        lw = self._node_log_mass()
        cdf = jnp.cumsum(jnp.exp(lw))
        u = jax.random.uniform(key, shape, dtype=cdf.dtype) * cdf[-1]
        idx = jnp.clip(jnp.searchsorted(cdf, u), 0, cdf.shape[0] - 1)
        return self.nodes[idx]


def _problem_log_density(problem, theta):
    """The quadrature integrand — defined ONCE so the jitted node
    evaluation and the returned ``DirectPosterior.log_density`` cannot
    drift apart."""
    return problem.guarded_log_likelihood(theta) + problem.guarded_log_prior(
        theta
    )


@jax.jit
def _direct_eval_program(problem, nodes, log_w):
    node_ld = jax.vmap(lambda th: _problem_log_density(problem, th))(nodes)
    return node_ld, logsumexp(log_w + node_ld)


def direct_posterior_distribution(
    *,
    problem: Optional[InferenceProblem] = None,
    log_likelihood: Optional[Callable] = None,
    likelihood: Optional[Callable] = None,
    data=None,
    prior_distribution=None,
    log_prior: Optional[Callable] = None,
    parameters: Optional[Sequence] = None,
    num_points: int = 64,
) -> DirectPosterior:
    """Exact/quadrature posterior + log evidence (BS:66-131).

    Either pass a ``problem`` or the same likelihood/prior specs accepted
    by :func:`~..models.problem.define_inference_problem`.  All parameters
    must have finite bounds (the integration box).  Cost is
    ``num_points ** d`` density evaluations in one vmapped batch — use for
    d <= 3 as the reference intends.
    """
    if problem is None:
        problem = define_inference_problem(
            parameters=parameters,
            log_likelihood=log_likelihood,
            likelihood=likelihood,
            data=data,
            prior_distribution=prior_distribution,
            log_prior=log_prior,
            validate=False,
        )
    if not (
        bool(jnp.all(jnp.isfinite(problem.lower)))
        and bool(jnp.all(jnp.isfinite(problem.upper)))
    ):
        raise ValueError("direct quadrature needs finite parameter bounds")
    nodes, log_w = gauss_legendre_grid(
        problem.lower, problem.upper, num_points
    )

    def log_density(theta):
        return _problem_log_density(problem, theta)

    # one jitted program with the problem as a PYTREE argument: its
    # static fields (the callables) key the cache, its traced leaves
    # (bounds, data) flow as arguments — with_data re-fits on fresh
    # same-shape data reuse the compiled evaluation
    node_ld, log_z = _direct_eval_program(problem, nodes, log_w)
    return DirectPosterior(
        nodes=nodes,
        log_quad_weights=log_w,
        node_log_density=node_ld,
        log_evidence=log_z,
        log_density=log_density,
    )
