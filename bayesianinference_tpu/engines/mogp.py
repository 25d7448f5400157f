"""Multi-output (coregionalized) GP regression with hyperparameter
posteriors.

Beyond-reference model family (the reference GP hard-rejects
multi-output targets, BayesianGaussianProcess.wl:209-226):
``define_multi_output_gp`` mirrors the ``define_gaussian_process``
surface for T correlated outputs via the intrinsic coregionalization
model (:mod:`..ops.mogp`): one input kernel, a learned B = a a^T +
diag(d) output covariance, per-output noise.  Missing observations
(output t unmeasured at input i) are declared with an ``observed``
mask and enter as static gather indices — the fitted model then
transfers signal across outputs into the gaps, which is the point of
multi-task GPs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..dists.pointwise import PointwiseMixture
from ..dists.scalar import Normal
from ..engines.evidence import NestedSamplingResult
from ..models.problem import InferenceProblem, define_inference_problem
from ..ops.mogp import (
    mogp_log_marginal_kronecker,
    mogp_log_marginal_likelihood,
    mogp_posterior_moments,
)

__all__ = [
    "MOGPModel",
    "define_multi_output_gp",
    "predict_from_multi_output_gp",
]


def _f(x):
    return jnp.asarray(x, jnp.result_type(jnp.asarray(x).dtype, float))


@dataclasses.dataclass(frozen=True)
class MOGPModel:
    """Model functions attached to a multi-output GP problem.

    ``b_builder(theta) -> [T, T]`` (use :func:`..ops.mogp.coregional_matrix`),
    ``noise_builder(theta) -> [T] | scalar`` (optional)."""

    x: jnp.ndarray  # [n, d]
    y_obs: jnp.ndarray  # [k] observed flat values (output-major gather)
    num_outputs: int
    kernel_builder: Callable
    b_builder: Callable
    noise_builder: Optional[Callable] = None
    observed_idx: Optional[jnp.ndarray] = None  # [k] or None (= all)
    jitter: float = 1e-6
    method: str = "dense"  # "dense" | "kronecker"
    y_grid: Optional[jnp.ndarray] = None  # [n, T] when fully observed

    def _noise(self, theta):
        if self.noise_builder is None:
            return None
        nv = _f(self.noise_builder(theta))
        return jnp.broadcast_to(nv, (self.num_outputs,))

    def log_marginal_likelihood(self, theta) -> jnp.ndarray:
        if self.method == "kronecker":
            nv = self._noise(theta)
            return mogp_log_marginal_kronecker(
                self.kernel_builder(theta),
                self.b_builder(theta),
                self.x,
                self.y_grid,
                nv[0] if nv is not None else 0.0,
                jitter=self.jitter,
            )
        return mogp_log_marginal_likelihood(
            self.kernel_builder(theta),
            self.b_builder(theta),
            self.x,
            self.y_obs,
            noise_variances=self._noise(theta),
            observed_idx=self.observed_idx,
            jitter=self.jitter,
        )

    def posterior_moments(self, theta, x_query):
        return mogp_posterior_moments(
            self.kernel_builder(theta),
            self.b_builder(theta),
            self.x,
            self.y_obs,
            x_query,
            noise_variances=self._noise(theta),
            observed_idx=self.observed_idx,
            jitter=self.jitter,
        )

    def predict_bytes_per_sample(self) -> int:
        k = self.y_obs.shape[0]
        return 4 * k * k


def define_multi_output_gp(
    x,
    y,
    kernel_builder: Callable,
    b_builder: Callable,
    parameters,
    *,
    noise_builder: Optional[Callable] = None,
    observed=None,
    jitter: float = 1e-6,
    method: str = "dense",
    prior_distribution=None,
    log_prior: Optional[Callable] = None,
    validate: bool = True,
    key=None,
) -> InferenceProblem:
    """Inference problem for coregionalized-GP hyperparameters.

    ``y``: [n, T] outputs (NaN entries are treated as missing);
    ``observed``: optional [n, T] boolean mask overriding the NaN rule.
    The mask is resolved HOST-SIDE into static gather indices, so the
    jitted likelihood keeps fixed shapes.

    ``method="kronecker"`` switches the logML to the Saatci
    eigendecomposition identity — O(n^3 + T^3) instead of O((nT)^3) —
    valid only for a FULL observation grid with a SCALAR noise builder
    (raises otherwise; the noise builder must return a scalar, which is
    broadcast per output in the dense path)."""
    if method not in ("dense", "kronecker"):
        raise ValueError(f"method must be dense or kronecker, got {method!r}")
    x = jnp.atleast_2d(_f(x))
    y = np.asarray(y, float)
    if y.ndim != 2 or y.shape[0] != x.shape[0]:
        raise ValueError(
            f"need x [n, d] and y [n, T]; got {x.shape} and {y.shape}"
        )
    n, t = y.shape
    if t < 2:
        raise ValueError(
            "multi-output GP needs T >= 2 outputs; use "
            "define_gaussian_process for one"
        )
    if observed is None:
        observed = ~np.isnan(y)
    observed = np.asarray(observed, bool)
    if observed.shape != y.shape:
        raise ValueError(
            f"observed mask {observed.shape} must match y {y.shape}"
        )
    if not observed.any():
        raise ValueError("no observed entries")
    if np.isnan(y[observed]).any():
        raise ValueError("NaN y entries flagged observed")
    # output-major flat order must match ops.mogp_covariance
    flat_mask = observed.T.reshape(-1)  # [T*n]
    idx = np.nonzero(flat_mask)[0].astype(np.int32)
    y_obs = jnp.asarray(y.T.reshape(-1)[idx])
    all_observed = bool(observed.all())
    if method == "kronecker" and not all_observed:
        raise ValueError(
            "method='kronecker' needs every output observed at every "
            "input (use the dense default for missing data)"
        )

    model = MOGPModel(
        x=x,
        y_obs=y_obs,
        num_outputs=t,
        kernel_builder=kernel_builder,
        b_builder=b_builder,
        noise_builder=noise_builder,
        observed_idx=None if all_observed else jnp.asarray(idx),
        jitter=float(jitter),
        method=method,
        y_grid=jnp.asarray(y) if all_observed else None,
    )
    return define_inference_problem(
        parameters=parameters,
        log_likelihood=model.log_marginal_likelihood,
        prior_distribution=prior_distribution,
        log_prior=log_prior,
        validate=validate,
        key=key,
        multi_output_gp=model,
    )


def predict_from_multi_output_gp(
    result,
    problem: InferenceProblem,
    points,
    *,
    max_samples: Optional[int] = 256,
    sample_chunk: Optional[int] = None,
):
    """Posterior-averaged predictions of EVERY output at query points —
    the ``predict_from_gaussian_process`` design over the [m, T] grid.
    Returns a :class:`PointwiseMixture` whose point axis is the
    FLATTENED (query, output) grid in output-major order: reshape
    ``mean()`` etc. with ``.reshape(T, m).T``."""
    model: MOGPModel = (problem.metadata or {}).get("multi_output_gp")
    if model is None:
        raise ValueError("problem has no attached MOGPModel metadata")
    points = jnp.atleast_2d(_f(points))

    if isinstance(result, NestedSamplingResult):
        thetas = result.points
        log_w = result.crude_log_posterior_weights
    else:
        thetas = jnp.asarray(getattr(result, "points", result))
        if thetas.ndim == 1:
            thetas = thetas[None, :]
        lw = getattr(result, "log_weights", None)
        log_w = (
            jnp.asarray(lw)
            if lw is not None
            else jnp.zeros((thetas.shape[0],), thetas.dtype)
        )
    if max_samples is not None and thetas.shape[0] > max_samples:
        order = jnp.argsort(-log_w)[:max_samples]
        thetas, log_w = thetas[order], log_w[order]

    def one(theta):
        mean, std = model.posterior_moments(theta, points)  # [m, T]
        return mean.T.reshape(-1), std.T.reshape(-1)  # output-major flat

    n_samp = thetas.shape[0]
    if sample_chunk is None:
        per = model.predict_bytes_per_sample()
        sample_chunk = max(1, min(n_samp, int(4e9) // max(per, 1)))
    if sample_chunk >= n_samp:
        means, stds = jax.vmap(one)(thetas)
    else:
        means, stds = jax.lax.map(one, thetas, batch_size=sample_chunk)
    return PointwiseMixture(
        log_weights=log_w,
        component=Normal(loc=means, scale=jnp.maximum(stds, 1e-12)),
    )
