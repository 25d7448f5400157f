"""Gaussian-process regression with full hyperparameter posteriors.

From-scratch JAX implementation of ``BayesianGaussianProcess.wl``:
``defineGaussianProcess`` (GP:201-330) builds an
:class:`~..models.problem.InferenceProblem` whose likelihood is the GP log
marginal likelihood, feeding any engine (nested sampling for full
posteriors, Laplace, plain MCMC); ``predictFromGaussianProcess``
(GP:332-422) becomes a *batched* predictor — one vmapped Cholesky over the
whole posterior-sample axis instead of the reference's per-sample
refactorization loop.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.standardize import NormalizedData, normalize_data
from ..dists.pointwise import PointwiseMixture
from ..dists.scalar import Normal
from ..engines.evidence import NestedSamplingResult
from ..models.problem import InferenceProblem, define_inference_problem
from ..ops.gp_kernels import (
    covariance_matrix,
    gp_log_marginal_likelihood,
    gp_posterior_moments,
)

__all__ = [
    "GPModel",
    "coordinate_bounds_grid",
    "define_gaussian_process",
    "predict_from_gaussian_process",
]


def coordinate_bounds_grid(x, num: int) -> jnp.ndarray:
    """Cartesian query grid with ``num`` points per dimension spanning the
    coordinate bounds of the training inputs — the reference's
    ``CoordinateBoundsArray[CoordinateBounds[data], Into[num - 1]]``
    (GP:332-341).  Returns a flattened [num^d, d] matrix."""
    if num < 2:
        raise ValueError("need at least 2 grid points per dimension")
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]  # n points in 1-D, not one point in n-D
    lo = jnp.min(x, axis=0)
    hi = jnp.max(x, axis=0)
    axes = [jnp.linspace(lo[j], hi[j], num) for j in range(x.shape[1])]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([m.ravel() for m in mesh], axis=-1)


def _f(x):
    return jnp.asarray(x, jnp.result_type(jnp.asarray(x).dtype, float))


@dataclasses.dataclass(frozen=True)
class GPModel:
    """The model functions attached to a GP problem
    ("GaussianProcessData" -> "ModelFunctions", GP:314-321).

    * ``kernel_builder(theta) -> Kernel``  (None => pure-nugget model,
      the reference's null-kernel case, GP:25-27)
    * ``nugget_builder(theta) -> scalar | [n] | callable``  (optional)
    * ``mean_builder(theta) -> callable x -> [n]``  (optional)
    """

    x: jnp.ndarray  # [n, d]
    y: jnp.ndarray  # [n]
    kernel_builder: Optional[Callable]
    nugget_builder: Optional[Callable] = None
    mean_builder: Optional[Callable] = None
    # "direct" = Cholesky logML (reference default, GP:290-296);
    # "automatic" = MVN log_prob (covarianceFunction -> Automatic, GP:268-289)
    logml_method: str = "direct"

    def _pieces(self, theta):
        kernel = self.kernel_builder(theta) if self.kernel_builder else None
        nugget = self.nugget_builder(theta) if self.nugget_builder else None
        mean_fn = self.mean_builder(theta) if self.mean_builder else None
        return kernel, nugget, mean_fn

    def log_marginal_likelihood(self, theta) -> jnp.ndarray:
        """logML(theta); the null-kernel model reduces to an independent
        heteroscedastic Gaussian likelihood (diagonal covariance,
        GP:27, GP:156-159)."""
        kernel, nugget, mean_fn = self._pieces(theta)
        mean = mean_fn(self.x) if mean_fn is not None else 0.0
        y = self.y - mean
        if kernel is None:
            nug = nugget(self.x) if callable(nugget) else jnp.broadcast_to(
                _f(nugget), y.shape
            )
            return jnp.sum(Normal(loc=0.0, scale=jnp.sqrt(nug)).log_prob(y))
        # Cholesky reads one triangle; built-in (declared-symmetric)
        # kernels skip the symmetrization HBM pass, user kernels keep it
        k = covariance_matrix(
            kernel, self.x, nugget, symmetrize=not kernel.exactly_symmetric
        )
        if self.logml_method == "automatic":
            from ..dists.multivariate import MultivariateNormal

            return jnp.sum(
                MultivariateNormal(
                    mean_=jnp.zeros_like(y), cov=k
                ).log_prob(y)
            )
        return gp_log_marginal_likelihood(k, y)

    def posterior_moments(self, theta, x_query, query_nugget: bool = True):
        kernel, nugget, mean_fn = self._pieces(theta)
        if kernel is None:
            # pure-nugget: prediction is the (mean fn, nugget) prior
            m = mean_fn(x_query) if mean_fn is not None else jnp.zeros(
                x_query.shape[0]
            )
            nug = nugget(x_query) if callable(nugget) else jnp.broadcast_to(
                _f(nugget), (x_query.shape[0],)
            )
            return m, jnp.sqrt(nug)
        return gp_posterior_moments(
            kernel,
            self.x,
            self.y,
            x_query,
            nugget=nugget,
            mean_fn=mean_fn,
            query_nugget=query_nugget,
        )

    def predict_bytes_per_sample(self) -> int:
        """Peak f32 bytes per vmapped posterior sample (the [n, n]
        covariance stack dominates) — drives the sample chunking in
        ``predict_from_gaussian_process``; the sparse model
        (``sparse_gp.SGPRModel``) overrides with its O(m n) footprint."""
        return 4 * self.x.shape[0] * self.x.shape[0]


def define_gaussian_process(
    x,
    y,
    kernel_builder: Optional[Callable],
    parameters,
    *,
    nugget_builder: Optional[Callable] = None,
    mean_builder: Optional[Callable] = None,
    prior_distribution=None,
    log_prior: Optional[Callable] = None,
    normalize: bool = False,
    validate: bool = True,
    key=None,
    log_likelihood_method: str = "direct",
) -> InferenceProblem:
    """Build the inference problem for GP hyperparameter inference
    (``defineGaussianProcess``, GP:201-330).

    ``y`` must be 1-D (the reference's 1-D-output restriction, GP:209-226).
    With ``normalize=True`` the data is standardized and the transforms are
    attached to the problem metadata (GP:214-218).
    ``log_likelihood_method``: "direct" (Cholesky path, the reference
    default) or "automatic" (MVN log-density, the reference's
    ``covarianceFunction -> Automatic`` option, GP:268-289); both must
    agree to numerical precision.
    """
    if log_likelihood_method not in ("direct", "automatic"):
        raise ValueError(f"bad log_likelihood_method {log_likelihood_method!r}")
    x = jnp.atleast_2d(_f(x))
    y = _f(y)
    if y.ndim == 2:
        if y.shape[1] != 1:
            raise ValueError(
                f"only 1-D output supported for GP regression, got {y.shape}"
            )
        y = y[:, 0]
    if x.shape[0] != y.shape[0]:
        raise ValueError("input and output data are not of the same length")
    norm: Optional[NormalizedData] = None
    if normalize:
        norm = normalize_data(x, y[:, None])
        x, y = norm.x, norm.y[:, 0]

    model = GPModel(
        x=x,
        y=y,
        kernel_builder=kernel_builder,
        nugget_builder=nugget_builder,
        mean_builder=mean_builder,
        logml_method=log_likelihood_method,
    )
    problem = define_inference_problem(
        parameters=parameters,
        log_likelihood=model.log_marginal_likelihood,
        prior_distribution=prior_distribution,
        log_prior=log_prior,
        validate=validate,
        key=key,
        gaussian_process=model,
        data_preprocessors=norm,
    )
    return problem


def predict_from_gaussian_process(
    result: NestedSamplingResult,
    problem: InferenceProblem,
    points,
    *,
    query_nugget: bool = True,
    max_samples: Optional[int] = 512,
    sample_chunk: Optional[int] = None,
) -> PointwiseMixture:
    """Posterior-predictive GP at query points (GP:332-394): for each
    posterior hyperparameter sample a Gaussian N(m*, s*), mixed with the
    crude posterior weights.  All samples are processed as ONE vmapped
    batch (batched covariance assembly + batched Cholesky), unlike the
    reference's per-sample refactorization (GP:396-422).

    ``sample_chunk`` bounds peak memory: the vmapped batch materializes a
    [S, n, n] covariance stack (32 GB at S=512, n=4k), so chunks of
    ``sample_chunk`` samples are mapped sequentially instead.  Defaults
    to an automatic choice keeping the stack under ~4 GB.

    Returns a :class:`PointwiseMixture` over the query axis: its
    ``mean()``/``variance()``/``log_prob``/``quantile``/``sample`` are all
    vectorized over the m query points.
    """
    model: GPModel = (problem.metadata or {}).get("gaussian_process")
    if model is None:
        raise ValueError("problem has no attached GPModel metadata")
    import numbers

    if isinstance(points, numbers.Integral) and not isinstance(points, bool):
        # integer argument (incl. numpy integer scalars): grid over the
        # training-data coordinate bounds (GP:332-341)
        points = coordinate_bounds_grid(model.x, int(points))
    points = jnp.atleast_2d(_f(points))

    if isinstance(result, NestedSamplingResult):
        log_w = result.crude_log_posterior_weights
        thetas = result.points
    else:
        # any weighted-sample carrier (WeightedSamples, Empirical, or a
        # plain [S, d] array of equally-weighted posterior draws, e.g.
        # from a Laplace fit or an MCMC chain)
        thetas = jnp.asarray(getattr(result, "points", result))
        lw = getattr(result, "log_weights", None)
        log_w = (
            jnp.asarray(lw)
            if lw is not None
            else jnp.zeros((thetas.shape[0],), thetas.dtype)
        )
    if max_samples is not None and thetas.shape[0] > max_samples:
        import warnings

        warnings.warn(
            f"predict_from_gaussian_process: truncating to the "
            f"{max_samples} highest-weight posterior samples of "
            f"{thetas.shape[0]} (pass max_samples=None to keep all)",
            stacklevel=2,
        )
        order = jnp.argsort(-log_w)[:max_samples]
        thetas, log_w = thetas[order], log_w[order]

    def one(theta):
        return model.posterior_moments(theta, points, query_nugget)

    n_samp = thetas.shape[0]
    if sample_chunk is None:
        # keep the per-sample working set (model-reported: [n, n] dense,
        # [m, n] sparse) under ~4 GB (f32)
        per = getattr(
            model, "predict_bytes_per_sample",
            lambda: 4 * model.x.shape[0] ** 2,
        )()
        sample_chunk = max(1, min(n_samp, int(4e9) // max(per, 1)))
    if sample_chunk >= n_samp:
        means, stds = jax.vmap(one)(thetas)  # [S, m], [S, m]
    else:
        means, stds = jax.lax.map(one, thetas, batch_size=sample_chunk)
    return PointwiseMixture(
        log_weights=log_w,
        component=Normal(loc=means, scale=jnp.maximum(stds, 1e-12)),
    )
