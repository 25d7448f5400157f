"""Student-t process regression with full hyperparameter posteriors.

Beyond-reference model family (the reference GP is strictly Gaussian,
BayesianGaussianProcess.wl:161-199): ``define_t_process`` mirrors the
``define_gaussian_process`` surface exactly — same kernel/nugget/mean
builders, same engine compatibility (NS/HMC/SMC/Laplace) — with the
Gaussian marginal replaced by the heavy-tailed multivariate Student-t
(:mod:`..ops.t_process`, Shah et al. 2014).  The degrees of freedom can
be FIXED (``nu=4.0``) or INFERRED (``nu=callable(theta)``) like any
other hyperparameter — the logML carries a closed-form nu-gradient.

``predict_from_t_process`` is the batched predictor: one vmapped
Cholesky over the posterior-sample axis, returning a
:class:`~..dists.pointwise.PointwiseMixture` of StudentT components
(the exact MVT conditional per hyperparameter sample).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from ..core.standardize import NormalizedData, normalize_data
from ..dists.pointwise import PointwiseMixture
from ..dists.scalar import StudentT
from ..engines.evidence import NestedSamplingResult
from ..models.problem import InferenceProblem, define_inference_problem
from ..ops.gp_kernels import covariance_matrix
from ..ops.t_process import tp_log_marginal_likelihood, tp_posterior_moments

__all__ = [
    "TPModel",
    "define_t_process",
    "predict_from_t_process",
]


def _f(x):
    return jnp.asarray(x, jnp.result_type(jnp.asarray(x).dtype, float))


@dataclasses.dataclass(frozen=True)
class TPModel:
    """Model functions attached to a Student-t-process problem — the
    heavy-tailed analogue of :class:`.gp.GPModel`.

    ``nu_builder(theta) -> scalar`` supplies the degrees of freedom
    (a closed-over constant when ``nu`` was passed as a number)."""

    x: jnp.ndarray  # [n, d]
    y: jnp.ndarray  # [n]
    kernel_builder: Callable
    nu_builder: Callable
    nugget_builder: Optional[Callable] = None
    mean_builder: Optional[Callable] = None

    def _pieces(self, theta):
        kernel = self.kernel_builder(theta)
        nugget = self.nugget_builder(theta) if self.nugget_builder else None
        mean_fn = self.mean_builder(theta) if self.mean_builder else None
        return kernel, nugget, mean_fn, self.nu_builder(theta)

    def log_marginal_likelihood(self, theta) -> jnp.ndarray:
        kernel, nugget, mean_fn, nu = self._pieces(theta)
        mean = mean_fn(self.x) if mean_fn is not None else None
        k = covariance_matrix(
            kernel, self.x, nugget, symmetrize=not kernel.exactly_symmetric
        )
        return tp_log_marginal_likelihood(k, self.y, nu, mean=mean)

    def posterior_moments(self, theta, x_query, query_nugget: bool = True):
        kernel, nugget, mean_fn, nu = self._pieces(theta)
        return tp_posterior_moments(
            kernel,
            self.x,
            self.y,
            x_query,
            nu,
            nugget=nugget,
            mean_fn=mean_fn,
            query_nugget=query_nugget,
        )

    def predict_bytes_per_sample(self) -> int:
        return 4 * self.x.shape[0] * self.x.shape[0]


def define_t_process(
    x,
    y,
    kernel_builder: Callable,
    parameters,
    *,
    nu: Union[float, Callable] = 4.0,
    nugget_builder: Optional[Callable] = None,
    mean_builder: Optional[Callable] = None,
    prior_distribution=None,
    log_prior: Optional[Callable] = None,
    normalize: bool = False,
    validate: bool = True,
    key=None,
) -> InferenceProblem:
    """Build the inference problem for Student-t-process hyperparameter
    inference — the ``defineGaussianProcess`` surface (GP:201-330) with a
    heavy-tailed marginal.

    ``nu``: a fixed float (> 0), or a callable ``theta -> scalar`` to
    infer the degrees of freedom jointly with the other hyperparameters
    (e.g. ``nu=lambda th: th[2]`` with a third box parameter)."""
    if kernel_builder is None:
        raise ValueError(
            "define_t_process requires a kernel (the pure-nugget model "
            "has no Student-t analogue: a diagonal MVT is not an "
            "independent product)"
        )
    if callable(nu):
        nu_builder = nu
    else:
        if float(nu) <= 0:
            raise ValueError(f"nu must be positive, got {nu}")
        nu_const = float(nu)

        def nu_builder(theta, _v=nu_const):
            return jnp.asarray(_v)

    x = jnp.atleast_2d(_f(x))
    y = _f(y)
    if y.ndim == 2:
        if y.shape[1] != 1:
            raise ValueError(
                f"only 1-D output supported for TP regression, got {y.shape}"
            )
        y = y[:, 0]
    if x.shape[0] != y.shape[0]:
        raise ValueError("input and output data are not of the same length")
    norm: Optional[NormalizedData] = None
    if normalize:
        norm = normalize_data(x, y[:, None])
        x, y = norm.x, norm.y[:, 0]

    model = TPModel(
        x=x,
        y=y,
        kernel_builder=kernel_builder,
        nu_builder=nu_builder,
        nugget_builder=nugget_builder,
        mean_builder=mean_builder,
    )
    return define_inference_problem(
        parameters=parameters,
        log_likelihood=model.log_marginal_likelihood,
        prior_distribution=prior_distribution,
        log_prior=log_prior,
        validate=validate,
        key=key,
        t_process=model,
        data_preprocessors=norm,
    )


def predict_from_t_process(
    result,
    problem: InferenceProblem,
    points,
    *,
    query_nugget: bool = True,
    max_samples: Optional[int] = 512,
    sample_chunk: Optional[int] = None,
) -> PointwiseMixture:
    """Posterior-predictive TP at query points: for each posterior
    hyperparameter sample the exact MVT conditional StudentT(df*, m*,
    s*), mixed with the crude posterior weights — the
    ``predict_from_gaussian_process`` design with Student-t components."""
    model: TPModel = (problem.metadata or {}).get("t_process")
    if model is None:
        raise ValueError("problem has no attached TPModel metadata")
    import numbers

    if isinstance(points, numbers.Integral) and not isinstance(points, bool):
        from .gp import coordinate_bounds_grid

        points = coordinate_bounds_grid(model.x, int(points))
    points = jnp.atleast_2d(_f(points))

    if isinstance(result, NestedSamplingResult):
        log_w = result.crude_log_posterior_weights
        thetas = result.points
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
        return model.posterior_moments(theta, points, query_nugget)

    n_samp = thetas.shape[0]
    if sample_chunk is None:
        per = model.predict_bytes_per_sample()
        sample_chunk = max(1, min(n_samp, int(4e9) // max(per, 1)))
    if sample_chunk >= n_samp:
        means, scales, dfs = jax.vmap(one)(thetas)
    else:
        means, scales, dfs = jax.lax.map(one, thetas, batch_size=sample_chunk)
    return PointwiseMixture(
        log_weights=log_w,
        component=StudentT(
            # every param [S, m] (the PointwiseMixture contract)
            df=jnp.broadcast_to(dfs[:, None], means.shape),
            loc=means,
            scale=jnp.maximum(scales, 1e-12),
        ),
    )
