"""Laplace approximation with MacKay evidence-framework hyperparameter
optimization.

From-scratch JAX implementation of ``LaplaceApproximation.wl``:
``approximateEvidence`` (LA:177-238), the hyperparameter variant with
memoized warm starts (LA:241-393), ``macKayUpdateMethod`` (LA:394-435) and
``laplacePosteriorFit`` (LA:453-563).

TPU-first departures from the reference:
* Mode finding is jitted multi-start L-BFGS (optax) instead of
  ``NMaximize``/``FindMaximum`` — all starts run as ONE vmapped batch.
* The precision matrix is the exact AD Hessian (``jax.hessian``) instead of
  finite differences (LA:19-20, 217-219).
* The MacKay fixed point and the hyperparameter search drive the jitted
  inner fit from the host, exactly as the reference's kernel drives its
  compiled numerical function.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.numerics import HashableFn, as_hashable_fn
from ..core.precise import log_precise
from ..ops.metropolis import _cholesky
from ..dists.base import Distribution
from ..dists.empirical import ParameterMixture
from ..dists.multivariate import MultivariateNormal
from ..dists.scalar import Cauchy
from ..models.problem import InferenceProblem, random_domain_points

__all__ = [
    "LaplaceFit",
    "laplace_log_evidence",
    "find_mode",
    "approximate_evidence",
    "mackay_update_1",
    "mackay_update_2",
    "approximate_evidence_hyper",
    "laplace_posterior_fit",
    "fit_precision_at_max",
]


def _f(x):
    return jnp.asarray(x, jnp.result_type(jnp.asarray(x).dtype, float))


def laplace_log_evidence(max_log_density, precision_matrix):
    """logZ = max + (k log(2 pi) - log det A)/2 (``laplaceLogEvidence``,
    LA:22-30).  Returns NaN when the precision matrix is not positive
    definite (the reference returns Missing and warns, LA:220-222)."""
    p = jnp.atleast_2d(_f(precision_matrix))
    k = p.shape[-1]
    # PD check + logdet via Cholesky with precise logs: slogdet's LU
    # path keeps TPU's ~300-ulp native log, which lands 1:1 in logZ
    # (core.precise); a non-PD matrix gives NaN diagonal entries, so the
    # isfinite test reproduces the sign>0 -> NaN contract below
    # size-dispatched factorization: XLA's TPU cholesky lowers tiny
    # [d, d] matrices through a serialized kernel costing ~ms per call
    # (the CLAUDE.md small-matrix pathology) -- the unrolled Crout form
    # is a handful of fused VPU ops (measured: the round-4 slogdet->
    # cholesky swap cost the Iris fit ~9 ms/fit on chip until this)
    diag = jnp.diagonal(_cholesky(p), axis1=-2, axis2=-1)
    logdet = 2.0 * jnp.sum(log_precise(diag), axis=-1)
    out = _f(max_log_density) + 0.5 * (k * jnp.log(2.0 * jnp.pi) - logdet)
    return jnp.where(jnp.isfinite(logdet), out, jnp.nan)


def _default_tol(dtype) -> float:
    """Gradient-norm stopping tolerance for the mode search: 1e-10 in
    f64.  In f32 (the TPU path) the AD gradient's noise floor sits near
    1e-5 relative, so 1e-10 never triggers and every solve would run to
    ``maxiter`` — measured 2.5x the wall cost on the Iris fit for a mode
    identical to 4 decimals; 1e-4 is below anything f32 Laplace output
    can resolve (mode error enters logZ quadratically)."""
    return 1e-10 if jnp.finfo(dtype).bits >= 64 else 1e-4


def _bounds_and_tol(x0, lower, upper, tol):
    """Shared solver prologue: broadcast the box bounds to [d] in the
    start points' dtype (infinite where absent) and default the
    gradient-norm tolerance per dtype."""
    dtype = x0.dtype
    d = x0.shape[-1]
    lo = jnp.broadcast_to(
        _f(-jnp.inf if lower is None else lower), (d,)
    ).astype(dtype)
    hi = jnp.broadcast_to(
        _f(jnp.inf if upper is None else upper), (d,)
    ).astype(dtype)
    return lo, hi, (_default_tol(dtype) if tol is None else tol)


def find_mode(
    log_density: Callable,
    x0,
    *,
    maxiter: int = 500,
    tol: Optional[float] = None,
    lower=None,
    upper=None,
):
    """Jitted L-BFGS maximization of a log density from one or more starting
    points (rows of ``x0``); the best final point wins.  Replaces
    ``NMaximize``/``FindMaximum`` (LA:197-211) with a vmapped multi-start.

    Box constraints are handled by a smooth bijection to unconstrained
    coordinates (sigmoid for two-sided, softplus for one-sided bounds)
    rather than clipping inside the objective — a clip zeroes the gradient
    beyond the box, so L-BFGS would stall at the boundary instead of
    sliding along it.  Returns (mode [d], max_value).

    The compiled solver caches on ``log_density``'s identity (the
    engine-jit convention): repeated fits of the same problem skip the
    re-trace, so per-fit latency is the device time, not tracing."""
    x0 = jnp.atleast_2d(_f(x0))
    lo, hi, tol = _bounds_and_tol(x0, lower, upper, tol)
    solver = _mode_solver(as_hashable_fn(log_density), maxiter)
    return solver(x0, lo, hi, jnp.asarray(tol, x0.dtype))


@functools.lru_cache(maxsize=32)
def _mode_solver(log_density, maxiter):
    """Jitted multi-start solver, held in a BOUNDED lru so ad-hoc
    closures don't accumulate compiled executables forever (evicting the
    entry releases the jitted function, its cache, and the closure)."""
    return jax.jit(
        partial(_find_mode_impl, log_density, maxiter=maxiter),
        static_argnames=(),
    )


def _find_mode_impl(log_density, x0, lower, upper, tol, *, maxiter):
    dtype = x0.dtype
    lo, hi = lower, upper
    f_lo, f_hi = jnp.isfinite(lo), jnp.isfinite(hi)
    both = f_lo & f_hi
    # sanitized operands so no branch produces nan (grad hygiene)
    lo_s = jnp.where(f_lo, lo, 0.0)
    hi_s = jnp.where(f_hi, hi, 1.0)
    pinned = both & (hi_s - lo_s <= 0)  # lo == hi: a fixed parameter
    width = jnp.where(both & ~pinned, hi_s - lo_s, 1.0)

    def to_x(z):
        x_both = lo_s + width * jax.nn.sigmoid(z)
        x_lo = lo_s + jax.nn.softplus(z)
        x_hi = hi_s - jax.nn.softplus(z)
        out = jnp.where(
            both, x_both, jnp.where(f_lo, x_lo, jnp.where(f_hi, x_hi, z))
        )
        return jnp.where(pinned, lo_s, out)

    def _sp_inv(y):
        y = jnp.maximum(y, jnp.asarray(1e-12, dtype))
        return y + jnp.log1p(-jnp.exp(-y))

    def to_z(x):
        frac = jnp.clip((x - lo_s) / width, 1e-9, 1.0 - 1e-9)
        z_both = jnp.log(frac) - jnp.log1p(-frac)
        z_lo = _sp_inv(jnp.maximum(x - lo_s, 1e-9))
        z_hi = _sp_inv(jnp.maximum(hi_s - x, 1e-9))
        return jnp.where(
            both, z_both, jnp.where(f_lo, z_lo, jnp.where(f_hi, z_hi, x))
        )

    def neg(z):
        return -log_density(to_x(z))

    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(neg)

    def solve_one(x_init):
        z_init = to_z(x_init)
        state0 = opt.init(z_init)

        def cond(carry):
            z, state, i, gnorm = carry
            return jnp.logical_and(i < maxiter, gnorm > tol)

        def body(carry):
            z, state, i, _ = carry
            v, g = value_and_grad(z, state=state)
            updates, state = opt.update(
                g, state, z, value=v, grad=g, value_fn=neg
            )
            z = optax.apply_updates(z, updates)
            return z, state, i + 1, jnp.linalg.norm(g)

        z, state, _, _ = jax.lax.while_loop(
            cond, body, (z_init, state0, 0, jnp.asarray(jnp.inf, dtype))
        )
        x = to_x(z)
        return x, log_density(x)

    xs, vals = jax.vmap(solve_one)(x0)
    vals = jnp.where(jnp.isfinite(vals), vals, -jnp.inf)
    best = jnp.argmax(vals)
    # to_x keeps iterates strictly inside the box; no final clip needed
    return xs[best], vals[best]


@dataclasses.dataclass(frozen=True)
class LaplaceFit:
    """Result of a Laplace fit (LA:223-237, enriched by
    ``laplacePosteriorFit``, LA:534-562)."""

    log_evidence: jnp.ndarray
    maximum: jnp.ndarray  # log posterior density at the mode
    mean: jnp.ndarray  # [d] the mode
    precision_matrix: jnp.ndarray  # [d, d]
    log_likelihood_at_mode: Optional[jnp.ndarray] = None
    param_names: Tuple[str, ...] = ()
    # hyperparameter block (MacKay path)
    conditional_log_evidence: Optional[jnp.ndarray] = None
    hyper_mean: Optional[jnp.ndarray] = None
    hyper_precision: Optional[jnp.ndarray] = None
    hyper_path: Optional[tuple] = None
    predictive_builder: Optional[Callable] = dataclasses.field(
        default=None, repr=False
    )

    @property
    def posterior_distribution(self) -> MultivariateNormal:
        """MultinormalDistribution[mean, inverse precision] (LA:545-547)."""
        cov = jnp.linalg.inv(self.precision_matrix)
        return MultivariateNormal(mean_=self.mean, cov=0.5 * (cov + cov.T))

    @property
    def hyper_distribution(self) -> Optional[MultivariateNormal]:
        """Gaussian posterior over hyperparameters (LA:380-383)."""
        if self.hyper_precision is None:
            return None
        cov = jnp.linalg.inv(jnp.atleast_2d(self.hyper_precision))
        return MultivariateNormal(
            mean_=jnp.atleast_1d(self.hyper_mean), cov=0.5 * (cov + cov.T)
        )

    def predictive_distribution(self, num_quadrature: int = 256):
        """ParameterMixtureDistribution over the Gaussian posterior
        (LA:548-557); requires a ``predictive_builder`` (theta -> dist)."""
        if self.predictive_builder is None:
            raise ValueError("no predictive builder attached to this fit")
        return ParameterMixture(
            param_dist=self.posterior_distribution,
            build=self.predictive_builder,
            num_quadrature=num_quadrature,
        )


@functools.lru_cache(maxsize=64)
def _sum_densities(loglike_fn, logprior_fn):
    """Stable-identity joint density for a (loglike, logprior) pair, so
    the solver caches keyed on function identity hit across repeated
    fits.  Bounded: evicted pairs release their closures (and any data
    they captured)."""
    return lambda x: loglike_fn(x) + logprior_fn(x)


@functools.lru_cache(maxsize=32)
def _evidence_program(dens, loglike, maxiter):
    """The whole fixed-model Laplace fit — multi-start mode search, exact
    AD Hessian, logdet evidence, loglike at the mode — as ONE jitted
    program, cached on the density's identity.  One device dispatch per
    warm fit: through the remote tunnel every eager op or separate jit
    call costs ~10-20 ms of latency, which dominated the Iris fit when
    the stages dispatched separately."""
    dens_f = dens.fn if isinstance(dens, HashableFn) else dens
    ll_f = (
        None
        if loglike is None
        else (loglike.fn if isinstance(loglike, HashableFn) else loglike)
    )

    def run(x0, lo, hi, tol):
        mode, max_val = _find_mode_impl(
            dens_f, x0, lo, hi, tol, maxiter=maxiter
        )
        precision = -jax.hessian(dens_f)(mode)
        precision = 0.5 * (precision + precision.T)
        log_ev = laplace_log_evidence(max_val, precision)
        ll = (
            ll_f(mode)
            if ll_f is not None
            else jnp.asarray(jnp.nan, mode.dtype)
        )
        return mode, max_val, precision, log_ev, ll

    return jax.jit(run)


@functools.lru_cache(maxsize=32)
def _evidence_program_data(loglike, logprior, maxiter):
    """Data-aware variant of :func:`_evidence_program`: the likelihood is
    ``f(theta, data)`` and the observations enter the jitted program as a
    TRACED argument, so repeated fits on fresh same-shape datasets
    (``problem.with_data``, the serving loop) hit the same compiled
    executable instead of retracing per dataset."""
    ll2 = loglike.fn if isinstance(loglike, HashableFn) else loglike
    lp = logprior.fn if isinstance(logprior, HashableFn) else logprior

    def run(x0, lo, hi, tol, data):
        def dens_f(x):
            return ll2(x, data) + lp(x)

        mode, max_val = _find_mode_impl(
            dens_f, x0, lo, hi, tol, maxiter=maxiter
        )
        precision = -jax.hessian(dens_f)(mode)
        precision = 0.5 * (precision + precision.T)
        log_ev = laplace_log_evidence(max_val, precision)
        return mode, max_val, precision, log_ev, ll2(mode, data)

    return jax.jit(run)


def approximate_evidence(
    log_density: Union[Callable, Tuple[Callable, Callable]],
    x0,
    *,
    initial_guess=None,
    maxiter: int = 500,
    tol: Optional[float] = None,
    lower=None,
    upper=None,
    param_names: Tuple[str, ...] = (),
    data=None,
) -> LaplaceFit:
    """Laplace evidence for a fixed model (``approximateEvidence``,
    LA:177-238).  ``log_density`` is either the joint log posterior density
    or a (log_likelihood, log_prior) pair.  With ``data`` the likelihood
    must be ``f(theta, data)`` and the observations ride through the
    fused program as a traced argument (serving-friendly)."""
    starts = jnp.atleast_2d(_f(initial_guess if initial_guess is not None else x0))
    lo, hi, tol = _bounds_and_tol(starts, lower, upper, tol)
    if data is not None:
        if not isinstance(log_density, tuple):
            raise ValueError(
                "data= needs the (log_likelihood, log_prior) pair form"
            )
        loglike_fn, logprior_fn = log_density
        program = _evidence_program_data(
            as_hashable_fn(loglike_fn), as_hashable_fn(logprior_fn), maxiter
        )
        mode, max_val, precision, log_ev, ll_at_mode = program(
            starts, lo, hi, jnp.asarray(tol, starts.dtype), data
        )
        return LaplaceFit(
            log_evidence=log_ev,
            maximum=max_val,
            mean=mode,
            precision_matrix=precision,
            log_likelihood_at_mode=ll_at_mode,
            param_names=tuple(param_names),
        )
    if isinstance(log_density, tuple):
        loglike_fn, logprior_fn = log_density
        dens = _sum_densities(
            as_hashable_fn(loglike_fn), as_hashable_fn(logprior_fn)
        )
    else:
        loglike_fn = None
        dens = log_density
    program = _evidence_program(
        as_hashable_fn(dens),
        None if loglike_fn is None else as_hashable_fn(loglike_fn),
        maxiter,
    )
    mode, max_val, precision, log_ev, ll_at_mode = program(
        starts, lo, hi, jnp.asarray(tol, starts.dtype)
    )
    return LaplaceFit(
        log_evidence=log_ev,
        maximum=max_val,
        mean=mode,
        precision_matrix=precision,
        log_likelihood_at_mode=ll_at_mode if loglike_fn is not None else None,
        param_names=tuple(param_names),
    )


def fit_precision_at_max(points, log_densities):
    """Estimate the precision matrix by fitting a quadratic to a path of
    (point, log-density) evaluations around the maximum
    (``fitPrecisionAtMax``, LaplaceApproximation.wl:570-629) — the manual
    fallback when the Hessian at the mode is not positive definite.

    Fits  logdens ~ max - dx^T P dx / 2  by least squares over the unique
    elements of the symmetric P; returns P [d, d].
    """
    import warnings

    points = jnp.atleast_2d(_f(points))
    log_densities = _f(jnp.ravel(jnp.asarray(log_densities)))
    n, d = points.shape
    n_coeff = d * (d + 1) // 2
    if n <= n_coeff + 1:
        raise ValueError(
            f"{n} points is insufficient for computing the precision "
            f"matrix; requires at least {n_coeff + 2}"
        )
    imax = int(jnp.argmax(log_densities))
    dx = points - points[imax]
    de = log_densities - log_densities[imax]

    sv = np.linalg.svd(np.cov(np.asarray(dx).T).reshape(d, d), compute_uv=False)
    if sv.max() < 1e-10 or sv.min() / max(sv.max(), 1e-300) < 1e-4:
        warnings.warn(
            "test points are highly correlated or localized; expect a poor "
            "precision-matrix fit", stacklevel=2,
        )
    if float(jnp.max(jnp.abs(de))) < 1e-5:
        warnings.warn(
            "log-density range in the path is tiny; expect a poor "
            "precision-matrix fit", stacklevel=2,
        )

    cols = []
    index_pairs = [(i, j) for i in range(d) for j in range(i, d)]
    for i, j in index_pairs:
        factor = 1.0 if i == j else 2.0
        cols.append(factor * dx[:, i] * dx[:, j])
    m = jnp.stack(cols, axis=-1)  # [n, n_coeff]
    coeffs, *_ = jnp.linalg.lstsq(m, de)
    p = jnp.zeros((d, d), points.dtype)
    for (i, j), c in zip(index_pairs, -2.0 * coeffs):
        p = p.at[i, j].set(c)
        if i != j:
            p = p.at[j, i].set(c)
    return p


def mackay_update_1(prior_deriv: Callable = lambda la: 0.0) -> Callable:
    """One-hyperparameter (log alpha) MacKay update (LA:396-410):
    alpha_new = k / (|w|^2 + tr(A^-1) - 2 d/dlogalpha logprior)."""

    def update(log_params, fit: LaplaceFit):
        la = log_params[0]
        tr_ainv = jnp.trace(jnp.linalg.inv(fit.precision_matrix))
        ew2 = jnp.sum(fit.mean**2)
        k = fit.mean.shape[0]
        return jnp.log(
            jnp.asarray([k / (ew2 + tr_ainv - 2.0 * prior_deriv(la))])
        )

    return update


def mackay_update_2(
    n_data: int,
    derivs: Tuple[Callable, Callable] = (lambda la: 0.0, lambda lb: 0.0),
) -> Callable:
    """(log alpha, log beta) MacKay update for weight-decay + noise
    precision (LA:412-435)."""

    def update(log_params, fit: LaplaceFit):
        la, lb = log_params[0], log_params[1]
        alpha, beta = jnp.exp(la), jnp.exp(lb)
        k = fit.mean.shape[0]
        tr_ainv = jnp.trace(jnp.linalg.inv(fit.precision_matrix))
        ew2 = jnp.sum(fit.mean**2)
        # sum of squared errors from the stored logL (LA:423)
        ed2 = -(2.0 / beta) * (
            fit.log_likelihood_at_mode
            + 0.5 * n_data * jnp.log(2.0 * jnp.pi / beta)
        )
        new_alpha = k / (ew2 + tr_ainv - 2.0 * derivs[0](la))
        new_beta = (n_data - k + alpha * tr_ainv) / (ed2 - 2.0 * derivs[1](lb))
        return jnp.log(jnp.asarray([new_alpha, new_beta]))

    return update


def approximate_evidence_hyper(
    density_builder: Callable,  # eta [h] -> (loglike_fn, logprior_fn) or fn
    x0,
    hyper_prior: Optional[Distribution] = None,
    *,
    n_hyper: Optional[int] = None,
    method: str = "nelder-mead",  # or "fixed_point"
    initial_hyper=None,
    update_function: Optional[Callable] = None,
    max_hyper_iterations: int = 1000,
    tolerance: float = 1e-6,
    search_radius: float = 0.25,
    maxiter: int = 500,
    lower=None,
    upper=None,
    param_names: Tuple[str, ...] = (),
    finite_diff_eps: float = 1e-3,
) -> LaplaceFit:
    """Hyperparameter-level evidence maximization (LA:241-393).

    ``density_builder(eta)`` returns the inner (conditional) model density
    for hyperparameters ``eta``.  The outer objective is
    logZ(eta) + logprior(eta), maximized either by a derivative-free
    Nelder-Mead search (the ``NMaximize`` path) or by the MacKay fixed point
    (``method="fixed_point"`` with an ``update_function`` from
    :func:`mackay_update_1` / :func:`mackay_update_2`).

    Inner fits are warm-started from the nearest previously-evaluated
    hyperparameter point within ``search_radius`` (LA:276-296).
    """
    if initial_hyper is None:
        if n_hyper is None:
            raise ValueError("give initial_hyper or n_hyper")
        initial_hyper = np.full((n_hyper,), 0.1)
    eta0 = np.atleast_1d(np.asarray(initial_hyper, float))
    h = eta0.shape[0]
    if hyper_prior is None:
        # default CauchyDistribution[0, 2] per hyperparameter (LA:466-477)
        cauchy = Cauchy(loc=0.0, scale=2.0)
        hyper_log_prior = lambda e: float(np.sum(np.asarray(cauchy.log_prob(e))))
    else:
        hyper_log_prior = lambda e: float(hyper_prior.log_prob(jnp.asarray(e)))

    stored: dict = {}
    best = {"fit": None, "hyper_post": -np.inf, "eta": None}
    last = {"fit": None}  # the fit at the most recently evaluated eta

    starts0 = jnp.atleast_2d(_f(x0))

    # ONE jitted inner solver with eta as a traced argument — every
    # hyperparameter evaluation reuses the same compiled program (the
    # reference memoizes per-point instead, LA:276-296; we memoize AND
    # avoid recompilation)
    @jax.jit
    def _inner(eta, starts):
        built = density_builder(eta)
        if isinstance(built, tuple):
            loglike_fn, logprior_fn = built
            dens = lambda x: loglike_fn(x) + logprior_fn(x)
        else:
            loglike_fn = None
            dens = built
        mode, max_val = find_mode(
            dens, starts, maxiter=maxiter, lower=lower, upper=upper
        )
        precision = -jax.hessian(dens)(mode)
        precision = 0.5 * (precision + precision.T)
        log_ev = laplace_log_evidence(max_val, precision)
        ll = loglike_fn(mode) if loglike_fn is not None else jnp.nan
        return mode, max_val, precision, log_ev, ll

    def num_fun(eta_np) -> float:
        eta_np = np.atleast_1d(np.asarray(eta_np, float))
        key_ = tuple(np.round(eta_np, 12))
        if key_ in stored:
            last["fit"] = stored[key_][2]
            return stored[key_][0]
        starts = starts0
        if stored:
            etas = np.asarray([list(k) for k in stored])
            dists = np.linalg.norm(etas - eta_np, axis=1)
            i = int(np.argmin(dists))
            if dists[i] <= search_radius:
                # warm start: prepend the nearest stored mode (LA:283-286)
                guess = stored[tuple(etas[i])][1]
                starts = jnp.concatenate(
                    [jnp.asarray(guess)[None, :], starts0]
                )
        else:
            starts = jnp.concatenate([starts0[:1], starts0])
        mode, max_val, precision, log_ev, ll = _inner(
            jnp.asarray(eta_np), starts
        )
        fit = LaplaceFit(
            log_evidence=log_ev,
            maximum=max_val,
            mean=mode,
            precision_matrix=precision,
            log_likelihood_at_mode=ll,
            param_names=tuple(param_names),
        )
        hyper_post = float(fit.log_evidence) + hyper_log_prior(eta_np)
        if np.isnan(hyper_post):
            hyper_post = -np.inf
        if hyper_post >= best["hyper_post"]:
            best.update(fit=fit, hyper_post=hyper_post, eta=eta_np)
        last["fit"] = fit
        stored[key_] = (hyper_post, np.asarray(fit.mean), fit)
        return hyper_post

    if method == "fixed_point":
        if update_function is None:
            update_function = mackay_update_1()
        num_fun(eta0)
        eta = eta0
        for _ in range(max_hyper_iterations):
            # the MacKay update needs the fit AT THE CURRENT eta (the
            # reference threads prevFit through the FixedPoint, LA:322-343)
            fit = last["fit"]
            new_eta = np.asarray(
                update_function(jnp.asarray(eta), fit), float
            )
            if not np.all(np.isfinite(new_eta)):
                raise RuntimeError(
                    f"MacKay update returned non-numeric hypers at {eta}"
                )
            num_fun(new_eta)
            if np.max(np.abs(new_eta - eta)) < tolerance:
                eta = new_eta
                break
            eta = new_eta
        eta_max = eta
    else:
        eta_max = _nelder_mead(num_fun, eta0, max_hyper_iterations, tolerance)

    hyper_post_max = num_fun(eta_max)
    best_fit = stored[tuple(np.round(np.atleast_1d(np.asarray(eta_max, float)), 12))][2]
    # finite-difference Hessian over the hyper axis (the outer objective is
    # host-driven, like the reference's numericD on numFun, LA:356-358)
    hess = np.zeros((h, h))
    e = finite_diff_eps
    f0 = hyper_post_max
    for i in range(h):
        for j in range(i, h):
            ei = np.zeros(h)
            ej = np.zeros(h)
            ei[i] = e
            ej[j] = e
            fpp = num_fun(eta_max + ei + ej)
            fpm = num_fun(eta_max + ei - ej)
            fmp = num_fun(eta_max - ei + ej)
            fmm = num_fun(eta_max - ei - ej)
            hess[i, j] = hess[j, i] = (fpp - fpm - fmp + fmm) / (4 * e * e)
    hyper_precision = -hess
    try:
        pos_def = bool(np.all(np.linalg.eigvalsh(hyper_precision) > 0))
    except np.linalg.LinAlgError:
        pos_def = False

    fit = best_fit
    log_ev = (
        laplace_log_evidence(hyper_post_max, jnp.asarray(hyper_precision))
        if pos_def
        else jnp.asarray(np.nan)
    )
    return dataclasses.replace(
        fit,
        log_evidence=log_ev,
        conditional_log_evidence=fit.log_evidence,
        hyper_mean=jnp.asarray(eta_max),
        hyper_precision=jnp.asarray(hyper_precision) if pos_def else None,
        hyper_path=tuple(
            (np.asarray(k), v[0]) for k, v in stored.items()
        ),
    )


def _nelder_mead(f, x0, maxiter, tol):
    """Minimal Nelder-Mead ascent (maximizes f) — host-side, replaces
    ``NMaximize`` for the non-smooth memoized outer objective."""
    n = x0.shape[0]
    pts = [np.asarray(x0, float)]
    for i in range(n):
        p = np.array(x0, float)
        p[i] += 0.25 if p[i] == 0 else 0.25 * abs(p[i]) + 0.05
        pts.append(p)
    simplex = np.asarray(pts)
    vals = np.asarray([f(p) for p in simplex])
    for _ in range(maxiter):
        order = np.argsort(-vals)  # descending: best first
        simplex, vals = simplex[order], vals[order]
        if np.max(np.abs(vals[0] - vals[-1])) < tol and np.max(
            np.abs(simplex[0] - simplex[-1])
        ) < tol:
            break
        centroid = simplex[:-1].mean(axis=0)
        worst = simplex[-1]
        xr = centroid + (centroid - worst)
        fr = f(xr)
        if fr > vals[0]:
            xe = centroid + 2.0 * (centroid - worst)
            fe = f(xe)
            simplex[-1], vals[-1] = (xe, fe) if fe > fr else (xr, fr)
        elif fr > vals[-2]:
            simplex[-1], vals[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (worst - centroid)
            fc = f(xc)
            if fc > vals[-1]:
                simplex[-1], vals[-1] = xc, fc
            else:  # shrink
                for i in range(1, n + 1):
                    simplex[i] = simplex[0] + 0.5 * (simplex[i] - simplex[0])
                    vals[i] = f(simplex[i])
    return simplex[np.argmax(vals)]


def laplace_posterior_fit(
    *,
    log_likelihood: Optional[Callable] = None,
    log_prior: Optional[Callable] = None,
    problem: Optional[InferenceProblem] = None,
    model=None,
    data: Optional[dict] = None,
    parameters=None,
    model_inputs: Optional[dict] = None,
    hyper_density_builder: Optional[Callable] = None,
    hyper_prior: Optional[Distribution] = None,
    n_hyper: Optional[int] = None,
    initial_guess=None,
    num_starts: int = 8,
    key=None,
    predictive_builder: Optional[Callable] = None,
    param_names: Tuple[str, ...] = (),
    lower=None,
    upper=None,
    **hyper_kwargs,
) -> LaplaceFit:
    """High-level Laplace fit (``laplacePosteriorFit``, LA:453-563).

    Model specs, one of:
    * ``problem`` — an :class:`InferenceProblem`;
    * ``log_likelihood`` + ``log_prior`` callables with box bounds;
    * ``model`` (a :class:`~..dists.combinators.ConditionalProduct`
      generative model) + ``data`` (observed variables) + ``parameters``
      (free-variable specs) [+ ``model_inputs``] — the reference's
      ``Distributed[var, dist]`` front-end with the graph dependency /
      acyclicity validation of LA:485-518.

    With ``hyper_density_builder`` (eta -> (loglike, logprior) pair) the
    MacKay / search hyperparameter machinery is engaged.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    if model is not None:
        if problem is not None:
            raise ValueError("pass either model=... or problem=..., not both")
        from ..models.generative import generative_model_problem

        problem = generative_model_problem(
            model, data or {}, parameters or (), inputs=model_inputs
        )
    problem_data = None
    if problem is not None:
        if problem.data is not None:
            # keep the identity-stable 2-arg likelihood and thread the
            # observations as a traced argument (with_data serving)
            problem_data = problem.data
            log_likelihood = problem.log_likelihood
        else:
            log_likelihood = problem.raw_log_likelihood
        log_prior = problem.log_prior
        lower = problem.lower if lower is None else lower
        upper = problem.upper if upper is None else upper
        param_names = param_names or problem.param_names
    if log_likelihood is None or log_prior is None:
        if hyper_density_builder is None:
            raise ValueError("need log_likelihood+log_prior or a problem")

    if initial_guess is None:
        lo = jnp.asarray(lower) if lower is not None else None
        hi = jnp.asarray(upper) if upper is not None else None
        if lo is None:
            raise ValueError("need bounds or an initial guess")
        starts = random_domain_points(key, lo, hi, num_starts, scale=5.0)
    else:
        starts = jnp.atleast_2d(_f(initial_guess))

    if hyper_density_builder is not None:
        fit = approximate_evidence_hyper(
            hyper_density_builder,
            starts,
            hyper_prior,
            n_hyper=n_hyper,
            lower=lower,
            upper=upper,
            param_names=param_names,
            **hyper_kwargs,
        )
    else:
        fit = approximate_evidence(
            (log_likelihood, log_prior),
            starts,
            lower=lower,
            upper=upper,
            param_names=param_names,
            data=problem_data,
        )
    if predictive_builder is not None:
        fit = dataclasses.replace(fit, predictive_builder=predictive_builder)
    return fit
