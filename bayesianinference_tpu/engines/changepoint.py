"""Changepoint-model front-end: streaming segmentation + hazard inference.

Beyond-reference capability built on :mod:`..ops.bocpd` (Adams &
MacKay run-length filtering).  The per-step normalizers compose to the
EXACT marginal likelihood p(y | hazard, segment hyperparameters) under
the product-partition model, so ``define_changepoint_model`` hands any
engine (NS/HMC/Laplace) a differentiable exact likelihood for the
hazard rate and conjugate segment hyperparameters — full Bayes over
"how often does this series change?", not just filtering at fixed
settings.

Posterior consumption mirrors :mod:`.ssm` / :mod:`.hmm`: the
run-length posterior at one theta, and changepoint probabilities that
INTEGRATE parameter uncertainty by averaging the run-length filter
over posterior draws (one vmapped jitted program)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.problem import InferenceProblem, define_inference_problem
from ..ops.bocpd import BOCPDResult, bocpd

__all__ = [
    "define_changepoint_model",
    "run_length_posterior",
    "changepoint_probability",
]


def define_changepoint_model(
    y,
    model_builder: Callable,
    parameters,
    *,
    r_max: Optional[int] = None,
    mask=None,
    prior_distribution=None,
    log_prior: Optional[Callable] = None,
    validate: bool = True,
    key=None,
) -> InferenceProblem:
    """Inference problem over changepoint-model parameters.

    ``model_builder(theta) -> (UPM, hazard)`` (use
    :func:`..ops.bocpd.gaussian_upm` / :func:`..ops.bocpd.poisson_upm`
    or any conjugate UPM triple); ``hazard`` must be traceable in
    theta.  ``r_max`` caps the run-length buffer (default: the series
    length — exact).  Out-of-support parameters producing NaN map to
    the log-zero sentinel via the problem layer's density guard."""
    y = jnp.asarray(y)
    mask_arr = None if mask is None else jnp.asarray(mask)

    def log_likelihood(theta):
        upm, hazard = model_builder(theta)
        return bocpd(
            y, upm, hazard, r_max=r_max, mask=mask_arr
        ).log_likelihood

    return define_inference_problem(
        parameters=parameters,
        log_likelihood=log_likelihood,
        prior_distribution=prior_distribution,
        log_prior=log_prior,
        validate=validate,
        key=key,
        changepoint={
            "y": y,
            "mask": mask_arr,
            "r_max": r_max,
            "model_builder": model_builder,
        },
    )


def _cp_meta(problem: InferenceProblem) -> dict:
    meta = (problem.metadata or {}).get("changepoint")
    if meta is None:
        raise ValueError(
            "problem was not built by define_changepoint_model"
        )
    return meta


def run_length_posterior(problem: InferenceProblem, theta) -> BOCPDResult:
    """Run-length filter at one parameter vector (e.g. the Laplace
    mode): log p(r_t | y_{1:t}, theta) [T, r_max] plus the exact
    marginal log-likelihood."""
    meta = _cp_meta(problem)
    upm, hazard = meta["model_builder"](jnp.asarray(theta))
    return bocpd(
        meta["y"], upm, hazard, r_max=meta["r_max"], mask=meta["mask"]
    )


def changepoint_probability(problem: InferenceProblem, theta):
    """Posterior probability that a changepoint just occurred,
    p(r_t = 0 | y_{1:t}) [T].  ``theta`` [d] gives the filter at one
    vector; [S, d] (posterior draws) Rao-Blackwellizes over parameter
    uncertainty — the filters run as one vmapped batch and average.

    Draws outside the model's support (a Gaussian Laplace posterior
    can put mass past the box, e.g. hazard <= 0) are dropped from the
    average rather than poisoning it (same degradation contract as the
    density guard) — note the guarded logsumexp makes an invalid
    hazard's filter finite-but-meaningless, so validity is tested on
    the hazard itself plus row finiteness, not finiteness alone."""
    meta = _cp_meta(problem)
    theta = jnp.atleast_2d(jnp.asarray(theta))

    def one(th):
        upm, hazard = meta["model_builder"](th)
        res = bocpd(
            meta["y"], upm, hazard, r_max=meta["r_max"], mask=meta["mask"]
        )
        h = jnp.asarray(hazard)
        valid = (h > 0.0) & (h < 1.0) & jnp.isfinite(res.log_likelihood)
        return jnp.exp(res.log_run_length[:, 0]), valid

    cps, ok = jax.vmap(one)(theta)  # [S, T], [S]
    ok = ok & jnp.isfinite(cps).all(axis=1)
    w = ok.astype(cps.dtype)
    denom = jnp.maximum(w.sum(), 1.0)
    return (jnp.where(ok[:, None], cps, 0.0)).sum(axis=0) / denom
