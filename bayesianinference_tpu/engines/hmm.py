"""Hidden-Markov-model front-end: exact discrete-latent inference.

Beyond-reference model family (the reference has no sequential-model
machinery; its time-series support is data normalization only,
BayesianUtilities.wl:204-232).  ``define_hidden_markov_model`` builds
an :class:`..models.problem.InferenceProblem` whose likelihood is the
EXACT HMM marginal p(y | theta) (:mod:`..ops.hmm` forward algorithm),
so every engine — nested sampling, HMC, SMC, Laplace — does parameter
inference over transition probabilities and emission parameters with
zero approximation, and the evidence it reports is exact.

The model builder contract:

    model_builder(theta) -> (HMM, log_obs)

where ``log_obs`` [T, K] holds per-step per-state emission
log-densities (compute with one vmapped batch evaluation of any
:mod:`..dists` distribution).  Builders must be traceable in theta so
they can sit inside a jitted engine loop; transition rows come from
:func:`..ops.hmm.row_stochastic` over unconstrained logits.

Posterior consumption mirrors :mod:`.ssm`: smoothed regime
probabilities, the Viterbi path, and joint hidden-path draws that
integrate hyperparameter uncertainty (theta_s ~ p(theta | y), then
z ~ p(z | y, theta_s) by forward-filter backward-sampling).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.problem import InferenceProblem, define_inference_problem
from ..ops.hmm import (
    HMM,
    hmm_filter,
    hmm_forecast,
    hmm_log_likelihood,
    hmm_posterior_sample,
    hmm_smoother,
    hmm_viterbi,
)

__all__ = [
    "define_hidden_markov_model",
    "regime_probabilities",
    "most_likely_states",
    "sample_hidden_paths",
    "forecast_regime_probabilities",
]


def define_hidden_markov_model(
    model_builder: Callable,
    parameters,
    *,
    mask=None,
    method: str = "sequential",
    prior_distribution=None,
    log_prior: Optional[Callable] = None,
    validate: bool = True,
    key=None,
) -> InferenceProblem:
    """Parameter-inference problem for a discrete-state HMM.

    ``model_builder(theta) -> (HMM, log_obs [T, K])`` (close over the
    data; use :func:`..ops.hmm.row_stochastic` for transition rows).
    The likelihood is the exact forward-algorithm marginal; NaN from
    out-of-support emission parameters is mapped to the log-zero
    sentinel by the problem layer's density guard (library-wide
    contract).

    ``mask``: [T] bool, True = observed (missing steps marginalized
    exactly).  ``method``: ``"sequential"`` (scan — right for engine
    hot paths, where vmap over chains batches the [K, K] algebra) or
    ``"parallel"`` (associative scan — log-depth for one long series).
    """
    mask_arr = None if mask is None else jnp.asarray(mask)

    def log_likelihood(theta):
        hmm, log_obs = model_builder(theta)
        return hmm_log_likelihood(
            hmm, log_obs, mask=mask_arr, method=method
        )

    return define_inference_problem(
        parameters=parameters,
        log_likelihood=log_likelihood,
        prior_distribution=prior_distribution,
        log_prior=log_prior,
        validate=validate,
        key=key,
        hidden_markov={
            "model_builder": model_builder,
            "mask": mask_arr,
            "method": method,
        },
    )


def _hmm_meta(problem: InferenceProblem) -> dict:
    meta = (problem.metadata or {}).get("hidden_markov")
    if meta is None:
        raise ValueError(
            "problem was not built by define_hidden_markov_model"
        )
    return meta


def regime_probabilities(problem: InferenceProblem, theta):
    """Smoothed regime probabilities p(z_t = k | y, theta) [T, K]
    (linear domain) for one parameter vector (e.g. the Laplace mode or
    a posterior draw)."""
    meta = _hmm_meta(problem)
    hmm, log_obs = meta["model_builder"](jnp.asarray(theta))
    return jnp.exp(
        hmm_smoother(hmm, log_obs, mask=meta["mask"], method=meta["method"])
    )


def most_likely_states(problem: InferenceProblem, theta):
    """Viterbi path argmax_z p(z_{1:T} | y, theta) [T] int32."""
    meta = _hmm_meta(problem)
    hmm, log_obs = meta["model_builder"](jnp.asarray(theta))
    return hmm_viterbi(hmm, log_obs, mask=meta["mask"])


def forecast_regime_probabilities(
    problem: InferenceProblem, theta, steps: int
):
    """h-step-ahead regime probabilities p(z_{T+h} = k | y, theta)
    [steps, K] (linear domain): the filtered terminal state pushed
    through the transition kernel.  Pair with each regime's emission
    predictive for an observation forecast mixture."""
    meta = _hmm_meta(problem)
    hmm, log_obs = meta["model_builder"](jnp.asarray(theta))
    fr = hmm_filter(hmm, log_obs, mask=meta["mask"], method=meta["method"])
    return jnp.exp(hmm_forecast(hmm, fr, steps))


def sample_hidden_paths(
    problem: InferenceProblem,
    key,
    theta,
    paths_per_theta: int = 1,
):
    """JOINT posterior draws of the hidden path, integrating parameter
    uncertainty: theta_s ~ p(theta | y) (any engine's draws), then
    z ~ p(z | y, theta_s) by forward-filter backward-sampling
    (:func:`..ops.hmm.hmm_posterior_sample`).

    ``theta``: [d] or [S, d].  Returns [S, paths_per_theta, T] int32
    (S=1 for a single vector).  One vmapped jitted program — the
    forward filter runs once per theta and is shared by its paths."""
    meta = _hmm_meta(problem)
    theta = jnp.atleast_2d(jnp.asarray(theta))

    def one_theta(th, k):
        hmm, log_obs = meta["model_builder"](th)
        return hmm_posterior_sample(
            k,
            hmm,
            log_obs,
            paths_per_theta,
            mask=meta["mask"],
            method=meta["method"],
        )

    keys = jax.random.split(key, theta.shape[0])
    return jax.vmap(one_theta)(theta, keys)
