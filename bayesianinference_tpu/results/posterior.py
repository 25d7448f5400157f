"""Posterior-predictive distributions from sampled results.

Equivalent of ``predictiveDistribution`` (BayesianStatistics.wl:1373-1483):
mixtures of the generating distribution over the posterior samples, with
``"MAP"`` / ``"MaximumLikelihood"`` single-point variants, for both i.i.d.
and regression models.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..dists.combinators import Mixture
from ..dists.pointwise import PointwiseMixture
from ..engines.evidence import NestedSamplingResult

__all__ = [
    "predictive_distribution",
    "regression_predictive_distribution",
    "posterior_predictive_check",
]


def _select_samples(result, mode: Optional[str]):
    """Weighted posterior draws from any engine's output.

    Accepts a :class:`NestedSamplingResult` (crude posterior weights,
    BS:1419-1435), a raw :class:`..core.containers.WeightedSamples`, or
    any result whose ``posterior_samples()`` takes no arguments (SMC,
    HMC — their pools feed the same mixtures).  VI posteriors need a
    draw key: pass ``vi_result.posterior_samples(key)`` explicitly."""
    from ..core.containers import WeightedSamples

    if hasattr(result, "crude_log_posterior_weights"):
        # NestedSamplingResult (or anything duck-typed like one)
        thetas = result.points
        log_w = result.crude_log_posterior_weights
        log_l = result.log_likelihoods
        log_post = result.log_likelihoods + result.log_priors
    else:
        if not isinstance(result, WeightedSamples):
            if not hasattr(result, "posterior_samples"):
                raise TypeError(
                    "expected a NestedSamplingResult, WeightedSamples, or "
                    f"a result with .posterior_samples(); got {type(result)}"
                )
            try:
                result = result.posterior_samples()
            except TypeError as e:
                raise TypeError(
                    "this result's posterior_samples() needs arguments "
                    "(a VI posterior needs a draw key) — call it yourself "
                    "and pass the WeightedSamples, e.g. "
                    "predictive_distribution(res.posterior_samples(key), ...)"
                ) from e
        thetas = result.points
        log_w = result.log_weights
        log_l = result.log_likelihoods
        log_post = None
    if mode is None:
        return thetas, log_w
    if mode == "MaximumLikelihood":
        # single best-likelihood sample (BS:1389-1402)
        if log_l is None:
            raise ValueError(
                "mode='MaximumLikelihood' needs per-sample log-likelihoods; "
                "this result does not carry them"
            )
        i = jnp.argmax(log_l)
    elif mode == "MAP":
        # best posterior-density sample (BS:1404-1417)
        if log_post is None:
            raise ValueError(
                "mode='MAP' needs per-sample log posterior densities; only "
                "nested-sampling results carry (log_likelihoods, log_priors)"
            )
        if bool(jnp.all(jnp.isnan(log_post))):
            # evidence_sampling results built without log_priors carry a
            # NaN fill — argmax over it would silently pick sample 0
            raise ValueError(
                "mode='MAP' needs log_priors; this result was built "
                "without them (NaN-filled)"
            )
        i = jnp.argmax(log_post)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return thetas[i : i + 1], jnp.zeros((1,), log_w.dtype)


def predictive_distribution(
    result,
    dist_builder: Callable,
    mode: Optional[str] = None,
) -> Mixture:
    """Posterior predictive for an i.i.d. model:
    MixtureDistribution[weights, dist(theta_s)] (BS:1419-1435).

    ``result`` is any engine output carrying weighted posterior draws —
    a :class:`NestedSamplingResult`, a ``WeightedSamples``, or an
    SMC/HMC result (``posterior_samples()``; VI: pass
    ``vi_result.posterior_samples(key)``).  ``dist_builder(theta)``
    must return the generating distribution; it is vmapped over the
    sample axis, so the mixture component is one batched distribution
    rather than a list."""
    thetas, log_w = _select_samples(result, mode)
    component = jax.vmap(dist_builder)(thetas)
    return Mixture(log_weights=log_w, component=component)


def regression_predictive_distribution(
    result,
    dist_builder: Callable,
    inputs,
    mode: Optional[str] = None,
) -> PointwiseMixture:
    """Posterior predictive for a regression model at ``inputs`` [m, d_in]
    (BS:1437-1483): a per-input-point mixture over the posterior samples,
    batched as one [S, m, ...] component.  ``result`` as in
    :func:`predictive_distribution` — any engine's weighted draws.

    ``dist_builder(theta, x)`` must return the output distribution at
    inputs ``x``: scalar families map [m, d_in] -> params [m]; vector
    outputs (the reference's multivariate generating-distribution form
    with custom output keys, BS:1445-1466) map to event-shaped params
    [m, k]/[m, k, k]/...  Per-theta-constant params (a noise level, a
    dof, a shared output covariance) may be returned UNbatched over the
    point axis — they are broadcast to [S, m, ...] here.  Ambiguity note:
    a per-theta vector param whose length happens to equal m is read as
    per-point; return it explicitly [m, k]-broadcast in that case."""
    inputs = jnp.asarray(inputs)
    if inputs.ndim == 1:
        inputs = inputs[:, None]  # [m] query points -> [m, 1]
    thetas, log_w = _select_samples(result, mode)
    component = jax.vmap(lambda th: dist_builder(th, inputs))(thetas)
    # normalize parameter leaves to [S, m, ...]
    m = inputs.shape[0]
    s = thetas.shape[0]

    def norm(p):
        p = jnp.asarray(p)
        if p.ndim == 1:  # scalar per theta
            p = p[:, None]
        elif p.ndim >= 2 and p.shape[1] != m:  # event-shaped per theta
            p = p[:, None, ...]
        return jnp.broadcast_to(p, (s, m) + p.shape[2:])

    component = jax.tree_util.tree_map(norm, component)
    return PointwiseMixture(log_weights=log_w, component=component)


def posterior_predictive_check(
    result,
    dist_builder: Callable,
    data,
    statistic: Callable,
    key,
    num_replicates: int = 500,
    mode: Optional[str] = None,
):
    """Posterior predictive check: simulate ``num_replicates`` replicated
    datasets (theta_s drawn by posterior weight, then one dataset of
    ``len(data)`` i.i.d. draws from ``dist_builder(theta_s)``), apply
    ``statistic`` to each, and compare with the observed statistic.

    Returns ``(observed, replicated [R], p_value)`` with
    p = P(T(y_rep) >= T(y_obs)) — values near 0 or 1 flag model misfit
    in the direction ``statistic`` measures.  Standard Bayesian workflow
    beyond the reference's surface (which stops at the predictive
    mixture, BS:1419-1435); ``statistic`` takes a [n] dataset and returns
    a scalar, and is vmapped over replicates.
    """
    data = jnp.asarray(data)
    n = data.shape[0]
    thetas, log_w = _select_samples(result, mode)
    k_pick, k_sim = jax.random.split(jnp.asarray(key))
    idx = jax.random.categorical(
        k_pick, jnp.asarray(log_w), shape=(num_replicates,)
    )
    picked = thetas[idx]  # [R, d]

    def simulate(k, th):
        return dist_builder(th).sample(k, (n,))

    reps = jax.vmap(simulate)(
        jax.random.split(k_sim, num_replicates), picked
    )  # [R, n]
    t_rep = jax.vmap(statistic)(reps)
    t_obs = statistic(data)
    p = jnp.mean((t_rep >= t_obs).astype(t_rep.dtype))
    return t_obs, t_rep, p
