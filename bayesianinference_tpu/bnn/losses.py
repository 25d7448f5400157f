"""Losses for quasi-Bayesian networks: Gaussian NLL and alpha-divergence.

From-scratch equivalents of ``gaussianLossLayer`` (NN:28-56),
``alphaDivergenceLoss`` (NN:245-264), ``netRegularizationLoss``
(NN:323-347) and ``networkLogEvidence`` (NN:349-387).  The reference
builds these as WL NetGraphs (incl. a hand-rolled logSumExp graph,
NN:197-243); here they are plain fused JAX functions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.numerics import logmeanexp

__all__ = [
    "gaussian_loss",
    "alpha_divergence_loss",
    "regression_loss",
    "net_regularization_loss",
    "network_log_evidence",
]


def gaussian_loss(y, y_pred, scale_param, parameterization="LogPrecision"):
    """Gaussian negative log-likelihood up to constants (NN:28-56):
    * LogPrecision: (yhat-y)^2 e^rho - rho
    * Variance:     (yhat-y)^2 / v + log v
    * StandardDeviation: ((yhat-y)/s)^2 + 2 log s
    """
    y, y_pred, s = jnp.asarray(y), jnp.asarray(y_pred), jnp.asarray(scale_param)
    sq = (y_pred - y) ** 2
    if parameterization == "LogPrecision":
        return sq * jnp.exp(s) - s
    if parameterization == "Variance":
        return sq / s + jnp.log(s)
    if parameterization == "StandardDeviation":
        return sq / s**2 + 2.0 * jnp.log(s)
    raise ValueError(f"unknown parameterization {parameterization!r}")


def alpha_divergence_loss(losses, alpha, axis=-1):
    """-(1/alpha) logMeanExp(-alpha * L) over the MC-sample axis
    (NN:245-264); alpha -> 0 gives the mean, +inf the min, -inf the max."""
    import math

    losses = jnp.asarray(losses)
    alpha = float(alpha)
    if alpha == 0:
        return jnp.mean(losses, axis=axis)
    if math.isinf(alpha):
        return (
            jnp.min(losses, axis=axis) if alpha > 0 else jnp.max(losses, axis=axis)
        )
    return -logmeanexp(-alpha * losses, axis=axis) / alpha


def _mc_outputs(net, params, key, x, k):
    """k stochastic (dropout-active) forward passes: [k, n, 2]."""
    keys = jax.random.split(key, k)

    def one(kk):
        return net.apply(params, x, deterministic=False, rngs={"dropout": kk})

    return jax.vmap(one)(keys)


def regression_loss(
    net,
    params,
    key,
    x,
    y,
    *,
    alpha: Optional[float] = None,
    sample_number: int = 10,
):
    """Training loss of ``regressionLossNet`` (NN:121-195).

    Without ``alpha``: one deterministic-dropout-free-pass-per-example is
    NOT what the reference does — it uses a single stochastic pass
    (NN:178-195); with ``alpha``: k stochastic passes through the net and
    the per-example alpha-divergence over the MC axis (NN:139-176).
    Returns the scalar mean loss over examples.
    """
    y = jnp.asarray(y).reshape(-1)
    if alpha is None:
        out = net.apply(
            params, x, deterministic=False, rngs={"dropout": key}
        )
        losses = gaussian_loss(y, out[:, 0], out[:, 1])
        return jnp.mean(losses)
    outs = _mc_outputs(net, params, key, x, sample_number)  # [k, n, 2]
    losses = gaussian_loss(y[None, :], outs[..., 0], outs[..., 1])  # [k, n]
    per_example = alpha_divergence_loss(losses, alpha, axis=0)  # [n]
    return jnp.mean(per_example)


def net_regularization_loss(params, lam=1.0, p: float = 2):
    """lambda * sum_w |w|^p over all weight arrays (NN:323-347); p = 0
    counts parameters.  ``lam``/``p`` may be lists for summed terms."""
    if isinstance(lam, (list, tuple)):
        return sum(
            net_regularization_loss(params, l_, p_) for l_, p_ in zip(lam, p)
        )
    leaves = jax.tree_util.tree_leaves(params)
    if p == 0:
        return lam * sum(leaf.size for leaf in leaves)
    return lam * sum(jnp.sum(jnp.abs(leaf) ** p) for leaf in leaves)


def network_log_evidence(
    net,
    params_or_key,
    key_or_x=None,
    x_or_y=None,
    y=None,
    lambda2=None,
    *,
    alpha=None,
    sample_number=None,
):
    """Quasi log-evidence -(mean alpha-div NLL + L2 regularization)
    (``networkLogEvidence``, NN:349-387).

    Two call forms:

    * ``network_log_evidence(trained, key, x, y)`` with a
      :class:`~.predict.TrainedRegressionNet` — alpha, the MC sample
      count and the L2 weight are AUTO-extracted from the trained bundle
      (the reference reads alpha back out of the trained net graph,
      NN:361-374); keyword overrides still win.
    * ``network_log_evidence(net, params, key, x, y, lambda2=0.0,
      alpha=0.5, sample_number=100)`` — the explicit form.
    """
    from .predict import TrainedRegressionNet

    if isinstance(net, TrainedRegressionNet):
        if y is not None:
            raise TypeError(
                "bundle form is network_log_evidence(trained, key, x, y); "
                "pass lambda2/alpha/sample_number by keyword"
            )
        trained = net
        net = trained.net
        params = trained.params
        key, x, y = params_or_key, key_or_x, x_or_y
        if alpha is None:
            alpha = trained.alpha
        if sample_number is None:
            sample_number = trained.sample_number
        if lambda2 is None:
            lambda2 = trained.weight_decay
    else:
        params, key, x = params_or_key, key_or_x, x_or_y
        if alpha is None:
            alpha = 0.5
        if sample_number is None:
            sample_number = 100
        if lambda2 is None:
            lambda2 = 0.0
    nll = regression_loss(
        net, params, key, x, y, alpha=alpha, sample_number=sample_number
    )
    reg = net_regularization_loss(params, lambda2, 2)
    return -(nll + reg)
