"""Training and MC-dropout prediction for quasi-Bayesian networks.

``sample_trained_net`` is the analogue of NN:291-321: n stochastic forward
passes with dropout active; predictive mean = mean of the mean-head,
predictive stdv = sqrt(Var(mean-head) + mean(exp(-log-precision))) — i.e.
epistemic + aliased aleatoric variance — yielding one Normal per input.
``train_regression_net`` replaces ``NetTrain`` with a jitted optax loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..dists.scalar import Normal
from .losses import net_regularization_loss, regression_loss
from .nets import RegressionNet

__all__ = [
    "TrainedRegressionNet",
    "train_regression_net",
    "sample_trained_net",
]


class TrainedRegressionNet(NamedTuple):
    """A trained net bundled with its loss configuration, so consumers can
    AUTO-extract the training hyperparameters the way the reference reads
    alpha back out of the trained NetGraph (``networkLogEvidence``'s
    net-inspection, NN:361-374)."""

    params: dict
    history: "jnp.ndarray"
    net: RegressionNet
    alpha: Optional[float]
    sample_number: int
    weight_decay: float


def train_regression_net(
    net: RegressionNet,
    key,
    x,
    y,
    *,
    alpha: Optional[float] = 0.5,
    sample_number: int = 10,
    weight_decay: float = 0.0,
    learning_rate: float = 1e-3,
    num_steps: int = 2000,
    batch_size: Optional[int] = None,
) -> "TrainedRegressionNet":
    """Train with Adam on the (alpha-divergence) Gaussian loss; returns a
    :class:`TrainedRegressionNet` — unpack ``trained.params`` /
    ``trained.history``, or pass the whole bundle to
    :func:`~.losses.network_log_evidence` for reference-style
    auto-extraction of alpha (NN:361-374)."""
    x = jnp.atleast_2d(jnp.asarray(x))
    y = jnp.asarray(y).reshape(-1)
    k_init, k_train = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    params = net.init(
        {"params": k_init, "dropout": k_init}, x[:1], deterministic=True
    )
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)
    n = x.shape[0]
    bs = batch_size or n

    def loss_fn(p, k, xb, yb):
        loss = regression_loss(
            net, p, k, xb, yb, alpha=alpha, sample_number=sample_number
        )
        if weight_decay:
            loss = loss + net_regularization_loss(p, weight_decay, 2)
        return loss

    @jax.jit
    def step(carry, k):
        p, s = carry
        k_batch, k_loss = jax.random.split(k)
        if bs < n:
            idx = jax.random.randint(k_batch, (bs,), 0, n)
            xb, yb = x[idx], y[idx]
        else:
            xb, yb = x, y
        loss, g = jax.value_and_grad(loss_fn)(p, k_loss, xb, yb)
        updates, s = opt.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), history = jax.lax.scan(
        step, (params, opt_state), jax.random.split(k_train, num_steps)
    )
    return TrainedRegressionNet(
        params=params,
        history=history,
        net=net,
        alpha=alpha,
        sample_number=sample_number,
        weight_decay=weight_decay,
    )


def sample_trained_net(
    net: RegressionNet,
    params,
    key,
    x,
    num_samples: int = 100,
) -> Normal:
    """MC-dropout predictive (NN:291-321): returns a batched Normal over
    the input points with
      mean = E_s[mu_s],  std = sqrt(Var_s[mu_s] + E_s[exp(-rho_s)]).
    """
    x = jnp.atleast_2d(jnp.asarray(x))
    keys = jax.random.split(key, num_samples)

    def one(k):
        return net.apply(params, x, deterministic=False, rngs={"dropout": k})

    outs = jax.vmap(one)(keys)  # [S, n, 2]
    mu = outs[..., 0]
    log_prec = outs[..., 1]
    mean = jnp.mean(mu, axis=0)
    var = jnp.var(mu, axis=0, ddof=1) + jnp.mean(jnp.exp(-log_prec), axis=0)
    return Normal(loc=mean, scale=jnp.sqrt(var))
