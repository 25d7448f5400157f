"""Quasi-Bayesian regression networks (MC dropout).

From-scratch flax implementation of the reference's WL/MXNet nets
(BayesianNeuralNetworks.wl): ``regressionNet`` (NN:58-119) — an MLP of
``depth`` x (Dense -> [BatchNorm] -> SELU -> Dropout) blocks with either a
heteroscedastic 2-output head (mean, log-precision) or a homoscedastic
1-output head plus a learned constant log-precision (the ``constLayer``
trick, NN:104-117).

Dropout stays active at prediction time (MC dropout); the PRNG key
discipline replaces ``NetEvaluationMode -> "Train"`` (NN:308-311).
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["RegressionNet", "regression_net"]


class RegressionNet(nn.Module):
    """MLP regression net with (mean, log-precision) output.

    error_model: "HeteroScedastic" — 2 network outputs; "HomoScedastic" —
    1 network output + learned constant log-precision (NN:102-119).
    """

    depth: int = 4
    layer_size: Union[int, Sequence[int]] = 100
    activation: Callable = nn.selu
    dropout_probability: float = 0.25
    batch_normalization: bool = False
    error_model: str = "HeteroScedastic"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = False):
        x = jnp.atleast_2d(x)
        for i in range(self.depth):
            size = (
                self.layer_size[i]
                if isinstance(self.layer_size, (tuple, list))
                else self.layer_size
            )
            x = nn.Dense(size)(x)
            if self.batch_normalization:
                x = nn.BatchNorm(use_running_average=deterministic)(x)
            x = self.activation(x)
            if self.dropout_probability:
                x = nn.Dropout(
                    rate=self.dropout_probability, deterministic=deterministic
                )(x)
        if self.error_model == "HeteroScedastic":
            out = nn.Dense(2)(x)  # [., 2] = (mean, log-precision)
        else:
            mean = nn.Dense(1)(x)
            log_prec = self.param(
                "log_precision", nn.initializers.zeros, (1,)
            )
            out = jnp.concatenate(
                [mean, jnp.broadcast_to(log_prec, mean.shape)], axis=-1
            )
        return out


def regression_net(
    error_model: str = "HeteroScedastic",
    *,
    depth: int = 4,
    layer_size: Union[int, Sequence[int]] = 100,
    activation: Callable = nn.selu,
    dropout_probability: float = 0.25,
    batch_normalization: bool = False,
) -> RegressionNet:
    """Builder mirroring ``regressionNet``'s options (NN:58-64)."""
    return RegressionNet(
        depth=depth,
        layer_size=layer_size,
        activation=activation,
        dropout_probability=dropout_probability,
        batch_normalization=batch_normalization,
        error_model=error_model,
    )
