"""Mesh-sharded Gaussian-process log marginal likelihood.

The tensor-parallel corner of the framework (SURVEY §2.4): for n >= 16k
the covariance matrix K dominates memory (n^2 * 4 bytes — 1 GB at 16k,
16 GB at 64k), so its ASSEMBLY is sharded row-wise over the mesh with
GSPMD: each device computes and holds only its row block of K (one
[n_local, d] x [d, n] matmul + fused elementwise kernel evaluation).

Here the Cholesky factorization is left to XLA's SPMD partitioner (which
gathers K); :mod:`.sharded_chol` provides the fully distributed blocked
factorization — row-sharded K end to end, one panel ``all_gather`` per
step — and is the path to use when K must never materialize on one
device.
"""

from __future__ import annotations


from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.gp_kernels import Kernel, gp_log_marginal_likelihood

__all__ = ["sharded_covariance_matrix", "sharded_gp_log_marginal_likelihood"]


def sharded_covariance_matrix(
    kernel: Kernel, x, mesh: Mesh, axis_name: str = "data", nugget=None
):
    """Assemble K with its ROW axis sharded over ``axis_name``.

    ``x`` is replicated in, the output K carries a row-sharding constraint;
    under jit XLA emits one per-device [n_local, n] block assembly."""
    x = jnp.asarray(x)
    n = x.shape[0]

    @jax.jit
    def build(xx):
        xx = jax.lax.with_sharding_constraint(
            xx, NamedSharding(mesh, P())
        )
        k = kernel.matrix(xx, xx)
        if nugget is not None:
            nug = nugget(xx) if callable(nugget) else jnp.broadcast_to(
                jnp.asarray(nugget, k.dtype), (n,)
            )
            k = k + jnp.diag(nug)
        return jax.lax.with_sharding_constraint(
            k, NamedSharding(mesh, P(axis_name, None))
        )

    return build(x)


def sharded_gp_log_marginal_likelihood(
    kernel: Kernel,
    x,
    y,
    mesh: Mesh,
    axis_name: str = "data",
    nugget=None,
    mean_fn: Callable = None,
):
    """GP logML with mesh-distributed covariance assembly (value identical
    to the single-device `gp_log_marginal_likelihood`)."""
    y = jnp.asarray(y)
    if mean_fn is not None:
        y = y - mean_fn(x)
    k = sharded_covariance_matrix(kernel, x, mesh, axis_name, nugget)
    return gp_log_marginal_likelihood(k, y)
