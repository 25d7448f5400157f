"""Mesh-sharded workloads: pool-sharded nested sampling and the
distributed blocked Cholesky GP logML.

Runs on a virtual 8-device CPU mesh (the same mechanism the test suite
and the driver's multi-chip dry run use) — on a real pod, drop the two
config lines and the same code shards over the physical mesh.

Run:  python examples/09_sharded_pool_and_gp.py
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.models import define_inference_problem
from bayesianinference_tpu.ops.gp_kernels import (
    covariance_matrix,
    gp_log_marginal_likelihood,
    se_kernel,
)
from bayesianinference_tpu.parallel import (
    make_mesh,
    sharded_gp_logml_blocked,
    sharded_pool_nested_sampling,
)

# ---- 1. one coherent NS run, live points sharded over the mesh ----
A = 5.0
problem = define_inference_problem(
    parameters=[("x", -A, A), ("y", -A, A)],
    log_likelihood=lambda th: jnp.sum(d.Normal(0.0, 1.0).log_prob(th)),
    prior_distribution=["location", "location"],
)
result = sharded_pool_nested_sampling(
    problem,
    jax.random.PRNGKey(0),
    sample_pool_size=512,       # 64 live points per device
    num_delete=8,               # global worst-8, one chain per device
    max_iterations=3000,
    monte_carlo_steps=60,
)
print(
    f"pool-sharded NS: logZ = {result.log_evidence} "
    f"(analytic {-2 * np.log(2 * A):.3f}), "
    f"{result.num_likelihood_evals} likelihood evals"
)

# ---- 2. GP logML with K row-sharded end to end (never gathered) ----
mesh = make_mesh(("data",))
rng = np.random.default_rng(0)
n = 2048
x = jnp.asarray(rng.uniform(-2, 2, (n, 3)))
y = jnp.asarray(np.sin(np.asarray(x)[:, 0]) + 0.1 * rng.standard_normal(n))
kern = se_kernel(1.3, 0.8)
sharded = float(sharded_gp_logml_blocked(kern, x, y, mesh, nugget=0.1))
dense = float(gp_log_marginal_likelihood(covariance_matrix(kern, x, nugget=0.1), y))
print(f"sharded GP logML = {sharded:.9f}  (dense single-device {dense:.9f})")
