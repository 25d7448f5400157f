"""Mesh-sharded workloads: pool-sharded nested sampling and the
distributed blocked Cholesky GP logML.

Runs on a virtual 8-device CPU mesh (the same mechanism the test suite
and the driver's multi-chip dry run use) — on a real pod, drop the two
config lines and the same code shards over the physical mesh.

Run:  python examples/09_sharded_pool_and_gp.py
"""

import os as _os
import sys as _sys

# make the example runnable from anywhere without installing the package
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# tiny sizes under the suite's smoke runner (tests/test_examples.py)
SMOKE = _os.environ.get("BI_EXAMPLE_SMOKE") == "1"

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

# ---- 3. GP posterior prediction, still never gathering K ----
from bayesianinference_tpu.parallel import sharded_gp_predict
from bayesianinference_tpu.ops.gp_kernels import gp_posterior_moments

xq = jnp.linspace(-2.0, 2.0, 9)[:, None] * jnp.ones((1, 3))
mean_sh, std_sh = sharded_gp_predict(kern, x, y, xq, mesh, nugget=0.1)
mean_ref, std_ref = gp_posterior_moments(kern, x, y, xq, nugget=0.1)
print(
    "sharded GP predict max |err| vs single-device: "
    f"mean {float(jnp.max(jnp.abs(mean_sh - mean_ref))):.2e}, "
    f"std {float(jnp.max(jnp.abs(std_sh - std_ref))):.2e}"
)

# ---- 4. long-data conjugate regression: sufficient statistics psum ----
from bayesianinference_tpu.engines import bayesian_linear_regression
from bayesianinference_tpu.parallel import sharded_bayesian_linear_regression

nr = 100_003  # not a multiple of 8: padding mask handles it
xr = jnp.asarray(rng.uniform(-2, 2, (nr, 1)))
yr = jnp.asarray(
    1.0 - 2.0 * np.asarray(xr)[:, 0]
    + 0.5 * np.asarray(xr)[:, 0] ** 3
    + 0.1 * rng.standard_normal(nr)
)
blr_sh = sharded_bayesian_linear_regression(xr, yr, mesh, degree=3)
blr_d = bayesian_linear_regression(xr, yr, degree=3)
print(
    f"sharded BLR logZ = {float(blr_sh.log_evidence):.6f} "
    f"(dense {float(blr_d.log_evidence):.6f}); "
    f"coefficients {np.round(np.asarray(blr_sh.posterior_parameters.b), 3)}"
)
