"""Mesh-parallel nested sampling with exact run merging, and
checkpointed/resumable runs.

Run (8 virtual devices):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/06_parallel_checkpoint.py
"""

import os as _os
import sys as _sys

# make the example runnable from anywhere without installing the package
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# tiny sizes under the suite's smoke runner (tests/test_examples.py)
SMOKE = _os.environ.get("BI_EXAMPLE_SMOKE") == "1"

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.models import define_inference_problem
from bayesianinference_tpu.engines import load_ns_run, nested_sampling
from bayesianinference_tpu.parallel import make_mesh, parallel_nested_sampling

problem = define_inference_problem(
    parameters=[("x", -5.0, 5.0), ("y", -5.0, 5.0)],
    log_likelihood=lambda th: jnp.sum(d.Normal(0.0, 1.0).log_prob(th)),
    prior_distribution=["location", "location"],
)

n_dev = len(jax.devices())
mesh = make_mesh(("runs",))
print(f"mesh: {n_dev} devices on the 'runs' axis")
result = parallel_nested_sampling(
    problem,
    jax.random.PRNGKey(0),
    num_runs=n_dev,
    sample_pool_size=50,  # per run -> total pool n_dev * 50
    mesh=mesh,
    monte_carlo_steps=60,
    max_iterations=1000,
)
print(f"combined logZ = {result.log_evidence} "
      f"(pool {result.sample_pool_size}, {result.total_samples} samples)")

# checkpointed single run: segments of 100 iterations, resumable anytime
res = nested_sampling(
    problem, jax.random.PRNGKey(1), sample_pool_size=60,
    monte_carlo_steps=60, max_iterations=800,
    checkpoint_path="/tmp/ns_checkpoint.npz", checkpoint_every=100,
)
print(f"checkpointed logZ = {res.log_evidence}")
ck = load_ns_run("/tmp/ns_checkpoint.npz")
print(f"checkpoint holds {int(ck.state.n_dead)} dead points at iteration "
      f"{int(ck.state.iteration) - 1}")
