"""Production serving round-trip: fit, persist the posterior artifact,
reload it in a fresh process, and serve predictions from the loaded copy.

Run:  python examples/10_serving_roundtrip.py
"""

import os
import subprocess
import sys
import tempfile

# make the example runnable from anywhere without installing the package
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# tiny sizes under the suite's smoke runner (tests/test_examples.py)
SMOKE = os.environ.get("BI_EXAMPLE_SMOKE") == "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines import (
    nested_sampling,
    save_result,
)
from bayesianinference_tpu.models import define_inference_problem

# ---- fit: Gaussian mean/scale inference ----
rng = np.random.default_rng(0)
data = jnp.asarray(rng.normal(1.2, 0.7, size=200))
problem = define_inference_problem(
    parameters=[("mu", -5.0, 5.0), ("sigma", 0.05, 5.0)],
    likelihood=lambda th: d.Normal(th[0], th[1]),
    data=data,
    prior_distribution=["location", "scale"],
)
result = nested_sampling(
    problem, jax.random.PRNGKey(0),
    sample_pool_size=48 if SMOKE else 100,
    max_iterations=1500, monte_carlo_steps=25 if SMOKE else 80,
)
_tmp = tempfile.TemporaryDirectory()
path = os.path.join(_tmp.name, "posterior.npz")
save_result(path, result)
print(f"fit: logZ = {result.log_evidence}; artifact -> {path}")

# ---- serve: a FRESH interpreter loads the artifact and predicts ----
serve_code = f"""
import sys
sys.path.insert(0, {_REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines import load_result
from bayesianinference_tpu.results import predictive_distribution

result = load_result({path!r})
print("loaded: logZ =", result.log_evidence,
      "| posterior mean =", np.round(np.asarray(
          result.parameter_expected_values.mean), 3))
pred = predictive_distribution(result, lambda th: d.Normal(th[0], th[1]))
q = pred.quantile(jnp.asarray([0.05, 0.5, 0.95]))
print("posterior-predictive quantiles:", np.round(np.asarray(q), 3))
"""
out = subprocess.run(
    [sys.executable, "-c", serve_code],
    capture_output=True,
    text=True,
)
print(out.stdout.strip())
_tmp.cleanup()
if out.returncode != 0:
    print(out.stderr, file=sys.stderr)
    raise SystemExit(1)

# ---- serve: a fit-per-request loop over FRESH datasets ----
# The problem carries its observations as a TRACED field, so
# problem.with_data(new) reuses every compiled engine program: the first
# fit pays the compile, every further fit is pure device time.
import time

import numpy as np

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines import nested_sampling
from bayesianinference_tpu.models import define_inference_problem

rng = np.random.default_rng(0)
problem = define_inference_problem(
    parameters=[("mu", -5.0, 5.0), ("log_sigma", -2.0, 2.0)],
    likelihood=lambda th: d.Normal(th[0], jnp.exp(th[1])),
    data=jnp.asarray(rng.normal(0.0, 1.0, 64)),
    prior_distribution=["location", "location"],
)
t0 = time.perf_counter()
nested_sampling(problem, jax.random.PRNGKey(0),
                sample_pool_size=48 if SMOKE else 100,
                max_iterations=1500)
print(f"first fit (compile): {time.perf_counter() - t0:.1f}s")
for request in range(3):
    true_mu = rng.uniform(-2, 2)
    fresh = problem.with_data(jnp.asarray(rng.normal(true_mu, 1.0, 64)))
    t0 = time.perf_counter()
    res = nested_sampling(fresh, jax.random.PRNGKey(request + 1),
                          sample_pool_size=48 if SMOKE else 100,
                          max_iterations=1500)
    mu_hat = float(res.parameter_expected_values.mean[0])
    print(f"request {request}: fit {1e3 * (time.perf_counter() - t0):.0f} ms"
          f"  mu_hat {mu_hat:+.2f} (truth {true_mu:+.2f})")
