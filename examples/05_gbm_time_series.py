"""Geometric-Brownian-motion time-series regression (the reference
README's worked example): infer drift and volatility from observations of
a GBM path treated as LogNormal regression over time.

Run:  python examples/05_gbm_time_series.py
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
from bayesianinference_tpu.engines import nested_sampling
from bayesianinference_tpu.results import regression_predictive_distribution

mu_true, sigma_true, s0 = 0.3, 0.25, 1.0
rng = np.random.default_rng(2)
t = np.sort(rng.uniform(0.05, 3.0, size=150))
y = s0 * np.exp(
    (mu_true - sigma_true**2 / 2) * t + sigma_true * rng.normal(size=150) * np.sqrt(t)
)


def gen_dist(th, times):
    mu, sigma = th[0], th[1]
    tt = times[:, 0]
    return d.LogNormal(
        loc=jnp.log(s0) + (mu - sigma**2 / 2) * tt, scale=sigma * jnp.sqrt(tt)
    )


problem = define_inference_problem(
    parameters=[("mu", -2.0, 2.0), ("sigma", 0.01, 2.0)],
    likelihood=gen_dist,
    data=jnp.asarray(y),
    independent_variables=jnp.asarray(t)[:, None],
    prior_distribution=["location", "scale"],
)
result = nested_sampling(
    problem, jax.random.PRNGKey(0),
    sample_pool_size=32 if SMOKE else 100,
    monte_carlo_steps=20 if SMOKE else 80,
)
est = np.asarray(result.parameter_expected_values.mean)
err = np.asarray(result.parameter_expected_values.standard_error)
print(f"mu    = {est[0]:.3f} ± {err[0]:.3f}   (true {mu_true})")
print(f"sigma = {est[1]:.3f} ± {err[1]:.3f}   (true {sigma_true})")
print(f"logZ  = {result.log_evidence}")

tq = np.linspace(0.2, 2.5, 10)[:, None]
pred = regression_predictive_distribution(result, gen_dist, jnp.asarray(tq))
med = np.asarray(pred.quantile(0.5))
print("predictive median path:", med.round(3))
