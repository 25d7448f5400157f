"""Gaussian-process regression with full hyperparameter posteriors via
nested sampling, and batched posterior prediction.

Run:  python examples/03_gaussian_process.py        (writes gp_fit.png)
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

from bayesianinference_tpu.engines import (
    define_gaussian_process,
    nested_sampling,
    predict_from_gaussian_process,
)
from bayesianinference_tpu.ops import se_kernel
from bayesianinference_tpu.viz import regression_plot_1d

rng = np.random.default_rng(1)
x = np.sort(rng.uniform(-3, 3, size=50))[:, None]
y = np.sin(1.5 * x[:, 0]) + 0.1 * rng.normal(size=50)

problem = define_gaussian_process(
    jnp.asarray(x),
    jnp.asarray(y),
    kernel_builder=lambda th: se_kernel(th[0] ** 2, th[1]),
    nugget_builder=lambda th: th[2] ** 2,
    parameters=[("amp", 0.05, 5.0), ("length", 0.05, 5.0), ("noise", 0.01, 1.0)],
    prior_distribution=["scale", "scale", "scale"],
)
result = nested_sampling(
    problem, jax.random.PRNGKey(0), sample_pool_size=100,
    monte_carlo_steps=100, max_iterations=1500,
)
print(f"logZ = {result.log_evidence}")
print("hyperparameter posterior means:",
      np.asarray(result.parameter_expected_values.mean).round(3))

xq = np.linspace(-3.2, 3.2, 80)[:, None]
pred = predict_from_gaussian_process(result, problem, jnp.asarray(xq))
fig = regression_plot_1d(result, pred, xq[:, 0], x_data=x, y_data=y)
fig.savefig("gp_fit.png", dpi=120)
print("wrote gp_fit.png")
