"""Conjugate Bayesian linear regression: polynomial fitting with exact
evidence-based model comparison (the reference README's flagship use).

Run:  python examples/02_bayesian_linear_regression.py
"""

import os as _os
import sys as _sys

# make the example runnable from anywhere without installing the package
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# tiny sizes under the suite's smoke runner (tests/test_examples.py)
SMOKE = _os.environ.get("BI_EXAMPLE_SMOKE") == "1"

import jax.numpy as jnp
import numpy as np

from bayesianinference_tpu.engines import bayesian_linear_regression

rng = np.random.default_rng(0)
x = rng.uniform(-2, 2, size=(80, 1))
y = 0.5 - 1.2 * x[:, 0] + 0.8 * x[:, 0] ** 2 + 0.4 * rng.normal(size=80)

print("model comparison by exact log evidence:")
results = {}
for degree in range(5):
    res = bayesian_linear_regression(jnp.asarray(x), jnp.asarray(y), degree=degree)
    results[degree] = res
    print(f"  degree {degree}: logZ = {float(res.log_evidence):9.3f}")

best = max(results, key=lambda k: float(results[k].log_evidence))
res = results[best]
print(f"best degree: {best} (true: 2)")
print(f"coefficients: {np.asarray(res.posterior_parameters.b).round(3)} "
      f"(true: [0.5, -1.2, 0.8])")

pred = res.predictive_distribution(jnp.asarray([[1.0]]))
print(f"predictive at x=1: {float(pred.mean()[0]):.3f} ± {float(pred.std()[0]):.3f} "
      f"(true value 0.1)")
coeff_dist = res.posterior["RegressionCoefficientDistribution"]
print(f"coefficient posterior covariance diag: "
      f"{np.asarray(coeff_dist.covariance()).diagonal().round(5)}")
