"""Pathfinder: approximate posteriors from one optimizer run per path.

The same correlated-Gaussian regression posterior fit three ways, cheap
to expensive: Laplace (curvature at the mode, LA:161-435 analogue),
multi-path Pathfinder (quasi-Newton VI along L-BFGS trajectories,
Zhang et al. 2022 — beyond-reference), and ADVI (stochastic-gradient
VI).  Pathfinder sits between them: deterministic optimizer cost like
Laplace, but it picks the iterate whose Gaussian best covers posterior
MASS (max ELBO), not the mode's curvature, and its pooled draws carry
importance weights with a Pareto-k quality diagnostic.

Run:  python examples/14_pathfinder.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# tiny sizes under the suite's smoke runner (tests/test_examples.py)
SMOKE = _os.environ.get("BI_EXAMPLE_SMOKE") == "1"

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines import (
    advi_fit,
    laplace_posterior_fit,
    pathfinder_fit,
)
from bayesianinference_tpu.models import define_inference_problem

# --- a correlated posterior: collinear regressors ---
rng = np.random.default_rng(7)
n = 60
x1 = rng.normal(size=n)
x2 = 0.95 * x1 + 0.3 * rng.normal(size=n)  # nearly collinear
y = 1.0 + 0.8 * x1 - 0.5 * x2 + 0.4 * rng.normal(size=n)
X = jnp.asarray(np.stack([x1, x2], axis=1))
yj = jnp.asarray(y)

problem = define_inference_problem(
    parameters=[("b0", -5.0, 5.0), ("b1", -5.0, 5.0), ("b2", -5.0, 5.0),
                ("sigma", 0.05, 3.0)],
    log_likelihood=lambda th, data: jnp.sum(
        d.Normal(
            th[0] + data["X"] @ th[1:3], th[3]
        ).log_prob(data["y"])
    ),
    data={"X": X, "y": yj},
    prior_distribution=[d.Normal(0.0, 3.0)] * 3 + ["scale"],
    validate=False,
)

key = jax.random.PRNGKey(0)

# --- Laplace: curvature at the mode ---
lap = laplace_posterior_fit(problem=problem)
print(f"Laplace   logZ ~ {float(lap.log_evidence):+.3f}")

# --- Pathfinder: max-ELBO Gaussian along 8 L-BFGS paths ---
pf = pathfinder_fit(problem, key, num_paths=2 if SMOKE else 8)
w = np.asarray(pf.samples.normalized_weights())
pts = np.asarray(pf.samples.points)
mean = w @ pts
sd = np.sqrt(np.sum(w[:, None] * (pts - mean) ** 2, axis=0))
print(
    f"Pathfinder ELBO {float(pf.elbo):+.3f} <= logZ,  "
    f"IS logZ ~ {float(pf.log_evidence_is):+.3f},  "
    f"pareto k {float(pf.pareto_k):.2f} (trust < 0.7)"
)
print(f"  winning iterations per path: {np.asarray(pf.best_iteration)}")
for i, nm in enumerate(problem.param_names):
    print(f"  {nm:6s} {mean[i]:+.3f} +- {sd[i]:.3f}")

# --- ADVI for comparison (stochastic, many more density evals) ---
vi = advi_fit(problem, key, family="fullrank",
              num_steps=200 if SMOKE else 4000)
print(f"ADVI      ELBO {float(vi.elbo):+.3f} <= logZ")

# the three evidence estimates should bracket consistently:
# ELBOs below logZ, Laplace close for this near-Gaussian posterior
