"""Generative-model (Distributed[var, dist]-style) Laplace fit.

The model is declared as a ConditionalProduct DAG — priors and the
observation distribution in one object — and conditioned on data; the
fit validates the dependency graph (acyclicity, inputs have no parents,
parameters cannot depend on observations) exactly like the reference's
laplacePosteriorFit front-end (LaplaceApproximation.wl:453-518).

Run:  python examples/08_generative_model_laplace.py
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
from bayesianinference_tpu.dists.combinators import ConditionalProduct
from bayesianinference_tpu.engines.laplace import laplace_posterior_fit

rng = np.random.default_rng(0)
n = 200
x = jnp.asarray(rng.uniform(-2, 2, (n, 2)))
true_w = jnp.asarray([1.5, -2.0])
y = jnp.asarray(
    (rng.uniform(size=n) < jax.nn.sigmoid(0.5 + x @ true_w)).astype(float)
)

# y | x, b0, w  ~  Bernoulli(logit = b0 + x.w);   b0, w ~ N(0, 10)
model = ConditionalProduct(
    [
        ("b0", lambda v: d.Normal(0.0, 10.0)),
        ("w", lambda v: d.Normal(jnp.zeros(2), 10.0)),
        ("y", lambda v: d.BernoulliLogits(logits=v["b0"] + v["x"] @ v["w"])),
    ]
)

fit = laplace_posterior_fit(
    model=model,
    data={"y": y},
    parameters=[("b0", -20.0, 20.0), ("w", -20.0, 20.0, (2,))],
    model_inputs={"x": x},
)

print("mode:", np.asarray(fit.mean), "(true ~ [0.5, 1.5, -2.0])")
print("log evidence:", float(fit.log_evidence))
post = fit.posterior_distribution
print("posterior sd:", np.sqrt(np.diagonal(np.linalg.inv(np.asarray(fit.precision_matrix)))))
s = post.sample(jax.random.PRNGKey(1), (2000,))
acc = np.mean(
    (np.asarray(x @ fit.mean[1:] + fit.mean[0]) > 0) == np.asarray(y)
)
print(f"mode train accuracy: {acc:.3f}")
