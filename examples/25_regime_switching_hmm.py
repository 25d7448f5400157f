"""Regime-switching returns with an exact hidden-Markov likelihood.

A 2-state Gaussian HMM (calm vs turbulent regime, different means AND
volatilities): `define_hidden_markov_model` gives every engine the
EXACT marginal likelihood (forward algorithm — all 2^T paths summed),
Laplace fits means/vols/transition logits, forward-backward smoothing
recovers the regime probabilities, Viterbi decodes the MAP path, and
FFBS draws joint hidden paths that integrate parameter uncertainty —
answering path questions ("longest turbulent spell") by direct MC.

Run:  python examples/25_regime_switching_hmm.py   (writes regime_hmm.png)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# tiny sizes under the suite's smoke runner (tests/test_examples.py)
SMOKE = _os.environ.get("BI_EXAMPLE_SMOKE") == "1"

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinference_tpu.engines import (
    define_hidden_markov_model,
    laplace_posterior_fit,
    most_likely_states,
    regime_probabilities,
    sample_hidden_paths,
)
from bayesianinference_tpu.ops import HMM, hmm_sample_states, row_stochastic

# ---- simulate: sticky 2-regime Gaussian returns ----
TRUE = dict(mu=(0.05, -0.1), sigma=(0.4, 1.4), p_stay=(0.97, 0.90))
T = 120 if SMOKE else 600
gen = HMM(
    initial_log_probs=jnp.log(jnp.asarray([0.5, 0.5])),
    transition_log_probs=jnp.log(
        jnp.asarray(
            [
                [TRUE["p_stay"][0], 1 - TRUE["p_stay"][0]],
                [1 - TRUE["p_stay"][1], TRUE["p_stay"][1]],
            ]
        )
    ),
)
z_true = np.asarray(hmm_sample_states(jax.random.PRNGKey(4), gen, T))
rng = np.random.default_rng(0)
y = jnp.asarray(
    np.take(TRUE["mu"], z_true) + np.take(TRUE["sigma"], z_true) * rng.normal(size=T)
)


def builder(theta):
    mu = jnp.stack([theta[0], theta[1]])
    log_sig = jnp.stack([theta[2], theta[3]])
    hmm = HMM(
        initial_log_probs=jnp.log(jnp.asarray([0.5, 0.5], theta.dtype)),
        transition_log_probs=row_stochastic(
            jnp.stack([theta[4], theta[5]])[:, None]
        ),
    )
    log_obs = (
        -0.5 * ((y[:, None] - mu) * jnp.exp(-log_sig)) ** 2
        - log_sig
        - 0.5 * jnp.log(2 * jnp.pi)
    )
    return hmm, log_obs


problem = define_hidden_markov_model(
    builder,
    parameters=[
        ("mu_calm", -1.0, 1.0),
        ("mu_turb", -1.0, 1.0),
        # disjoint volatility boxes break the label-switching symmetry:
        # "calm" is DEFINED as the sigma<0.8 regime
        ("log_sig_calm", -3.0, -0.2),
        ("log_sig_turb", 0.0, 2.0),
        ("logit_stay_calm", -2.0, 8.0),
        ("logit_leave_turb", -8.0, 2.0),
    ],
    prior_distribution=["location"] * 6,
    validate=False,
)

fit = laplace_posterior_fit(problem=problem, key=jax.random.PRNGKey(0))
mu0, mu1, ls0, ls1, l0, l1 = np.asarray(fit.mean)
print("MAP parameters (true in parens):")
print(f"  mu      calm {mu0:+.3f} ({TRUE['mu'][0]})   turb {mu1:+.3f} ({TRUE['mu'][1]})")
print(f"  sigma   calm {np.exp(ls0):.3f} ({TRUE['sigma'][0]})   turb {np.exp(ls1):.3f} ({TRUE['sigma'][1]})")
print(f"  p_stay  calm {1/(1+np.exp(-l0)):.3f} ({TRUE['p_stay'][0]})   turb {1/(1+np.exp(l1)):.3f} ({TRUE['p_stay'][1]})")
print(f"exact log evidence (Laplace): {float(fit.log_evidence):.1f}")

g = np.asarray(regime_probabilities(problem, fit.mean))
vit = np.asarray(most_likely_states(problem, fit.mean))
acc = np.mean(vit == z_true)
acc = max(acc, 1 - acc)  # label switching
print(f"Viterbi regime accuracy: {acc:.3f}")

# joint paths with parameter uncertainty: longest turbulent spell
thetas = fit.posterior_distribution.sample(jax.random.PRNGKey(1), (16,))
paths = np.asarray(
    sample_hidden_paths(problem, jax.random.PRNGKey(2), thetas, paths_per_theta=64)
).reshape(-1, T)


def longest_run(row):
    best = cur = 0
    for v in row:
        cur = cur + 1 if v == 1 else 0
        best = max(best, cur)
    return best


runs = np.asarray([longest_run(r) for r in paths])
print(
    f"longest turbulent spell: median {np.median(runs):.0f} steps, "
    f"90% CI [{np.percentile(runs, 5):.0f}, {np.percentile(runs, 95):.0f}]"
)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, (ax0, ax1) = plt.subplots(
    2, 1, figsize=(10, 6), sharex=True, height_ratios=[2, 1]
)
t = np.arange(T)
ax0.plot(t, np.asarray(y), lw=0.7, color="k")
ax0.set_ylabel("return")
ax0.set_title(
    f"2-regime HMM: exact logZ {float(fit.log_evidence):.1f}, "
    f"Viterbi accuracy {acc:.2f}"
)
ax1.fill_between(t, 0, g[:, 1], color="C3", alpha=0.5, label="P(turbulent | y)")
ax1.step(t, z_true, lw=0.8, color="k", alpha=0.6, label="true regime")
ax1.set_ylabel("regime")
ax1.legend(loc="upper right")
fig.tight_layout()
fig.savefig(_os.path.join(_os.path.dirname(__file__), "regime_hmm.png"), dpi=110)
print("wrote regime_hmm.png")
