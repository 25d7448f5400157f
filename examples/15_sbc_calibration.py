"""Simulation-based calibration: proving a fitting pipeline is honest.

SBC (Talts et al. 2018) closes the loop the reference's error-bar
studies (BS:1209-1291) leave open: draw truths from the prior, simulate
data, fit, and rank each truth among the posterior draws — a calibrated
pipeline gives uniform ranks for ANY model.  Here the conjugate
normal-model engine (exact) passes, while a deliberately overconfident
variant (posterior standard deviations shrunk 40%) is flagged, both in
one vectorized study each (the whole N-replication loop is a single
jitted vmap — hundreds of fits per dispatch).

Run:  python examples/15_sbc_calibration.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# tiny sizes under the suite's smoke runner (tests/test_examples.py)
SMOKE = _os.environ.get("BI_EXAMPLE_SMOKE") == "1"

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinference_tpu.dists import NormalInverseGamma
from bayesianinference_tpu.engines import normal_conjugate_model
from bayesianinference_tpu.results import sbc_ranks

PRIOR = NormalInverseGamma(mu0=0.0, lam=1.0, beta=1.0, nu=2.0)
N_OBS, L_DRAWS, N_REPS = 12, 19, (20 if SMOKE else 300)


def prior_sample(k):
    m, v = PRIOR.sample(k)
    return jnp.stack([m, v])


def simulate(k, theta):
    return theta[0] + jnp.sqrt(theta[1]) * jax.random.normal(k, (N_OBS,))


def make_posterior_draws(shrink):
    def posterior_draws(k, data):
        fit = normal_conjugate_model(data, prior=PRIOR)
        m, v = fit.posterior.sample(k, (L_DRAWS,))
        if shrink != 1.0:  # deliberately mis-calibrated variant
            m_c = jnp.mean(m)
            v_c = jnp.exp(jnp.mean(jnp.log(v)))
            m = m_c + shrink * (m - m_c)
            v = v_c * (v / v_c) ** shrink
        return jnp.stack([m, v], axis=-1)

    return posterior_draws


for label, shrink in [("exact conjugate", 1.0), ("overconfident", 0.6)]:
    res = sbc_ranks(
        jax.random.PRNGKey(0),
        prior_sample=prior_sample,
        simulate=simulate,
        posterior_draws=make_posterior_draws(shrink),
        num_replications=N_REPS,
        vectorized=True,  # the whole study is ONE jitted vmap
        param_names=("mean", "var"),
    )
    p = np.asarray(res.uniformity_pvalues())
    verdict = "calibrated" if p.min() > 0.01 else "MISCALIBRATED"
    print(
        f"{label:16s} rank-uniformity p-values "
        f"mean={p[0]:.3f} var={p[1]:.3f} -> {verdict}"
    )

# the classic rank histograms, saved next to this script
try:
    from bayesianinference_tpu import viz

    res = sbc_ranks(
        jax.random.PRNGKey(0),
        prior_sample=prior_sample,
        simulate=simulate,
        posterior_draws=make_posterior_draws(1.0),
        num_replications=N_REPS,
        vectorized=True,
        param_names=("mean", "var"),
    )
    out = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "sbc_ranks.png")
    viz.sbc_rank_plot(res, columns=2).savefig(out, dpi=100)
    print(f"rank histograms -> {out}")
except ImportError:
    pass
