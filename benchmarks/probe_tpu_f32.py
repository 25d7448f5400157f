"""ULP accuracy of native f32 transcendentals on the current backend.

The committed form of the round-4 probe that diagnosed the on-chip f32
logZ gap (PERFORMANCE.md "On-chip f32 accuracy"): TPU's native f32
`log` measured up to ~2.4e3 ulps (2.9e-4 relative), `exp` ~40 ulps,
`gammaln` up to 1.4e-2 relative, where CPU f32 delivers ~1 ulp.  Those
numbers motivated `core/precise.py` (software-rounded cores, ~1 ulp on
every backend).

Evaluates native jnp ops AND the `core.precise` replacements on a log-
spaced input grid, fetches results to the host, and reports worst-case
error vs numpy/scipy f64 ground truth in ulps of the f32 result.

Usage::

    python benchmarks/probe_tpu_f32.py          # whatever backend is live
    JAX_PLATFORMS= python benchmarks/probe_tpu_f32.py --cpu
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np
from scipy.special import gammaln as scipy_gammaln


def ulp_err(got_f32, ref_f64):
    """|got - ref| in units of the f32 ulp at ref."""
    got = np.asarray(got_f32, np.float64)
    spacing = np.spacing(np.abs(ref_f64).astype(np.float32)).astype(
        np.float64
    )
    return np.abs(got - ref_f64) / spacing


def report(name, fn, x, ref):
    got = np.asarray(jax.jit(fn)(jnp.asarray(x, jnp.float32)))
    u = ulp_err(got, ref)
    rel = np.abs(got.astype(np.float64) - ref) / np.maximum(
        np.abs(ref), 1e-300
    )
    print(f"{name:28s} max {u.max():10.1f} ulp   median {np.median(u):6.2f} "
          f"ulp   max rel {rel.max():.2e}")


def main():
    from bayesianinference_tpu.core import precise

    # the software cores regardless of backend, so this probe compares
    # native vs software on the SAME platform (trace-time dispatch)
    precise.set_precise_mode("on")

    print(f"platform={jax.default_backend()}")
    rng = np.random.default_rng(0)

    # log: positive grid spanning the f32 exponent range plus jitter
    x_log = np.exp(rng.uniform(np.log(1e-30), np.log(1e30), 200_000))
    x_log = x_log.astype(np.float32).astype(np.float64)
    report("native log", jnp.log, x_log, np.log(x_log))
    report("precise.log_precise", precise.log_precise, x_log, np.log(x_log))

    # exp: arguments that stay in f32 range
    x_exp = rng.uniform(-80.0, 80.0, 200_000)
    x_exp = x_exp.astype(np.float32).astype(np.float64)
    report("native exp", jnp.exp, x_exp, np.exp(x_exp))
    report("precise.exp_precise", precise.exp_precise, x_exp, np.exp(x_exp))

    # gammaln: the evidence-assembly range (conjugate updates hit a ~
    # n/2).  NOTE the max-ulp/max-rel columns are dominated by inputs
    # near the roots at x=1 and x=2 where gammaln -> 0 and the
    # denominators vanish — read the MEDIAN for the accuracy class.
    x_g = rng.uniform(0.1, 5000.0, 200_000)
    x_g = x_g.astype(np.float32).astype(np.float64)
    ref_g = scipy_gammaln(x_g)
    report("native gammaln", jax.scipy.special.gammaln, x_g, ref_g)
    report("precise.gammaln_precise", precise.gammaln_precise, x_g, ref_g)


if __name__ == "__main__":
    main()
