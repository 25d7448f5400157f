"""Benchmark: nested-sampling likelihood throughput on one chip.

Prints ONE JSON line:
  {"metric": "ns_likelihood_evals_per_sec_per_chip", "value": N,
   "unit": "evals/s", "vs_baseline": N / 1e6}

Config: the BASELINE 2-D Gaussian-likelihood x uniform-prior nested
sampling run (BASELINE.json configs[1]), with the live-point pool evolved
by batched vmapped adaptive-Metropolis chains (num_delete chains per
iteration, each chain a lax.scan of MH steps; every step evaluates one
likelihood per chain).  The baseline target is >= 1e6 evals/s/chip
(BASELINE.json north_star).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

# amortize the slow remote compiles across invocations
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main():
    from bayesianinference_tpu import dists as d
    from bayesianinference_tpu.models import define_inference_problem
    from bayesianinference_tpu.engines.nested_sampling import (
        nested_sampling_loop,
    )

    a = 5.0
    problem = define_inference_problem(
        parameters=[("x", -a, a), ("y", -a, a)],
        log_likelihood=lambda th: jnp.sum(d.Normal(0.0, 1.0).log_prob(th)),
        prior_distribution=["location", "location"],
        validate=False,
    )

    n_live = 32768
    num_delete = 8192
    mc_steps = 50
    iters = 16

    key = jax.random.PRNGKey(0)
    starts = problem.prior_distribution.sample(key, (n_live,))

    def run(k):
        return nested_sampling_loop(
            problem,
            starts,
            k,
            max_iterations=iters,
            min_iterations=iters,  # fixed trip count for stable timing
            monte_carlo_steps=(mc_steps, mc_steps, mc_steps),
            num_delete=num_delete,
        )

    # compile + warm up (host fetch forces real completion; see
    # PERFORMANCE.md on block_until_ready through the axon tunnel)
    r = run(key)
    float(r.state.log_z)

    best_dt = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        r = run(jax.random.fold_in(key, rep + 1))
        float(r.state.log_z)
        best_dt = min(best_dt, time.perf_counter() - t0)
    dt = best_dt

    from bayesianinference_tpu.engines.nested_sampling import evals_to_int

    evals = evals_to_int(r.state.num_likelihood_evals)
    evals_per_sec = evals / dt

    print(
        f"[bench] platform={jax.default_backend()} evals={evals} "
        f"wall={dt:.3f}s logZ~{float(r.state.log_z):.3f} "
        f"(analytic -4.605)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "ns_likelihood_evals_per_sec_per_chip",
                "value": evals_per_sec,
                "unit": "evals/s",
                "vs_baseline": evals_per_sec / 1e6,
            }
        )
    )


if __name__ == "__main__":
    main()
