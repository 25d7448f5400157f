"""Dynamic nested sampling: event-merge exactness, oracle logZ, and the
posterior-ESS payoff that motivates the algorithm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines import (
    NSSegment,
    combine_runs,
    dynamic_nested_sampling,
    generate_starting_points,
    merge_segments,
    merged_evidence_sampling,
    nested_sampling,
    nested_sampling_loop,
    segment_from_run,
)
from bayesianinference_tpu.models import define_inference_problem
from bayesianinference_tpu.ops.ns_math import pool_schedule


def _conjugate_problem(n_obs=40, seed=1, tau0=3.0):
    rng = np.random.default_rng(seed)
    data = rng.normal(1.2, 1.0, n_obs)
    problem = define_inference_problem(
        parameters=[("mu", -10.0, 10.0)],
        likelihood=lambda th: d.Normal(th[0], 1.0),
        data=jnp.asarray(data),
        prior_distribution=[d.Normal(0.0, tau0)],
        validate=False,
    )
    cov = tau0**2 * np.ones((n_obs, n_obs)) + np.eye(n_obs)
    log_z = st.multivariate_normal(np.zeros(n_obs), cov).logpdf(data)
    post_prec = 1 / tau0**2 + n_obs
    return problem, log_z, (data.sum() / post_prec, post_prec**-0.5)


@pytest.fixture(scope="module")
def conjugate_runs():
    problem, log_z, post = _conjugate_problem()
    pts = generate_starting_points(problem, jax.random.PRNGKey(0), 64)
    run1 = nested_sampling_loop(
        problem, pts, jax.random.PRNGKey(1), monte_carlo_steps=60
    )
    pts2 = generate_starting_points(problem, jax.random.PRNGKey(2), 64)
    run2 = nested_sampling_loop(
        problem, pts2, jax.random.PRNGKey(3), monte_carlo_steps=60
    )
    return problem, log_z, post, run1, run2


def test_single_run_merge_reproduces_pool_schedule(conjugate_runs):
    """The event accounting must reproduce the loop's exact per-deletion
    schedule: constant n through the deletions (k=1), then the harmonic
    tail n, n-1, ..., 1 over the final live points."""
    _, _, _, run1, _ = conjugate_runs
    seg = segment_from_run(run1)
    _, logl, _, m = merge_segments([seg])
    nd, n = seg.n_dead, seg.n_live
    np.testing.assert_array_equal(m[:nd], np.full(nd, n))
    np.testing.assert_array_equal(m[nd:], np.arange(n, 0, -1))
    assert np.all(np.diff(logl) >= 0)


def test_batched_deletion_merge_matches_schedule():
    """num_delete > 1: the within-batch dips n, n-1, ..., n-k+1 emerge
    from the death/replacement-birth event ordering."""
    problem, _, _ = _conjugate_problem()
    pts = generate_starting_points(problem, jax.random.PRNGKey(4), 64)
    run = nested_sampling_loop(
        problem, pts, jax.random.PRNGKey(5), monte_carlo_steps=60,
        num_delete=8,
    )
    seg = segment_from_run(run)
    _, _, _, m = merge_segments([seg])
    nd = seg.n_dead
    expected = np.asarray(pool_schedule(64, 8, nd))
    np.testing.assert_array_equal(m[:nd], expected)


def test_two_full_runs_merge_agrees_with_combine(conjugate_runs):
    """Merging two equal full runs: the pool is n1+n2 through the joint
    main phase (the classic exact-merge result), and both the event
    merge and combine_runs hit the analytic logZ within error bars."""
    problem, log_z, _, run1, run2 = conjugate_runs
    s1, s2 = segment_from_run(run1), segment_from_run(run2)
    pts, logl, logp, m = merge_segments([s1, s2])
    assert int(m.max()) == 128
    assert int(m[0]) == 128
    res_m = merged_evidence_sampling(
        points=pts, log_likelihoods=logl, log_priors=logp, schedule=m,
        key=jax.random.PRNGKey(6), num_runs=100, sample_pool_size=128,
    )
    se = float(res_m.log_evidence.standard_error)
    assert abs(float(res_m.log_evidence.mean) - log_z) < 3 * se + 0.05
    # cross-check against the reference-style combine of the two results
    from bayesianinference_tpu.engines.evidence import evidence_sampling

    def classic(run, key):
        points, ll, lp, _, nd = run.finalize()
        return evidence_sampling(
            points=points, log_likelihoods=ll, log_priors=lp,
            sample_pool_size=run.n_live,
            schedule=pool_schedule(run.n_live, run.num_delete, nd),
            key=key, num_runs=50,
        )

    comb = combine_runs(
        classic(run1, jax.random.PRNGKey(7)),
        classic(run2, jax.random.PRNGKey(8)),
        key=jax.random.PRNGKey(9),
    )
    diff = abs(float(comb.log_evidence.mean) - float(res_m.log_evidence.mean))
    assert diff < 3 * se + 0.05, diff


def test_stop_at_log_likelihood_bounds_thresholds(conjugate_runs):
    """A batch segment's deletion thresholds never exceed the stop level
    (the final live tail legitimately does)."""
    problem, _, _, run1, _ = conjugate_runs
    seg = segment_from_run(run1)
    stop = float(np.quantile(seg.log_likelihoods, 0.5))
    pts = generate_starting_points(problem, jax.random.PRNGKey(10), 32)
    run = nested_sampling_loop(
        problem, pts, jax.random.PRNGKey(11), monte_carlo_steps=60,
        min_iterations=1, stop_at_log_likelihood=stop,
        max_iterations=2000,
    )
    nd = int(run.state.n_dead)
    dead = np.asarray(run.state.dead_logl[:nd])
    # thresholds stop within one deletion past the level
    assert nd < 2000
    assert dead[:-1].max() <= stop or dead.max() <= stop
    assert np.asarray(run.state.live_logl).min() > stop


def test_dynamic_oracle_and_ess(conjugate_runs):
    problem, log_z, (pm, ps), run1, _ = conjugate_runs
    dyn = dynamic_nested_sampling(
        problem, jax.random.PRNGKey(12), sample_pool_size=64,
        num_batches=2, monte_carlo_steps=60,
    )
    se = float(dyn.log_evidence.standard_error)
    assert abs(float(dyn.log_evidence.mean) - log_z) < 3 * se + 0.05
    # posterior moments against the conjugate closed form
    w = np.exp(np.asarray(dyn.crude_log_posterior_weights))
    x = np.asarray(dyn.points)[:, 0]
    mean = float(w @ x)
    sd = float(np.sqrt(w @ (x - mean) ** 2))
    np.testing.assert_allclose(mean, pm, atol=0.05)
    np.testing.assert_allclose(sd, ps, rtol=0.2)
    # the algorithm's reason to exist: posterior ESS per sample rises
    # because batches concentrate in the posterior bulk
    from bayesianinference_tpu.engines.evidence import evidence_sampling

    points, ll, lp, _, nd = run1.finalize()
    static = evidence_sampling(
        points=points, log_likelihoods=ll, log_priors=lp,
        sample_pool_size=run1.n_live,
        schedule=pool_schedule(run1.n_live, run1.num_delete, nd),
        key=jax.random.PRNGKey(13), num_runs=50,
    )
    w_s = np.exp(np.asarray(static.crude_log_posterior_weights))
    ess_dyn = 1.0 / np.sum(w**2)
    ess_stat = 1.0 / np.sum(w_s**2)
    assert ess_dyn > 1.5 * ess_stat, (ess_dyn, ess_stat)
    assert dyn.num_likelihood_evals > 0
    assert dyn.iterations > 0


def test_dynamic_validation():
    problem, *_ = _conjugate_problem()
    with pytest.raises(ValueError):
        dynamic_nested_sampling(
            problem, jax.random.PRNGKey(0), posterior_fraction=1.5
        )
    with pytest.raises(ValueError):
        dynamic_nested_sampling(
            problem, jax.random.PRNGKey(0), importance_fraction=1.0
        )
    with pytest.raises(ValueError):
        merge_segments([])


def test_target_posterior_ess_stops_early(conjugate_runs):
    """With a trivially-met ESS target, no batches are added — the
    result equals a pure base run's merged form (same sample count)."""
    problem, *_ = conjugate_runs
    dyn = dynamic_nested_sampling(
        problem, jax.random.PRNGKey(20), sample_pool_size=64,
        num_batches=5, target_posterior_ess=1.0, monte_carlo_steps=60,
    )
    base = nested_sampling_loop(
        problem,
        generate_starting_points(problem, jax.random.PRNGKey(21), 64),
        jax.random.PRNGKey(22),
        monte_carlo_steps=60,
    )
    # one base-run's worth of samples, not five batches' worth
    assert dyn.total_samples < int(base.state.n_dead) + 64 + 200


def test_merge_matches_explicit_birth_death_simulation():
    """Ground truth for the event accounting: simulate a toy NS process
    tracking every point's (birth, death) interval EXPLICITLY, then
    check the segment-summary reconstruction (which never sees births)
    produces the identical alive-count at every death."""
    rng = np.random.default_rng(9)
    n, k, iters = 20, 3, 15
    live = np.sort(rng.uniform(0.0, 1.0, n))
    birth = np.full(n, -np.inf)
    dead_levels, dead_births = [], []
    for _ in range(iters):
        thr = live[k - 1]
        dead_levels.extend(live[:k])
        dead_births.extend(birth[:k])
        new = thr + rng.uniform(0.01, 1.0, k)
        live = np.concatenate([new, live[k:]])
        birth = np.concatenate([np.full(k, thr), birth[k:]])
        order = np.argsort(live, kind="stable")
        live, birth = live[order], birth[order]
    order = np.argsort(live, kind="stable")
    levels = np.concatenate([dead_levels, live[order]])
    births = np.concatenate([dead_births, birth[order]])

    # ground truth: j is alive at death i iff its birth activates at or
    # before position i and it dies at or after position i
    pos = np.argsort(levels, kind="stable")
    L, B = levels[pos], births[pos]
    nn = len(L)
    birth_pos = np.searchsorted(L, B, side="right")
    m_true = np.array(
        [np.sum((birth_pos <= i) & (np.arange(nn) >= i)) for i in range(nn)]
    )

    seg = NSSegment(
        points=levels[:, None].copy(),
        log_likelihoods=levels,
        log_priors=np.zeros_like(levels),
        n_live=n,
        num_delete=k,
        n_dead=len(dead_levels),
        constraint_logl=-np.inf,
    )
    _, _, _, m = merge_segments([seg])
    np.testing.assert_array_equal(m, m_true)
