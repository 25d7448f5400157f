"""Affine-invariant ensemble engine: move kernels + posterior oracles.

Beyond-reference engine (the reference's samplers are single-chain
adaptive Metropolis, BS:655-745); oracles follow the suite convention —
exact Gaussian moments, conjugate posterior agreement, and the
affine-invariance property the sampler is named for."""



import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines import ensemble_sample
from bayesianinference_tpu.models import define_inference_problem
from bayesianinference_tpu.ops.ensemble import ensemble_init, ensemble_sweep


def _gauss_logdens(prec, mu):
    def logdens(x):
        z = x - mu
        return -0.5 * z @ prec @ z

    return logdens


def test_sweep_invariants(key):
    # one sweep preserves shapes, counts a single proposal per walker,
    # and every walker's cached density matches its position
    logdens = _gauss_logdens(jnp.eye(2), jnp.zeros(2))
    batch = jax.vmap(logdens)
    x0 = jax.random.normal(key, (16, 2))
    st = ensemble_init(x0, batch)
    st2 = ensemble_sweep(jax.random.fold_in(key, 1), st, batch)
    assert st2.x.shape == (16, 2)
    assert int(st2.proposed[0]) == 1
    np.testing.assert_allclose(
        np.asarray(st2.log_density), np.asarray(batch(st2.x)), rtol=1e-12
    )
    # rejected walkers kept their position, accepted ones moved
    moved = np.any(np.asarray(st2.x != st.x), axis=1)
    np.testing.assert_array_equal(moved, np.asarray(st2.accepted) == 1)


def test_walker_count_validation(key):
    with pytest.raises(ValueError, match="even"):
        ensemble_sample(
            _gauss_logdens(jnp.eye(2), jnp.zeros(2)),
            key,
            num_walkers=7,
            starting_points=jnp.zeros((7, 2)),
        )
    problem = define_inference_problem(
        parameters=[("a", -5.0, 5.0), ("b", -5.0, 5.0)],
        likelihood=lambda th: d.Normal(th[0] + th[1], 1.0),
        data=jnp.asarray([0.0]),
        validate=False,
    )
    with pytest.raises(ValueError, match="2d"):
        ensemble_sample(problem, key, num_walkers=4)
    # the 2d+2 minimum also applies to raw-density targets (d is known
    # from starting_points)
    with pytest.raises(ValueError, match="2d"):
        ensemble_sample(
            _gauss_logdens(jnp.eye(4), jnp.zeros(4)),
            key,
            num_walkers=8,
            starting_points=jnp.zeros((8, 4)),
        )


def test_move_knob_validation_and_plumbing(key):
    # each move owns exactly one knob; passing the other move's knob is
    # an error, not a silent no-op
    logdens = _gauss_logdens(jnp.eye(2), jnp.zeros(2))
    pts = jax.random.normal(key, (16, 2))
    with pytest.raises(ValueError, match="gamma_jump_prob"):
        ensemble_sample(
            logdens, key, num_walkers=16, starting_points=pts,
            move="stretch", gamma_jump_prob=0.3,
        )
    with pytest.raises(ValueError, match="stretch_scale"):
        ensemble_sample(
            logdens, key, num_walkers=16, starting_points=pts,
            move="de", stretch_scale=3.0,
        )
    # gamma_jump_prob really reaches the DE kernel: identical key and
    # starts, different knob -> gamma differs on the jump draws, so the
    # trajectories must diverge (an ignored knob gives bit-identical runs)
    run = lambda p: ensemble_sample(
        logdens, jax.random.fold_in(key, 1), num_walkers=16,
        starting_points=pts, num_warmup=0, num_samples=20,
        move="de", gamma_jump_prob=p,
    ).samples
    assert not np.allclose(np.asarray(run(1.0)), np.asarray(run(0.0)))


@pytest.mark.parametrize("move", ["stretch", "de"])
def test_gaussian_moments(key, move):
    # 2-D correlated Gaussian, exact moments through a raw density
    rho = 0.9
    cov = np.asarray([[1.0, rho], [rho, 1.3]])
    mu = np.asarray([1.0, -2.0])
    logdens = _gauss_logdens(jnp.asarray(np.linalg.inv(cov)), jnp.asarray(mu))
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(64, 2)))
    r = ensemble_sample(
        logdens,
        key,
        num_walkers=64,
        num_samples=400,
        num_warmup=400,
        move=move,
        starting_points=x0,
    )
    acc = np.asarray(r.acceptance_rates)
    assert 0.05 < acc.mean() < 0.9, acc.mean()
    pooled = np.asarray(r.posterior_samples().points)
    np.testing.assert_allclose(pooled.mean(axis=0), mu, atol=0.12)
    np.testing.assert_allclose(
        np.cov(pooled.T), cov, atol=0.2 * np.max(np.abs(cov))
    )


def test_affine_invariance(key):
    # the SAME keys on an affinely mapped target yield the exact mapped
    # chain: x' = A x + b with proposals built from the ensemble itself
    A = jnp.asarray([[3.0, 0.0], [1.0, 0.2]])
    b = jnp.asarray([5.0, -7.0])
    prec = jnp.asarray(np.linalg.inv([[1.0, 0.5], [0.5, 1.0]]))
    base = _gauss_logdens(prec, jnp.zeros(2))
    Ainv = jnp.linalg.inv(A)

    def mapped(y):
        return base(Ainv @ (y - b))

    x0 = jax.random.normal(key, (16, 2), jnp.float64)
    kw = dict(num_walkers=16, num_samples=50, num_warmup=0)
    r0 = ensemble_sample(base, key, starting_points=x0, **kw)
    r1 = ensemble_sample(
        mapped, key, starting_points=x0 @ A.T + b, **kw
    )
    np.testing.assert_allclose(
        np.asarray(r1.samples),
        np.asarray(r0.samples) @ np.asarray(A).T + np.asarray(b),
        atol=1e-8,
    )
    np.testing.assert_array_equal(
        np.asarray(r0.acceptance_rates), np.asarray(r1.acceptance_rates)
    )


def test_problem_conjugate_posterior(key):
    # mu-only Normal model, Normal prior: exact conjugate posterior,
    # sampled through the box bijection from prior-draw walkers
    rng = np.random.default_rng(1)
    data = rng.normal(1.2, 1.0, 40)
    tau0, mu0 = 3.0, 0.0
    problem = define_inference_problem(
        parameters=[("mu", -10.0, 10.0)],
        likelihood=lambda th: d.Normal(th[0], 1.0),
        data=jnp.asarray(data),
        prior_distribution=[d.Normal(mu0, tau0)],
        validate=False,
    )
    post_prec = 1 / tau0**2 + len(data)
    post_mean = (mu0 / tau0**2 + data.sum()) / post_prec
    post_sd = post_prec**-0.5
    r = ensemble_sample(
        problem, key, num_walkers=32, num_samples=300, num_warmup=300
    )
    assert r.param_names == ("mu",)
    pooled = np.asarray(r.posterior_samples().points[:, 0])
    np.testing.assert_allclose(pooled.mean(), post_mean, atol=3 * post_sd / 10)
    np.testing.assert_allclose(pooled.std(), post_sd, rtol=0.2)
    # every walker is a valid chain for the convergence diagnostics
    assert r.per_parameter_chains(0).shape == (32, 300)


def test_serving_zero_retrace(key):
    # fresh same-shape data reuses the compiled program (pytree arg)
    def make(data):
        return define_inference_problem(
            parameters=[("mu", -10.0, 10.0)],
            likelihood=lambda th: d.Normal(th[0], 1.0),
            data=data,
            prior_distribution=[d.Normal(0.0, 3.0)],
            validate=False,
        )

    from bayesianinference_tpu.engines.ensemble import (
        _ensemble_problem_program,
    )

    p1 = make(jnp.asarray(np.random.default_rng(2).normal(0.5, 1.0, 20)))
    x0 = jnp.full((8, 1), 0.1)
    kw = dict(
        num_walkers=8, num_samples=20, num_warmup=10, starting_points=x0
    )
    ensemble_sample(p1, key, **kw)
    compiled = _ensemble_problem_program._cache_size()
    p2 = p1.with_data(
        jnp.asarray(np.random.default_rng(3).normal(-0.5, 1.0, 20))
    )
    r2 = ensemble_sample(p2, key, **kw)
    assert _ensemble_problem_program._cache_size() == compiled
    assert np.isfinite(np.asarray(r2.samples)).all()


def test_parallel_ensemble_mesh_oracle(key):
    # walkers sharded over the virtual 8-device mesh: conjugate oracle +
    # per-walker acceptance bookkeeping survive the collectives
    from bayesianinference_tpu.parallel import make_mesh, parallel_ensemble

    rng = np.random.default_rng(5)
    data = rng.normal(-0.7, 1.0, 30)
    problem = define_inference_problem(
        parameters=[("mu", -10.0, 10.0)],
        likelihood=lambda th: d.Normal(th[0], 1.0),
        data=jnp.asarray(data),
        prior_distribution=[d.Normal(0.0, 2.0)],
        validate=False,
    )
    post_prec = 1 / 4.0 + len(data)
    post_mean = data.sum() / post_prec
    mesh = make_mesh(("walkers",))
    assert mesh.shape["walkers"] == 8
    r = parallel_ensemble(
        problem,
        key,
        num_walkers=64,
        num_samples=250,
        num_warmup=250,
        mesh=mesh,
    )
    assert r.samples.shape == (64, 250, 1)
    acc = np.asarray(r.acceptance_rates)
    assert acc.shape == (64,) and 0.05 < acc.mean() < 0.95
    pooled = np.asarray(r.posterior_samples().points[:, 0])
    np.testing.assert_allclose(pooled.mean(), post_mean, atol=0.06)
    np.testing.assert_allclose(pooled.std(), post_prec**-0.5, rtol=0.25)
