"""Mesh-parallel SMC and HMC on the virtual 8-device CPU mesh.

parallel_smc must reproduce the single-device vmapped ladders EXACTLY
(identical per-run keys and math); parallel_hmc adapts one global
(step size, mass) through collectives and must agree statistically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesianinference_tpu import dists as d
from bayesianinference_tpu.engines import hmc_sample, smc_sampler
from bayesianinference_tpu.models import define_inference_problem
from bayesianinference_tpu.parallel import make_mesh, parallel_hmc, parallel_smc


def _problem():
    return define_inference_problem(
        parameters=[("x", -5.0, 5.0), ("y", -5.0, 5.0)],
        log_likelihood=lambda th: jnp.sum(d.Normal(0.0, 1.0).log_prob(th)),
        prior_distribution=["location", "location"],
        validate=False,
    )


def test_parallel_smc_matches_single_device(key):
    problem = _problem()
    mesh = make_mesh(("runs",))
    assert mesh.shape["runs"] == 8
    r_mesh = parallel_smc(
        problem, key, num_runs=8, n_particles=200, mcmc_steps=8, mesh=mesh
    )
    r_single = smc_sampler(
        problem, key, num_runs=8, n_particles=200, mcmc_steps=8
    )
    # same keys, same math -> identical ladders
    np.testing.assert_allclose(
        np.asarray(r_mesh.log_z_runs), np.asarray(r_single.log_z_runs),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(r_mesh.particles), np.asarray(r_single.particles),
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_array_equal(
        np.asarray(r_mesh.n_stages), np.asarray(r_single.n_stages)
    )


def test_parallel_smc_vmapped_runs_per_device(key):
    # 16 runs on the 8-device mesh: 2 vmapped ladders per device
    problem = _problem()
    r = parallel_smc(
        problem, key, num_runs=16, n_particles=100, mcmc_steps=8
    )
    assert r.log_z_runs.shape == (16,)
    assert np.isfinite(float(r.log_evidence.standard_error))
    assert abs(float(r.log_evidence.mean) + 4.6052) < 0.3


def test_parallel_smc_bad_run_count(key):
    mesh = make_mesh(("runs",))
    with pytest.raises(ValueError, match="multiple"):
        parallel_smc(_problem(), key, num_runs=3, mesh=mesh)


def test_parallel_smc_default_mesh_divisor(key):
    # 12 runs on 8 devices: the default mesh picks the largest divisor (6)
    # instead of failing the even-split check
    r = parallel_smc(
        _problem(), key, num_runs=12, n_particles=64, mcmc_steps=4
    )
    assert r.log_z_runs.shape == (12,)
    assert np.all(np.isfinite(np.asarray(r.log_z_runs)))


def test_parallel_hmc_smoke(key):
    # fast mesh smoke: shapes, finiteness, and the global (replicated)
    # step size; the statistical-agreement test below is marked slow
    r = parallel_hmc(
        _problem(),
        key,
        num_chains=8,
        num_samples=40,
        num_warmup=60,
        num_leapfrog=5,
        mesh=make_mesh(("chains",)),
    )
    assert r.samples.shape == (8, 40, 2)
    assert r.step_size.shape == ()
    assert np.all(np.isfinite(np.asarray(r.samples)))
    assert float(r.step_size) > 0


@pytest.mark.slow
def test_parallel_hmc_global_adaptation(key):
    problem = _problem()
    mesh = make_mesh(("chains",))
    r = parallel_hmc(
        problem,
        key,
        num_chains=8,
        num_samples=600,
        num_warmup=400,
        num_leapfrog=10,
        mesh=mesh,
    )
    assert r.samples.shape == (8, 600, 2)
    # global step size: one scalar, all shards froze the same value
    assert r.step_size.shape == ()
    pooled = np.asarray(r.samples).reshape(-1, 2)
    np.testing.assert_allclose(pooled.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(pooled.std(axis=0), 1.0, atol=0.1)
    acc = np.asarray(r.acceptance_rates)
    assert np.all(acc > 0.5), acc
    assert int(np.asarray(r.divergences).sum()) == 0
    # agrees statistically with the single-device engine
    r1 = hmc_sample(
        problem, key, num_chains=8, num_samples=600, num_warmup=400,
        num_leapfrog=10,
    )
    p1 = np.asarray(r1.samples).reshape(-1, 2)
    np.testing.assert_allclose(
        pooled.mean(axis=0), p1.mean(axis=0), atol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(r.inv_mass_diag), np.asarray(r1.inv_mass_diag),
        rtol=0.5,
    )


def test_parallel_hmc_dense_mass(key):
    # dense inverse mass merges globally (psum of [d, d] moments) and
    # replicates across shards
    r = parallel_hmc(
        _problem(),
        key,
        num_chains=8,
        num_samples=30,
        num_warmup=60,
        num_leapfrog=5,
        mesh=make_mesh(("chains",)),
        dense_mass=True,
    )
    assert r.inv_mass_diag.shape == (2, 2)
    m = np.asarray(r.inv_mass_diag)
    np.testing.assert_allclose(m, m.T, rtol=1e-12)  # symmetric covariance
    assert np.all(np.isfinite(np.asarray(r.samples)))


def test_parallel_hmc_chees_auto(key):
    # num_leapfrog="auto": the ChEES gradient and chain means ride mesh
    # collectives, so all shards freeze ONE global trajectory length
    r = parallel_hmc(
        _problem(),
        key,
        num_chains=8,
        num_samples=60,
        num_warmup=120,
        num_leapfrog="auto",
        mesh=make_mesh(("chains",)),
    )
    assert r.samples.shape == (8, 60, 2)
    assert r.trajectory_length.shape == ()
    assert float(r.trajectory_length) > 0
    assert np.all(np.isfinite(np.asarray(r.samples)))
