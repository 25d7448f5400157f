"""Automatic-differentiation variational inference (ADVI).

Beyond-reference engine: the reference approximates posteriors by
Laplace expansion at the mode (LA:161-435) or samples them exactly (NS,
MCMC); ADVI (Kucukelbir et al. 2017) fills the gap between the two — a
fitted Gaussian in the UNCONSTRAINED space of the shared box bijection
(:func:`..core.transforms.box_bijection`), optimized by stochastic
reparameterization gradients.  Unlike Laplace it fits global mass (not
curvature at the mode); unlike NS/MCMC it costs only an optimizer run
and yields the ELBO, a lower bound on log-evidence that complements the
NS estimate and the Laplace approximation.

TPU-first design:

* one jitted ``lax.scan`` over optimizer steps; each step evaluates the
  ELBO on a BATCH of reparameterized draws (vmapped density+gradient),
  so the hot path is the same batched-density kernel as everywhere else;
* the program takes the problem as a pytree argument (the serving
  convention) — refits on fresh same-shape data hit the compile cache;
* families: ``"meanfield"`` (diagonal) and ``"fullrank"`` (dense
  Cholesky) Gaussians; the entropy term is closed-form, so the ELBO is
  ``E_q[logpost(x(z)) + log|J(z)|] + H(q)`` with only the expectation
  estimated.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..core.containers import WeightedSamples
from ..core.numerics import is_log_zero, log_zero
from ..core.transforms import box_bijection
from ..models.problem import InferenceProblem

__all__ = ["VIResult", "advi_fit"]


def _meta(default=None):
    return dataclasses.field(default=default, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VIResult:
    """A fitted variational posterior (Gaussian in unconstrained space)."""

    loc: jnp.ndarray  # [d] variational mean (z-space)
    scale_tril: jnp.ndarray  # [d, d] Cholesky factor (z-space)
    elbo: jnp.ndarray  # final ELBO estimate (lower-bounds log evidence)
    elbo_history: jnp.ndarray  # [num_steps] per-step minibatch ELBO
    lower: jnp.ndarray  # [d] problem box (for the bijection)
    upper: jnp.ndarray  # [d]
    param_names: Tuple[str, ...] = _meta(())
    family: str = _meta("meanfield")

    @property
    def dim(self) -> int:
        return self.loc.shape[-1]

    def sample(self, key, num_samples: int) -> jnp.ndarray:
        """[num_samples, d] draws from the fitted posterior, constrained
        space."""
        bij = box_bijection(self.lower, self.upper)
        eps = jax.random.normal(
            key, (num_samples, self.dim), self.loc.dtype
        )
        z = self.loc + eps @ self.scale_tril.T
        return jax.vmap(bij.to_x)(z)

    def posterior_samples(self, key, num_samples: int = 4000) -> WeightedSamples:
        pts = self.sample(key, num_samples)
        return WeightedSamples(
            points=pts, log_weights=jnp.zeros((num_samples,), pts.dtype)
        )

    def log_prob(self, x) -> jnp.ndarray:
        """Fitted-posterior log density at constrained-space ``x``
        (Gaussian in z minus the bijection volume)."""
        bij = box_bijection(self.lower, self.upper)
        x = jnp.asarray(x)
        z = bij.to_z(x)
        diff = z - self.loc
        d = self.dim
        # batch axes ride as RHS columns of one triangular solve
        sol = jax.scipy.linalg.solve_triangular(
            self.scale_tril, diff.reshape(-1, d).T, lower=True
        )
        maha = jnp.sum(sol * sol, axis=0).reshape(diff.shape[:-1])
        logdet = jnp.sum(jnp.log(jnp.diagonal(self.scale_tril)))
        lp_z = -0.5 * maha - 0.5 * d * jnp.log(2.0 * jnp.pi) - logdet
        return lp_z - bij.log_jacobian(z)


@functools.partial(
    jax.jit,
    static_argnames=(
        "family",
        "num_steps",
        "num_elbo_samples",
        "learning_rate",
        "final_elbo_samples",
    ),
)
def _advi_program(
    problem: InferenceProblem,
    key,
    z0,
    family: str,
    num_steps: int,
    num_elbo_samples: int,
    learning_rate: float,
    final_elbo_samples: int,
):
    import optax

    bij = box_bijection(problem.lower, problem.upper)
    d = z0.shape[-1]
    dtype = z0.dtype
    lz = log_zero(dtype)

    def log_target(z):
        x = bij.to_x(z)
        lp = problem.log_posterior_density(x) + bij.log_jacobian(z)
        # sentinel regions (extra constraints) contribute the sentinel,
        # not NaN; gradients there are zeroed by the guard below
        return jnp.where(is_log_zero(lp), lz, lp)

    half_log_2pi_e = 0.5 * (1.0 + jnp.log(2.0 * jnp.pi))

    if family == "meanfield":
        params0 = {
            "loc": z0,
            "log_scale": jnp.full((d,), -1.0, dtype),
        }

        def draw(params, eps):
            return params["loc"] + jnp.exp(params["log_scale"]) * eps

        def entropy(params):
            return jnp.sum(params["log_scale"]) + d * half_log_2pi_e
    else:  # fullrank
        params0 = {
            "loc": z0,
            "log_diag": jnp.full((d,), -1.0, dtype),
            "off": jnp.zeros((d, d), dtype),  # strictly-lower part used
        }

        def _tril(params):
            off = jnp.tril(params["off"], k=-1)
            return off + jnp.diag(jnp.exp(params["log_diag"]))

        def draw(params, eps):
            return params["loc"] + _tril(params) @ eps

        def entropy(params):
            return jnp.sum(params["log_diag"]) + d * half_log_2pi_e

    def neg_elbo(params, eps_batch):
        zs = jax.vmap(lambda e: draw(params, e))(eps_batch)
        lps = jax.vmap(log_target)(zs)
        return -(jnp.mean(lps) + entropy(params))

    # cosine-decayed Adam: the MC gradient noise otherwise leaves the
    # final iterate wandering ~0.2 posterior-sd around the optimum
    opt = optax.adam(
        optax.cosine_decay_schedule(learning_rate, num_steps, alpha=0.01)
    )
    opt_state0 = opt.init(params0)

    def step(carry, k):
        params, opt_state = carry
        eps = jax.random.normal(k, (num_elbo_samples, d), dtype)
        loss, grads = jax.value_and_grad(neg_elbo)(params, eps)
        # sentinel/NaN hygiene: a draw far in the tail can touch guarded
        # regions whose gradients are zeroed; any residual non-finite
        # gradient skips the update rather than poisoning the state
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    (params, _), elbo_hist = jax.lax.scan(
        step, (params0, opt_state0), jax.random.split(key, num_steps)
    )

    # final low-variance ELBO estimate on a big fresh batch
    k_final = jax.random.fold_in(key, num_steps + 1)
    eps = jax.random.normal(k_final, (final_elbo_samples, d), dtype)
    elbo = -neg_elbo(params, eps)

    if family == "meanfield":
        scale_tril = jnp.diag(jnp.exp(params["log_scale"]))
    else:
        scale_tril = jnp.tril(params["off"], k=-1) + jnp.diag(
            jnp.exp(params["log_diag"])
        )
    return params["loc"], scale_tril, elbo, elbo_hist


def advi_fit(
    problem: InferenceProblem,
    key,
    *,
    family: str = "meanfield",
    num_steps: int = 3000,
    num_elbo_samples: int = 32,
    learning_rate: float = 0.02,
    final_elbo_samples: int = 4096,
    initial_point=None,
) -> VIResult:
    """Fit a Gaussian variational posterior by ADVI.

    ``family``: ``"meanfield"`` (diagonal covariance; fast, understates
    correlations) or ``"fullrank"`` (dense Cholesky; exact for Gaussian
    posteriors).  The returned ``elbo`` lower-bounds the log evidence —
    compare with ``nested_sampling``/``smc_sampler`` logZ: a small gap
    certifies the variational family fits well.

    ``initial_point`` (constrained space) seeds the variational mean;
    default is the box-bijection image of zero (the box center)."""
    if family not in ("meanfield", "fullrank"):
        raise ValueError(f"unknown family {family!r}")
    key = jax.random.PRNGKey(0) if key is None else key
    dtype = jnp.result_type(problem.lower.dtype, float)
    if initial_point is not None:
        bij = box_bijection(problem.lower, problem.upper)
        z0 = bij.to_z(jnp.asarray(initial_point, dtype))
    else:
        z0 = jnp.zeros((problem.dim,), dtype)
    loc, scale_tril, elbo, hist = _advi_program(
        problem,
        key,
        z0,
        family,
        num_steps,
        num_elbo_samples,
        float(learning_rate),
        final_elbo_samples,
    )
    return VIResult(
        loc=loc,
        scale_tril=scale_tril,
        elbo=elbo,
        elbo_history=hist,
        lower=problem.lower,
        upper=problem.upper,
        param_names=problem.param_names,
        family=family,
    )
