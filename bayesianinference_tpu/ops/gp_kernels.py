"""Gaussian-process covariance kernels and log-marginal-likelihood ops.

TPU-native re-design of the reference's GP numerics
(BayesianGaussianProcess.wl): ``covarianceMatrix`` (GP:27-43) becomes a
matmul-based pairwise assembly that XLA tiles onto the MXU (with an optional
fused Pallas kernel for the squared-exponential hot path),
``matrixInverseAndDet`` (GP:130-159) becomes Cholesky + triangular solves,
and ``gaussianProcessLogLikelihood`` (GP:161-199) is a fused clipped logML
with well-defined gradients for hyperparameter inference.

Conventions: inputs are [n, d]; kernels are covariance *functions* built
from hyperparameters, exposing ``matrix(x1, x2)`` and ``diag(x)``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.scipy.linalg import cho_solve, solve_triangular

from ..core.numerics import LOG2PI, log_zero
from ..core.precise import exp_neg_precise, log_precise

__all__ = [
    "Kernel",
    "se_kernel",
    "matern12_kernel",
    "matern32_kernel",
    "matern52_kernel",
    "rational_quadratic_kernel",
    "periodic_kernel",
    "linear_kernel",
    "constant_kernel",
    "white_kernel",
    "squared_distances",
    "covariance_matrix",
    "gp_log_marginal_likelihood",
    "gp_posterior_moments",
    "se_covariance_pallas",
    "cholesky_pallas",
]



def _f(x):
    return jnp.asarray(x, jnp.result_type(jnp.asarray(x).dtype, float))


# Largest [n1, n2, d] difference temp (elements) for which
# squared_distances takes the accurate direct-difference form; above it,
# the MXU matmul identity.  Module-level so tests can exercise both
# branches at small shapes.
_DIRECT_SQDIST_MAX_ELEMS = 1 << 24


def squared_distances(x1, x2):
    """Pairwise squared Euclidean distances via the matmul identity
    |a-b|^2 = |a|^2 + |b|^2 - 2 a.b  — one MXU matmul instead of an
    O(n^2 d) gather loop (the reference assembles entry-by-entry via
    SymmetrizedArray, GP:31-43).

    The Gram matmul runs at ``Precision.HIGHEST``: TPU's default bf16
    matmul loses ~1e-2 relative on the cross terms, enough to push the
    assembled covariance NON-positive-definite past small nuggets
    (measured: min eig -8e-4 at n=256, nugget 0.05 -> Cholesky NaN ->
    sentinel logML).  The sqdist matmul is O(n^2 d) against the
    factorization's O(n^3), so full precision here is free.

    Small problems take the direct-difference form sum((a-b)^2) instead:
    the matmul identity cancels catastrophically when |a.b| >> |a-b|^2,
    inflating f32 entry error ~22x over exact rounding (1.3e-6 vs 6e-8
    max abs at the PRECISION gp config) and roughly DOUBLING the final
    f32 logML error (2.5e-6 -> 1.4e-6 measured,
    scratch/probe_gp_f32_floor.py).  The [n1, n2, d] difference temp
    makes it O(n^2 d) memory, so it is gated to shapes whose temp fits
    comfortably in HBM slack (<= 2^24 elements, 64 MB f32 — n=2048 at
    d=4); above that the matmul form's error is dominated by the f32
    factorization anyway (PERFORMANCE.md "f32 GP logML floor")."""
    x1, x2 = _f(x1), _f(x2)
    n1_, d = x1.shape[-2], x1.shape[-1]
    n2_ = x2.shape[-2]
    if n1_ * n2_ * d <= _DIRECT_SQDIST_MAX_ELEMS:
        diff = x1[..., :, None, :] - x2[..., None, :, :]
        return jnp.sum(diff * diff, axis=-1)
    n1 = jnp.sum(x1 * x1, axis=-1)
    n2 = jnp.sum(x2 * x2, axis=-1)
    g = jnp.matmul(x1, x2.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(n1[:, None] + n2[None, :] - 2.0 * g, 0.0)


@dataclasses.dataclass(frozen=True)
class Kernel:
    """A covariance function: ``matrix(x1, x2) -> [n1, n2]`` and
    ``diag(x) -> [n]``.  Compose with ``+`` and ``*``.

    ``exactly_symmetric`` declares that ``matrix(x, x)`` is symmetric to
    the last bit by construction (true for all built-in kernels: their
    Gram/distance forms are).  Only then do the hot logML paths skip the
    defensive 0.5 (K + K^T) pass; user-built kernels default to False and
    keep the reference's symmetrization guard (GP:27-43)."""

    matrix: Callable
    diag: Callable
    exactly_symmetric: bool = False

    def __add__(self, other: "Kernel") -> "Kernel":
        return Kernel(
            matrix=lambda a, b: self.matrix(a, b) + other.matrix(a, b),
            diag=lambda a: self.diag(a) + other.diag(a),
            exactly_symmetric=self.exactly_symmetric
            and other.exactly_symmetric,
        )

    def __mul__(self, other: "Kernel") -> "Kernel":
        return Kernel(
            matrix=lambda a, b: self.matrix(a, b) * other.matrix(a, b),
            diag=lambda a: self.diag(a) * other.diag(a),
            exactly_symmetric=self.exactly_symmetric
            and other.exactly_symmetric,
        )


def _stationary(f_of_sqdist: Callable, variance, lengthscale=1.0) -> Kernel:
    """Stationary kernel v * f(|x - x'|^2) in lengthscale-rescaled input
    space.  ``lengthscale`` may be a scalar (isotropic) or a [d] vector
    (ARD, one lengthscale per input dimension); inputs are divided by it
    BEFORE the sqdist matmul, so the anisotropic metric costs one O(n d)
    elementwise pass, not a new O(n^2 d) kernel."""
    variance = _f(variance)
    inv = 1.0 / _f(lengthscale)
    return Kernel(
        matrix=lambda a, b: variance
        * f_of_sqdist(squared_distances(_f(a) * inv, _f(b) * inv)),
        diag=lambda a: variance * jnp.ones(jnp.shape(a)[0], _f(a).dtype),
        exactly_symmetric=True,
    )


def se_kernel(variance=1.0, lengthscale=1.0) -> Kernel:
    """Squared-exponential (RBF): v * exp(-r^2 / (2 l^2)) — the headline
    BASELINE kernel.  ``lengthscale`` scalar or [d] (ARD)."""

    def f(sq):
        return exp_neg_precise(-0.5 * sq)

    return _stationary(f, variance, lengthscale)


def matern12_kernel(variance=1.0, lengthscale=1.0) -> Kernel:
    """Matern-1/2 (Ornstein-Uhlenbeck): v * exp(-r / l).  ``lengthscale``
    scalar or [d] (ARD)."""

    def f(sq):
        return exp_neg_precise(-jnp.sqrt(sq + 1e-36))

    return _stationary(f, variance, lengthscale)


def matern32_kernel(variance=1.0, lengthscale=1.0) -> Kernel:
    """Matern-3/2: v * (1 + sqrt(3) r / l) exp(-sqrt(3) r / l).
    ``lengthscale`` scalar or [d] (ARD)."""

    def f(sq):
        r = jnp.sqrt(3.0 * sq + 1e-36)
        return (1.0 + r) * exp_neg_precise(-r)

    return _stationary(f, variance, lengthscale)


def matern52_kernel(variance=1.0, lengthscale=1.0) -> Kernel:
    """Matern-5/2: v * (1 + u + u^2/3) exp(-u), u = sqrt(5) r / l.
    ``lengthscale`` scalar or [d] (ARD)."""

    def f(sq):
        r = jnp.sqrt(5.0 * sq + 1e-36)
        return (1.0 + r + r * r / 3.0) * exp_neg_precise(-r)

    return _stationary(f, variance, lengthscale)


def rational_quadratic_kernel(variance=1.0, lengthscale=1.0, alpha=1.0) -> Kernel:
    """Rational quadratic: v * (1 + r^2 / (2 a l^2))^-a — a scale mixture
    of SE kernels over lengthscales.  ``lengthscale`` scalar or [d] (ARD)."""
    a = _f(alpha)

    def f(sq):
        # x^-a = exp(-a log x) with precise transcendentals (native pow
        # inherits TPU's ~300-ulp log, squarely in the kernel entries)
        return exp_neg_precise(-a * log_precise(1.0 + sq / (2.0 * a)))

    return _stationary(f, variance, lengthscale)


def periodic_kernel(variance=1.0, lengthscale=1.0, period=1.0) -> Kernel:
    """1-D periodic (exp-sine-squared) kernel."""
    v, l, p = _f(variance), _f(lengthscale), _f(period)

    def matrix(a, b):
        a, b = _f(a), _f(b)
        r = jnp.abs(a[:, None, :] - b[None, :, :]).sum(-1)
        return v * exp_neg_precise(-2.0 * jnp.sin(jnp.pi * r / p) ** 2 / l**2)

    return Kernel(
        matrix=matrix,
        diag=lambda a: v * jnp.ones(jnp.shape(a)[0], _f(a).dtype),
        exactly_symmetric=True,
    )


def linear_kernel(variance=1.0, offset=0.0) -> Kernel:
    """Dot-product kernel v * (x - c).(x' - c) (non-stationary).

    ``variance`` may be a [d] vector (ARD): per-dimension prior weight
    variances, K = (x - c) diag(v) (x' - c)^T — folded into the left
    factor so the Gram stays one matmul."""
    v, c = _f(variance), _f(offset)
    sqv = jnp.sqrt(v)
    return Kernel(
        # HIGHEST precision for the same PD-safety reason as
        # squared_distances (bf16 Gram error vs small nuggets)
        matrix=lambda a, b: jnp.matmul(
            (_f(a) - c) * sqv,
            ((_f(b) - c) * sqv).T,
            precision=jax.lax.Precision.HIGHEST,
        ),
        diag=lambda a: jnp.sum(v * (_f(a) - c) ** 2, axis=-1),
        exactly_symmetric=True,
    )


def constant_kernel(variance=1.0) -> Kernel:
    """Constant covariance v (a shared random level across all inputs)."""
    v = _f(variance)
    return Kernel(
        matrix=lambda a, b: v * jnp.ones((jnp.shape(a)[0], jnp.shape(b)[0])),
        diag=lambda a: v * jnp.ones(jnp.shape(a)[0]),
        exactly_symmetric=True,
    )


def white_kernel(variance=1.0) -> Kernel:
    """Nugget as a kernel: contributes only to the diagonal/self-pairs."""
    v = _f(variance)
    return Kernel(
        matrix=lambda a, b: jnp.zeros((jnp.shape(a)[0], jnp.shape(b)[0])),
        diag=lambda a: v * jnp.ones(jnp.shape(a)[0]),
        exactly_symmetric=True,
    )


def covariance_matrix(
    kernel: Kernel, x, nugget=None, symmetrize: bool = True
) -> jnp.ndarray:
    """K = k(x_i, x_j) + diag(nugget(x_i)) (``covarianceMatrix``, GP:27-43).
    ``nugget``: scalar, [n] vector, or callable x -> [n].

    ``symmetrize=False`` skips the explicit 0.5 (K + K^T) pass — an extra
    full read+write of K (11 ms of HBM traffic at n=16k).  Safe whenever
    the consumer only reads one triangle (Cholesky-based logML/solves) or
    the kernel is exactly symmetric by construction (all built-in kernels:
    their Gram/distance forms give max |K - K^T| = 0 in f32)."""
    x = _f(x)
    k = kernel.matrix(x, x)
    if symmetrize:
        k = 0.5 * (k + k.T)
    if nugget is None:
        return k
    if callable(nugget):
        nug = nugget(x)
    else:
        nug = jnp.broadcast_to(_f(nugget), (x.shape[0],))
    return k + jnp.diag(nug)


def _gp_logml_forward(k_matrix, y):
    n = y.shape[-1]
    L = jnp.linalg.cholesky(k_matrix)
    ok = jnp.all(jnp.isfinite(jnp.diagonal(L)))
    L_safe = jnp.where(ok, L, jnp.eye(n, dtype=L.dtype))
    w = solve_triangular(L_safe, y, lower=True)
    logdet = 2.0 * jnp.sum(log_precise(jnp.diagonal(L_safe)))
    out = -0.5 * (n * LOG2PI + logdet + jnp.sum(w * w))
    lz = log_zero(out.dtype)
    out = jnp.clip(out, lz, -lz)
    return jnp.where(ok, out, lz), (L_safe, w, ok)


@jax.custom_vjp
def _gp_logml_core(k_matrix, y):
    return _gp_logml_forward(k_matrix, y)[0]


def _gp_logml_fwd(k_matrix, y):
    out, (L, w, ok) = _gp_logml_forward(k_matrix, y)
    return out, (L, w, ok)


def _tri_inv_lower(L, base: int = 256):
    """Z = L^-1 for lower-triangular L by blocked divide and conquer:

        [[A, 0], [B, C]]^-1 = [[A^-1, 0], [-C^-1 B A^-1, C^-1]]

    Triangular solves appear only at the ``base``-sized diagonal blocks —
    ALL of which invert in one batched (vmapped) solve — and the combine
    step runs level-by-level as batched matmuls, which is what the MXU
    wants: XLA's own triangular solve runs its substitution serially and
    leaves the MXU idle (the 8x forward/backward gap of PERFORMANCE.md
    round 1 lived here).  Static shapes; log2(n/base) levels."""
    n = L.shape[-1]
    nb = n // base if n % base == 0 else 0
    if L.ndim != 2 or nb <= 1 or (nb & (nb - 1)) != 0:
        # general fallback (odd sizes, leading batch dims): plain recursion
        if n <= base:
            return solve_triangular(L, jnp.eye(n, dtype=L.dtype), lower=True)
        m = n // 2
        ai = _tri_inv_lower(L[..., :m, :m], base)
        ci = _tri_inv_lower(L[..., m:, m:], base)
        x = -ci @ (L[..., m:, :m] @ ai)
        top = jnp.concatenate(
            [ai, jnp.zeros(ai.shape[:-1] + (n - m,), L.dtype)], axis=-1
        )
        bot = jnp.concatenate([x, ci], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    # [k, k, m, m] block view of L at the current level's block size m
    blocks = L.reshape(nb, base, nb, base).transpose(0, 2, 1, 3)
    diag = blocks[jnp.arange(nb), jnp.arange(nb)]  # [nb, base, base]
    invs = jax.vmap(
        lambda t: solve_triangular(t, jnp.eye(base, dtype=L.dtype), lower=True)
    )(diag)

    m, k = base, nb
    while k > 1:
        pairs = invs.reshape(k // 2, 2, m, m)
        ai, ci = pairs[:, 0], pairs[:, 1]
        bv = L.reshape(k // 2, 2 * m, k // 2, 2 * m).transpose(0, 2, 1, 3)
        b = bv[jnp.arange(k // 2), jnp.arange(k // 2), m:, :m]  # [k/2, m, m]
        x = -ci @ (b @ ai)
        new = jnp.zeros((k // 2, 2 * m, 2 * m), L.dtype)
        new = new.at[:, :m, :m].set(ai)
        new = new.at[:, m:, :m].set(x)
        new = new.at[:, m:, m:].set(ci)
        invs, m, k = new, 2 * m, k // 2
    return invs[0]


def _inv_from_chol(L):
    """K^-1 from L = chol(K):  K^-1 = L^-T L^-1 = Z^T Z with Z = L^-1
    computed by the blocked inverse above — one matmul-dominated pass
    instead of 2n chained triangular-solve columns."""
    z = _tri_inv_lower(L)
    k_inv = jnp.swapaxes(z, -1, -2) @ z
    return 0.5 * (k_inv + jnp.swapaxes(k_inv, -1, -2))


def _gp_logml_bwd(res, g):
    """Closed-form reverse rule (instead of differentiating through the
    Cholesky):  d logML/dK = (alpha alpha^T - K^-1)/2  with
    alpha = K^-1 y,  d logML/dy = -alpha."""
    L, w, ok = res
    alpha = solve_triangular(L, w, lower=True, trans=1)  # K^-1 y
    k_inv = _inv_from_chol(L)
    dk = 0.5 * (jnp.outer(alpha, alpha) - k_inv)
    dk = jnp.where(ok, dk, jnp.zeros_like(dk))
    dy = jnp.where(ok, -alpha, jnp.zeros_like(alpha))
    return (g * dk, g * dy)


_gp_logml_core.defvjp(_gp_logml_fwd, _gp_logml_bwd)


def gp_log_marginal_likelihood(
    k_matrix: jnp.ndarray, y, mean=None
) -> jnp.ndarray:
    """Clipped GP log marginal likelihood
    -(n log 2pi + log|K| + y^T K^-1 y)/2  via one Cholesky
    (``gaussianProcessLogLikelihood``, GP:161-199).  A failed factorization
    (non-PD / near-singular K) returns the finite log-zero sentinel, the
    analogue of the "MatInv" Throw (GP:130-148).

    The hyperparameter gradient uses the closed-form custom VJP
    d logML/dK = (alpha alpha^T - K^-1)/2 rather than differentiating the
    factorization."""
    y = _f(y)
    if mean is not None:
        y = y - mean
    return _gp_logml_core(k_matrix, y)


def gp_posterior_moments(
    kernel: Kernel,
    x_train,
    y_train,
    x_query,
    nugget=None,
    mean_fn: Optional[Callable] = None,
    query_nugget: bool = True,
):
    """Posterior predictive moments at query points
    (``predictFromGaussianProcessInternal``, GP:396-422):
      m* = m(x*) + k*^T K^-1 (y - m(X));   s*^2 = kappa - k*^T K^-1 k*
    where kappa includes the nugget when ``query_nugget`` (GP:110-115).
    Returns (mean [m], std [m])."""
    x_train, y_train, x_query = _f(x_train), _f(y_train), _f(x_query)
    k_train = covariance_matrix(
        kernel, x_train, nugget, symmetrize=not kernel.exactly_symmetric
    )
    k_cross = kernel.matrix(x_train, x_query)  # [n, m]
    kappa = kernel.diag(x_query)
    if query_nugget and nugget is not None:
        if callable(nugget):
            kappa = kappa + nugget(x_query)
        else:
            kappa = kappa + jnp.broadcast_to(_f(nugget), kappa.shape)
    mean_train = mean_fn(x_train) if mean_fn is not None else 0.0
    mean_query = mean_fn(x_query) if mean_fn is not None else 0.0
    L = jnp.linalg.cholesky(k_train)
    resid = y_train - mean_train
    alpha = cho_solve((L, True), resid)
    mean_star = mean_query + k_cross.T @ alpha
    v = solve_triangular(L, k_cross, lower=True)  # [n, m]
    var_star = kappa - jnp.sum(v * v, axis=0)
    return mean_star, jnp.sqrt(jnp.maximum(var_star, 0.0))


# ---------------------------------------------------------------------------
# Pallas fused SE covariance assembly (TPU hot path)
# ---------------------------------------------------------------------------


def _se_cov_kernel(scal_ref, x1_ref, x2_ref, out_ref):
    """One [bm, bn] tile of  var * exp(-|a-b|^2/(2 l^2)):
    the Gram tile runs on the MXU; norms, exp and scaling stay in VMEM
    (fused epilogue — the HBM-bandwidth win over materializing sqdist).
    ``scal_ref`` holds [inv2l2, var] in SMEM."""
    inv2l2 = scal_ref[0, 0]
    var = scal_ref[0, 1]
    x1 = x1_ref[...]
    x2 = x2_ref[...]
    g = jnp.dot(x1, x2.T, preferred_element_type=jnp.float32)
    n1sq = jnp.sum(x1 * x1, axis=1, keepdims=True)  # [bm, 1]
    n2sq = jnp.sum(x2 * x2, axis=1, keepdims=True)  # [bn, 1]
    sq = n1sq + n2sq.T - 2.0 * g
    sq = jnp.maximum(sq, 0.0)
    out_ref[...] = (var * jnp.exp(-sq * inv2l2)).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("block", "interpret"))
def se_covariance_pallas(
    x, variance, lengthscale, nugget=0.0, block: int = 256, interpret: bool = False
):
    """Fused squared-exponential covariance assembly K [n, n] as a Pallas
    TPU kernel (tiling: [block, block] output tiles; inputs padded to the
    block size).  ``interpret=True`` runs the kernel in the Pallas
    interpreter (for CPU correctness tests).

    Dispatches fine on the dev chip as of round 2 (matches the XLA
    assembly to 4e-6 and its wall time at n=4k); the XLA path stays the
    default since its fusion already saturates this op.
    """
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    n_pad = ((n + block - 1) // block) * block
    d_pad = ((d + 127) // 128) * 128
    xp = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(x)

    inv2l2 = jnp.float32(0.5) / jnp.asarray(lengthscale, jnp.float32) ** 2
    var = jnp.asarray(variance, jnp.float32)
    scal = jnp.stack([inv2l2, var]).reshape(1, 2)

    grid = (n_pad // block, n_pad // block)
    out = pl.pallas_call(
        _se_cov_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block, d_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((block, d_pad), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((block, block), lambda i, j: (i, j)),
        interpret=interpret,
    )(scal, xp, xp)
    k = out[:n, :n]
    return k + jnp.asarray(nugget, k.dtype) * jnp.eye(n, dtype=k.dtype)


# ---------------------------------------------------------------------------
# Pallas VMEM-resident blocked SPD Cholesky (the SURVEY §7.4 tiled kernel)
# ---------------------------------------------------------------------------


def _chol_pallas_kernel(a_ref, out_ref, *, n, block):
    """Right-looking blocked Cholesky, whole matrix resident in VMEM.

    Per panel p (width ``block``, a multiple of 128 so lane-dim dynamic
    slices stay aligned):
      1. masked one-hot column loop factorizes the [b, b] diagonal block
         and builds inv(L_jj) by forward substitution (VPU, b steps);
      2. the full [n, b] panel of L comes from ONE MXU matmul
         pan @ inv(L_jj)^T (band rows reproduce L_jj exactly);
      3. the trailing update runs as ONE full-width [n, b] x [b, n] MXU
         matmul with the second factor masked to rows >= c0 + b, so
         finished and in-flight columns are untouched (the same masking
         argument as the distributed factorization in
         parallel/sharded_chol.py).
    """
    dtype = out_ref.dtype
    b = block
    # Everything stays 2-D ([b,1] / [1,b]) with keepdims reductions and
    # broadcast outer products: Mosaic (this jax version) rejects 1-D
    # dot_general operands and 1-D reduction outputs.
    riota = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)  # [b, 1]
    ciota = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)  # [1, b]
    rows_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # [n, 1]
    zero = jnp.zeros((), dtype)

    out_ref[...] = a_ref[...]

    def panel(p, _):
        c0 = p * b
        dblk = out_ref[pl.ds(c0, b), pl.ds(c0, b)]  # [b, b]

        def col(j, carry):
            # d: partially factored diag block; w = inv(L_jj)^T built
            # column-by-column (transpose form avoids transposes: the
            # forward-substitution sum becomes a row-broadcast reduce)
            d, w = carry
            ej_col = (riota == j).astype(dtype)  # [b, 1]
            ej_row = (ciota == j).astype(dtype)  # [1, b]
            dj = jnp.sqrt(
                jnp.sum(d * ej_col * ej_row, keepdims=True)
            )  # [1, 1]
            colv = jnp.sum(d * ej_row, axis=1, keepdims=True)  # [b,1] col j
            rowv = jnp.sum(d * ej_col, axis=0, keepdims=True)  # [1,b] row j
            l_col = jnp.where(riota >= j, colv / dj, zero)
            l_col = jnp.where(riota == j, dj, l_col)
            strict_col = jnp.where(riota > j, l_col, zero)
            # the trailing (>= j) block is symmetric, so row j mirrors
            # column j there; entries < j are masked off anyway
            l_row = jnp.where(ciota >= j, rowv / dj, zero)
            l_row = jnp.where(ciota == j, dj, l_row)
            strict_row = jnp.where(ciota > j, l_row, zero)
            d = d - strict_col * strict_row
            d = jnp.where(ciota == j, l_col, d)
            # w[:, j] = (e_j - W L[j, :j]^T) / dj  with  L[j, :j] from the
            # already-written row j (rowv) plus the fresh diagonal dj
            row_lj = jnp.where(ciota < j, rowv, zero)
            s_col = jnp.sum(w * row_lj, axis=1, keepdims=True)  # [b, 1]
            w_j = (ej_col - s_col) / dj
            w = jnp.where(ciota == j, w_j, w)
            return d, w

        _, w_inv_t = jax.lax.fori_loop(
            0, b, col, (dblk, jnp.zeros((b, b), dtype))
        )

        pan = out_ref[:, pl.ds(c0, b)]  # [n, b] (band rows still unfactored)
        lpan = jnp.dot(
            pan,
            w_inv_t,
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,  # full f32: bf16 MXU
            # truncation loses ~1e-2 relative through the solve chain
        )
        keep = jnp.logical_and(
            rows_n - c0 >= ciota, rows_n >= c0
        )  # [n, b] lower-tri-within-band mask
        lpan = jnp.where(keep, lpan, zero)
        below = jnp.where(rows_n >= c0 + b, lpan, zero)
        out_ref[...] = out_ref[...] - jax.lax.dot_general(
            lpan,
            below,
            dimension_numbers=(((1,), (1,)), ((), ())),  # lpan @ below.T
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[:, pl.ds(c0, b)] = lpan
        return 0

    jax.lax.fori_loop(0, n // b, panel, 0)


@partial(jax.jit, static_argnames=("block", "interpret"))
def cholesky_pallas(k_matrix, block: int = 128, interpret: bool = False):
    """L = chol(K) as ONE fused Pallas TPU kernel (VMEM-resident; n up to
    ~1.4k in f32 given ~16 MB VMEM for the in+out pair).  The tiled SPD
    factorization of SURVEY §7.4.  Dispatches and matches the dense
    factor to ~4e-7 relative on the dev chip, but the sequential masked
    column loop keeps it 4-8x slower than XLA's Cholesky (402 vs 47 ms
    at n=512, PERFORMANCE.md) — production paths keep XLA's; this kernel
    is the in-VMEM factorization building block for fused pipelines.

    ``n`` must be a multiple of ``block`` (itself a multiple of 128, for
    aligned lane-dimension dynamic slices)."""
    k_matrix = jnp.asarray(k_matrix, jnp.float32)
    n = k_matrix.shape[-1]
    if n % block or block % 128:
        raise ValueError(
            f"n={n} must be a multiple of block={block}, and block a "
            "multiple of 128"
        )
    out = pl.pallas_call(
        partial(_chol_pallas_kernel, n=n, block=block),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(k_matrix)
    return out
