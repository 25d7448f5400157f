"""Information criteria from weighted posterior samples.

WAIC (widely applicable information criterion, Watanabe 2010) estimated
from any weighted posterior sample — nested-sampling output included —
via importance-weighted pointwise quantities.  Complements the exact log
evidences the engines already produce (logZ compares models under their
priors; WAIC estimates out-of-sample predictive fit).  No counterpart in
the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.numerics import log_zero, logsumexp

__all__ = [
    "LOOResult",
    "WAICResult",
    "model_weights",
    "psis_loo",
    "waic",
]


@dataclasses.dataclass(frozen=True)
class WAICResult:
    """elpd = lppd - p_waic per data point; waic = -2 sum elpd."""

    waic: float
    elpd: float  # sum over data points
    p_waic: float  # effective number of parameters
    se: float  # standard error of waic (sqrt(n var) scaling)
    pointwise_elpd: jnp.ndarray  # [n]

    def __repr__(self):
        return (
            f"WAIC {self.waic:.2f} ± {self.se:.2f} "
            f"(elpd {self.elpd:.2f}, p_waic {self.p_waic:.2f})"
        )


def waic(result, pointwise_loglike: Callable) -> WAICResult:
    """WAIC from a weighted posterior sample.

    ``result``: a NestedSamplingResult or WeightedSamples (anything with
    ``points`` and normalized weights via ``posterior_samples()`` /
    ``normalized_weights()``).  ``pointwise_loglike(theta) -> [n]`` maps
    one parameter vector to the per-observation log-likelihood vector
    (NOT the sum); it is vmapped over the posterior samples.

    lppd_i  = log sum_s w_s p(y_i | theta_s)        (importance-weighted)
    p_i     = Var_w[log p(y_i | theta_s)]
    elpd_i  = lppd_i - p_i;   WAIC = -2 sum_i elpd_i
    """
    from ..engines.evidence import NestedSamplingResult

    if isinstance(result, NestedSamplingResult):
        result = result.posterior_samples()
    thetas = jnp.asarray(result.points)
    w = jnp.asarray(result.normalized_weights())

    ll = jax.vmap(pointwise_loglike)(thetas)  # [S, n]
    if ll.ndim != 2:
        raise ValueError(
            "pointwise_loglike(theta) must return the [n] per-observation "
            f"log-likelihood vector, got shape {ll.shape[1:]}"
        )
    # log weights with zero-weight samples mapped to the per-dtype
    # sentinel (a 1e-300 clamp underflows to 0 in f32 — CLAUDE.md rule)
    log_w = jnp.where(
        w > 0, jnp.log(jnp.where(w > 0, w, 1.0)), log_zero(w.dtype)
    )[:, None]
    lppd = logsumexp(log_w + ll, axis=0)  # [n]
    mu = jnp.sum(w[:, None] * ll, axis=0)
    p_w = jnp.sum(w[:, None] * (ll - mu) ** 2, axis=0)
    elpd_i = lppd - p_w
    n = elpd_i.shape[0]
    waic_val = -2.0 * jnp.sum(elpd_i)
    se = 2.0 * jnp.sqrt(n * jnp.var(elpd_i))
    return WAICResult(
        waic=float(waic_val),
        elpd=float(jnp.sum(elpd_i)),
        p_waic=float(jnp.sum(p_w)),
        se=float(se),
        pointwise_elpd=elpd_i,
    )


@dataclasses.dataclass(frozen=True)
class LOOResult:
    """PSIS-LOO: elpd_loo = sum_i log p(y_i | y_-i) estimated by
    Pareto-smoothed importance sampling."""

    elpd_loo: float
    p_loo: float  # effective parameters: lppd - elpd_loo
    se: float
    pointwise_elpd: "jnp.ndarray"  # [n]
    pareto_k: "jnp.ndarray"  # [n] tail-shape diagnostics (flag > 0.7)

    def __repr__(self):
        import numpy as np

        bad = int(np.sum(np.asarray(self.pareto_k) > 0.7))
        return (
            f"LOO elpd {self.elpd_loo:.2f} ± {self.se:.2f} "
            f"(p_loo {self.p_loo:.2f}; {bad} obs with pareto k > 0.7)"
        )


def _gpd_fit(x):
    """Generalized-Pareto (k, sigma) fit to sorted exceedances x > 0 by
    the Zhang & Stephens (2009) quasi-Bayes profile method (the PSIS
    paper's recommended estimator), with the small-sample shape
    regularization toward 0.5."""
    import numpy as np

    n = x.shape[0]
    m = 30 + int(np.sqrt(n))
    b = 1.0 - np.sqrt(m / (np.arange(1, m + 1) - 0.5))
    b = b / (3.0 * x[max(int(n / 4 + 0.5) - 1, 0)]) + 1.0 / x[-1]
    k = np.mean(np.log1p(-b[:, None] * x[None, :]), axis=1)  # = -khat per b
    log_lik = n * (np.log(-b / k) - k - 1.0)
    weights = 1.0 / np.sum(np.exp(log_lik - log_lik[:, None]), axis=1)
    b_post = np.sum(b * weights)
    k_post = np.mean(np.log1p(-b_post * x))
    sigma = -k_post / b_post
    k_post = k_post * n / (n + 10.0) + 0.25 * 10.0 / (n + 10.0) * 2.0
    return k_post, sigma


def _psis_smooth_tail(log_ratios):
    """Smooth the upper tail of one observation's log importance ratios
    in place (numpy); returns (smoothed log ratios, pareto k)."""
    import numpy as np

    lr = np.asarray(log_ratios, float).copy()
    s = lr.shape[0]
    tail_len = min(int(0.2 * s), max(int(3.0 * np.sqrt(s)), 5))
    if tail_len < 5:
        return lr, np.inf
    order = np.argsort(lr)
    tail_idx = order[-tail_len:]
    cutoff = lr[order[-tail_len - 1]]
    max_lr = lr[order[-1]]
    exceed = np.exp(lr[tail_idx] - cutoff) - 1.0
    exceed = np.sort(exceed) * np.exp(cutoff)
    if np.allclose(exceed, 0.0) or not np.all(np.isfinite(exceed)):
        return lr, np.inf
    k, sigma = _gpd_fit(exceed)
    if not np.isfinite(k):
        return lr, np.inf
    # replace tail by expected GPD order statistics (inverse CDF at
    # plotting positions), capped at the raw maximum
    p = (np.arange(tail_len) + 0.5) / tail_len
    if abs(k) < 1e-12:
        q = -sigma * np.log1p(-p)
    else:
        q = sigma * np.expm1(-k * np.log1p(-p)) / k
    # back to log-ratio scale: the exceedances q sit ABOVE exp(cutoff)
    # dtype-aware clamp: 1e-300 underflows to 0 for f32 inputs
    smoothed = np.log(np.maximum(q + np.exp(cutoff), np.finfo(lr.dtype).tiny))
    smoothed = np.minimum(np.sort(smoothed), max_lr)
    lr[tail_idx[np.argsort(lr[tail_idx])]] = smoothed
    return lr, k


def psis_loo(result, pointwise_loglike: Callable) -> LOOResult:
    """Pareto-smoothed importance-sampling leave-one-out cross-validation
    (Vehtari, Gelman & Gabry 2017) from a weighted posterior sample.

    Importance ratios for observation i are w_s / p(y_i | theta_s); each
    observation's ratio tail is smoothed by a generalized-Pareto fit and
    the tail shape khat is reported per observation (khat > 0.7 flags an
    unreliable estimate).  ``pointwise_loglike`` as in :func:`waic`.

    .. note:: Observations flagged ``khat = inf`` (some posterior draw
       assigned them sentinel-zero likelihood) STILL contribute an
       ``elpd_i`` — estimated from the surviving draws — to the headline
       ``elpd_loo`` and ``se``.  A warning is emitted; check
       ``pareto_k`` before trusting the totals, and refit those
       observations exactly (or drop them) if any k is non-finite or
       above 0.7.
    """
    import numpy as np

    from ..engines.evidence import NestedSamplingResult

    if isinstance(result, NestedSamplingResult):
        result = result.posterior_samples()
    thetas = jnp.asarray(result.points)
    w = np.asarray(result.normalized_weights(), float)

    ll = np.asarray(jax.vmap(pointwise_loglike)(thetas), float)  # [S, n]
    if ll.ndim != 2:
        raise ValueError(
            "pointwise_loglike(theta) must return the [n] per-observation "
            f"log-likelihood vector, got shape {ll.shape[1:]}"
        )
    s, n = ll.shape
    log_w = np.where(w > 0, np.log(np.where(w > 0, w, 1.0)), -np.inf)

    # a log-zero-sentinel likelihood (theta that assigns ~zero density to
    # y_i) makes the raw ratio w/p astronomically large: the LOO estimate
    # for that observation is genuinely divergent, so flag it (khat=inf)
    # and exclude those draws from the smoothing/estimate below
    from ..core.numerics import is_log_zero

    dead = np.asarray(is_log_zero(jnp.asarray(ll)))

    elpd_i = np.empty(n)
    khat = np.empty(n)
    for i in range(n):
        lr = log_w - ll[:, i]  # log raw importance ratios
        finite = np.isfinite(lr) & ~dead[:, i]
        lr = np.where(finite, lr, -np.inf)
        lr_s, k = _psis_smooth_tail(lr)
        khat[i] = np.inf if dead[:, i].any() else k
        # elpd_i = log( sum_s wtilde_s p(y_i|theta_s) / sum_s wtilde_s )
        a = lr_s + ll[:, i]
        amax, lmax = a.max(), lr_s.max()
        elpd_i[i] = (
            amax
            + np.log(np.sum(np.exp(a - amax)))
            - (lmax + np.log(np.sum(np.exp(lr_s - lmax))))
        )
    lppd_i = np.asarray(
        [  # in-sample lppd for p_loo
            _np_logsumexp(log_w + ll[:, i]) for i in range(n)
        ]
    )
    elpd = float(np.sum(elpd_i))
    n_bad = int(np.sum(~np.isfinite(khat) | (khat > 0.7)))
    if n_bad:
        import warnings

        warnings.warn(
            f"psis_loo: {n_bad}/{n} observations have Pareto khat > 0.7 "
            "or non-finite; their elpd_i terms are unreliable but still "
            "included in elpd_loo/se — inspect pareto_k",
            stacklevel=2,
        )
    return LOOResult(
        elpd_loo=elpd,
        p_loo=float(np.sum(lppd_i) - elpd),
        se=float(np.sqrt(n * np.var(elpd_i))),
        pointwise_elpd=jnp.asarray(elpd_i),
        pareto_k=jnp.asarray(khat),
    )


def _np_logsumexp(a):
    import numpy as np

    m = np.max(a)
    if not np.isfinite(m):
        return m
    return m + np.log(np.sum(np.exp(a - m)))


def model_weights(
    results,
    *,
    method: str = "stacking",
    key=None,
    n_bootstrap: int = 1000,
    num_iters: int = 500,
) -> jnp.ndarray:
    """Model-averaging weights from pointwise elpd estimates
    (Yao, Vehtari, Simpson & Gelman 2018).

    ``results``: a sequence of :class:`LOOResult` / :class:`WAICResult`
    (or raw ``[n]`` pointwise-elpd arrays), one per model, all evaluated
    on the SAME n observations.  No counterpart in the reference — it
    compares models only by exact log evidence (``log_bayes_factor``);
    these weights target out-of-sample predictive fit instead.

    * ``"stacking"`` — maximize the LOO predictive density of the
      mixture, ``sum_i log sum_k w_k exp(elpd_ik)`` over the simplex.
      Solved by projected exponentiated-gradient ascent (softmax
      parametrization, one jitted ``lax.scan``) — the objective is
      concave in w, so the fixed iteration budget converges to the
      optimum for any K likely in practice.
    * ``"pseudo-bma"`` — ``w_k ∝ exp(sum_i elpd_ik)``.
    * ``"pseudo-bma+"`` — Bayesian-bootstrap regularized: Dirichlet(1)
      reweightings of the observations produce replicate elpd sums;
      the weight is the average softmax over replicates (needs ``key``;
      defaults to ``PRNGKey(0)``).

    Returns a ``[K]`` simplex vector.
    """
    import numpy as np

    elpds = []
    for r in results:
        e = getattr(r, "pointwise_elpd", r)
        elpds.append(np.asarray(e, float))
    elpd = np.stack(elpds, axis=0)  # [K, n]
    if elpd.ndim != 2:
        raise ValueError(f"pointwise elpds must be [n] vectors, got {elpd.shape}")
    k_models, n = elpd.shape
    if not np.all(np.isfinite(elpd)):
        raise ValueError(
            "non-finite pointwise elpd — inspect pareto_k / refit flagged "
            "observations before computing model weights"
        )
    if k_models == 1:
        return jnp.ones((1,))

    if method == "pseudo-bma":
        tot = elpd.sum(axis=1)
        w = np.exp(tot - tot.max())
        return jnp.asarray(w / w.sum())

    if method == "pseudo-bma+":
        key = jax.random.PRNGKey(0) if key is None else key
        # Bayesian bootstrap: Dirichlet(1,...,1) weights over observations
        alpha = jax.random.dirichlet(
            key, jnp.ones((n,), jnp.float64 if jax.config.jax_enable_x64
            else jnp.float32), shape=(n_bootstrap,)
        )  # [B, n]
        rep = jnp.asarray(elpd) @ alpha.T * n  # [K, B] replicate sums
        w = jax.nn.softmax(rep, axis=0)  # softmax over models per replicate
        return jnp.mean(w, axis=1)

    if method != "stacking":
        raise ValueError(
            f"unknown method {method!r}; use 'stacking', 'pseudo-bma' or "
            "'pseudo-bma+'"
        )

    # stacking: concave maximization of sum_i log(sum_k w_k exp(elpd_ik))
    # over the simplex; exponentiated-gradient (mirror) ascent in a scan
    le = jnp.asarray(elpd - elpd.max(axis=0, keepdims=True))  # [K, n]

    def objective_grad(logw):
        w = jax.nn.softmax(logw)
        # log mixture density per observation
        lmix = logsumexp(jnp.log(w)[:, None] + le, axis=0)  # [n]
        # d/dw_k = sum_i exp(elpd_ik - lmix_i); mirror step uses this
        g = jnp.sum(jnp.exp(le - lmix[None, :]), axis=1) / n  # [K]
        return g

    def body(logw, _):
        g = objective_grad(logw)
        # exponentiated gradient: w <- w * exp(eta g) renormalized
        logw = logw + 0.5 * g
        logw = logw - logsumexp(logw)
        return logw, None

    logw0 = jnp.zeros((k_models,)) - jnp.log(float(k_models))
    logw, _ = jax.lax.scan(body, logw0, None, length=num_iters)
    return jax.nn.softmax(logw)
