"""Shared closed-form quadrature oracles for the test suite.

The original oracles used scipy ``dblquad`` with a scalar Python
integrand at epsrel 1e-10 — correct but ~4-5 minutes each.  These
tensor-product Gauss-Legendre versions integrate the same Normal x
Normal-InverseGamma integrand in (mu, log var) coordinates with the
likelihood in closed form (no per-point scipy dist objects); they match
dblquad to ~1e-13 relative in ~20 ms (validated at n=400 vs the original
epsabs=1e-13 dblquad values for both test configurations).
"""

import numpy as np
from scipy.special import gammaln


def normal_nig_log_evidence_quadrature(
    y,
    *,
    mu0,
    lam,
    a_ig,
    scale_ig,
    mu_lo,
    mu_hi,
    v_lo,
    v_hi,
    n=400,
):
    """log integral of  prod_i N(y_i | mu, var) * N(mu | mu0, var/lam)
    * InvGamma(var | a_ig, scale_ig)  over the (mu, var) box, by
    Gauss-Legendre in (mu, log var)."""
    y = np.asarray(y, float)
    xb, wb = np.polynomial.legendre.leggauss(n)
    mu = 0.5 * (mu_hi - mu_lo) * xb + 0.5 * (mu_hi + mu_lo)
    wmu = 0.5 * (mu_hi - mu_lo) * wb
    lo, hi = np.log(v_lo), np.log(v_hi)
    u = 0.5 * (hi - lo) * xb + 0.5 * (hi + lo)
    wv = 0.5 * (hi - lo) * wb
    v = np.exp(u)

    m = len(y)
    sy, ssy = y.sum(), (y**2).sum()
    MU, V = mu[:, None], v[None, :]
    ss = ssy - 2 * MU * sy + m * MU**2
    loglike = -0.5 * ss / V - 0.5 * m * np.log(2 * np.pi * V)
    logp_mu = -0.5 * lam * (MU - mu0) ** 2 / V - 0.5 * np.log(
        2 * np.pi * V / lam
    )
    logp_v = (
        a_ig * np.log(scale_ig)
        - gammaln(a_ig)
        - (a_ig + 1) * np.log(V)
        - scale_ig / V
    )
    logint = loglike + logp_mu + logp_v + np.log(V)  # + log-var jacobian
    mx = logint.max()
    return mx + np.log(np.einsum("i,j,ij->", wmu, wv, np.exp(logint - mx)))
