"""Maneuvering-target tracking with a Rao-Blackwellized particle filter.

A target alternates between CRUISE (low process noise) and MANEUVER
(high process noise) — a jump-Markov linear system.  The regime is a
discrete particle substate; the 4-D kinematic state (position +
velocity in 2-D) is marginalized EXACTLY by one Kalman filter per
particle (`ops.rbpf`), so 256 particles track what a plain bootstrap
filter needs tens of thousands for.

The same filter, driven by PMMH, infers the maneuver process-noise
scale from the track alone.

Run:  python examples/28_rbpf_tracking.py   (writes rbpf_tracking.png)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# tiny sizes under the suite's smoke runner (tests/test_examples.py)
SMOKE = _os.environ.get("BI_EXAMPLE_SMOKE") == "1"

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinference_tpu.ops import RBPFModel, rbpf_filter
from bayesianinference_tpu.ops.particle import (
    ParticleModel,
    particle_filter,
)

# ---- constant-velocity kinematics, regime-switched process noise ----
DT = 1.0
F = jnp.asarray(
    [[1, 0, DT, 0], [0, 1, 0, DT], [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float64
)
H = jnp.asarray([[1, 0, 0, 0], [0, 1, 0, 0]], jnp.float64)  # position only
R_OBS = 4.0 * jnp.eye(2)
Q_SCALE = (0.02, 2.0)  # cruise vs maneuver acceleration variance
P_STAY = 0.95


def _q(scale):
    # white-acceleration discretization
    g = jnp.asarray([0.5 * DT**2, 0.5 * DT**2, DT, DT], jnp.float64)
    return scale * jnp.diag(g * g)


def _rbpf_model(q_maneuver):
    def trans(k, u, t):
        stay = jax.random.uniform(k, (u.shape[0], 1), jnp.float64) < P_STAY
        return jnp.where(stay, u, 1.0 - u)

    def lin_trans(u, t):
        q = jnp.where(u[0] > 0.5, q_maneuver, Q_SCALE[0])
        return F, jnp.zeros(4), _q(q)

    return RBPFModel(
        init_sampler=lambda k, p: jnp.zeros((p, 1), jnp.float64),
        transition_sampler=trans,
        linear_init=lambda u: (jnp.zeros(4), 25.0 * jnp.eye(4)),
        linear_transition=lin_trans,
        linear_observation=lambda u, t: (H, jnp.zeros(2), R_OBS),
    )


# ---- simulate a track with two maneuver bursts ----
rng = np.random.default_rng(5)
T = 30 if SMOKE else 120
regime = np.zeros(T, int)
regime[40:55] = 1
regime[85:100] = 1
x = np.zeros(4)
x[2:] = [1.0, 0.5]
xs, ys = [], []
for t in range(T):
    if t > 0:
        q = Q_SCALE[regime[t]]
        g = np.asarray([0.5, 0.5, 1.0, 1.0])
        x = np.asarray(F) @ x + rng.normal(size=4) * np.sqrt(q) * g
    xs.append(x.copy())
    ys.append(x[:2] + rng.normal(size=2) * 2.0)
xs, ys = np.asarray(xs), np.asarray(ys)

# ---- filter ----
res = rbpf_filter(
    _rbpf_model(Q_SCALE[1]), jnp.asarray(ys), 256, jax.random.PRNGKey(0)
)
est = np.asarray(res.linear_means)
p_man = np.asarray(res.nonlinear_means)[:, 0]
rmse_rbpf = float(np.sqrt(np.mean((est[:, :2] - xs[:, :2]) ** 2)))
rmse_obs = float(np.sqrt(np.mean((ys - xs[:, :2]) ** 2)))
print(f"position RMSE: observations {rmse_obs:.2f} -> RBPF {rmse_rbpf:.2f}")
man_acc = np.mean((p_man > 0.5) == (regime == 1))
print(f"maneuver-regime accuracy: {man_acc:.2f}")


# ---- plain bootstrap PF at the same particle count, for contrast ----
def _plain_pf():
    f64 = jnp.float64

    def init(k, p):
        k1, k2 = jax.random.split(k)
        reg = jnp.zeros((p, 1), f64)
        x0 = jax.random.normal(k2, (p, 4), f64) * 5.0
        return jnp.concatenate([reg, x0], axis=1)

    def trans(k, u, t):
        k1, k2 = jax.random.split(k)
        stay = jax.random.uniform(k1, (u.shape[0], 1), f64) < P_STAY
        reg = jnp.where(stay, u[:, :1], 1.0 - u[:, :1])
        q = jnp.where(reg[:, 0] > 0.5, Q_SCALE[1], Q_SCALE[0])
        g = jnp.asarray([0.5, 0.5, 1.0, 1.0], f64)
        eps = jax.random.normal(k2, (u.shape[0], 4), f64) * jnp.sqrt(
            q
        )[:, None] * g
        xn = u[:, 1:] @ F.T + eps
        return jnp.concatenate([reg, xn], axis=1)

    def obs(u, y_t, t):
        e = y_t - u[:, 1:3]
        return -0.5 * jnp.sum(e * e, axis=1) / 4.0 - jnp.log(
            2 * jnp.pi * 4.0
        )

    return ParticleModel(init, trans, obs)


pf = particle_filter(_plain_pf(), jnp.asarray(ys), 256, jax.random.PRNGKey(0))
est_pf = np.asarray(pf.filter_means)[:, 1:3]
rmse_pf = float(np.sqrt(np.mean((est_pf - xs[:, :2]) ** 2)))
print(f"plain bootstrap PF (same 256 particles) RMSE: {rmse_pf:.2f}")
print(
    f"marginal-likelihood estimates: RBPF {float(res.log_likelihood):.1f}, "
    f"PF {float(pf.log_likelihood):.1f}"
)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, (ax0, ax1) = plt.subplots(
    2, 1, figsize=(10, 7), height_ratios=[3, 1]
)
ax0.plot(ys[:, 0], ys[:, 1], ".", ms=3, color="0.6", label="radar returns")
ax0.plot(xs[:, 0], xs[:, 1], "-", color="k", lw=1, label="truth")
ax0.plot(est[:, 0], est[:, 1], "-", color="C3", lw=1.2, label="RBPF (256 particles)")
ax0.legend()
ax0.set_title(
    f"RBPF tracking: RMSE {rmse_rbpf:.2f} vs obs {rmse_obs:.2f} "
    f"(plain PF {rmse_pf:.2f})"
)
ax1.fill_between(np.arange(T), 0, p_man, color="C3", alpha=0.5)
ax1.step(np.arange(T), regime, color="k", lw=0.8, alpha=0.6)
ax1.set_ylabel("P(maneuver)")
ax1.set_xlabel("t")
fig.tight_layout()
fig.savefig(
    _os.path.join(_os.path.dirname(__file__), "rbpf_tracking.png"), dpi=110
)
print("wrote rbpf_tracking.png")
