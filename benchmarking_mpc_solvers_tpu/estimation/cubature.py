"""Unscented/cubature Kalman filter and smoother for nonlinear systems.

Working redesign of the reference's *broken* ``kalman_curb``
(``MPCBenchmark/i2c/kalman_cubature.py:6-102``: imports a nonexistent class
name and reads never-assigned noise attributes) with its hardcoded pendulum
dynamics generalized to arbitrary (dynamics, observe) functions. Filter and
smoother are ``lax.scan`` passes built on the sigma-point moment matching in
``quadrature.py``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .kalman import FilterResult, SmootherResult
from .quadrature import SigmaPoints, make_sigma_points, moments


class UKFModel(NamedTuple):
    dynamics: Callable  # (pts (n,S), u (U,)) -> (n, S)
    observe: Callable  # (pts (n,S)) -> (n, Y)
    sig_eta: jnp.ndarray  # (S, S) process noise cov
    sig_zeta: jnp.ndarray  # (Y, Y) observation noise cov


def ukf_filter(
    model: UKFModel, sp: SigmaPoints, mu0, sig0, us, ys
) -> FilterResult:
    def step(carry, inp):
        mu, sig = carry
        u, y = inp
        # predict through the nonlinear dynamics
        mu_p, sig_p, _ = moments(sp, lambda pts: model.dynamics(pts, u), mu, sig)
        sig_p = sig_p + model.sig_eta
        # update through the nonlinear observation model
        m_y, sig_y, sig_xy = moments(sp, model.observe, mu_p, sig_p)
        sig_y = sig_y + model.sig_zeta
        L = jnp.linalg.solve(sig_y.T, sig_xy.T).T
        mu_f = mu_p + L @ (y - m_y)
        sig_f = sig_p - L @ sig_y @ L.T
        sig_f = 0.5 * (sig_f + sig_f.T)
        return (mu_f, sig_f), (mu_f, sig_f, mu_p, sig_p)

    with jax.default_matmul_precision("highest"):
        (_, _), (mu_f, sig_f, mu_p, sig_p) = lax.scan(step, (mu0, sig0), (us, ys))
    return FilterResult(
        jnp.concatenate([mu0[None], mu_f], axis=0),
        jnp.concatenate([sig0[None], sig_f], axis=0),
        mu_p,
        sig_p,
    )


def ukf_smoother(model: UKFModel, sp: SigmaPoints, fr: FilterResult, us) -> SmootherResult:
    """Unscented RTS smoother: cross-covariances from sigma points."""

    def step(carry, inp):
        mu_next, sig_next = carry
        mu_f, sig_f, mu_p, sig_p, u = inp
        _, _, sig_xd = moments(sp, lambda pts: model.dynamics(pts, u), mu_f, sig_f)
        J = jnp.linalg.solve(sig_p.T, sig_xd.T).T
        mu_s = mu_f + J @ (mu_next - mu_p)
        sig_s = sig_f + J @ (sig_next - sig_p) @ J.T
        return (mu_s, sig_s), (mu_s, sig_s)

    with jax.default_matmul_precision("highest"):
        init = (fr.mu_filt[-1], fr.sig_filt[-1])
        per_t = (fr.mu_filt[:-1], fr.sig_filt[:-1], fr.mu_pred, fr.sig_pred, us)
        _, (mu_s, sig_s) = lax.scan(step, init, per_t, reverse=True)
    return SmootherResult(
        jnp.concatenate([mu_s, fr.mu_filt[-1][None]], axis=0),
        jnp.concatenate([sig_s, fr.sig_filt[-1][None]], axis=0),
    )


def make_pendulum_ukf(
    process_std: float = 1e-2, obs_std: float = 1e-2, damping: float = 0.5
) -> UKFModel:
    """The reference cubature filter's damped-pendulum system with sin/cos
    observations (``kalman_cubature.py:6-23``), batch-safe."""
    dt, m, l, g, u_mx = 0.05, 1.0, 1.0, 9.80665, 2.0

    def dynamics(pts, u):
        torque = jnp.clip(u[0], -u_mx, u_mx)
        th, thdot = pts[:, 0], pts[:, 1]
        thddot = (
            -3.0 * g / (2 * l) * jnp.sin(th + jnp.pi)
            - damping * thdot
            + 3.0 / (m * l**2) * torque
        )
        new_thdot = thdot + thddot * dt
        new_th = th + new_thdot * dt
        return jnp.stack([new_th, new_thdot], axis=1)

    def observe(pts):
        return jnp.stack([jnp.sin(pts[:, 0]), jnp.cos(pts[:, 0])], axis=1)

    return UKFModel(
        dynamics,
        observe,
        process_std**2 * jnp.eye(2, dtype=jnp.float32),
        obs_std**2 * jnp.eye(2, dtype=jnp.float32),
    )


def default_sigma_points(dim: int = 2) -> SigmaPoints:
    """Reference construction: QuadratureInf(1, 0, 0, dim)
    (``kalman_cubature.py:34-35``)."""
    return make_sigma_points(1.0, 0.0, 0.0, dim)
