"""Linear-Gaussian Kalman filtering and RTS smoothing.

TPU-first redesign of the reference's estimation building blocks for the
(unfinished) i2c solver: the stateful ``kalman`` class
(``MPCBenchmark/i2c/kalman.py:4-83``: predict with affine dynamics
Ax + a + Bu, update with pinv-based gain, backward RTS smoothing) becomes
pure ``lax.scan`` passes over whole measurement sequences — filter and
smoother each one fused program, vmappable over batches of trajectories.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LGSSM(NamedTuple):
    """Affine-Gaussian state-space model x' = Ax + a + Bu + w, y = Cx + v."""

    A: jnp.ndarray  # (S, S)
    a: jnp.ndarray  # (S,)
    B: jnp.ndarray  # (S, U)
    C: jnp.ndarray  # (Y, S)
    sig_eta: jnp.ndarray  # (S, S) process noise cov
    sig_zeta: jnp.ndarray  # (Y, Y) observation noise cov


class FilterResult(NamedTuple):
    mu_filt: jnp.ndarray  # (N+1, S) filtered means incl. prior
    sig_filt: jnp.ndarray  # (N+1, S, S)
    mu_pred: jnp.ndarray  # (N, S) one-step predicted means
    sig_pred: jnp.ndarray  # (N, S, S)


def kalman_filter(model: LGSSM, mu0, sig0, us, ys) -> FilterResult:
    """Filter a sequence: us (N, U) controls, ys (N, Y) measurements."""

    def step(carry, inp):
        mu, sig = carry
        u, y = inp
        # predict (kalman.py:46-54)
        mu_p = model.A @ mu + model.a + model.B @ u
        sig_p = model.A @ sig @ model.A.T + model.sig_eta
        # update (kalman.py:56-67)
        sig_y = model.C @ sig_p @ model.C.T + model.sig_zeta
        L = jnp.linalg.solve(sig_y.T, (sig_p @ model.C.T).T).T  # gain
        mu_f = mu_p + L @ (y - model.C @ mu_p)
        sig_f = (jnp.eye(mu.shape[0], dtype=sig.dtype) - L @ model.C) @ sig_p
        return (mu_f, sig_f), (mu_f, sig_f, mu_p, sig_p)

    with jax.default_matmul_precision("highest"):
        (_, _), (mu_f, sig_f, mu_p, sig_p) = lax.scan(step, (mu0, sig0), (us, ys))
    return FilterResult(
        jnp.concatenate([mu0[None], mu_f], axis=0),
        jnp.concatenate([sig0[None], sig_f], axis=0),
        mu_p,
        sig_p,
    )


class SmootherResult(NamedTuple):
    mu_smooth: jnp.ndarray  # (N+1, S)
    sig_smooth: jnp.ndarray  # (N+1, S, S)


def rts_smoother(model: LGSSM, fr: FilterResult) -> SmootherResult:
    """Backward Rauch-Tung-Striebel pass (kalman.py:69-83) as a reversed scan."""

    def step(carry, inp):
        mu_next, sig_next = carry
        mu_f, sig_f, mu_p, sig_p = inp
        J = jnp.linalg.solve(sig_p.T, (sig_f @ model.A.T).T).T
        mu_s = mu_f + J @ (mu_next - mu_p)
        sig_s = sig_f + J @ (sig_next - sig_p) @ J.T
        return (mu_s, sig_s), (mu_s, sig_s)

    with jax.default_matmul_precision("highest"):
        init = (fr.mu_filt[-1], fr.sig_filt[-1])
        per_t = (fr.mu_filt[:-1], fr.sig_filt[:-1], fr.mu_pred, fr.sig_pred)
        _, (mu_s, sig_s) = lax.scan(step, init, per_t, reverse=True)
    return SmootherResult(
        jnp.concatenate([mu_s, fr.mu_filt[-1][None]], axis=0),
        jnp.concatenate([sig_s, fr.sig_filt[-1][None]], axis=0),
    )


def kalman_smooth(model: LGSSM, mu0, sig0, us, ys) -> SmootherResult:
    return rts_smoother(model, kalman_filter(model, mu0, sig0, us, ys))
