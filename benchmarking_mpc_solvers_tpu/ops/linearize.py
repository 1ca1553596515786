"""Trajectory linearization / quadratization.

No reference counterpart (the reference's only derivative machinery is the
numdifftools finite-difference workers in ``agents/ilqr.py:13-45``); this
module provides the exact-autodiff building blocks for the QP/SQP solver
families required by BASELINE.json: time-varying affine dynamics

    x_{t+1} ≈ A_t x_t + B_t u_t + c_t

and quadratic cost expansions around a nominal trajectory, all vmapped over
the horizon so XLA emits one fused batched-jacobian kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.base import Model


class AffineDynamics(NamedTuple):
    A: jnp.ndarray  # (T, S, S)
    B: jnp.ndarray  # (T, S, A)
    c: jnp.ndarray  # (T, S)   residual so x' = A x + B u + c is exact at the
    #                  linearization point


class QuadCost(NamedTuple):
    Q: jnp.ndarray  # (T, S, S)
    R: jnp.ndarray  # (T, A, A)
    M: jnp.ndarray  # (T, A, S) cross term
    q: jnp.ndarray  # (T, S)
    r: jnp.ndarray  # (T, A)
    Qf: jnp.ndarray  # (S, S)
    qf: jnp.ndarray  # (S,)


def linearize_dynamics(model: Model, xs, us) -> AffineDynamics:
    """Jacobians of the dynamics along (xs[:T], us): one fused vmap·jacfwd."""

    def one(x, u):
        fx = jax.jacfwd(model.dynamics, argnums=0)(x, u)
        fu = jax.jacfwd(model.dynamics, argnums=1)(x, u)
        c = model.dynamics(x, u) - fx @ x - fu @ u
        return fx, fu, c

    A, B, c = jax.vmap(one)(xs, us)
    return AffineDynamics(A, B, c)


def quadratize_cost(model: Model, xs, us, g_z, gauss_newton: bool = True) -> QuadCost:
    """Second-order cost expansion along the trajectory.

    ``gauss_newton=True`` drops the transform's curvature (exact when the
    feature map is affine, PSD-guaranteed otherwise) — the right default for
    SQP; ``False`` uses the full Hessian (DDP-style).
    """
    S = model.state_size

    def one(x, u, gz):
        xu = jnp.concatenate([x, u])

        def c_fn(v):
            return model.cost(v[:S], v[S:], gz)

        grad = jax.grad(c_fn)(xu)
        if gauss_newton:
            # J^T W J with W from the quadratic outer cost: since state_cost
            # is (z-g)^T W (z-g), GN Hessian = 2 J^T W J where J = dz/d(xu).
            def z_fn(v):
                return model.transform(v[:S], v[S:])

            J = jax.jacfwd(z_fn)(xu)
            W = jax.hessian(lambda z: model.state_cost(z, gz))(z_fn(xu)) / 2.0
            H = 2.0 * J.T @ W @ J
        else:
            H = jax.hessian(c_fn)(xu)
        return grad[:S], grad[S:], H[:S, :S], H[S:, S:], H[S:, :S]

    q, r, Q, R, M = jax.vmap(one)(xs[:-1], us, g_z)

    def cf_fn(x):
        return model.final_cost(x, g_z[-1])

    qf = jax.grad(cf_fn)(xs[-1])
    if gauss_newton:
        # same J^T W J drop of feature curvature for the terminal stage —
        # exact-Hessian terminals of the nonlinear feature costs (e.g.
        # cartpole's (x/2.4)^10 and 1-cos(theta) terms) are indefinite far
        # from the goal, which poisons the Riccati seed V_T
        zf = lambda x: model.transform(x, jnp.zeros((model.action_size,), x.dtype))  # noqa: E731
        Jf = jax.jacfwd(zf)(xs[-1])
        Wf = jax.hessian(lambda z: model.terminal_cost(z, g_z[-1]))(zf(xs[-1])) / 2.0
        Qf = 2.0 * Jf.T @ Wf @ Jf
    else:
        Qf = jax.hessian(cf_fn)(xs[-1])
    return QuadCost(Q, R, M, q, r, Qf, qf)
