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
    """Jacobians of the dynamics along (xs[:T], us), vmapped over the horizon.

    One ``jax.linearize`` per point: a single primal evaluation shared by
    the S+A basis-tangent pushes AND the affine residual c — the previous
    two-jacfwd + extra-primal form evaluated the (RK4) dynamics three times
    per point, which dominated the SQP iteration at B=1024 x T=100
    (PROFILE_SQP_r04.json)."""
    S = model.state_size

    def one(x, u):
        xu = jnp.concatenate([x, u])

        def f(v):
            return model.dynamics(v[:S], v[S:])

        y, jvp = jax.linearize(f, xu)
        J = jax.vmap(jvp)(jnp.eye(xu.shape[0], dtype=xu.dtype))  # (S+A, S)
        fx, fu = J[:S].T, J[S:].T
        c = y - fx @ x - fu @ u
        return fx, fu, c

    A, B, c = jax.vmap(one)(xs, us)
    return AffineDynamics(A, B, c)


def gn_point_terms(model: Model, x, u, gz):
    """Closed-form Gauss-Newton expansion of the stage cost at one point:
    ``grad = 2 Jᵀ W_sym (z−g)``, ``H = 2 Jᵀ W_sym J`` with the model's
    compile-time ``quad_cost`` weight and J the transform Jacobian — the
    single source of truth for the GN stage math, shared by
    ``quadratize_cost``, ILQR's GN derivative stage, and (in spirit) the
    in-kernel terms of ``ops/fused_derivs.py``. Keeps a live gradient in
    the ±1e30 cost-saturation regime where autodiff of the clipped cost
    sees a zero derivative. Requires ``model.state_cost.W``."""
    S = model.state_size
    Wsym = jnp.asarray(model.state_cost.W, jnp.float32)
    Wsym = 0.5 * (Wsym + Wsym.T)
    xu = jnp.concatenate([x, u])

    def z_of(v):
        return model.transform(v[:S], v[S:])

    z, J = z_of(xu), jax.jacfwd(z_of)(xu)
    grad = 2.0 * (J.T @ (Wsym @ (z - gz)))
    H = 2.0 * (J.T @ Wsym @ J)
    return grad, H


def gn_terminal_terms(model: Model, x, g_last):
    """Closed-form GN terminal expansion at one point (zero action):
    ``qf = 2 Jfᵀ W_sym (z−g)``, ``Qf = 2 Jfᵀ W_sym Jf`` from
    ``model.terminal_cost.W`` — shared by ``quadratize_cost`` and the
    batched SQP terminal tail (``solvers/sqp.py:_derivs_cv``)."""
    WfT = jnp.asarray(model.terminal_cost.W, jnp.float32)
    WfT = 0.5 * (WfT + WfT.T)

    def zf(v):
        return model.transform(v, jnp.zeros((model.action_size,), v.dtype))

    zT, Jf = zf(x), jax.jacfwd(zf)(x)
    qf = 2.0 * (Jf.T @ (WfT @ (zT - g_last)))
    Qf = 2.0 * (Jf.T @ WfT @ Jf)
    return qf, Qf


def quadratize_cost(model: Model, xs, us, g_z, gauss_newton: bool = True) -> QuadCost:
    """Second-order cost expansion along the trajectory.

    ``gauss_newton=True`` drops the transform's curvature (exact when the
    feature map is affine, PSD-guaranteed otherwise) — the right default for
    SQP; ``False`` uses the full Hessian (DDP-style).

    When the outer costs expose their constant weight matrices
    (``quad_cost``-style ``.W``), the GN path uses the closed form
    grad = 2 Jᵀ W_sym (z−g), H = 2 Jᵀ W_sym J with only the transform
    Jacobian J from autodiff — per-point ``jax.hessian``/``jax.grad`` of
    the cost re-derived the constant W at every (B, T) trajectory point and
    was the dominant stage of the batched SQP iteration (profile:
    PROFILE_SQP_r04.json). The closed form also keeps a live gradient in
    the ±1e30 cost-saturation regime where autodiff sees a zero clip
    derivative (models/base.py quad_cost).
    """
    S = model.state_size
    W_state = getattr(model.state_cost, "W", None)

    def z_of(v):
        return model.transform(v[:S], v[S:])

    if gauss_newton and W_state is not None:
        def one(x, u, gz):
            grad, H = gn_point_terms(model, x, u, gz)
            return grad[:S], grad[S:], H[:S, :S], H[S:, S:], H[S:, :S]
    else:
        def one(x, u, gz):
            xu = jnp.concatenate([x, u])

            def c_fn(v):
                return model.cost(v[:S], v[S:], gz)

            grad = jax.grad(c_fn)(xu)
            if gauss_newton:
                # J^T W J with W recovered from the outer cost's curvature
                # (fallback for non-quad_cost models without a .W)
                J = jax.jacfwd(z_of)(xu)
                W = jax.hessian(lambda z: model.state_cost(z, gz))(z_of(xu)) / 2.0
                H = 2.0 * J.T @ W @ J
            else:
                H = jax.hessian(c_fn)(xu)
            return grad[:S], grad[S:], H[:S, :S], H[S:, S:], H[S:, :S]

    q, r, Q, R, M = jax.vmap(one)(xs[:-1], us, g_z)

    def cf_fn(x):
        return model.final_cost(x, g_z[-1])

    W_term = getattr(model.terminal_cost, "W", None)
    zf = lambda x: model.transform(x, jnp.zeros((model.action_size,), x.dtype))  # noqa: E731
    if gauss_newton and W_term is not None:
        qf, Qf = gn_terminal_terms(model, xs[-1], g_z[-1])
    elif gauss_newton:
        # same J^T W J drop of feature curvature for the terminal stage —
        # exact-Hessian terminals of the nonlinear feature costs (e.g.
        # cartpole's (x/2.4)^10 and 1-cos(theta) terms) are indefinite far
        # from the goal, which poisons the Riccati seed V_T
        qf = jax.grad(cf_fn)(xs[-1])
        Jf = jax.jacfwd(zf)(xs[-1])
        Wf = jax.hessian(lambda z: model.terminal_cost(z, g_z[-1]))(zf(xs[-1])) / 2.0
        Qf = 2.0 * Jf.T @ Wf @ Jf
    else:
        qf = jax.grad(cf_fn)(xs[-1])
        Qf = jax.hessian(cf_fn)(xs[-1])
    return QuadCost(Q, R, M, q, r, Qf, qf)
