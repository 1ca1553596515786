"""Time-varying LQR via Riccati recursion (sequential scan and
parallel-in-horizon associative scan).

New machinery owed by BASELINE.json ("Riccati-based interior-point",
"SQP: repeated linearize + Riccati QP") — the reference's closest relative
is the hand-rolled scalar backward pass in ``agents/ilqr.py:309-333``.

Cost convention here is the ½-form: stage ½xᵀQx + qᵀx + ½uᵀRu + rᵀu + uᵀMx,
terminal ½xᵀQf x + qfᵀx (callers converting from the framework's W-quadratic
models multiply their weights by 2 — see ``solvers/qp_mpc.py``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .linearize import AffineDynamics, QuadCost


class TVLQRPolicy(NamedTuple):
    K: jnp.ndarray  # (T, A, S)
    k: jnp.ndarray  # (T, A)


def tvlqr_backward(dyn: AffineDynamics, cost: QuadCost, reg: float = 0.0) -> TVLQRPolicy:
    """Backward Riccati recursion; returns the affine policy u = K x + k."""
    S = dyn.A.shape[-1]
    eye = jnp.eye(S, dtype=dyn.A.dtype)

    def step(carry, inp):
        P, p = carry
        A, B, c, Q, R, M, q, r = inp
        Pc_p = P @ c + p
        Q_x = q + A.T @ Pc_p
        Q_u = r + B.T @ Pc_p
        P_reg = P + reg * eye
        Q_xx = Q + A.T @ P @ A
        Q_uu = R + B.T @ P_reg @ B
        Q_ux = M + B.T @ P_reg @ A
        sol = jnp.linalg.solve(Q_uu, jnp.concatenate([Q_u[:, None], Q_ux], axis=1))
        k = -sol[:, 0]
        K = -sol[:, 1:]
        P_new = Q_xx + K.T @ Q_uu @ K + K.T @ Q_ux + Q_ux.T @ K
        p_new = Q_x + K.T @ Q_uu @ k + K.T @ Q_u + Q_ux.T @ k
        P_new = 0.5 * (P_new + P_new.T)
        return (P_new, p_new), (K, k)

    init = (cost.Qf, cost.qf)
    per_t = (dyn.A, dyn.B, dyn.c, cost.Q, cost.R, cost.M, cost.q, cost.r)
    _, (K, k) = lax.scan(step, init, per_t, reverse=True)
    return TVLQRPolicy(K, k)


def tvlqr_rollout(dyn: AffineDynamics, policy: TVLQRPolicy, x0):
    """Forward simulate the affine policy through the affine dynamics."""

    def step(x, inp):
        A, B, c, K, k = inp
        u = K @ x + k
        x_next = A @ x + B @ u + c
        return x_next, (x, u)

    xT, (xs, us) = lax.scan(step, x0, (dyn.A, dyn.B, dyn.c, policy.K, policy.k))
    return jnp.concatenate([xs, xT[None]], axis=0), us


def tvlqr_solve(dyn: AffineDynamics, cost: QuadCost, x0, reg: float = 0.0):
    """Solve the unconstrained TV-LQR: returns (xs, us, policy)."""
    with jax.default_matmul_precision("highest"):
        policy = tvlqr_backward(dyn, cost, reg)
        xs, us = tvlqr_rollout(dyn, policy, x0)
    return xs, us, policy


# -- parallel-in-horizon variant ---------------------------------------------
#
# For long horizons the O(T) sequential scan leaves the chip idle; the
# Riccati value recursion composes as an associative operation on affine
# fractional transforms (cf. the parallel-in-horizon NMPC literature in
# PAPERS.md), enabling lax.associative_scan with O(log T) depth.
# The element for step t represents V_t→(t+1) as the pair (F, z, P̃, p̃)
# of a linear-fractional map; composition is matrix algebra.


class _RicEl(NamedTuple):
    A: jnp.ndarray  # (T, S, S)
    b: jnp.ndarray  # (T, S)
    C: jnp.ndarray  # (T, S, S)
    P: jnp.ndarray  # (T, S, S)
    p: jnp.ndarray  # (T, S)


def _ric_combine(e2, e1):
    """Compose conditional-value elements (Särkkä & García-Fernández style
    parallel LQT): e1 is the earlier segment, e2 the later."""
    S = e1.A.shape[-1]
    eye = jnp.eye(S, dtype=e1.A.dtype)

    def comb(a2, b2, c2, p2, s2, a1, b1, c1, p1, s1):
        # I + C1 P2 — shared solve
        M = eye + c1 @ p2
        Minv_a1 = jnp.linalg.solve(M, a1)
        Minv_c1 = jnp.linalg.solve(M, c1)
        A = a2 @ Minv_a1
        b = a2 @ jnp.linalg.solve(M, b1 - c1 @ s2) + b2
        C = a2 @ Minv_c1 @ a2.T + c2
        Mt = eye + p2 @ c1
        P = a1.T @ jnp.linalg.solve(Mt, p2) @ a1 + p1
        p = a1.T @ jnp.linalg.solve(Mt, p2 @ b1 + s2) + s1
        return A, b, C, P, p

    A, b, C, P, p = jax.vmap(comb)(
        e2.A, e2.b, e2.C, e2.P, e2.p, e1.A, e1.b, e1.C, e1.P, e1.p
    )
    return _RicEl(A, b, C, P, p)


def tvlqr_backward_assoc(dyn: AffineDynamics, cost: QuadCost) -> TVLQRPolicy:
    """Parallel-in-horizon Riccati: same policy as ``tvlqr_backward`` (up to
    roundoff) with O(log T) sequential depth via ``associative_scan``.

    Restriction: no cross terms (cost.M must be 0) — the standard LQT form.
    """
    A, B, c = dyn.A, dyn.B, dyn.c
    Q, R, q, r = cost.Q, cost.R, cost.q, cost.r
    T, S, nA = B.shape

    with jax.default_matmul_precision("highest"):
        Rinv = jnp.linalg.inv(R)
        # per-step elements: value-passing form
        #   A_el = A, b_el = c − B R⁻¹ r, C_el = B R⁻¹ Bᵀ, P_el = Q, p_el = q
        b_el = c - jnp.einsum("tij,tjk,tk->ti", B, Rinv, r)
        C_el = jnp.einsum("tij,tjk,tlk->til", B, Rinv, B)
        els = _RicEl(A, b_el, C_el, Q, q)
        # terminal element: identity dynamics with value (Qf, qf)
        term = _RicEl(
            jnp.eye(S, dtype=A.dtype)[None],
            jnp.zeros((1, S), A.dtype),
            jnp.zeros((1, S, S), A.dtype),
            cost.Qf[None],
            cost.qf[None],
        )
        els = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), els, term)
        # reversed suffix-scan: element t accumulates t..T
        rev = jax.tree.map(lambda x: jnp.flip(x, axis=0), els)
        acc = jax.lax.associative_scan(_ric_combine, rev)
        acc = jax.tree.map(lambda x: jnp.flip(x, axis=0), acc)
        # value at t+1 (suffix starting at t+1): P_{t+1}, p_{t+1}
        P_next, p_next = acc.P[1:], acc.p[1:]

        def gains(A_t, B_t, c_t, R_t, r_t, P1, p1):
            Q_uu = R_t + B_t.T @ P1 @ B_t
            rhs = r_t + B_t.T @ (P1 @ c_t + p1)
            Q_ux = B_t.T @ P1 @ A_t
            sol = jnp.linalg.solve(Q_uu, jnp.concatenate([rhs[:, None], Q_ux], 1))
            return -sol[:, 1:], -sol[:, 0]

        K, k = jax.vmap(gains)(A, B, c, R, r, P_next, p_next)
    return TVLQRPolicy(K, k)
