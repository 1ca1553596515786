"""Time-varying LQR via Riccati recursion (sequential scan and
parallel-in-horizon associative scan).

New machinery owed by BASELINE.json ("Riccati-based interior-point",
"SQP: repeated linearize + Riccati QP") — the reference's closest relative
is the hand-rolled scalar backward pass in ``agents/ilqr.py:309-333``.

Cost convention here is the ½-form: stage ½xᵀQx + qᵀx + ½uᵀRu + rᵀu + uᵀMx,
terminal ½xᵀQf x + qfᵀx (callers converting from the framework's W-quadratic
models multiply their weights by 2 — see ``solvers/qp_mpc.py``).

Sequential-vs-associative crossover, measured on one TPU chip
(scripts/bench_riccati.py, 2026-08; S=2..4, A=1):

- raw ``tvlqr_backward`` (single instance): sequential wins at T=50;
  associative wins 1.45x at T=100 and 1.96x at T=500.
- ``admm_solve_riccati_batch`` with the iteration count FORCED (eps=0,
  50 ADMM iterations): associative wins everywhere measured — 2.4x (T=10,
  B=256) up to 41x (T=500, B=1) — the T-step linear scans inside 50
  sequential ADMM iterations are latency-bound.
- the same solver in the BASELINE config-2 closed-loop regime (warm
  residuals, eps early-exit after a few iterations): sequential wins
  (1.0ms vs 1.4ms at T=50, B=256).
- under an outer ``vmap`` of the *scalar* solve (config-5 style), the
  associative combine's many small ``linalg.solve``s are ~30x slower than
  the vmapped sequential scan — never enable ``parallel_horizon`` there.

Hence ``parallel_horizon`` defaults to False in QPMPC/SQP and should be
switched on for long horizons (T >= ~100) or iteration-heavy cold-start
solves on the dedicated batched path.
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


def _solve_gains(Q_uu, rhs):
    """``Q_uu⁻¹ rhs`` with a scalar fast path for single-input systems.

    Inside the sequential Riccati scans the general ``linalg.solve`` on a
    (1,1) block is a full lax.linalg kernel per step — measured to dominate
    the whole backward pass on TPU (see ``solvers/ilqr.py:backward_pass``).
    All shipped benchmark plants have action_size == 1.
    """
    if Q_uu.shape[-1] == 1:
        return rhs / Q_uu[..., :1, :]
    return jnp.linalg.solve(Q_uu, rhs)


def _inv_quu(Q_uu):
    """``Q_uu⁻¹`` with the same scalar fast path as ``_solve_gains``."""
    if Q_uu.shape[-1] == 1:
        return 1.0 / Q_uu
    return jnp.linalg.inv(Q_uu)


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
        sol = _solve_gains(Q_uu, jnp.concatenate([Q_u[:, None], Q_ux], axis=1))
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


class RiccatiFactors(NamedTuple):
    """Scenario- and linear-term-independent pieces of the TV-LQR solution.

    The quadratic Riccati recursion (P_t, K_t, Q_uu, Q_ux) depends only on
    (A, B, Q, R, M) — NOT on (c, q, r, x0). For problems that share dynamics
    and weights across a batch and vary only the linear terms (the ADMM
    u-update in ``ops/qp.py:admm_solve_riccati_*`` re-solves with a new r
    every iteration; batched MPC varies x0 per scenario), computing these
    once turns each subsequent solve into a *linear* backward scan of
    matvecs — O(S^2) per step instead of an O(S^3) re-factorization, and a
    (B, S) batch of them is one MXU matmul per step.
    """

    K: jnp.ndarray  # (T, A, S) feedback gains
    Quu_inv: jnp.ndarray  # (T, A, A)
    Qux: jnp.ndarray  # (T, A, S)
    Acl: jnp.ndarray  # (T, S, S) closed loop A + B K
    Pc: jnp.ndarray  # (T, S) P_{t+1} @ c_t


def riccati_factors(dyn: AffineDynamics, cost: QuadCost,
                    parallel: bool = False) -> RiccatiFactors:
    """Run the quadratic Riccati recursion once and keep the shared factors.

    ``parallel=True`` computes the P_t sequence with the O(log T)-depth
    associative scan (``tvlqr_values_assoc``) instead of the sequential
    scan — profitable for long horizons (see scripts/bench_riccati.py).
    """
    A, B = dyn.A, dyn.B
    T, S, nA = B.shape

    if parallel:
        Ps = tvlqr_values_assoc(dyn, cost)[0]  # (T+1, S, S)
        P_next = Ps[1:]

        def factor(A_t, B_t, c_t, Q_t, R_t, M_t, P1):
            Q_uu = R_t + B_t.T @ P1 @ B_t
            Q_ux = M_t + B_t.T @ P1 @ A_t
            Quu_inv = _inv_quu(Q_uu)
            K = -Quu_inv @ Q_ux
            return K, Quu_inv, Q_ux, A_t + B_t @ K, P1 @ c_t

        K, Quu_inv, Qux, Acl, Pc = jax.vmap(factor)(
            A, B, dyn.c, cost.Q, cost.R, cost.M, P_next
        )
        return RiccatiFactors(K, Quu_inv, Qux, Acl, Pc)

    def step(P, inp):
        A_t, B_t, c_t, Q_t, R_t, M_t = inp
        Q_uu = R_t + B_t.T @ P @ B_t
        Q_ux = M_t + B_t.T @ P @ A_t
        Quu_inv = _inv_quu(Q_uu)
        K = -Quu_inv @ Q_ux
        P_new = Q_t + A_t.T @ P @ A_t + K.T @ Q_uu @ K + K.T @ Q_ux + Q_ux.T @ K
        P_new = 0.5 * (P_new + P_new.T)
        return P_new, (K, Quu_inv, Q_ux, A_t + B_t @ K, P @ c_t)

    per_t = (A, B, dyn.c, cost.Q, cost.R, cost.M)
    _, (K, Quu_inv, Qux, Acl, Pc) = lax.scan(step, cost.Qf, per_t, reverse=True)
    return RiccatiFactors(K, Quu_inv, Qux, Acl, Pc)


def tvlqr_solve_linear_batch(dyn: AffineDynamics, f: RiccatiFactors,
                             q, qf, rs, x0s, parallel: bool = False):
    """Solve a batch of TV-LQR problems sharing (A, B, c, Q, R, Qf) with
    per-scenario linear control terms ``rs`` (T, B, A) and starts ``x0s``
    (B, S), given precomputed ``RiccatiFactors``.

    Backward: the value-gradient recursion collapses to the affine map
        p_t = Acl_tᵀ p_{t+1} + h_t,
        h_t = q_t + A_tᵀ Pc_t + K_tᵀ (r_t + B_tᵀ Pc_t),
        k_t = −Q_uu⁻¹ (r_t + B_tᵀ (Pc_t + p_{t+1})),
    forward: x_{t+1} = Acl_t x_t + B_t k_t + c_t, u_t = K_t x_t + k_t.
    Everything is (B, S) × (S, S) matmuls — one MXU launch per step.
    ``parallel=True`` evaluates both affine recursions with O(log T)-depth
    associative scans. Returns us (T, B, A).
    """
    A, B, c = dyn.A, dyn.B, dyn.c
    T, S, nA = B.shape

    # shared per-t pieces of h and k
    APc = jnp.einsum("tji,tj->ti", A, f.Pc)  # AᵀPc
    BPc = jnp.einsum("tji,tj->ti", B, f.Pc)  # BᵀPc

    if parallel:
        # suffix-compose p_t = Acl_tᵀ p_{t+1} + h_t with associative_scan
        h = q[:, None, :] + APc[:, None, :] + jnp.einsum(
            "tas,tba->tbs", f.K, rs + BPc[:, None, :]
        )  # (T, B, S)
        G = jnp.swapaxes(f.Acl, -1, -2)  # (T, S, S)

        def combine(later, earlier):
            # elements are (G, h) of the affine map p = G p' + h. With
            # reverse=True the scan accumulates suffixes, passing the
            # already-combined LATER segment as the first argument (same
            # convention as _ric_combine); the composite is
            # f_earlier ∘ f_later.
            Gl, hl = later
            Ge, he = earlier
            return Ge @ Gl, jnp.einsum("tij,tbj->tbi", Ge, hl) + he

        qf_b = jnp.broadcast_to(qf, (1, h.shape[1], S))
        els = (
            jnp.concatenate([G, jnp.eye(S, dtype=G.dtype)[None]], 0),
            jnp.concatenate([h, qf_b], 0),
        )
        _, p_all = jax.lax.associative_scan(combine, els, reverse=True)
        p_next = p_all[1:]  # (T, B, S): p_{t+1} per t
        rBp = rs + BPc[:, None, :] + jnp.einsum("tji,tbj->tbi", B, p_next)
        k = -jnp.einsum("tba,tca->tbc", rBp, f.Quu_inv)
        # forward x_{t+1} = Acl x_t + (B k_t + c_t): prefix associative scan
        const = jnp.einsum("tia,tba->tbi", B, k) + c[:, None, :]

        def fcombine(a, b):
            Ga, ha = a
            Gb, hb = b
            return Gb @ Ga, jnp.einsum("tij,tbj->tbi", Gb, ha) + hb

        els_f = (f.Acl, const)
        Gacc, hacc = jax.lax.associative_scan(fcombine, els_f)
        # x_{t+1} = Gacc_t x0 + hacc_t; xs = [x0, x_1..x_{T-1}] for u_t
        x_later = jnp.einsum("tij,bj->tbi", Gacc[:-1], x0s) + hacc[:-1]
        xs = jnp.concatenate([jnp.broadcast_to(x0s, (1, *x0s.shape)), x_later], 0)
        us = jnp.einsum("tas,tbs->tba", f.K, xs) + k
        return us

    def bstep(p, inp):
        # p: (B, S) value gradient at t+1
        A_t, B_t, q_t, APc_t, BPc_t, K_t, Quu_inv_t, r_t = inp
        rBp = r_t + BPc_t[None] + p @ B_t  # (B, A): r + Bᵀ(Pc + p)
        k = -rBp @ Quu_inv_t.T
        h = q_t[None] + APc_t[None] + (r_t + BPc_t[None]) @ K_t
        p_new = h + p @ (A_t + B_t @ K_t)
        return p_new, k

    pT = jnp.broadcast_to(qf, (rs.shape[1], S))
    per_t = (A, B, q, APc, BPc, f.K, f.Quu_inv, rs)
    _, ks = lax.scan(bstep, pT, per_t, reverse=True)  # (T, B, A)

    def fstep(x, inp):
        Acl_t, B_t, c_t, K_t, k_t = inp
        u = x @ K_t.T + k_t
        x_next = x @ Acl_t.T + k_t @ B_t.T + c_t[None]
        return x_next, u

    _, us = lax.scan(fstep, jnp.asarray(x0s), (f.Acl, B, c, f.K, ks))
    return us


def tvlqr_values_assoc(dyn: AffineDynamics, cost: QuadCost):
    """(P_t)_{t=0..T} via the associative-scan Riccati (quadratic part of
    ``tvlqr_backward_assoc``'s elements). Cross terms must be zero."""
    A, B = dyn.A, dyn.B
    T, S, nA = B.shape
    with jax.default_matmul_precision("highest"):
        Rinv = _inv_quu(cost.R)
        C_el = jnp.einsum("tij,tjk,tlk->til", B, Rinv, B)
        b_el = dyn.c - jnp.einsum("tij,tjk,tk->ti", B, Rinv, cost.r)
        els = _RicEl(A, b_el, C_el, cost.Q, cost.q)
        term = _RicEl(
            jnp.eye(S, dtype=A.dtype)[None],
            jnp.zeros((1, S), A.dtype),
            jnp.zeros((1, S, S), A.dtype),
            cost.Qf[None],
            cost.qf[None],
        )
        els = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), els, term)
        rev = jax.tree.map(lambda x: jnp.flip(x, axis=0), els)
        acc = jax.lax.associative_scan(_ric_combine, rev)
        acc = jax.tree.map(lambda x: jnp.flip(x, axis=0), acc)
    return acc.P, acc.p


def tvlqr_backward_assoc_general(dyn: AffineDynamics, cost: QuadCost) -> TVLQRPolicy:
    """``tvlqr_backward_assoc`` for costs WITH cross terms (M ≠ 0), via the
    standard substitution ũ = u + R⁻¹Mx that eliminates them:

        A' = A − BR⁻¹M,  Q' = Q − MᵀR⁻¹M,  q' = q − MᵀR⁻¹r,
        policy maps back as K = K̃ − R⁻¹M, k = k̃.
    """
    with jax.default_matmul_precision("highest"):
        RinvM = _solve_gains(cost.R, cost.M)  # (T, A, S)
        A2 = dyn.A - jnp.einsum("tia,tas->tis", dyn.B, RinvM)
        Q2 = cost.Q - jnp.einsum("tas,tau->tsu", cost.M, RinvM)
        q2 = cost.q - jnp.einsum("tas,ta->ts", RinvM, cost.r)
        pol = tvlqr_backward_assoc(
            AffineDynamics(A2, dyn.B, dyn.c),
            cost._replace(Q=Q2, q=q2, M=jnp.zeros_like(cost.M)),
        )
        return TVLQRPolicy(pol.K - RinvM, pol.k)


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
        Rinv = _inv_quu(R)
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
            sol = _solve_gains(Q_uu, jnp.concatenate([rhs[:, None], Q_ux], 1))
            return -sol[:, 1:], -sol[:, 0]

        K, k = jax.vmap(gains)(A, B, c, R, r, P_next, p_next)
    return TVLQRPolicy(K, k)
