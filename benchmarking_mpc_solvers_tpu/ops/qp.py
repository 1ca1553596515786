"""Condensed-QP construction and box-constrained QP solvers (ADMM + IP).

New solver family owed by BASELINE.json (configs 1-2: "single condensed QP
(ADMM)", "QP MPC horizon 50 with box input constraints") — the reference has
no QP solvers. Everything is dense linear algebra sized (T·A)², which XLA
maps straight onto the MXU; all iteration counts are static so the whole
solve jits into one program and vmaps over thousands of scenarios.

Condensing: for affine time-varying dynamics x_{t+1} = A_t x_t + B_t u_t + c_t
the stacked states X = (x_1..x_T) are affine in U = (u_0..u_{T-1}):
X = Su·U + Xfree, and the tracking objective

    Σ_{t=1}^{T-1} (x_t-xref)ᵀQ(x_t-xref) + (x_T-xref)ᵀQf(x_T-xref)
  + Σ_{t=0}^{T-1} (u_t-uref)ᵀR(u_t-uref)

condenses to min_U ½UᵀHU + gᵀU with H = 2(SuᵀQ̄Su + R̄),
g = 2(SuᵀQ̄(Xfree-Xref) − R̄Uref), subject to box bounds on U.
(x_0 is given, so its stage cost is constant and dropped.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .linearize import AffineDynamics, QuadCost


class CondensedQP(NamedTuple):
    H: jnp.ndarray  # (TA, TA)
    g: jnp.ndarray  # (TA,)
    lo: jnp.ndarray  # (TA,)
    hi: jnp.ndarray  # (TA,)
    Su: jnp.ndarray  # (T, S, TA) state-from-input map (for reconstruction)
    Xfree: jnp.ndarray  # (T, S) free response


def condense(
    dyn: AffineDynamics,
    x0,
    Q,
    R,
    Qf,
    xref,
    uref,
    u_lo,
    u_hi,
) -> CondensedQP:
    """Build the condensed box-QP. Q/R/Qf are single (S,S)/(A,A) weight
    matrices (time-invariant tracking); xref/uref are (S,)/(A,) targets."""
    A, B, c = dyn.A, dyn.B, dyn.c
    T, S, nA = B.shape
    TA = T * nA

    # Su rows and free response via one forward scan:
    #   row_t = A_t @ row_{t-1} + e_t ⊗ B_t ;  xf_t = A_t xf_{t-1} + c_t
    eye_T = jnp.eye(T, dtype=B.dtype)

    def step(carry, inp):
        row, xf = carry  # row: (S, T, A) block-columns; xf: (S,)
        A_t, B_t, c_t, e_t = inp
        row = jnp.einsum("ij,jta->ita", A_t, row) + jnp.einsum("t,ia->ita", e_t, B_t)
        xf = A_t @ xf + c_t
        return (row, xf), (row, xf)

    init = (jnp.zeros((S, T, nA), B.dtype), jnp.asarray(x0, B.dtype))
    (_, _), (rows, xfree) = lax.scan(step, init, (A, B, c, eye_T))
    Su = rows.reshape(T, S, TA)

    # stacked weights: Q for x_1..x_{T-1}, Qf for x_T
    Qbar = jnp.broadcast_to(Q, (T, S, S)).at[T - 1].set(Qf)
    QSu = jnp.einsum("tij,tjk->tik", Qbar, Su)
    Rbar = jnp.kron(jnp.eye(T, dtype=B.dtype), R)
    H = 2.0 * (jnp.einsum("tsi,tsj->ij", Su, QSu) + Rbar)
    dX = xfree - xref[None, :]
    g = 2.0 * (jnp.einsum("tsi,ts->i", QSu, dX) - Rbar @ jnp.tile(uref, T))
    lo = jnp.tile(jnp.asarray(u_lo, B.dtype), T)
    hi = jnp.tile(jnp.asarray(u_hi, B.dtype), T)
    return CondensedQP(H, g, lo, hi, Su, xfree)


class CondensedQPBatch(NamedTuple):
    H: jnp.ndarray  # (TA, TA) shared Hessian
    g: jnp.ndarray  # (B, TA) per-scenario linear terms
    lo: jnp.ndarray  # (TA,)
    hi: jnp.ndarray  # (TA,)
    Su: jnp.ndarray  # (T, S, TA)
    Xfree: jnp.ndarray  # (B, T, S)


def condense_batch(
    dyn: AffineDynamics,
    x0s,
    Q,
    R,
    Qf,
    xref,
    uref,
    u_lo,
    u_hi,
) -> CondensedQPBatch:
    """Batched condensing for *shared* dynamics (linear MPC linearized at a
    fixed operating point): H/Su are built once; only the free response —
    affine in x₀ via the state-transition products Φ_t = A_t···A_0 — and
    hence g vary per scenario. Feeds the shared-H Pallas ADMM path
    (``qp_pallas.admm_iterate``)."""
    A, B, c = dyn.A, dyn.B, dyn.c
    T, S, nA = B.shape
    TA = T * nA
    eye_T = jnp.eye(T, dtype=B.dtype)

    def step(carry, inp):
        row, Phi, xp = carry
        A_t, B_t, c_t, e_t = inp
        row = jnp.einsum("ij,jta->ita", A_t, row) + jnp.einsum("t,ia->ita", e_t, B_t)
        Phi = A_t @ Phi
        xp = A_t @ xp + c_t
        return (row, Phi, xp), (row, Phi, xp)

    init = (
        jnp.zeros((S, T, nA), B.dtype),
        jnp.eye(S, dtype=B.dtype),
        jnp.zeros((S,), B.dtype),
    )
    _, (rows, Phis, xparts) = lax.scan(step, init, (A, B, c, eye_T))
    Su = rows.reshape(T, S, TA)

    Qbar = jnp.broadcast_to(Q, (T, S, S)).at[T - 1].set(Qf)
    QSu = jnp.einsum("tij,tjk->tik", Qbar, Su)
    Rbar = jnp.kron(jnp.eye(T, dtype=B.dtype), R)
    H = 2.0 * (jnp.einsum("tsi,tsj->ij", Su, QSu) + Rbar)
    Xfree = jnp.einsum("tij,bj->bti", Phis, jnp.asarray(x0s, B.dtype)) + xparts[None]
    dX = Xfree - xref[None, None, :]
    g = 2.0 * (jnp.einsum("tsi,bts->bi", QSu, dX) - (Rbar @ jnp.tile(uref, T))[None])
    lo = jnp.tile(jnp.asarray(u_lo, B.dtype), T)
    hi = jnp.tile(jnp.asarray(u_hi, B.dtype), T)
    return CondensedQPBatch(H, g, lo, hi, Su, Xfree)


class ADMMResult(NamedTuple):
    U: jnp.ndarray  # (TA,) projected (feasible) solution
    r_prim: jnp.ndarray  # final primal residual ‖U − z‖∞
    r_dual: jnp.ndarray  # final dual residual ρ‖z − z_prev‖∞
    iters: jnp.ndarray  # iterations executed


def admm_solve(
    qp: CondensedQP,
    rho: float = 1.0,
    alpha: float = 1.6,
    iters: int = 100,
    eps: float = 1e-6,
) -> ADMMResult:
    """OSQP-style ADMM for min ½UᵀHU + gᵀU s.t. lo ≤ U ≤ hi.

    Splitting U = z with box projection on z and over-relaxation alpha.
    (H + ρI) is Cholesky-factorized once; the iteration is two triangular
    solves + a clip, which XLA fuses. Early exit via while_loop when both
    residuals drop below eps.
    """
    H, g, lo, hi = qp.H, qp.g, qp.lo, qp.hi
    n = g.shape[0]
    with jax.default_matmul_precision("highest"):
        chol = jnp.linalg.cholesky(H + rho * jnp.eye(n, dtype=H.dtype))

        def cond(carry):
            i, _z, _y, r_p, r_d = carry
            done = jnp.logical_and(r_p < eps, r_d < eps)
            return jnp.logical_and(i < iters, ~done)

        def body(carry):
            i, z, y, _, _ = carry
            u = jax.scipy.linalg.cho_solve((chol, True), rho * (z - y) - g)
            u_rel = alpha * u + (1.0 - alpha) * z
            z_new = jnp.clip(u_rel + y, lo, hi)
            y = y + u_rel - z_new
            r_p = jnp.max(jnp.abs(u - z_new))
            r_d = rho * jnp.max(jnp.abs(z_new - z))
            return (i + 1, z_new, y, r_p, r_d)

        big = jnp.float32(jnp.inf)
        i, z, _y, r_p, r_d = lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros(n, H.dtype), jnp.zeros(n, H.dtype), big, big)
        )
    return ADMMResult(z, r_p, r_d, i)


def ip_solve(qp: CondensedQP, iters: int = 25, mu0: float = 1.0, kappa: float = 0.2):
    """Primal log-barrier interior-point for the same box QP.

    Newton steps on ½UᵀHU + gᵀU − μ Σ[log(U−lo) + log(hi−U)] with a
    geometrically decreasing barrier μ ← κμ and a fraction-to-boundary
    damped step. Dense (TA)² Newton solves ride the MXU; iteration count is
    static for jit.
    """
    H, g, lo, hi = qp.H, qp.g, qp.lo, qp.hi
    n = g.shape[0]
    U0 = jnp.clip((lo + hi) / 2.0, lo + 1e-3, hi - 1e-3)

    with jax.default_matmul_precision("highest"):

        def body(carry, _):
            U, mu = carry
            d_lo = U - lo
            d_hi = hi - U
            grad = H @ U + g - mu / d_lo + mu / d_hi
            hess = H + jnp.diag(mu / d_lo**2 + mu / d_hi**2)
            step = jnp.linalg.solve(hess, grad)
            # fraction-to-boundary: keep strictly inside the box
            with_dir = jnp.where(step > 0, d_lo / step, jnp.inf)
            against = jnp.where(step < 0, -d_hi / step, jnp.inf)
            t_max = jnp.minimum(jnp.min(with_dir), jnp.min(against))
            t = jnp.minimum(1.0, 0.995 * t_max)
            U = U - t * step
            # f32 rounding can land exactly on the boundary -> inf barrier;
            # keep a strict interior margin
            margin = 1e-6 * (hi - lo)
            U = jnp.clip(U, lo + margin, hi - margin)
            return (U, jnp.maximum(mu * kappa, 1e-8)), None

        (U, _), _ = lax.scan(body, (U0, jnp.float32(mu0)), None, length=iters)
    return jnp.clip(U, lo, hi)


def admm_solve_riccati_batch(
    dyn: AffineDynamics,
    x0s,
    Q,
    R,
    Qf,
    xref,
    uref,
    u_lo,
    u_hi,
    rho: float = 1.0,
    iters: int = 100,
    eps: float = 1e-6,
    parallel_horizon: bool = False,
):
    """Batched ADMM for box-constrained LQ-MPC with a *Riccati* x-update.

    Condensing an unstable system over a long horizon squares an
    exponentially-conditioned Su into H — cond(H) ~ ρ(A)^{2T} overflows f32
    (cartpole upright at T=50 hits ~1e14). This variant never condenses:
    the ADMM U-subproblem

        min_U  J_LQ(U) + (ρ/2)‖U − (z − y)‖²

    is an unconstrained time-varying LQR (control penalty ρ, linear term
    −ρ(z−y)). Dynamics and weights are shared across the batch and across
    iterations, so the quadratic Riccati factors (P, K, Q_uu⁻¹) are computed
    ONCE (``ops/riccati.py:riccati_factors``) and every iteration's u-update
    is just the linear backward/forward affine scans batched over scenarios
    — (B, S) × (S, S) MXU matmuls per step, no per-iteration factorization.

    x0s: (B, S). Early exit when the worst-case residuals over the whole
    batch drop below eps. ``parallel_horizon`` switches the three horizon
    recursions (P precompute + per-iteration backward/forward) to O(log T)
    associative scans — profitable for long horizons (crossover measured in
    ``scripts/bench_riccati.py``). Returns (us (B, T, A), r_prim, r_dual,
    iters).
    """
    from .riccati import riccati_factors, tvlqr_solve_linear_batch

    T, S, nA = dyn.B.shape
    Bn = x0s.shape[0]
    Q2 = jnp.broadcast_to(2.0 * Q, (T, S, S))
    q2 = jnp.broadcast_to(-2.0 * (Q @ xref), (T, S))
    R2 = jnp.broadcast_to(
        2.0 * R + rho * jnp.eye(nA, dtype=jnp.float32), (T, nA, nA)
    )
    M0 = jnp.zeros((T, nA, S), jnp.float32)
    lo = jnp.asarray(u_lo, jnp.float32)  # (A,) broadcasts over (T, B, A)
    hi = jnp.asarray(u_hi, jnp.float32)
    r_base = jnp.broadcast_to(-2.0 * (R @ uref), (T, nA))
    qf = -2.0 * (Qf @ xref)

    with jax.default_matmul_precision("highest"):
        cost = QuadCost(Q=Q2, R=R2, M=M0, q=q2, r=r_base, Qf=2.0 * Qf, qf=qf)
        factors = riccati_factors(dyn, cost, parallel=parallel_horizon)
        x0s = jnp.asarray(x0s, jnp.float32)

        def u_update(z, y):
            rs = r_base[:, None, :] - rho * (z - y)  # (T, B, A)
            return tvlqr_solve_linear_batch(
                dyn, factors, q2, qf, rs, x0s, parallel=parallel_horizon
            )

        def cond_fn(carry):
            i, _z, _y, r_p, r_d = carry
            done = jnp.logical_and(r_p < eps, r_d < eps)
            return jnp.logical_and(i < iters, ~done)

        def body_fn(carry):
            i, z, y, _, _ = carry
            u = u_update(z, y)
            z_new = jnp.clip(u + y, lo, hi)
            y = y + u - z_new
            r_p = jnp.max(jnp.abs(u - z_new))
            r_d = rho * jnp.max(jnp.abs(z_new - z))
            return (i + 1, z_new, y, r_p, r_d)

        big = jnp.float32(jnp.inf)
        z0 = jnp.zeros((T, Bn, nA), jnp.float32)
        i, z, _y, r_p, r_d = lax.while_loop(
            cond_fn, body_fn, (jnp.int32(0), z0, z0, big, big)
        )
    return jnp.swapaxes(z, 0, 1), r_p, r_d, i


def admm_solve_riccati(
    dyn: AffineDynamics,
    x0,
    Q,
    R,
    Qf,
    xref,
    uref,
    u_lo,
    u_hi,
    rho: float = 1.0,
    iters: int = 100,
    eps: float = 1e-6,
    parallel_horizon: bool = False,
):
    """Single-scenario ``admm_solve_riccati_batch`` (B = 1).

    Returns (us (T,A), r_prim, r_dual, iters)."""
    us, r_p, r_d, i = admm_solve_riccati_batch(
        dyn, jnp.asarray(x0, jnp.float32)[None], Q, R, Qf, xref, uref,
        u_lo, u_hi, rho=rho, iters=iters, eps=eps,
        parallel_horizon=parallel_horizon,
    )
    return us[0], r_p, r_d, i



def qp_objective(qp: CondensedQP, U):
    return 0.5 * U @ qp.H @ U + qp.g @ U


def kkt_residual(qp: CondensedQP, U, tol: float = 1e-6):
    """∞-norm KKT residual of the box QP at U (projected-gradient form):
    r = ‖U − clip(U − (HU+g), lo, hi)‖∞ — zero iff U is optimal."""
    grad = qp.H @ U + qp.g
    return jnp.max(jnp.abs(U - jnp.clip(U - grad, qp.lo, qp.hi)))
