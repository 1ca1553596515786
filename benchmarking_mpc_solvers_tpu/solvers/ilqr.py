"""iLQR / DDP with Levenberg–Marquardt trust region and line search.

Behavioral parity target: ``MPCBenchmark/agents/ilqr.py:10-350``, redesigned
TPU-first:

- exact derivatives via ``jax.grad`` / ``jax.hessian`` / ``jax.jacfwd``
  vmapped over the horizon — one fused XLA call replacing the reference's
  numdifftools workers fed through module-level multiprocessing queues
  (``ilqr.py:10-45,100-106,240-253``).
- backward Riccati recursion as a reversed ``lax.scan``; non-PD Q_uu is
  detected via NaNs from ``cholesky`` (the reference catches exceptions and
  reports a failed pass, ``ilqr.py:319-323``), triggering the same μ
  escalation (μ∈[1e-6,1024], δ0=2 — ``ilqr.py:92-96,136-140,208-210``).
- line search over the reference's α schedule 1.1^(−i²), i=0..9
  (``ilqr.py:97``) with all 10 forward passes evaluated in parallel via
  ``vmap`` and the sequential accept logic replayed over the precomputed
  costs.
- the outer iteration loop is a ``lax.while_loop`` (vmappable: batched
  instances run lock-step with masking).
- ``ddp=True`` adds the second-order dynamics contractions V_x·f_xx/f_ux/f_uu
  to the Q-terms — full DDP, which the reference's ``closed_loop`` flag
  sketched but never implemented (commented out at ``ilqr.py:301-305``).
- ``box_ddp=True`` makes the backward pass control-limit-aware (clamped k,
  zeroed K rows on the active set — boxDDP, exact for scalar actions); the
  reference only clips in the forward pass.

Deliberate correctness deltas from the reference (documented, flag-gated
where behavioral):
- full cost Hessian blocks instead of the reference's diagonal-only
  l_xx/l_uu vectors and elementwise Q_uu inverse (``ilqr.py:24-27,324-325``
  — only valid for scalar actions); our recursion is the standard matrix
  form, exact for the scalar-action case too. ``diag_hessian=True``
  switches the backward pass to an exact replica of the reference
  numerics — diagonal-only cost Hessians (``ilqr.py:24-27``), the
  ``hess[-1, :S]`` l_ux row (``ilqr.py:27``), elementwise ``Q_uu**-1``
  gains (``ilqr.py:324-325``), and the terminal step's vector-V_xx
  broadcasting (``ilqr.py:269,289-307`` keep the terminal Hessian as a
  diagonal *vector*, so the first recursion step contracts a vector and
  the l_xx row is broadcast-added before symmetrization). Scalar-action
  models only, like the reference.
- forward-pass stage costs use the goal trajectory g_z; the reference's
  forward pass dropped the goal (``ilqr.py:349`` calls predict without
  goal), identical in all shipped experiments since goals are zero.
- ``reference_accept=True`` (default) reproduces the reference's line-search
  quirk in which any accepted improvement immediately satisfies the relative
  convergence test (cost is updated *before* the check, ``ilqr.py:190-206``),
  so each solve call performs at most one accepted step. ``False`` gives a
  standard best-alpha multi-iteration iLQR.
- the modern path (``reference_accept=False`` and not ``diag_hessian``)
  scores the nominal rollout and line-search candidates on stage costs PLUS
  the terminal cost — the objective the backward pass optimizes. The
  reference's forward pass drops the terminal cost (``ilqr.py:340-350``),
  making its acceptance metric disagree with its own Q-model; solves then
  freeze short of the optimum wherever the two objectives disagree (see
  ``_terminal_in_objective``). Compat modes keep the truncated metric.
- ``gauss_newton=True`` swaps the exact cost Hessians for the PSD
  feature-space Gauss-Newton quadratization (see the field comment).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.fused_derivs import fused_derivs
from ..ops.linearize import gn_point_terms
from ..ops.fused_linesearch import fused_linesearch, linesearch_applicable
from ..ops.riccati_pallas import (
    pallas_riccati_applicable,
    riccati_backward_batch,
    use_pallas_riccati,
)
from ..ops.rollout import simulate_trajectory, simulate_trajectory_noisy
from .base import Solver


class ILQRState(NamedTuple):
    planned_us: jnp.ndarray  # (T, A)
    key: jnp.ndarray


class _Derivs(NamedTuple):
    l_x: jnp.ndarray  # (T+1, S)   (terminal row appended)
    l_u: jnp.ndarray  # (T, A)
    l_xx: jnp.ndarray  # (T+1, S, S)
    l_uu: jnp.ndarray  # (T, A, A)
    l_ux: jnp.ndarray  # (T, A, S)
    f_x: jnp.ndarray  # (T, S, S)
    f_u: jnp.ndarray  # (T, S, A)


@dataclasses.dataclass(frozen=True, eq=False)
class ILQR(Solver):
    max_iter: int = 10
    threshold: float = 1e-3
    closed_loop: bool = False  # kept for config parity (unused, as in reference)
    mu_min: float = 1e-6
    mu_max: float = 1024.0
    delta_zero: float = 2.0
    n_alphas: int = 10
    reference_accept: bool = True
    diag_hessian: bool = False  # True = reference's diag-Hessian numerics
    # True = Gauss-Newton cost quadratization (J^T W J in feature space,
    # PSD-guaranteed): on cartpole/acrobot the exact Hessians of the
    # nonlinear feature costs ((x/2.4)^10, 1-cos) are indefinite far from
    # the goal, stalling the line search (closed-loop medians ~2x worse —
    # see QUALITY.md); GN restores a descent-guaranteeing quadratic model.
    # Exact == GN on affine-feature models (synthetic LQR goldens).
    gauss_newton: bool = False
    ddp: bool = False  # True = full DDP: second-order dynamics terms
    box_ddp: bool = False  # True = control-limited gains (clamp k, mask K)
    # planning-model noise (noise_tests.py model_noise sweeps): the reference
    # noises every model.predict (models/model.py:42-43), which in iLQR means
    # the nominal rollout and the line-search forward passes — NOT the
    # derivative closures, which call _dynamics/_transform directly
    # (agents/ilqr.py:57-81) and so stay clean.
    model_noise_std: float = 0.0
    # batched backward pass as ONE Pallas kernel launch (see
    # ops/riccati_pallas.py — 5.3 ms -> sub-ms at T=100, B=1024). Tri-state:
    # None = auto (TPU backend only), True/False = force. Fires only when
    # the solve is vmapped (custom_vmap); scalar solves keep the scan.
    pallas_backward: "bool | None" = None

    # -- state ----------------------------------------------------------------
    def init_state(self, key) -> ILQRState:
        k_init, key = jax.random.split(key)
        # reference init: planned_us ~ N(0, bounds_high) (ilqr.py:90-91)
        us = jnp.asarray(self.model.hi) * jax.random.normal(
            k_init, (self.T, self.model.action_size), dtype=jnp.float32
        )
        return ILQRState(us, key)

    @property
    def alphas(self):
        return 1.1 ** (-jnp.arange(self.n_alphas, dtype=jnp.float32) ** 2)

    # -- derivative stage ------------------------------------------------------
    def _stage_derivs_cv(self, xs, us, g_z):
        """Stage derivatives (GN path) with a ``custom_vmap`` rule: batched
        solves compute every (scenario, timestep) Jacobian + GN cost block
        in ONE Pallas launch (``ops/fused_derivs.py``, shared with SQP);
        unbatched solves use the SAME closed-form GN terms the kernel
        computes (``ops/linearize.gn_point_terms``) so both paths agree
        everywhere — including the ±1e30 cost-saturation regime, where
        per-point autodiff of the clipped cost would go to zero while the
        closed form stays live. Same trace discipline as ``linesearch_cv``
        — everything travels as arguments."""
        model = self.model
        S = model.state_size

        def scan_stage(xs, us, g_z):
            def stage(x, u, gz):
                def f(v):
                    return model.dynamics(v[:S], v[S:])

                grad, hess = gn_point_terms(model, x, u, gz)
                jac_f = jax.jacfwd(f)(jnp.concatenate([x, u]))
                return (grad[:S], grad[S:], hess[:S, :S], hess[S:, S:],
                        hess[S:, :S], jac_f[:, :S], jac_f[:, S:])

            return jax.vmap(stage)(xs[:-1], us, g_z)

        @jax.custom_batching.custom_vmap
        def dv(xs, us, g_z):
            return scan_stage(xs, us, g_z)

        @dv.def_vmap
        def _rule(axis_size, in_batched, xs_b, us_b, g_z_):
            bc = lambda a, b: (  # noqa: E731
                a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            )
            if in_batched[2]:
                out = jax.vmap(scan_stage)(
                    bc(xs_b, in_batched[0]), bc(us_b, in_batched[1]), g_z_
                )
                return out, tuple(True for _ in out)
            xs_b, us_b = bc(xs_b, in_batched[0]), bc(us_b, in_batched[1])
            A, Bd, _c, Q, R, M, q, r = fused_derivs(model, xs_b, us_b, g_z_)
            return (q, r, Q, R, M, A, Bd), tuple(True for _ in range(7))

        return dv(xs, us, g_z)

    def derivatives(self, xs, us, g_z, ref_terminal: bool = False) -> _Derivs:
        """``ref_terminal=True`` (set by the diag_hessian compat mode)
        evaluates the terminal-cost derivatives at x_{T-1} instead of x_T,
        replicating the reference quirk where ``_calc_action`` passes the
        truncated ``xs[:-1]`` into ``derivatives`` and the terminal stage
        then reads the truncated array's last row
        (``agents/ilqr.py:132-133,267-271``)."""
        model = self.model
        S = model.state_size

        def stage(x, u, gz):
            def c(xu):
                return model.cost(xu[:S], xu[S:], gz)

            def f(xu):
                return model.dynamics(xu[:S], xu[S:])

            xu = jnp.concatenate([x, u])
            if self.gauss_newton and hasattr(model.state_cost, "W"):
                # shared closed form (ops/linearize.gn_point_terms) — the
                # same math as the fused kernel and quadratize_cost
                grad, hess = gn_point_terms(model, x, u, gz)
            elif self.gauss_newton:
                grad = jax.grad(c)(xu)

                def z(xu):
                    return model.transform(xu[:S], xu[S:])

                J = jax.jacfwd(z)(xu)
                W = jax.hessian(lambda zz: model.state_cost(zz, gz))(z(xu)) / 2.0
                hess = 2.0 * J.T @ W @ J
            else:
                grad = jax.grad(c)(xu)
                hess = jax.hessian(c)(xu)
            jac_f = jax.jacfwd(f)(xu)
            return (
                grad[:S],
                grad[S:],
                hess[:S, :S],
                hess[S:, S:],
                hess[S:, :S],
                jac_f[:, :S],
                jac_f[:, S:],
            )

        if (
            self.gauss_newton
            and not ref_terminal
            and use_pallas_riccati(self.pallas_backward)
            and linesearch_applicable(model)
        ):
            l_x, l_u, l_xx, l_uu, l_ux, f_x, f_u = self._stage_derivs_cv(
                xs, us, g_z
            )
        else:
            l_x, l_u, l_xx, l_uu, l_ux, f_x, f_u = jax.vmap(stage)(xs[:-1], us, g_z)

        def ct(x):
            return model.final_cost(x, g_z[-1])

        x_term = xs[-2] if ref_terminal else xs[-1]
        lx_T = jax.grad(ct)(x_term)
        if self.gauss_newton:
            def zt(x):
                return model.transform(x, jnp.zeros((model.action_size,), x.dtype))

            Jt = jax.jacfwd(zt)(x_term)
            Wt = jax.hessian(lambda zz: model.terminal_cost(zz, g_z[-1]))(zt(x_term)) / 2.0
            lxx_T = 2.0 * Jt.T @ Wt @ Jt
        else:
            lxx_T = jax.hessian(ct)(x_term)
        return _Derivs(
            jnp.concatenate([l_x, lx_T[None]], axis=0),
            l_u,
            jnp.concatenate([l_xx, lxx_T[None]], axis=0),
            l_uu,
            l_ux,
            f_x,
            f_u,
        )

    # -- second-order dynamics (DDP) --------------------------------------------
    def dynamics_hessian(self, xs, us):
        """(T, S, S+A, S+A) Hessians H[i] = ∂²f_i/∂(x,u)² along the
        trajectory — the terms the reference's ``closed_loop`` flag left
        commented out (``ilqr.py:301-305``)."""
        model = self.model
        S = model.state_size

        def one(x, u):
            def f(xu):
                return model.dynamics(xu[:S], xu[S:])

            return jax.jacfwd(jax.jacfwd(f))(jnp.concatenate([x, u]))

        return jax.vmap(one)(xs[:-1], us)

    # -- backward pass ---------------------------------------------------------
    def backward_pass(self, d: _Derivs, mu, f_hess=None, us=None):
        """``us`` (passed when ``box_ddp``) enables control-limited gains:
        k is clamped so u+k stays in bounds and K rows of clamped (active)
        controls are zeroed (the scalar-action exact case of the boxDDP
        projected-Newton solve, Tassa et al. 2014)."""
        S = self.model.state_size
        eye_s = jnp.eye(S, dtype=jnp.float32)
        lo, hi = self.model.lo, self.model.hi

        def step(carry, inp):
            V_x, V_xx = carry
            if us is not None:
                inp, u_t = inp[:-1], inp[-1]
            if f_hess is None:
                l_x, l_u, l_xx, l_uu, l_ux, f_x, f_u = inp
                vf_xx = vf_uu = vf_ux = 0.0
            else:
                l_x, l_u, l_xx, l_uu, l_ux, f_x, f_u, H = inp
                vf = jnp.einsum("i,ijk->jk", V_x, H)  # V_x · f_(xu)(xu)
                vf_xx, vf_uu, vf_ux = vf[:S, :S], vf[S:, S:], vf[S:, :S]
            # State-regularized gains (Tassa et al. 2012, eq. 10): the μ·I
            # term enters ONLY the gain solve. The value recursion below uses
            # the UNregularized Q-terms — folding the regularized Q_uu/Q_ux
            # into V (as the reference does, ``ilqr.py:300-307``) injects
            # O(μ) terms that the f_xᵀ·V_xx·f_x product amplifies
            # geometrically over the horizon, overflowing for unstable
            # dynamics (cartpole) at any μ.
            V_reg = V_xx + mu * eye_s
            Q_x = l_x + f_x.T @ V_x
            Q_u = l_u + f_u.T @ V_x
            Q_xx = l_xx + f_x.T @ V_xx @ f_x + vf_xx
            Q_uu = l_uu + f_u.T @ V_xx @ f_u + vf_uu
            Q_ux = l_ux + f_u.T @ V_xx @ f_x + vf_ux
            Q_uu_reg = l_uu + f_u.T @ V_reg @ f_u + vf_uu
            Q_ux_reg = l_ux + f_u.T @ V_reg @ f_x + vf_ux
            rhs = jnp.concatenate([Q_u[:, None], Q_ux_reg], axis=1)
            if Q_uu.shape[0] == 1:
                # Scalar-action fast path: the Cholesky of a (1,1) matrix is
                # a sqrt and the solve a division. The general lax.linalg
                # kernels on (1,1) blocks dominated the batched backward scan
                # on TPU (4.7 ms of a 5.7 ms iLQR iteration at B=1024,
                # T=100); this path drops them entirely. Positivity check is
                # exact here (the Cholesky-NaN test accepted Q_uu == 0 and
                # produced inf gains; > 0 is the correct PD condition).
                q00 = Q_uu_reg[0, 0]
                ok = q00 > 0.0
                kK = rhs / jnp.where(ok, q00, 1.0)
            else:
                chol = jnp.linalg.cholesky(Q_uu_reg)
                ok = jnp.all(jnp.isfinite(chol))
                chol_safe = jnp.where(
                    jnp.isfinite(chol), chol, jnp.eye(Q_uu.shape[0])
                )
                kK = jax.scipy.linalg.cho_solve((chol_safe, True), rhs)
            k = -kK[:, 0]
            K = -kK[:, 1:]
            if us is not None:
                u_new = u_t + k
                lo_hit, hi_hit = u_new < lo, u_new > hi
                k = jnp.where(lo_hit, lo - u_t, jnp.where(hi_hit, hi - u_t, k))
                K = jnp.where((lo_hit | hi_hit)[:, None], 0.0, K)
            V_x = Q_x + K.T @ Q_uu @ k + K.T @ Q_u + Q_ux.T @ k
            V_xx = Q_xx + K.T @ Q_uu @ K + K.T @ Q_ux + Q_ux.T @ K
            V_xx = 0.5 * (V_xx + V_xx.T)
            return (V_x, V_xx), (k, K, ok)

        init = (d.l_x[-1], d.l_xx[-1])
        per_t = (d.l_x[:-1], d.l_u, d.l_xx[:-1], d.l_uu, d.l_ux, d.f_x, d.f_u)
        if f_hess is not None:
            per_t = per_t + (f_hess,)
        if us is not None:
            per_t = per_t + (us,)
        _, (ks, Ks, oks) = lax.scan(step, init, per_t, reverse=True)
        return ks, Ks, jnp.all(oks)

    def backward_pass_cv(self, d: _Derivs, mu):
        """``backward_pass`` with a ``custom_vmap`` rule: when the solve is
        batched (vmapped episodes — the BASELINE benchmark path), the whole
        batched recursion runs as ONE Pallas kernel launch
        (``ops/riccati_pallas.py``) instead of a vmapped scan of tiny
        batched matmuls; unbatched calls are untouched. Plain iLQR only —
        the DDP/boxDDP/diag-Hessian variants keep the scan."""

        @jax.custom_batching.custom_vmap
        def bw(l_x, l_u, l_xx, l_uu, l_ux, f_x, f_u, mu):
            return self.backward_pass(
                _Derivs(l_x, l_u, l_xx, l_uu, l_ux, f_x, f_u), mu
            )

        @bw.def_vmap
        def _rule(axis_size, in_batched, *args):
            args = [
                a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)
            ]
            ks, Ks, ok = riccati_backward_batch(
                *args[:7], args[7], check_pd=True
            )
            return (ks, Ks, ok), (True, True, True)

        return bw(d.l_x, d.l_u, d.l_xx, d.l_uu, d.l_ux, d.f_x, d.f_u,
                  jnp.asarray(mu, jnp.float32))

    def linesearch_cv(self, ks, Ks, xs, us, g_z):
        """All-alpha line search with a ``custom_vmap`` rule: batched solves
        evaluate every (alpha, scenario) candidate in ONE fused Pallas
        feedback-rollout launch (``ops/fused_linesearch.py``) instead of
        n_alpha vmapped scans; unbatched solves keep the scan. Returns
        ``(uss, costs)`` of shapes ``(n_alphas, T, A)``, ``(n_alphas,)``."""
        # NOTE alphas travels as an ARGUMENT, never a closure: this method
        # runs inside the while_loop body trace, where even constant
        # arithmetic yields body-trace tracers — a closure would leak them
        # into the vmap rule, which executes under a different trace.
        def scan_ls(alphas, ks, Ks, xs, us, g_z):
            _, uss, costs = jax.vmap(
                lambda a: self.forward_pass(a, ks, Ks, xs, us, g_z)
            )(alphas)
            return uss, costs

        @jax.custom_batching.custom_vmap
        def ls(alphas, ks, Ks, xs, us, g_z):
            return scan_ls(alphas, ks, Ks, xs, us, g_z)

        @ls.def_vmap
        def _rule(axis_size, in_batched, alphas, *args):
            bc = lambda a, b: (  # noqa: E731
                a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            )
            assert not in_batched[0], "alphas is a per-solver constant"
            if in_batched[5]:
                # per-scenario goal trajectories don't fit the kernel's
                # shared-SMEM g_z: keep the scan path
                uss, costs = jax.vmap(
                    lambda k2, K2, x2, u2, g2: scan_ls(alphas, k2, K2, x2, u2, g2)
                )(*(bc(a, f) for a, f in zip(args, in_batched[1:])))
                return (uss, costs), (True, True)
            ks_b, Ks_b, xs_b, us_b = (
                bc(a, f) for a, f in zip(args[:4], in_batched[1:5])
            )
            uss, costs = fused_linesearch(
                self.model, alphas, xs_b[:, 0], us_b, ks_b, Ks_b, xs_b,
                args[4], with_terminal=self._terminal_in_objective,
            )
            return (jnp.swapaxes(uss, 0, 1), jnp.swapaxes(costs, 0, 1)), (
                True, True)

        return ls(self.alphas, ks, Ks, xs, us, g_z)

    # -- reference-numerics backward pass (diag_hessian compat) ----------------
    def backward_pass_ref(self, d: _Derivs, mu):
        """Replicates ``MPCBenchmark/agents/ilqr.py:280-333`` numerically.

        The reference keeps only cost-Hessian diagonals (as vectors) and the
        ``hess[-1, :S]`` cross row (``ilqr.py:24-27``), inverts Q_uu
        elementwise (``ilqr.py:324-325``), and initializes ``V_xx`` with the
        terminal *diagonal vector* (``ilqr.py:269,289-290``) — so the first
        recursion step contracts a vector (yielding a row for Q_xx) and every
        step broadcast-adds the l_xx/l_uu/l_ux rows before symmetrization.
        Exact only for scalar actions, like the reference.
        """
        if self.model.action_size != 1:
            raise ValueError("diag_hessian compat mode is scalar-action only")
        S = self.model.state_size
        eye_s = jnp.eye(S, dtype=jnp.float32)
        lxx_diag = jnp.diagonal(d.l_xx, axis1=-2, axis2=-1)  # (T+1, S)
        luu_diag = jnp.diagonal(d.l_uu, axis1=-2, axis2=-1)  # (T, A)
        lux_row = d.l_ux[:, -1, :]  # (T, S): reference keeps hess[-1, :S]

        def gains(Q_u, Q_uu, Q_ux):
            Q_uu_inv = Q_uu**-1  # elementwise, = true inverse only for A=1
            return -Q_uu_inv @ Q_u, -Q_uu_inv @ Q_ux

        # peeled terminal-adjacent step: V_xx is still the diagonal *vector*
        t = -1
        V_x, v_xx = d.l_x[-1], lxx_diag[-1]
        f_x, f_u = d.f_x[t], d.f_u[t]
        Q_x = d.l_x[t - 1] + f_x.T @ V_x
        Q_u = d.l_u[t] + f_u.T @ V_x
        q_xx_row = lxx_diag[t - 1] + (f_x.T @ v_xx) @ f_x  # (S,)
        V_reg = v_xx[None, :] + mu * eye_s  # vector+matrix broadcast
        Q_uu = luu_diag[t][None, :] + f_u.T @ V_reg @ f_u
        Q_ux = lux_row[t][None, :] + f_u.T @ V_reg @ f_x
        k_last, K_last = gains(Q_u, Q_uu, Q_ux)
        V_x = Q_x + K_last.T @ Q_uu @ k_last + K_last.T @ Q_u + Q_ux.T @ k_last
        V_xx = q_xx_row[None, :] + (
            K_last.T @ Q_uu @ K_last + K_last.T @ Q_ux + Q_ux.T @ K_last
        )
        V_xx = 0.5 * (V_xx + V_xx.T)

        def step(carry, inp):
            V_x, V_xx = carry
            l_x, l_u, lxx_d, luu_d, lux_r, f_x, f_u = inp
            V_reg = V_xx + mu * eye_s
            Q_x = l_x + f_x.T @ V_x
            Q_u = l_u + f_u.T @ V_x
            Q_uu = luu_d[None, :] + f_u.T @ V_reg @ f_u
            Q_ux = lux_r[None, :] + f_u.T @ V_reg @ f_x
            k, K = gains(Q_u, Q_uu, Q_ux)
            V_x = Q_x + K.T @ Q_uu @ k + K.T @ Q_u + Q_ux.T @ k
            V_xx = (
                lxx_d[None, :]
                + f_x.T @ V_xx @ f_x
                + K.T @ Q_uu @ K
                + K.T @ Q_ux
                + Q_ux.T @ K
            )
            V_xx = 0.5 * (V_xx + V_xx.T)
            return (V_x, V_xx), (k, K)

        per_t = (
            d.l_x[:-2],
            d.l_u[:-1],
            lxx_diag[:-2],
            luu_diag[:-1],
            lux_row[:-1],
            d.f_x[:-1],
            d.f_u[:-1],
        )
        _, (ks, Ks) = lax.scan(step, (V_x, V_xx), per_t, reverse=True)
        ks = jnp.concatenate([ks, k_last[None]], axis=0)
        Ks = jnp.concatenate([Ks, K_last[None]], axis=0)
        # the reference's elementwise inverse never raises (ilqr.py:319-325)
        return ks, Ks, jnp.bool_(True)

    # -- forward pass ----------------------------------------------------------
    def forward_pass(self, alpha, ks, Ks, xs, us, g_z, xnoise=None):
        """``xnoise`` (T, S), when given, is added after each dynamics step —
        the noisy planning model's ``predict`` (``models/model.py:42-43``)."""
        model = self.model
        if xnoise is None:
            xnoise = jnp.zeros((self.T, model.state_size), jnp.float32)

        def step(carry, inp):
            x_hat, cost = carry
            u, k, K, x_ref, gz, nz = inp
            u_hat = u + alpha * k + K @ (x_hat - x_ref)
            u_hat = jnp.clip(u_hat, model.lo, model.hi)
            x_next, c = model.step_and_cost(x_hat, u_hat, gz)
            return (x_next + nz, cost + c), (x_hat, u_hat)

        (x_last, cost), (xs_hat, us_hat) = lax.scan(
            step,
            (xs[0], jnp.zeros((), jnp.float32)),
            (us, ks, Ks, xs[:-1], g_z, xnoise),
        )
        xs_hat = jnp.concatenate([xs_hat[1:], x_last[None]], axis=0)
        xs_hat = jnp.concatenate([xs[:1], xs_hat], axis=0)
        if self._terminal_in_objective:
            cost = cost + model.final_cost(x_last, g_z[-1])
        return xs_hat, us_hat, cost

    @property
    def _terminal_in_objective(self) -> bool:
        """Modern path only: score the nominal rollout and line-search
        candidates on stage costs PLUS the terminal cost — the objective the
        backward pass actually optimizes (lx_T/lxx_T seed the recursion).
        The reference's forward pass drops the terminal cost
        (``ilqr.py:340-350``), so its acceptance metric disagrees with its
        own Q-model; near the optimum every candidate then scores worse on
        the truncated metric and the solve freezes short of the optimum
        (caught by test_ilqr_default_path_closed_loop_matches_lqr). Compat
        modes keep the reference's truncated objective verbatim."""
        return not (self.reference_accept or self.diag_hessian)

    # -- outer loop ------------------------------------------------------------
    def solve(self, state: ILQRState, x, g_z):
        # The Riccati recursion multiplies many small, ill-conditioned
        # matrices; TPU bf16-default matmuls lose the <1e-3 parity gate, so
        # force f32 accumulation for everything traced in the solve.
        with jax.default_matmul_precision("highest"):
            return self._solve(state, x, g_z)

    def _solve(self, state: ILQRState, x, g_z):
        model = self.model
        alphas = self.alphas

        def mu_increase(mu, delta):
            delta = jnp.maximum(self.delta_zero, delta * self.delta_zero)
            mu = jnp.maximum(self.mu_min, mu * delta)
            return mu, delta

        def mu_decrease(mu, delta):
            delta = jnp.minimum(1.0 / self.delta_zero, delta / self.delta_zero)
            mu = jnp.where(mu * delta < self.mu_min, 0.0, mu * delta)
            return mu, delta

        def cond(carry):
            i, _us, _mu, _delta, converged, _key = carry
            return jnp.logical_and(i < self.max_iter, ~converged)

        def body(carry):
            i, us, mu, delta, _, key = carry
            mu = jnp.clip(mu, self.mu_min, self.mu_max)
            if self.model_noise_std > 0.0:
                key, k_sim, k_fwd = jax.random.split(key, 3)
                nz_sim = self.model_noise_std * jax.random.normal(
                    k_sim, (self.T, model.state_size), jnp.float32
                )
                xs, cost = simulate_trajectory_noisy(model, x, us, g_z, nz_sim)
            else:
                xs, cost = simulate_trajectory(model, x, us, g_z)
            if self._terminal_in_objective:
                cost = cost + model.final_cost(xs[-1], g_z[-1])
            d = self.derivatives(xs, us, g_z, ref_terminal=self.diag_hessian)
            if self.diag_hessian:
                ks, Ks, bp_ok = self.backward_pass_ref(d, mu)
            else:
                f_hess = self.dynamics_hessian(xs, us) if self.ddp else None
                us_bp = jnp.clip(us, model.lo, model.hi) if self.box_ddp else None
                if (
                    f_hess is None
                    and us_bp is None
                    and use_pallas_riccati(self.pallas_backward)
                    and pallas_riccati_applicable(
                        model.state_size, model.action_size
                    )
                ):
                    ks, Ks, bp_ok = self.backward_pass_cv(d, mu)
                else:
                    ks, Ks, bp_ok = self.backward_pass(d, mu, f_hess, us_bp)

            us_c = jnp.clip(us, model.lo, model.hi)
            if self.model_noise_std > 0.0:
                # fresh noise per line-search rollout, like the reference's
                # per-predict draws (ilqr.py:340-350 through model.predict)
                nz_fwd = self.model_noise_std * jax.random.normal(
                    k_fwd, (self.n_alphas, self.T, model.state_size), jnp.float32
                )
                fwd = jax.vmap(
                    lambda a, nz: self.forward_pass(a, ks, Ks, xs, us_c, g_z, nz)
                )
                new_xss, new_uss, new_costs = fwd(alphas, nz_fwd)
            elif use_pallas_riccati(self.pallas_backward) and linesearch_applicable(
                model
            ):
                new_uss, new_costs = self.linesearch_cv(ks, Ks, xs, us_c, g_z)
            else:
                fwd = jax.vmap(
                    lambda a: self.forward_pass(a, ks, Ks, xs, us_c, g_z)
                )
                _new_xss, new_uss, new_costs = fwd(alphas)

            if self.reference_accept:
                # Sequential accept replay (ilqr.py:149-206): stop at the first
                # alpha that improves (accept; the post-update relative test
                # then trivially passes) or whose cost is within threshold.
                def ls_step(carry, j):
                    best_us, cur_cost, accepted, stop, mu, delta = carry
                    new_cost = new_costs[j]
                    improves = jnp.logical_and(~stop, new_cost < cur_cost)
                    mu_d, delta_d = mu_decrease(mu, delta)
                    mu = jnp.where(improves, mu_d, mu)
                    delta = jnp.where(improves, delta_d, delta)
                    best_us = jnp.where(improves, new_uss[j], best_us)
                    cur_cost = jnp.where(improves, new_cost, cur_cost)
                    rel = jnp.abs((cur_cost - new_cost) / cur_cost)
                    stop_now = jnp.logical_and(~stop, rel < self.threshold)
                    accepted = jnp.logical_or(accepted, improves)
                    stop = jnp.logical_or(stop, stop_now)
                    return (best_us, cur_cost, accepted, stop, mu, delta), None

                (us_new, _c, accepted, converged, mu, delta), _ = lax.scan(
                    ls_step,
                    (us_c, cost, jnp.bool_(False), jnp.bool_(False), mu, delta),
                    jnp.arange(self.n_alphas),
                )
            else:
                best_j = jnp.argmin(new_costs)
                best_cost = new_costs[best_j]
                accepted = best_cost < cost
                us_new = jnp.where(accepted, new_uss[best_j], us_c)
                rel = jnp.abs((cost - best_cost) / cost)
                converged = jnp.logical_and(accepted, rel < self.threshold)
                mu_d, delta_d = mu_decrease(mu, delta)
                mu = jnp.where(accepted, mu_d, mu)
                delta = jnp.where(accepted, delta_d, delta)

            # backward-pass failure or no accepted step → escalate trust region
            escalate = jnp.logical_or(~bp_ok, ~accepted)
            mu_i, delta_i = mu_increase(mu, delta)
            mu = jnp.where(escalate, mu_i, mu)
            delta = jnp.where(escalate, delta_i, delta)
            us_new = jnp.where(bp_ok, us_new, us)
            converged = jnp.where(bp_ok, converged, False)
            return (i + 1, us_new, mu, delta, converged, key)

        init = (
            jnp.int32(0),
            state.planned_us,
            jnp.float32(1.0),
            jnp.float32(self.delta_zero),
            jnp.bool_(False),
            state.key,
        )
        _, us, _, _, _, key = lax.while_loop(cond, body, init)
        new_state = ILQRState(us, key)
        return new_state, us[0], {}
