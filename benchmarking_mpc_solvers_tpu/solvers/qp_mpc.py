"""QP-based linear MPC: condensed box-QP solved by ADMM or interior point.

New solver family owed by BASELINE.json configs 1-2 (the reference ships
only sampling + iLQR solvers). Each ``solve`` call:

1. linearizes the model dynamics around an operating point (the goal state
   by default — classic linear MPC — or the current state for LTV behavior),
2. condenses the horizon into a dense (T·A)² box QP (``ops/qp.py``),
3. solves it with OSQP-style ADMM (default) or a log-barrier interior-point
   method, both fully jittable with static iteration bounds,
4. returns the first control; the full plan seeds the next call's warm
   start through the agent-layer receding-horizon shift.

The tracking weights (Q, R, Qf) default to the state/action blocks of the
model's quadratic feature cost evaluated at the linearization point, so the
QP objective is the Gauss-Newton model of the true benchmark cost.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.linearize import AffineDynamics
from ..ops.qp import (
    admm_solve,
    admm_solve_riccati,
    admm_solve_riccati_batch,
    condense,
    condense_batch,
    ip_solve,
)
from .base import Solver


class QPMPCState(NamedTuple):
    planned_us: jnp.ndarray  # (T, A)
    key: jnp.ndarray


@dataclasses.dataclass(frozen=True, eq=False)
class QPMPC(Solver):
    # "riccati_admm" (default: stable for unstable plants / long horizons),
    # "admm" (condensed dense — fine for stable systems / short horizons),
    # "ip" (condensed log-barrier interior point)
    method: str = "riccati_admm"
    iters: int = 100
    rho: float = 1.0
    eps: float = 1e-6
    # "goal" (classic linear MPC), "state" (re-linearize at the current
    # state, constant over the horizon), "plan" (LTV: re-linearize along
    # the previous plan's rollout — real-time-iteration SQP; see
    # _linearize)
    linearize_at: str = "goal"
    # optional explicit tracking weights; default derives them from the model
    Q: Optional[tuple] = None
    R: Optional[tuple] = None
    Qf: Optional[tuple] = None
    goal_x: Optional[tuple] = None  # linearization/tracking state target
    # planning-model noise (noise_tests.py model_noise sweeps): QPMPC makes
    # one dynamics evaluation per solve (the linearization residual), so the
    # reference's per-predict state noise (models/model.py:42-43) lands on
    # the affine term c — the planned trajectory is perturbed accordingly
    model_noise_std: float = 0.0
    # evaluate the horizon recursions with O(log T) associative scans instead
    # of sequential lax.scan — profitable at long horizons (crossover
    # benchmarked in scripts/bench_riccati.py; riccati_admm method only)
    parallel_horizon: bool = False
    # init_std > 0: random initial plan ~ N(0, init_std) clipped to the box
    # (cf. sqp.py/i2c.py init_std). Only meaningful for linearize_at="plan":
    # a zero plan at a symmetric equilibrium is an LTV fixed point (zero
    # rollout -> hanging linearization -> zero QP optimum). Default 0.
    init_std: float = 0.0

    def _weights(self):
        """Gauss-Newton (Q, R, Qf) from the model's feature-space quadratic,
        evaluated at the goal point."""
        model = self.model
        S = model.state_size
        x_op = self._goal_state()
        u_op = jnp.zeros((model.action_size,), jnp.float32)
        xu = jnp.concatenate([x_op, u_op])

        def z_fn(v):
            return model.transform(v[:S], v[S:])

        J = jax.jacfwd(z_fn)(xu)
        gz = jnp.zeros((model.goal_size,), jnp.float32)
        W = jax.hessian(lambda z: model.state_cost(z, gz))(z_fn(xu)) / 2.0
        Hgn = J.T @ W @ J  # cost ≈ (xu)ᵀ Hgn (xu) around the operating point
        Q = Hgn[:S, :S] if self.Q is None else jnp.asarray(self.Q, jnp.float32)
        R = Hgn[S:, S:] if self.R is None else jnp.asarray(self.R, jnp.float32)
        R = R + 1e-6 * jnp.eye(model.action_size, dtype=jnp.float32)
        Qf = Q if self.Qf is None else jnp.asarray(self.Qf, jnp.float32)
        return Q, R, Qf

    def _goal_state(self):
        if self.goal_x is not None:
            return jnp.asarray(self.goal_x, jnp.float32)
        return jnp.zeros((self.model.state_size,), jnp.float32)

    def init_state(self, key) -> QPMPCState:
        us, key = self._init_plan(key, self.init_std)
        return QPMPCState(us, key)

    def _linearize(self, x, planned_us=None):
        model = self.model
        if self.linearize_at == "plan":
            # LTV mode: re-linearize along the rollout of the previous plan
            # (real-time-iteration SQP style — one Gauss-Newton QP per MPC
            # step, bootstrapped by the receding-horizon warm start). This
            # turns QPMPC from a goal-linearized linear MPC (which cannot
            # plan a swing-up: the goal linearization never sees the
            # hanging-side dynamics) into a competitor on the swing-up
            # tasks, while keeping the convex box-QP solve.
            from ..ops.linearize import linearize_dynamics
            from ..ops.rollout import rollout

            g_dummy = jnp.zeros((self.T, model.goal_size), jnp.float32)
            us = jnp.clip(planned_us, model.lo, model.hi)
            xs, _ = rollout(model, x, us, g_dummy)
            return linearize_dynamics(model, xs[:-1], us)
        x_op = self._goal_state() if self.linearize_at == "goal" else x
        u_op = jnp.zeros((model.action_size,), jnp.float32)
        A = jax.jacfwd(model.dynamics, argnums=0)(x_op, u_op)
        B = jax.jacfwd(model.dynamics, argnums=1)(x_op, u_op)
        c = model.dynamics(x_op, u_op) - A @ x_op - B @ u_op
        T = self.T
        return AffineDynamics(
            jnp.broadcast_to(A, (T, *A.shape)),
            jnp.broadcast_to(B, (T, *B.shape)),
            jnp.broadcast_to(c, (T, *c.shape)),
        )

    def solve(self, state: QPMPCState, x, g_z):
        model = self.model
        key = state.key
        with jax.default_matmul_precision("highest"):
            dyn = self._linearize(x, state.planned_us)
            if self.model_noise_std > 0.0:
                key, k_noise = jax.random.split(key)
                dyn = dyn._replace(
                    c=dyn.c
                    + self.model_noise_std
                    * jax.random.normal(k_noise, dyn.c.shape, jnp.float32)
                )
            Q, R, Qf = self._weights()
            xref = self._goal_state()
            uref = jnp.zeros((model.action_size,), jnp.float32)
            if self.method == "riccati_admm":
                us, _, _, _ = admm_solve_riccati(
                    dyn, x, Q, R, Qf, xref, uref, model.lo, model.hi,
                    rho=self.rho, iters=self.iters, eps=self.eps,
                    parallel_horizon=self.parallel_horizon,
                )
                planned = us
            else:
                qp = condense(
                    dyn, x, Q, R, Qf,
                    xref=xref, uref=uref, u_lo=model.lo, u_hi=model.hi,
                )
                if self.method == "ip":
                    U = ip_solve(qp, iters=self.iters)
                else:
                    U = admm_solve(qp, rho=self.rho, iters=self.iters, eps=self.eps).U
                planned = U.reshape(self.T, model.action_size)
            if self.linearize_at == "plan":
                # globalized RTI step: the QP optimizes the Gauss-Newton
                # model around the previous plan, which can walk uphill in
                # true cost far from the trajectory it linearized; accept
                # full step / half step / keep by true rollout cost
                # (cf. i2c.py line_search, sqp.py merit line search)
                from ..ops.rollout import best_plan_by_rollout_cost

                old = jnp.clip(state.planned_us, model.lo, model.hi)
                cands = jnp.stack(
                    [planned, 0.5 * (planned + old), old], axis=0
                )
                planned = best_plan_by_rollout_cost(model, x, g_z, cands)
        return QPMPCState(planned, key), planned[0], {}

    # -- batched path (fused episode runner, experiment/episode.py) ----------

    def init_state_batch(self, keys) -> QPMPCState:
        if self.init_std > 0.0:
            return jax.vmap(self.init_state)(keys)
        B = keys.shape[0]
        return QPMPCState(
            jnp.zeros((B, self.T, self.model.action_size), jnp.float32), keys
        )

    def solve_batch(self, state: QPMPCState, xs, g_z):
        """Batched solve over B scenarios.

        ``method='riccati_admm'`` (the default, and BASELINE config 2's
        box-QP path) shares the quadratic Riccati factors across the batch
        and all ADMM iterations — each iteration is a linear backward /
        forward affine scan of (B, S) MXU matmuls
        (``ops/qp.py:admm_solve_riccati_batch``); requires the shared
        linearization of ``linearize_at='goal'``.

        ``method='admm'`` runs the blocked Pallas ADMM kernel
        (``ops/qp_pallas.py``): shared-H MXU matvecs at ``'goal'``,
        per-scenario VMEM-resident factorizations for LTV (``'state'``).

        Everything else — 'ip', LTV riccati_admm, and the
        noised-planning-model mode, which needs per-scenario keyed residual
        noise — falls back to a vmapped scalar solve."""
        model = self.model
        if (
            self.method == "riccati_admm"
            and self.linearize_at == "goal"
            and self.model_noise_std == 0.0
        ):
            with jax.default_matmul_precision("highest"):
                dyn = self._linearize(xs[0])  # x ignored at 'goal'
                Q, R, Qf = self._weights()
                us, _, _, _ = admm_solve_riccati_batch(
                    dyn, xs, Q, R, Qf, self._goal_state(),
                    jnp.zeros((model.action_size,), jnp.float32),
                    model.lo, model.hi, rho=self.rho, iters=self.iters,
                    eps=self.eps, parallel_horizon=self.parallel_horizon,
                )
            return QPMPCState(us, state.key), us[:, 0], {}
        if (self.method != "admm" or self.model_noise_std > 0.0
                or self.linearize_at == "plan"):
            return jax.vmap(lambda s, x: self.solve(s, x, g_z))(state, xs)

        from ..ops.qp_pallas import admm_iterate

        B = xs.shape[0]
        with jax.default_matmul_precision("highest"):
            Q, R, Qf = self._weights()
            xref = self._goal_state()
            uref = jnp.zeros((model.action_size,), jnp.float32)
            n = self.T * model.action_size
            eye = jnp.eye(n, dtype=jnp.float32)

            def chol_inv(M):
                # Cholesky-based inverse (= cho_solve against I) so the
                # batched path matches admm_solve's numerics; an explicit
                # inv() amplifies error on the ill-conditioned condensed H
                # (cond up to ~1e14 on unstable plants, see ops/qp.py).
                c = jnp.linalg.cholesky(M)
                return jax.scipy.linalg.cho_solve((c, True), eye)

            if self.linearize_at == "goal":
                dyn = self._linearize(xs[0])  # x ignored at 'goal'
                qp = condense_batch(
                    dyn, xs, Q, R, Qf, xref, uref, model.lo, model.hi
                )
                Minv = chol_inv(qp.H + self.rho * eye)  # (n, n) shared
                g, lo, hi = qp.g, qp.lo, qp.hi
            else:
                qps = jax.vmap(
                    lambda x: condense(
                        self._linearize(x), x, Q, R, Qf,
                        xref=xref, uref=uref, u_lo=model.lo, u_hi=model.hi,
                    )
                )(xs)
                Minv = jax.vmap(chol_inv)(qps.H + self.rho * eye)  # (B, n, n)
                g, lo, hi = qps.g, qps.lo, qps.hi  # full per-scenario bounds
            z = admm_iterate(
                Minv, g, lo, hi, rho=self.rho, alpha=1.6, iters=self.iters
            )
            planned = z.reshape(B, self.T, model.action_size)
        return QPMPCState(planned, state.key), planned[:, 0], {}
