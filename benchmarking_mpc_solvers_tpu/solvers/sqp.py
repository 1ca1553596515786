"""SQP nonlinear MPC: repeated linearize → Riccati QP → line search.

New solver family owed by BASELINE.json config 4 ("Acrobot nonlinear MPC
(SQP: repeated linearize + Riccati QP)"). Each SQP iteration:

1. rolls out the current plan and linearizes dynamics / Gauss-Newton
   quadratizes the cost around it (``ops/linearize.py``, one fused vmap),
2. solves the resulting time-varying LQR subproblem in deviation
   coordinates with the Riccati recursion (``ops/riccati.py``) plus a
   Levenberg-style regularization on the value curvature,
3. line-searches the feedback step (all candidate step sizes rolled out in
   parallel via vmap), clipping controls to the box bounds,
4. accepts the best improving candidate; regularization adapts up on
   rejection, down on acceptance.

Fixed iteration counts keep everything jittable; batched instances (vmap)
run lock-step.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.fused_derivs import fused_derivs
from ..ops.fused_linesearch import fused_linesearch, linesearch_applicable
from ..ops.linearize import (
    AffineDynamics,
    QuadCost,
    gn_terminal_terms,
    linearize_dynamics,
    quadratize_cost,
)
from ..ops.riccati import tvlqr_backward, tvlqr_backward_assoc_general
from ..ops.riccati_pallas import (
    pallas_riccati_applicable,
    tvlqr_backward_cv,
    use_pallas_riccati,
)
from ..ops.rollout import rollout, simulate_trajectory, simulate_trajectory_noisy
from .base import Solver


class SQPState(NamedTuple):
    planned_us: jnp.ndarray  # (T, A)
    key: jnp.ndarray


@dataclasses.dataclass(frozen=True, eq=False)
class SQP(Solver):
    max_iter: int = 10
    reg_init: float = 1e-2
    reg_min: float = 1e-8
    reg_max: float = 1e4
    reg_factor: float = 10.0
    n_alphas: int = 8
    tol: float = 1e-6
    # planning-model noise (noise_tests.py model_noise sweeps): rollouts and
    # line-search forward passes get additive state noise, the linearization
    # stays clean at the noisy points — the reference's noisy-predict /
    # clean-closure split (models/model.py:42-43 vs agents/ilqr.py:57-81)
    model_noise_std: float = 0.0
    # solve the Riccati subproblem with the O(log T) associative scan —
    # profitable at long horizons (crossover in scripts/bench_riccati.py)
    parallel_horizon: bool = False
    # batched Riccati subproblem as ONE Pallas kernel launch when the solve
    # is vmapped (ops/riccati_pallas.py). None = auto (TPU backend only).
    pallas_backward: "bool | None" = None
    # init_std > 0 draws the initial plan ~ N(0, init_std) (clipped to the
    # box) instead of zeros — the swing-up tasks start at symmetric
    # equilibria where a zero plan has zero gradient and Gauss-Newton can
    # never leave (the reference's iLQR breaks the symmetry the same way,
    # agents/ilqr.py:90-91). Default 0 keeps solves deterministic.
    init_std: float = 0.0

    def init_state(self, key) -> SQPState:
        us, key = self._init_plan(key, self.init_std)
        return SQPState(us, key)

    @property
    def alphas(self):
        return 0.5 ** jnp.arange(self.n_alphas, dtype=jnp.float32)

    def _derivs_cv(self, xs, us, g_z):
        """linearize + GN-quadratize with a ``custom_vmap`` rule: batched
        solves compute every (scenario, timestep) derivative in ONE Pallas
        launch (``ops/fused_derivs.py``) instead of dozens of small
        XLA-fused autodiff kernels (the dominant stage of the batched SQP
        iteration — PROFILE_SQP_r04.json); unbatched solves keep the
        vmapped closed-form quadratize. The terminal expansion (one point
        per scenario) uses the shared closed form
        (``ops/linearize.gn_terminal_terms``) on both paths."""
        model = self.model
        S = model.state_size

        def scan_derivs(xs, us, g_z):
            dyn = linearize_dynamics(model, xs[:-1], us)
            cost = quadratize_cost(model, xs, us, g_z, gauss_newton=True)
            return tuple(dyn) + tuple(cost)

        @jax.custom_batching.custom_vmap
        def dv(xs, us, g_z):
            return scan_derivs(xs, us, g_z)

        @dv.def_vmap
        def _rule(axis_size, in_batched, xs_b, us_b, g_z_):
            bc = lambda a, b: (  # noqa: E731
                a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            )
            if in_batched[2]:
                # per-scenario goals don't fit the kernel's shared-SMEM g_z
                out = jax.vmap(scan_derivs)(
                    bc(xs_b, in_batched[0]), bc(us_b, in_batched[1]), g_z_
                )
                return out, tuple(True for _ in out)
            xs_b, us_b = bc(xs_b, in_batched[0]), bc(us_b, in_batched[1])
            A, Bd, c, Q, R, M, q, r = fused_derivs(model, xs_b, us_b, g_z_)
            # terminal expansion: one point per scenario, closed form
            qf, Qf = jax.vmap(lambda x: gn_terminal_terms(model, x, g_z_[-1]))(
                xs_b[:, -1]
            )
            return (A, Bd, c, Q, R, M, q, r, Qf, qf), tuple(
                True for _ in range(10)
            )

        out = dv(xs, us, g_z)
        return AffineDynamics(*out[:3]), QuadCost(*out[3:])

    def _subproblem(self, xs, us, g_z, reg):
        """Gauss-Newton TV-LQR step in deviation coordinates; returns the
        affine deviation policy δu = K δx + k."""
        if use_pallas_riccati(self.pallas_backward) and linesearch_applicable(
            self.model
        ):
            dyn, cost = self._derivs_cv(xs, us, g_z)
        else:
            dyn = linearize_dynamics(self.model, xs[:-1], us)
            cost = quadratize_cost(self.model, xs, us, g_z, gauss_newton=True)
        # deviation dynamics are homogeneous (residual c = 0 at the rollout)
        dyn = dyn._replace(c=jnp.zeros_like(dyn.c))
        cost = cost._replace(
            R=cost.R + reg * jnp.eye(self.model.action_size, dtype=jnp.float32)[None]
        )
        if self.parallel_horizon:
            return tvlqr_backward_assoc_general(dyn, cost)
        if use_pallas_riccati(self.pallas_backward) and pallas_riccati_applicable(
            self.model.state_size, self.model.action_size
        ):
            return tvlqr_backward_cv(dyn, cost)
        return tvlqr_backward(dyn, cost, reg=0.0)

    def _try_step(self, alpha, policy, xs, us, g_z, xnoise=None):
        """Closed-loop forward application of the deviation policy. Returns
        ``(us_new, xs_new, cost)`` — the realized trajectory travels back so
        the accepting caller can adopt it without re-simulating."""
        model = self.model
        if xnoise is None:
            xnoise = jnp.zeros((self.T, model.state_size), jnp.float32)

        def step(carry, inp):
            x, cost = carry
            u, K, k, x_ref, gz, nz = inp
            u_new = u + alpha * k + K @ (x - x_ref)
            u_new = jnp.clip(u_new, model.lo, model.hi)
            x_next, c = model.step_and_cost(x, u_new, gz)
            return (x_next + nz, cost + c), (u_new, x_next + nz)

        (x_last, cost), (us_new, xs_tail) = lax.scan(
            step,
            (xs[0], jnp.zeros((), jnp.float32)),
            (us, policy.K, policy.k, xs[:-1], g_z, xnoise),
        )
        xs_new = jnp.concatenate([xs[:1], xs_tail], axis=0)
        # terminal cost keeps the line-search objective consistent with the
        # quadratized subproblem (unlike the reference iLQR, whose forward
        # pass drops it — ilqr.py:340-350)
        return us_new, xs_new, cost + model.final_cost(x_last, g_z[-1])

    def linesearch_cv(self, policy, xs, us, g_z):
        """All-alpha line search; under vmap every (alpha, scenario)
        candidate runs in ONE fused Pallas feedback-rollout launch
        (``ops/fused_linesearch.py``, with the terminal cost the SQP
        objective includes); unbatched solves keep the scan. Returns
        ``(uss, xss, costs)`` — candidate trajectories included, so the
        accepted one replaces the next iteration's nominal rollout."""
        # alphas travels as an ARGUMENT, never a closure: this runs inside
        # the solve's scan-body trace, where even constant arithmetic yields
        # body-trace tracers — a closure would leak them into the vmap rule,
        # which executes under a different trace.
        def scan_ls(alphas, k, K, xs, us, g_z):
            from ..ops.riccati import TVLQRPolicy

            pol = TVLQRPolicy(K=K, k=k)
            return jax.vmap(lambda a: self._try_step(a, pol, xs, us, g_z))(alphas)

        @jax.custom_batching.custom_vmap
        def ls(alphas, k, K, xs, us, g_z):
            return scan_ls(alphas, k, K, xs, us, g_z)

        @ls.def_vmap
        def _rule(axis_size, in_batched, alphas, *args):
            bc = lambda a, b: (  # noqa: E731
                a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            )
            assert not in_batched[0], "alphas is a per-solver constant"
            if in_batched[5]:
                # per-scenario goals don't fit the kernel's shared-SMEM g_z
                uss, xss, costs = jax.vmap(
                    lambda k2, K2, x2, u2, g2: scan_ls(alphas, k2, K2, x2, u2, g2)
                )(*(bc(a, f) for a, f in zip(args, in_batched[1:])))
                return (uss, xss, costs), (True, True, True)
            k_b, K_b, xs_b, us_b = (
                bc(a, f) for a, f in zip(args[:4], in_batched[1:5])
            )
            uss, xss, costs = fused_linesearch(
                self.model, alphas, xs_b[:, 0], us_b, k_b, K_b, xs_b,
                args[4], with_terminal=True, return_states=True,
            )
            return (
                jnp.swapaxes(uss, 0, 1),
                jnp.swapaxes(xss, 0, 1),
                jnp.swapaxes(costs, 0, 1),
            ), (True, True, True)

        return ls(self.alphas, policy.k, policy.K, xs, us, g_z)

    def solve(self, state: SQPState, x, g_z):
        with jax.default_matmul_precision("highest"):
            return self._solve(state, x, g_z)

    def _solve(self, state: SQPState, x, g_z):
        if self.model_noise_std > 0.0:
            return self._solve_noisy(state, x, g_z)
        model = self.model
        alphas = self.alphas

        # nominal rollout ONCE; thereafter the accepted line-search
        # candidate's realized trajectory (streamed out of the fused kernel)
        # replaces it, removing the per-iteration sequential T-step scan —
        # the iteration's only remaining scan-shaped stage
        xs0, cost0 = simulate_trajectory(model, x, state.planned_us, g_z)
        cost0 = cost0 + model.final_cost(xs0[-1], g_z[-1])

        def body(carry, _):
            us, xs, cost, reg, done = carry
            policy = self._subproblem(xs, us, g_z, reg)
            if use_pallas_riccati(self.pallas_backward) and linesearch_applicable(
                self.model
            ):
                cand_us, cand_xs, cand_costs = self.linesearch_cv(
                    policy, xs, us, g_z
                )
            else:
                cand_us, cand_xs, cand_costs = jax.vmap(
                    lambda a: self._try_step(a, policy, xs, us, g_z)
                )(alphas)
            best = jnp.argmin(cand_costs)
            best_cost = cand_costs[best]
            improved = best_cost < cost - self.tol * jnp.abs(cost)
            accept = jnp.logical_and(improved, ~done)
            us = jnp.where(accept, cand_us[best], us)
            xs = jnp.where(accept, cand_xs[best], xs)
            cost = jnp.where(accept, best_cost, cost)
            reg = jnp.where(
                accept,
                jnp.maximum(reg / self.reg_factor, self.reg_min),
                jnp.minimum(reg * self.reg_factor, self.reg_max),
            )
            done = jnp.logical_or(done, ~improved)
            return (us, xs, cost, reg, done), None

        (us, _, _, _, _), _ = lax.scan(
            body,
            (state.planned_us, xs0, cost0, jnp.float32(self.reg_init),
             jnp.bool_(False)),
            None,
            length=self.max_iter,
        )
        us = jnp.clip(us, model.lo, model.hi)
        return SQPState(us, state.key), us[0], {}

    def _solve_noisy(self, state: SQPState, x, g_z):
        """model_noise path: the nominal rollout and every line-search
        forward pass draw fresh state noise per iteration (the reference's
        noisy ``model.predict``), so trajectories cannot be reused."""
        model = self.model
        alphas = self.alphas

        def body(carry, _):
            us, reg, done, key = carry
            key, k_sim, k_fwd = jax.random.split(key, 3)
            nz_sim = self.model_noise_std * jax.random.normal(
                k_sim, (self.T, model.state_size), jnp.float32
            )
            xs, cost = simulate_trajectory_noisy(model, x, us, g_z, nz_sim)
            cost = cost + model.final_cost(xs[-1], g_z[-1])
            policy = self._subproblem(xs, us, g_z, reg)
            nz_fwd = self.model_noise_std * jax.random.normal(
                k_fwd, (self.n_alphas, self.T, model.state_size), jnp.float32
            )
            cand_us, _cand_xs, cand_costs = jax.vmap(
                lambda a, nz: self._try_step(a, policy, xs, us, g_z, nz)
            )(alphas, nz_fwd)
            best = jnp.argmin(cand_costs)
            best_cost = cand_costs[best]
            improved = best_cost < cost - self.tol * jnp.abs(cost)
            accept = jnp.logical_and(improved, ~done)
            us = jnp.where(accept, cand_us[best], us)
            reg = jnp.where(
                accept,
                jnp.maximum(reg / self.reg_factor, self.reg_min),
                jnp.minimum(reg * self.reg_factor, self.reg_max),
            )
            done = jnp.logical_or(done, ~improved)
            return (us, reg, done, key), None

        (us, _, _, key), _ = lax.scan(
            body,
            (state.planned_us, jnp.float32(self.reg_init), jnp.bool_(False),
             state.key),
            None,
            length=self.max_iter,
        )
        us = jnp.clip(us, model.lo, model.hi)
        return SQPState(us, key), us[0], {}
