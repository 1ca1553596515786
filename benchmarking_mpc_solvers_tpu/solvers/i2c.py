"""i2c — Input Inference for Control (optimal control as Gaussian inference).

The reference intended a fourth solver family built on its Kalman /
cubature / quadrature estimation stack but never finished it
(``MPCBenchmark/agents/i2c.py`` is a 0-byte file; the building blocks live
in ``MPCBenchmark/i2c/``). This is a working implementation of the
linear-Gaussian i2c recursion (Watson, Abdulsamad & Peters' input-inference
formulation): trajectory optimization as iterated Bayesian smoothing.

Formulation per iteration, around the current nominal (x̄, ū):

- augmented latent ξ_t = (x_t, u_t) with dynamics prior
      ξ_{t+1} = F_t ξ_t + m_t + w,  F_t = [[A_t, B_t], [0, 0]],
      m_t = (c_t, ū_t),  w ~ N(0, blockdiag(εI, Σ_u)),
  i.e. the control is an independent latent with prior N(ū_t, Σ_u)
  (linearization A_t, B_t, c_t from ``ops/linearize``).
- "optimality" pseudo-observation of the cost features:
      y_t = g_t observed through z(ξ) ≈ J_t ξ + z0_t with Gaussian noise
      R = (2α W̃)⁻¹,  W̃ = W + εI — the exp(−α·cost) likelihood moment-matched
      at the linearization point; α is the annealing temperature.
- a time-varying Kalman filter + RTS smoother over ξ gives the posterior;
  the smoothed control means become the next nominal: ū ← E[u | y=g].

As α → ∞ on an LQ problem the fixed point is the LQR optimum (validated in
tests); on nonlinear systems the iteration is a Gauss-Newton-like method
with built-in exploration covariances. Everything is scans over the
horizon under jit, vmappable over scenarios, f32-precision guarded.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.i2c_pallas import i2c_smooth_batch
from ..ops.linearize import linearize_dynamics
from ..ops.riccati_pallas import use_pallas_riccati
from ..ops.rollout import best_plan_by_rollout_cost, rollout, rollout_noisy
from .base import Solver


class I2CState(NamedTuple):
    planned_us: jnp.ndarray  # (T, A) nominal controls
    key: jnp.ndarray


@dataclasses.dataclass(frozen=True, eq=False)
class I2C(Solver):
    max_iter: int = 10
    alpha0: float = 1.0  # initial optimality temperature
    anneal: float = 1.5  # per-iteration temperature growth
    alpha_max: float = 100.0  # cap: in f32 the (2αW)⁻¹ observation noise
    # degenerates past ~1e2 and the smoother walks away from the optimum
    sigma_u: float = 0.5  # control prior std
    eps_w: float = 1e-5  # cost-weight ridge (W is usually singular)
    eps_x: float = 1e-6  # state process-noise floor
    # planning-model noise (noise_tests.py model_noise sweeps): the nominal
    # rollout the smoother linearizes around gets additive state noise — the
    # reference's noisy model.predict (models/model.py:42-43)
    model_noise_std: float = 0.0
    # batched KF + RTS smoothing as two Pallas launches when the solve is
    # vmapped (ops/i2c_pallas.py). None = auto (TPU backend only).
    pallas_smoother: "bool | None" = None
    # init_std > 0: random initial plan ~ N(0, init_std) clipped to the box
    # (symmetric-equilibrium escape, cf. sqp.py init_std / the reference
    # iLQR's N(0, bounds_high) init). Default 0 = zeros (deterministic).
    init_std: float = 0.0
    # backtracked acceptance of each smoothing step on the true rollout
    # cost; candidate step sizes along (us_new - us), 0.0 = keep the old
    # plan. See solve().
    line_search: bool = True
    ls_steps: tuple = (1.0, 0.5, 0.0)
    # prior_lag=True sets the control-prior mean carried by m_t to ū_t
    # instead of ū_{t+1} (see _smooth_once): the one-step lag phase-shifts
    # the prior against oscillatory plans and acts as control-rate damping.
    # On pendulum swing-up that damping kills energy pumping (the r4
    # T>=25 quality collapse), but on cartpole swing-up — where the
    # optimal plan rides the +-1 actuation box and the x^10 track-edge
    # cost punishes overshoot — it measurably stabilizes long-horizon
    # MPC (T=50 median 199 vs ~480 without it, scripts/new_solver_sweep.py).
    prior_lag: bool = False

    def init_state(self, key) -> I2CState:
        us, key = self._init_plan(key, self.init_std)
        return I2CState(us, key)

    # -- one smoothing iteration ------------------------------------------------
    def _smooth_once(self, x0, us, g_z, alpha, xnoise=None):
        model = self.model
        S, A = model.state_size, model.action_size
        D = S + A
        T = self.T

        if xnoise is None:
            xs, _ = rollout(model, x0, us, g_z)
        else:
            xs, _ = rollout_noisy(model, x0, us, g_z, xnoise)
        dyn = linearize_dynamics(model, xs[:-1], us)

        # feature observation model z(ξ) ≈ J ξ + z0 at the nominal
        def z_lin(x, u):
            xu = jnp.concatenate([x, u])

            def zf(v):
                return model.transform(v[:S], v[S:])

            J = jax.jacfwd(zf)(xu)
            z0 = zf(xu) - J @ xu
            return J, z0

        Js, z0s = jax.vmap(z_lin)(xs[:-1], us)  # (T, Z, D), (T, Z)

        W = jnp.asarray(model.state_cost.W, jnp.float32)
        Z = W.shape[0]
        R = jnp.linalg.inv(2.0 * alpha * (W + self.eps_w * jnp.eye(Z)))

        F = jnp.zeros((T, D, D), jnp.float32)
        F = F.at[:, :S, :S].set(dyn.A).at[:, :S, S:].set(dyn.B)
        # predict step t produces ξ_{t+1}, so the control-prior mean carried
        # by m_t is ū_{t+1} (last row repeats ū_{T-1}; that prediction is
        # unobserved). prior_lag=True uses ū_t instead — a one-step lag
        # that damps oscillatory plans (see the field comment; it froze
        # pendulum swing-up at T>=25 in the r4 study, VERDICT r4 weak #1,
        # but is the better regularizer on cartpole).
        if self.prior_lag:
            us_prior = us
        else:
            us_prior = jnp.concatenate([us[1:], us[-1:]], axis=0)
        m = jnp.concatenate([dyn.c, us_prior], axis=1)  # (T, D)

        # prior at t=0: x0 known (tight), u_0 ~ N(ū_0, Σ_u)
        mu0 = jnp.concatenate([x0, us[0]])

        mu_smooth = self._kf_rts_cv(F, m, Js, z0s, R, mu0, g_z)
        return mu_smooth[:, S:]  # smoothed control means

    def _prior_covs(self):
        """(sig0, Q_proc) from the static solver constants."""
        S, A = self.model.state_size, self.model.action_size
        D = S + A
        Q_proc = jnp.zeros((D, D), jnp.float32)
        Q_proc = Q_proc.at[:S, :S].set(self.eps_x * jnp.eye(S))
        Q_proc = Q_proc.at[S:, S:].set(self.sigma_u**2 * jnp.eye(A))
        sig0 = jnp.zeros((D, D), jnp.float32)
        sig0 = sig0.at[:S, :S].set(1e-8 * jnp.eye(S))
        sig0 = sig0.at[S:, S:].set(self.sigma_u**2 * jnp.eye(A))
        return sig0, Q_proc

    def _kf_rts(self, F, m, Js, z0s, R, mu0, g_z):
        """Forward KF + backward RTS over the augmented chain (scan path);
        returns smoothed means (T, D)."""
        sig0, Q_proc = self._prior_covs()

        def update(mu_p, sig_p, J, z0, g):
            sig_y = J @ sig_p @ J.T + R
            L = jnp.linalg.solve(sig_y.T, (sig_p @ J.T).T).T
            mu_f = mu_p + L @ (g - (J @ mu_p + z0))
            sig_f = sig_p - L @ J @ sig_p
            return mu_f, 0.5 * (sig_f + sig_f.T)

        # forward filter over t = 0..T-1 (observation then predict)
        def fstep(carry, inp):
            mu_p, sig_p = carry
            F_t, m_t, J_t, z0_t, g_t = inp
            mu_f, sig_f = update(mu_p, sig_p, J_t, z0_t, g_t)
            mu_n = F_t @ mu_f + m_t
            sig_n = F_t @ sig_f @ F_t.T + Q_proc
            return (mu_n, sig_n), (mu_f, sig_f, mu_n, sig_n)

        (_, _), (mu_f, sig_f, mu_pred, sig_pred) = lax.scan(
            fstep, (mu0, sig0), (F, m, Js, z0s, g_z)
        )

        # backward RTS over the augmented chain
        def bstep(carry, inp):
            mu_next, sig_next = carry
            mu_ft, sig_ft, mu_pt, sig_pt, F_t = inp
            G = jnp.linalg.solve(sig_pt.T, (sig_ft @ F_t.T).T).T
            mu_s = mu_ft + G @ (mu_next - mu_pt)
            sig_s = sig_ft + G @ (sig_next - sig_pt) @ G.T
            return (mu_s, sig_s), mu_s

        init = (mu_f[-1], sig_f[-1])
        per_t = (mu_f[:-1], sig_f[:-1], mu_pred[:-1], sig_pred[:-1], F[:-1])
        (_, _), mu_s = lax.scan(bstep, init, per_t, reverse=True)
        return jnp.concatenate([mu_s, mu_f[-1][None]], axis=0)  # (T, D)

    def _kf_rts_cv(self, F, m, Js, z0s, R, mu0, g_z):
        """KF+RTS with a ``custom_vmap`` rule: batched solves run the whole
        filter and smoother as two Pallas launches (``ops/i2c_pallas.py``)
        instead of vmapped scans of per-step ``linalg.solve`` kernels;
        unbatched solves keep the scans."""
        if not use_pallas_riccati(self.pallas_smoother):
            return self._kf_rts(F, m, Js, z0s, R, mu0, g_z)

        def scan_kf(F, m, Js, z0s, R, mu0, g_z):
            return self._kf_rts(F, m, Js, z0s, R, mu0, g_z)

        @jax.custom_batching.custom_vmap
        def kf(F, m, Js, z0s, R, mu0, g_z):
            return scan_kf(F, m, Js, z0s, R, mu0, g_z)

        @kf.def_vmap
        def _rule(axis_size, in_batched, *args):
            bc = lambda a, b: (  # noqa: E731
                a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            )
            if in_batched[6]:
                # per-scenario goals don't fit the kernel's shared-SMEM g_z
                out = jax.vmap(scan_kf)(
                    *(bc(a, f) for a, f in zip(args, in_batched))
                )
                return out, True
            Fb, mb, Jb, z0b, Rb, mu0b = (
                bc(a, f) for a, f in zip(args[:6], in_batched[:6])
            )
            sig0, Q_proc = self._prior_covs()
            return (
                i2c_smooth_batch(Fb, mb, Jb, z0b, Rb, mu0b, sig0, Q_proc,
                                 args[6]),
                True,
            )

        return kf(F, m, Js, z0s, R, mu0, g_z)

    def solve(self, state: I2CState, x, g_z):
        model = self.model
        with jax.default_matmul_precision("highest"):

            def body(carry, _):
                us, alpha, key = carry
                if self.model_noise_std > 0.0:
                    key, k_noise = jax.random.split(key)
                    nz = self.model_noise_std * jax.random.normal(
                        k_noise, (self.T, model.state_size), jnp.float32
                    )
                    us_new = self._smooth_once(x, us, g_z, alpha, nz)
                else:
                    us_new = self._smooth_once(x, us, g_z, alpha)
                # failure guard (cf. iLQR's Cholesky-NaN handling): if the
                # smoother diverges (inf linearization Jacobians at
                # far-out-of-envelope states under heavy model noise), keep
                # the previous plan instead of adopting a nan one
                us_new = jnp.where(
                    jnp.all(jnp.isfinite(us_new)), us_new, us
                )
                us_new = jnp.clip(us_new, model.lo, model.hi)
                if self.line_search:
                    # backtracked acceptance on the true rollout cost (the
                    # smoother optimizes a moment-matched surrogate and can
                    # walk uphill in true cost — on pendulum swing-up the
                    # surrogate fixpoint at T>=25 is a swing-damping plan;
                    # cf. SQP's merit-function line search, solvers/sqp.py).
                    # On LQ problems the full step always wins and the
                    # fixed point is unchanged (tests/test_i2c.py).
                    cands = jnp.stack(
                        [us + g * (us_new - us) for g in self.ls_steps],
                        axis=0,
                    )
                    us_new = best_plan_by_rollout_cost(model, x, g_z, cands)
                alpha = jnp.minimum(alpha * self.anneal, self.alpha_max)
                return (us_new, alpha, key), None

            (us, _, key), _ = lax.scan(
                body,
                (state.planned_us, jnp.float32(self.alpha0), state.key),
                None,
                length=self.max_iter,
            )
        return I2CState(us, key), us[0], {}
