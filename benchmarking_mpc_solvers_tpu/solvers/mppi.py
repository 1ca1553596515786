"""MPPI — Model-Predictive Path Integral control.

Behavioral parity target: ``MPCBenchmark/agents/mppi.py:7-75``. The
reference evaluates K perturbed rollouts in a ``multiprocessing.Pool``
(``mppi.py:24,55-57``); here the K samples are a ``vmap`` axis fused with the
horizon ``lax.scan`` into one XLA program (or the Pallas fused kernel in
``ops/``), so one chip evaluates K×B rollouts in a single launch.

Semantics:
- per-sample cost = Σ_t stage_cost(x_t, u_t) + λ uₜᵀ Σ⁻¹ δuₜ with
  u = planned + δ and Σ = diag(std²)  (``mppi.py:36-48``; pinv(std²) = 1/std²
  for the reference's scalar std).
- softmax weights with baseline β = min cost: w ∝ exp(−(c−β)/λ)
  (``mppi.py:59-62``).
- update planned_us += Σ_k w_k δu_k. The reference's accumulation
  (``mppi.py:64-69``) sums over *all* axes of w·δuᵀ[:,t] which is only
  correct for action_size == 1; we implement the correct einsum (identical
  for the 1-D actions all reference systems have).
- quirk flag: the reference samples δu once in ``__init__`` and reuses it
  every step (``mppi.py:20-21``). ``resample=True`` (our default) redraws per
  step; ``resample=False`` reproduces the reference behavior.
- actions in the rollout are NOT clipped (clipping is commented out at
  ``mppi.py:42``) — the physical models clip internally where the reference
  ones do.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.rollout import rollout_cost_noisy_samples, rollout_cost_samples
from .base import Solver


class MPPIState(NamedTuple):
    planned_us: jnp.ndarray  # (T, A)
    delta_u: jnp.ndarray  # (K, T, A) fixed perturbations (compat mode)
    key: jnp.ndarray


@dataclasses.dataclass(frozen=True, eq=False)
class MPPI(Solver):
    K: int = 100
    std: float = 1.0
    lam: float = 1.0
    resample: bool = True  # False = reference's sample-once quirk
    model_noise_std: float = 0.0  # planning-model noise (noise_tests.py sweeps)

    def init_state(self, key) -> MPPIState:
        k_delta, key = jax.random.split(key)
        A = self.model.action_size
        planned = jnp.zeros((self.T, A), dtype=jnp.float32)
        delta = self.std * jax.random.normal(
            k_delta, (self.K, self.T, A), dtype=jnp.float32
        )
        return MPPIState(planned, delta, key)

    def solve(self, state: MPPIState, x, g_z):
        model = self.model
        if self.resample:
            k_delta, key = jax.random.split(state.key)
            delta_u = self.std * jax.random.normal(
                k_delta, (self.K, self.T, model.action_size), dtype=jnp.float32
            )
        else:
            delta_u, key = state.delta_u, state.key

        samples = state.planned_us[None] + delta_u  # (K, T, A)
        if self.model_noise_std > 0.0:
            k_noise, key = jax.random.split(key)
            xnoise = self.model_noise_std * jax.random.normal(
                k_noise, (self.K, self.T, model.state_size), dtype=jnp.float32
            )
            roll_costs, _ = rollout_cost_noisy_samples(model, x, samples, g_z, xnoise)
        else:
            roll_costs, _ = rollout_cost_samples(model, x, samples, g_z)
        # control penalty λ Σ_t uₜᵀ Σ⁻¹ δuₜ, Σ = diag(std²)
        ctrl = self.lam * jnp.einsum("kta,kta->k", samples, delta_u) / (self.std**2)
        costs = roll_costs + ctrl
        # failure guard: a candidate whose simulated trajectory overflowed
        # (Euler instability under heavy model noise -> sin(inf)=nan) is
        # infinitely bad — score it 1e30 so it gets zero weight instead of
        # poisoning min/softmax with nan (observed in the noise_tests sweep)
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.float32(1e30))

        beta = jnp.min(costs)
        w = jax.nn.softmax(-(costs - beta) / self.lam)
        planned = state.planned_us + jnp.einsum("k,kta->ta", w, delta_u)

        new_state = MPPIState(planned, state.delta_u, key)
        return new_state, planned[0], {"sample_costs": costs}

    # -- batched-scenario fast path -------------------------------------------
    def init_state_batch(self, keys) -> MPPIState:
        """Batched state from per-scenario keys (B, 2). Mirrors
        ``init_state``'s key split so the batched path reproduces the
        per-scenario path bit-for-bit; the delta placeholder is (1,1,1)
        (the compat sample-once mode stays on the per-scenario path)."""
        batch = keys.shape[0]
        keys = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
        planned = jnp.zeros((batch, self.T, self.model.action_size), jnp.float32)
        return MPPIState(planned, jnp.zeros((batch, 1, 1, 1), jnp.float32), keys)

    def solve_batch(self, state: MPPIState, xs, g_z, use_fused: bool = True):
        """One MPPI step for B scenarios at once.

        Everything is *time-major*: perturbations are drawn per scenario
        (vmapped threefry over the per-scenario keys, batch on axis 1) so a
        scenario's noise stream — and therefore its result — is a function
        of its key alone, not its batch slot: permuting the batch permutes
        the outputs. The (T, B, K) draws feed the fused Pallas kernel
        (``ops/fused.py``) with no transposes. Same update law as ``solve``
        with ``resample=True`` and the SAME noise stream as the scalar path:
        identical per-scenario keys give identical controls (up to rollout
        summation-order f32 rounding) — asserted by
        ``tests/test_equivalence.py``.

        state fields carry a leading (B,) axis; xs is (B, S).
        """
        from ..ops.fused import fused_rollout_costs_tm

        model = self.model
        B, S = xs.shape
        K, T, A = self.K, self.T, model.action_size
        N = B * K
        keys = jax.vmap(jax.random.split)(state.key)  # (B, 2, 2)
        k_delta, key = keys[:, 0], keys[:, 1]

        if use_fused and A == 1:
            # draw in the scalar path's (K, T) shape then lay out time-major:
            # same key -> the SAME perturbations as ``solve``, so the fused
            # path is seed-replay-equivalent to the gated scalar path
            # (tests/test_equivalence.py); the transpose fuses into the
            # threefry kernel's output layout
            delta_tm = self.std * jax.vmap(
                lambda k: jax.random.normal(k, (K, T), jnp.float32).T, out_axes=1
            )(k_delta).reshape(T, N)
            planned_tm = state.planned_us[..., 0].T  # (T, B)
            us_tm = (
                jnp.broadcast_to(planned_tm[:, :, None], (T, B, K)).reshape(T, N)
                + delta_tm
            )
            x0_tm = jnp.broadcast_to(xs.T[:, :, None], (S, B, K)).reshape(S, N)
            roll = fused_rollout_costs_tm(model, x0_tm, us_tm, g_z).reshape(B, K)
            ctrl = (
                self.lam
                * jnp.einsum("tn,tn->n", us_tm, delta_tm).reshape(B, K)
                / self.std**2
            )
            costs = roll + ctrl
            costs = jnp.where(jnp.isfinite(costs), costs, jnp.float32(1e30))
            beta = jnp.min(costs, axis=1, keepdims=True)
            w = jax.nn.softmax(-(costs - beta) / self.lam, axis=1)
            upd = jnp.einsum("bk,tbk->bt", w, delta_tm.reshape(T, B, K))
            planned = state.planned_us + upd[:, :, None]
        else:
            delta = self.std * jax.vmap(
                lambda k: jax.random.normal(k, (K, T, A), jnp.float32)
            )(k_delta)
            samples = state.planned_us[:, None] + delta
            roll = jax.vmap(
                lambda x, s: rollout_cost_samples(model, x, s, g_z)[0]
            )(xs, samples)
            ctrl = self.lam * jnp.einsum("bkta,bkta->bk", samples, delta) / self.std**2
            costs = roll + ctrl
            costs = jnp.where(jnp.isfinite(costs), costs, jnp.float32(1e30))
            beta = jnp.min(costs, axis=1, keepdims=True)
            w = jax.nn.softmax(-(costs - beta) / self.lam, axis=1)
            planned = state.planned_us + jnp.einsum("bk,bkta->bta", w, delta)

        new_state = MPPIState(planned, state.delta_u, key)
        return new_state, planned[:, 0], {"sample_costs": costs}

    def kernel_ok(self) -> bool:
        """True when the single-kernel MPPI step applies: scalar action and
        a quad_cost stage cost (the shapes ``ops/fused_mppi.py`` handles).
        Planning-model noise has no kernel path — those configs must take
        the two-stage/scalar tiers."""
        return (self.model.action_size == 1
                and hasattr(self.model.state_cost, "W")
                and self.model_noise_std == 0.0)

    def solve_batch_tm(self, planned_tm, xs_tm, g_z, seed):
        """One MPPI step for B scenarios as a single Pallas kernel launch —
        in-kernel RNG, rollouts, softmax and plan update with no (B·K)-sized
        HBM arrays (``ops/fused_mppi.py``). Time-major plan state.

        Args:
          planned_tm: (T, B) current plans (action_size == 1).
          xs_tm: (S, B) current states.
          g_z: (T, Z) goal features.
          seed: int32 scalar; vary per MPC step for fresh noise
            (= ``resample=True`` semantics; the noise stream is the
            kernel's own, like ``solve_batch``'s differs from ``solve``'s).

        Returns (new_planned_tm, u0s): (T, B) updated plans, (B,) first
        actions (unclipped — callers clip like ``agent.py:64-65,76``).
        """
        from ..ops.fused_mppi import fused_mppi_step, pick_lanes

        lanes = pick_lanes(planned_tm.shape[1])
        planned = fused_mppi_step(
            self.model, self.K, self.std, self.lam, lanes, planned_tm, xs_tm, g_z, seed
        )
        return planned, planned[0]
