"""CEM — Cross-Entropy Method MPC.

Behavioral parity target: ``MPCBenchmark/agents/cem.py:8-78``. The reference
maps K Gaussian candidate rollouts onto a ``multiprocessing.Pool``
(``cem.py:31,61-64``); here K is a ``vmap`` axis over the fused scan rollout
and the refinement iterations are a ``lax.while_loop`` so the whole solve is
one XLA program.

Semantics:
- per call, std restarts from the configured value (``cem.py:56``) while
  planned_us persists across calls.
- each iteration: sample K sequences ~ N(planned_us, std), clip to bounds,
  score by rollout reward (−cost), keep the n_elite best (``cem.py:58-67``).
- exponential smoothing: new = α·old + (1−α)·elite-stat for both mean and
  std (``cem.py:69-73``).
- early exit when every std entry < ε (``cem.py:75-76``), realized as the
  while_loop predicate (vmapped instances run lock-step with masking).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.rollout import rollout_cost_noisy_samples, rollout_cost_samples
from .base import Solver


class CEMState(NamedTuple):
    planned_us: jnp.ndarray  # (T, A)
    key: jnp.ndarray


@dataclasses.dataclass(frozen=True, eq=False)
class CEM(Solver):
    K: int = 50
    max_iter: int = 5
    n_elite: int = 10
    epsilon: float = 1e-2
    alpha: float = 0.2
    std: float = 1.0
    model_noise_std: float = 0.0  # planning-model noise (noise_tests.py sweeps)

    def init_state(self, key) -> CEMState:
        planned = jnp.zeros((self.T, self.model.action_size), dtype=jnp.float32)
        return CEMState(planned, key)

    def solve(self, state: CEMState, x, g_z):
        model = self.model
        T, A = self.T, model.action_size
        init_std = jnp.full((T, A), self.std, dtype=jnp.float32)

        def cond(carry):
            i, _mean, std, _key = carry
            return jnp.logical_and(i < self.max_iter, ~jnp.all(std < self.epsilon))

        def body(carry):
            i, mean, std, key = carry
            k_sample, key = jax.random.split(key)
            noise = jax.random.normal(k_sample, (self.K, T, A), dtype=jnp.float32)
            samples = jnp.clip(mean[None] + std[None] * noise, model.lo, model.hi)
            if self.model_noise_std > 0.0:
                k_mnoise, key = jax.random.split(key)
                xnoise = self.model_noise_std * jax.random.normal(
                    k_mnoise, (self.K, T, model.state_size), dtype=jnp.float32
                )
                costs, _ = rollout_cost_noisy_samples(model, x, samples, g_z, xnoise)
            else:
                costs, _ = rollout_cost_samples(model, x, samples, g_z)
            # failure guard (cf. mppi.py): a nan-cost candidate (overflowed
            # noisy rollout) is infinitely bad, never elite
            costs = jnp.where(jnp.isfinite(costs), costs, jnp.float32(1e30))
            rewards = -costs
            _, elite_idx = lax.top_k(rewards, self.n_elite)
            elites = samples[elite_idx]  # (n_elite, T, A)
            new_mean = jnp.mean(elites, axis=0)
            new_std = jnp.std(elites, axis=0)
            mean = self.alpha * mean + (1.0 - self.alpha) * new_mean
            std = self.alpha * std + (1.0 - self.alpha) * new_std
            return (i + 1, mean, std, key)

        _, mean, _, key = lax.while_loop(
            cond, body, (jnp.int32(0), state.planned_us, init_std, state.key)
        )
        new_state = CEMState(mean, key)
        return new_state, mean[0], {}

    # -- batched-scenario fast path -------------------------------------------
    def init_state_batch(self, keys) -> CEMState:
        """Batched state from per-scenario keys (B, 2). Identical to
        ``jax.vmap(init_state)`` (which does not consume the key), so the
        batched episode replays the scalar episode seed-for-seed."""
        batch = keys.shape[0]
        planned = jnp.zeros((batch, self.T, self.model.action_size), jnp.float32)
        return CEMState(planned, keys)

    def solve_batch(self, state: CEMState, xs, g_z, use_fused: bool = True):
        """One CEM solve for B scenarios at once on the fused Pallas rollout
        path. All refinement iterations run lock-step for max_iter with
        per-scenario convergence masking (equivalent to the per-scenario
        while_loop early exit); elite statistics are computed with one-hot
        einsum reductions in time-major layout so no (B,K,T) transpose is
        materialized.
        """
        from ..ops.fused import fused_rollout_costs_tm

        model = self.model
        B, S = xs.shape
        K, T, A = self.K, self.T, model.action_size
        if not (use_fused and A == 1):
            st, u0, aux = jax.vmap(lambda s, x: self.solve(s, x, g_z))(state, xs)
            return st, u0, aux
        N = B * K
        x0_tm = jnp.broadcast_to(xs.T[:, :, None], (S, B, K)).reshape(S, N)
        lo, hi = float(model.bounds_low[0]), float(model.bounds_high[0])

        def body(carry, _):
            mean, std, keys, done = carry  # (B,T), (B,T), (B,2) keys, (B,)
            # per-scenario draws (batch on axis 1): a scenario's noise is a
            # function of its key, not its batch slot, so permuting the
            # batch permutes the results
            splits = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
            k_sample, keys = splits[:, 0], splits[:, 1]
            # scalar path's (K, T) draw shape, laid out time-major: same key
            # -> same samples as ``solve`` (tests/test_equivalence.py)
            noise_tm = jax.vmap(
                lambda k: jax.random.normal(k, (K, T), jnp.float32).T, out_axes=1
            )(k_sample)
            samples_tm = jnp.clip(
                mean.T[:, :, None] + std.T[:, :, None] * noise_tm, lo, hi
            )
            costs = fused_rollout_costs_tm(
                model, x0_tm, samples_tm.reshape(T, N), g_z
            ).reshape(B, K)
            costs = jnp.where(jnp.isfinite(costs), costs, jnp.float32(1e30))
            _, elite_idx = lax.top_k(-costs, self.n_elite)  # (B, n_elite)
            mask = jnp.zeros((B, K), jnp.float32).at[
                jnp.arange(B)[:, None], elite_idx
            ].set(1.0 / self.n_elite)
            e_mean = jnp.einsum("bk,tbk->bt", mask, samples_tm)
            e_sq = jnp.einsum("bk,tbk->bt", mask, samples_tm**2)
            e_std = jnp.sqrt(jnp.maximum(e_sq - e_mean**2, 0.0))
            new_mean = self.alpha * mean + (1.0 - self.alpha) * e_mean
            new_std = self.alpha * std + (1.0 - self.alpha) * e_std
            mean = jnp.where(done[:, None], mean, new_mean)
            std = jnp.where(done[:, None], std, new_std)
            done = jnp.logical_or(done, jnp.all(std < self.epsilon, axis=1))
            return (mean, std, keys, done), None

        mean0 = state.planned_us[..., 0]  # (B, T)
        std0 = jnp.full((B, T), self.std, jnp.float32)
        done0 = jnp.zeros((B,), bool)
        (mean, _, keys, _), _ = lax.scan(
            body, (mean0, std0, state.key, done0), None, length=self.max_iter
        )
        new_state = CEMState(mean[:, :, None], keys)
        return new_state, mean[:, :1, None][:, 0], {}

    # -- single-kernel tier (experiment/episode.py:_run_episodes_kernel) -----

    def kernel_ok(self) -> bool:
        """The single-kernel step handles scalar actions with a quad_cost
        stage cost (the shapes ``ops/fused_cem.py`` supports), like MPPI's.
        Planning-model noise has no kernel path — those configs must take
        the two-stage/scalar tiers."""
        return (self.model.action_size == 1
                and hasattr(self.model.state_cost, "W")
                and self.model_noise_std == 0.0)

    def solve_batch_tm(self, planned_tm, xs_tm, g_z, seed):
        """One full CEM refinement (max_iter iterations) for B scenarios as
        a single Pallas kernel launch — in-kernel RNG, rollouts, per-lane
        elite selection and mean/std update with no (B·K)-sized HBM arrays
        (``ops/fused_cem.py``). Time-major plan state; per-call std reset
        (``agents/cem.py:56``) happens inside the kernel.

        Args:
          planned_tm: (T, B) current plan means (action_size == 1).
          xs_tm: (S, B) current states.
          g_z: (T, Z) goal features.
          seed: int32 scalar; vary per MPC step for fresh noise (the
            stream is the kernel's own, like ``solve_batch``'s differs
            from ``solve``'s).

        Returns (new_planned_tm, u0s): (T, B) updated means, (B,) first
        actions (unclipped — callers clip like ``agent.py:64-65,76``).
        """
        from ..ops.fused_cem import fused_cem_step
        from ..ops.fused_mppi import pick_lanes

        lanes = pick_lanes(planned_tm.shape[1])
        planned = fused_cem_step(
            self.model, self.K, self.n_elite, self.max_iter, self.alpha,
            self.std, lanes, planned_tm, xs_tm, g_z, seed
        )
        return planned, planned[0]
