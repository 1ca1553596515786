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
