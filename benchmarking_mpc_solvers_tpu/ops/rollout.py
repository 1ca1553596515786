"""Horizon rollout engine.

Replaces the reference's three per-sample sequential Python rollout loops
(``agents/agent.py:97-108`` ``simulate_trajectory``, ``agents/cem.py:43-48``
``CEM.f``, ``agents/mppi.py:36-48`` ``MPPI.f`` — each dispatched to a
``multiprocessing.Pool``) with a single ``lax.scan`` that XLA fuses on-chip.
Sample parallelism is ``jax.vmap`` (one chip), scenario parallelism is a
sharded batch axis (see ``parallel/``).

Cost convention matches the reference: stage cost evaluated at the current
``(x, u)`` *before* the dynamics step (``models/model.py:31-38``), total
trajectory cost = Σ stage costs (``agent.py:102-107`` accumulates
``-reward``). Terminal cost is NOT added (the reference rollouts don't add
it either — ``cem.py:43-48``, ``mppi.py:48`` has it commented out).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..models.base import Model


def rollout(model: Model, x0, us, g_z):
    """Roll a single action sequence through the model.

    Args:
      model: pure-function model.
      x0: (S,) initial state.
      us: (T, A) action sequence.
      g_z: (T, Z) goal feature trajectory.

    Returns:
      xs: (T+1, S) state trajectory including x0.
      costs: (T,) per-step stage costs.
    """

    def step(x, inp):
        u, gz = inp
        x_next, c = model.step_and_cost(x, u, gz)
        return x_next, (x_next, c)

    _, (xs, costs) = lax.scan(step, x0, (us, g_z))
    return jnp.concatenate([x0[None], xs], axis=0), costs


def rollout_cost(model: Model, x0, us, g_z):
    """Total cost only (no trajectory) — cheaper carry for sampling solvers."""

    def step(carry, inp):
        x, acc = carry
        u, gz = inp
        x_next, c = model.step_and_cost(x, u, gz)
        return (x_next, acc + c), None

    (x_last, total), _ = lax.scan(step, (x0, jnp.zeros((), x0.dtype)), (us, g_z))
    return total, x_last


# Batched variants: samples (K) and/or scenarios (B) via vmap.
# rollout_batch: (B, S), (B, T, A) -> (B, T+1, S), (B, T)
rollout_batch = jax.vmap(rollout, in_axes=(None, 0, 0, None))
# rollout_cost_samples: (S,), (K, T, A) -> (K,), (K, S)
rollout_cost_samples = jax.vmap(rollout_cost, in_axes=(None, None, 0, None))


def rollout_cost_noisy(model: Model, x0, us, g_z, xnoise):
    """Rollout with additive per-step state noise.

    Reproduces the reference's planning-model sensor noise
    (``models/model.py:42-43``: each ``predict`` adds N(0, std) to the next
    state), used by the ``model_noise`` robustness sweeps
    (``scripts/noise_tests.py:44``). ``xnoise`` is (T, S) pre-sampled noise.
    """

    def step(carry, inp):
        x, acc = carry
        u, gz, nz = inp
        x_next, c = model.step_and_cost(x, u, gz)
        return (x_next + nz, acc + c), None

    (x_last, total), _ = lax.scan(
        step, (x0, jnp.zeros((), x0.dtype)), (us, g_z, xnoise)
    )
    return total, x_last


# (K,T,A) samples with per-sample noise (K,T,S)
rollout_cost_noisy_samples = jax.vmap(
    rollout_cost_noisy, in_axes=(None, None, 0, None, 0)
)


def rollout_noisy(model: Model, x0, us, g_z, xnoise):
    """Full-trajectory rollout with additive per-step state noise (T, S).

    The trajectory counterpart of ``rollout_cost_noisy`` — used by the
    derivative solvers (iLQR/SQP/I2C) when the *planning model* is noised
    (reference: every ``model.predict`` in ``Agent.simulate_trajectory`` /
    ``forward_pass`` adds N(0, std) to the next state when
    ``Experiment.py:58-60`` calls ``model.set_sensor_noise``; the derivative
    closures bypass ``predict`` and stay clean, ``agents/ilqr.py:57-81``).
    """

    def step(x, inp):
        u, gz, nz = inp
        x_next, c = model.step_and_cost(x, u, gz)
        x_next = x_next + nz
        return x_next, (x_next, c)

    _, (xs, costs) = lax.scan(step, x0, (us, g_z, xnoise))
    return jnp.concatenate([x0[None], xs], axis=0), costs


def simulate_trajectory_noisy(model: Model, x0, us, g_z, xnoise):
    """Noisy-planning-model variant of ``simulate_trajectory``."""
    xs, costs = rollout_noisy(model, x0, us, g_z, xnoise)
    return xs, jnp.sum(costs)


def simulate_trajectory(model: Model, x0, us, g_z):
    """(xs, total_cost) — the reference ``Agent.simulate_trajectory`` contract
    (``agents/agent.py:97-108``: returns states and −Σreward)."""
    xs, costs = rollout(model, x0, us, g_z)
    return xs, jnp.sum(costs)


def best_plan_by_rollout_cost(model: Model, x, g_z, candidates):
    """Pick the candidate plan with the lowest true rollout cost.

    ``candidates``: (C, T, A) stack of plans; non-finite costs lose. The
    shared merit-selection step of the solvers' line searches (I2C's
    backtracked smoothing acceptance, QPMPC's globalized LTV/RTI step) —
    one implementation so the inf-guard and tie behavior stay identical."""

    def plan_cost(us):
        _, cs = rollout(model, x, us, g_z)
        return jnp.sum(cs)

    costs = jax.vmap(plan_cost)(candidates)
    costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
    return candidates[jnp.argmin(costs)]
