"""Closed-loop episode runner: solver + plant fused into one XLA program.

This is the TPU-native replacement for the reference's Python experiment
loop (``ExperimentCore/Experiment.py:79-99``: per step, time
``agent.predict_action`` then ``env.step``): the whole
``experiment_length``-step episode — including warm start
(``agent.py:30-48``) and every solver-internal iteration — is a single
``lax.scan`` under ``jit``, vmappable over thousands of initial states and
shardable over a device mesh (see ``parallel/``).

The recorded history matches the reference result schema
(``Experiment.py:109-139`` + the env history columns ``env.py:48-49``):
observations, true states, actuated and commanded actions, per-step costs,
plus optional per-step planned trajectories (``agent.py:81-87``) and
warm-start trajectories.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..envs.env import Env, NoiseConfig, env_step
from ..solvers.base import Solver, predict_action, warm_start


class EpisodeResult(NamedTuple):
    observations: jnp.ndarray  # (N, S) post-step observed states (the
    # reference history "state" column, env.py:48-49; step i's solver input
    # is observations[i-1], or x0 at i=0)
    true_states: jnp.ndarray  # (N+1, S) plant states incl. x0
    actions: jnp.ndarray  # (N, A) actuated (noise-injected) actions
    true_actions: jnp.ndarray  # (N, A) commanded actions
    costs: jnp.ndarray  # (N,) plant stage costs
    dones: jnp.ndarray  # (N,) termination predicate per step
    planned_states: Optional[jnp.ndarray]  # (N, T+1, S) per-step plans
    planned_actions: Optional[jnp.ndarray]  # (N, T, A)
    planned_costs: Optional[jnp.ndarray]  # (N,)
    warmstart_trajectories: Optional[jnp.ndarray]  # (W, T, A)

    @property
    def total_cost(self):
        return jnp.sum(self.costs, axis=-1)


@dataclasses.dataclass(frozen=True, eq=False)
class EpisodeConfig:
    n_steps: int = 100  # reference experiment_length
    warmstart: int = 0  # solver iterations before the episode (50 in sweeps)
    noise: NoiseConfig = NoiseConfig()
    record_plans: bool = True  # reference agent logging (agent.py:67-73)
    goal_state: Optional[tuple] = None  # defaults to zeros(S+A) (Experiment.py:81)


def run_episode(
    env: Env, solver: Solver, cfg: EpisodeConfig, key, x0=None
) -> EpisodeResult:
    """Run one closed-loop episode. Pure: jit/vmap/shard_map freely."""
    model = env.model
    x0 = env.start_state if x0 is None else jnp.asarray(x0, jnp.float32)
    goal = (
        jnp.zeros((model.goal_size,), jnp.float32)
        if cfg.goal_state is None
        else jnp.asarray(cfg.goal_state, jnp.float32)
    )
    g_z = jnp.broadcast_to(goal, (solver.T, model.goal_size))

    k_solver, k_env = jax.random.split(key)
    sstate = solver.init_state(k_solver)

    ws_trajs = None
    if cfg.warmstart > 0:
        sstate, ws_trajs = warm_start(solver, sstate, x0, g_z, cfg.warmstart)

    def step(carry, k):
        sstate, x_true, obs = carry
        out = predict_action(solver, sstate, obs, g_z, shift=cfg.record_plans)
        es = env_step(env, k, x_true, out.action, cfg.noise)
        rec = (
            es.observation,
            es.true_state,
            es.action,
            es.true_action,
            es.cost,
            es.done,
            out.planned_xs if cfg.record_plans else None,
            out.planned_us if cfg.record_plans else None,
            out.planned_cost if cfg.record_plans else None,
        )
        return (out.state, es.true_state, es.observation), rec

    keys = jax.random.split(k_env, cfg.n_steps)
    (_, _, _), recs = jax.lax.scan(step, (sstate, x0, x0), keys)
    (obs, true_states, actions, true_actions, costs, dones, pxs, pus, pcs) = recs
    return EpisodeResult(
        observations=obs,
        true_states=jnp.concatenate([x0[None], true_states], axis=0),
        actions=actions,
        true_actions=true_actions,
        costs=costs,
        dones=dones,
        planned_states=pxs,
        planned_actions=pus,
        planned_costs=pcs,
        warmstart_trajectories=ws_trajs,
    )


def run_episodes_batch(env: Env, solver: Solver, cfg: EpisodeConfig, keys, x0s):
    """vmap over a batch of (key, x0) scenarios — the reference's serial
    5-repetition sweep loops (``scripts/sample_test.py:26-51``) collapsed
    into one batched program."""
    return jax.vmap(lambda k, x0: run_episode(env, solver, cfg, k, x0))(keys, x0s)
