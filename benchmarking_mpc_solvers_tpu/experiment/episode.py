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
from ..ops.rollout import simulate_trajectory
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


def run_episodes_fused(env: Env, solver, cfg: EpisodeConfig, keys, x0s,
                       use_kernel: bool = True):
    """Batched closed-loop episodes on the fused Pallas path.

    Requires a solver exposing ``solve_batch`` / ``init_state_batch``
    (currently MPPI): the B scenarios' K-sample rollouts flatten into one
    Pallas kernel launch per MPC step instead of a vmapped scan — the
    headline solves/s path (bench.py). When the solver additionally exposes
    the single-kernel time-major step (``solve_batch_tm`` + ``kernel_ok``,
    MPPI on TPU), the *entire* MPPI update — RNG, rollouts, softmax, plan
    update — runs as one kernel per MPC step with no (B·K)-sized HBM
    arrays (``ops/fused_mppi.py``; ~3.4x the two-stage path). Semantics
    match ``run_episode`` with resampled perturbations.

    With ``cfg.record_plans`` the reference-schema planning histories
    (``agent.py:67-73,81-87``) and warm-start trajectories
    (``agent.py:30-48``) ARE materialized on both fused tiers: one extra
    batched nominal rollout per MPC step (vs the K sample rollouts of the
    solve itself), so ``plot_experiment(plot_planning=True)`` works from a
    fused-path run at fused speed.
    """
    model = env.model
    B = x0s.shape[0]
    if use_kernel and getattr(solver, "kernel_ok", None) and solver.kernel_ok():
        return _run_episodes_kernel(env, solver, cfg, keys, x0s)
    # from here: the two-stage path, which replays the vmapped-scalar
    # episode seed-for-seed (tests/test_equivalence.py)
    goal = (
        jnp.zeros((model.goal_size,), jnp.float32)
        if cfg.goal_state is None
        else jnp.asarray(cfg.goal_state, jnp.float32)
    )
    g_z = jnp.broadcast_to(goal, (solver.T, model.goal_size))

    k_all = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
    k_env = k_all[:, 1]
    sstates = solver.init_state_batch(k_all[:, 0])

    def warm(carry, _):
        sstates = carry
        sstates, _, _ = solver.solve_batch(sstates, x0s, g_z)
        sstates = sstates._replace(
            planned_us=jnp.clip(sstates.planned_us, model.lo, model.hi)
        )
        # the reference records each warm-start plan (agent.py:30-48)
        return sstates, sstates.planned_us if cfg.record_plans else None

    ws_trajs = None
    if cfg.warmstart > 0:
        sstates, ws = jax.lax.scan(warm, sstates, None, length=cfg.warmstart)
        if cfg.record_plans:
            ws_trajs = jnp.swapaxes(ws, 0, 1)  # (B, W, T, A)

    batched_env_step = jax.vmap(lambda k, x, u: env_step(env, k, x, u, cfg.noise))
    batched_sim = jax.vmap(
        lambda x, us: simulate_trajectory(model, x, us, g_z)
    )

    def step(carry, keys_t):
        sstates, x_true, obs = carry
        sstates, u0s, _ = solver.solve_batch(sstates, obs, g_z)
        planned = jnp.clip(sstates.planned_us, model.lo, model.hi)
        if cfg.record_plans:
            # simulate the plan for logging, then receding-horizon shift
            # (agent.py:67-73) — exactly predict_action's semantics
            pxs, pcs = batched_sim(obs, planned)
            shifted = jnp.roll(planned, -1, axis=1).at[:, -1].set(0.0)
            sstates = sstates._replace(planned_us=shifted)
        else:
            pxs = pcs = None
            sstates = sstates._replace(planned_us=planned)
        actions = jnp.clip(u0s, model.lo, model.hi)
        es = batched_env_step(keys_t, x_true, actions)
        rec = (es.observation, es.true_state, es.action, es.true_action,
               es.cost, es.done, pxs, planned if cfg.record_plans else None, pcs)
        return (sstates, es.true_state, es.observation), rec

    keys_t = jax.vmap(lambda k: jax.random.split(k, cfg.n_steps))(k_env)
    keys_t = jnp.swapaxes(keys_t, 0, 1)  # (N, B, key)
    (_, _, _), recs = jax.lax.scan(step, (sstates, x0s, x0s), keys_t)
    obs, true_states, actions, true_actions, costs, dones, pxs, pus, pcs = recs
    sw = lambda a: None if a is None else jnp.swapaxes(a, 0, 1)  # noqa: E731
    return EpisodeResult(
        observations=jnp.swapaxes(obs, 0, 1),
        true_states=jnp.concatenate(
            [x0s[:, None], jnp.swapaxes(true_states, 0, 1)], axis=1
        ),
        actions=jnp.swapaxes(actions, 0, 1),
        true_actions=jnp.swapaxes(true_actions, 0, 1),
        costs=jnp.swapaxes(costs, 0, 1),
        dones=jnp.swapaxes(dones, 0, 1),
        planned_states=sw(pxs),
        planned_actions=sw(pus),
        planned_costs=sw(pcs),
        warmstart_trajectories=ws_trajs,
    )


def _run_episodes_kernel(env: Env, solver, cfg: EpisodeConfig, keys, x0s):
    """Single-kernel episode path: one ``solve_batch_tm`` launch per MPC
    step, plan state carried time-major (T, B) so no per-step transposes of
    the big array; only the (B, S) states transpose each step (a few KB)."""
    model = env.model
    B = x0s.shape[0]
    goal = (
        jnp.zeros((model.goal_size,), jnp.float32)
        if cfg.goal_state is None
        else jnp.asarray(cfg.goal_state, jnp.float32)
    )
    g_z = jnp.broadcast_to(goal, (solver.T, model.goal_size))
    lo, hi = float(model.bounds_low[0]), float(model.bounds_high[0])

    k_all = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
    k_env = k_all[:, 1]
    # solver noise comes from the kernel's on-core PRNG: one fresh int32
    # seed per solver invocation (warm-start iterations + episode steps)
    seeds = jax.random.randint(
        k_all[0, 0], (cfg.warmstart + cfg.n_steps,), -(2**31), 2**31 - 1, jnp.int32
    )

    planned_tm = jnp.zeros((solver.T, B), jnp.float32)
    x0s_tm = x0s.T

    def warm(planned_tm, seed):
        planned_tm, _ = solver.solve_batch_tm(planned_tm, x0s_tm, g_z, seed)
        planned_tm = jnp.clip(planned_tm, lo, hi)
        return planned_tm, planned_tm.T[..., None] if cfg.record_plans else None

    ws_trajs = None
    if cfg.warmstart > 0:
        planned_tm, ws = jax.lax.scan(warm, planned_tm, seeds[: cfg.warmstart])
        if cfg.record_plans:
            ws_trajs = jnp.swapaxes(ws, 0, 1)  # (B, W, T, 1)

    batched_env_step = jax.vmap(lambda k, x, u: env_step(env, k, x, u, cfg.noise))
    batched_sim = jax.vmap(lambda x, us: simulate_trajectory(model, x, us, g_z))

    def step(carry, inputs):
        planned_tm, x_true, obs = carry
        keys_t, seed = inputs
        planned_tm, u0s = solver.solve_batch_tm(planned_tm, obs.T, g_z, seed)
        planned_tm = jnp.clip(planned_tm, lo, hi)
        if cfg.record_plans:
            planned = planned_tm.T[..., None]  # (B, T, 1)
            pxs, pcs = batched_sim(obs, planned)
            # receding-horizon shift (agent.py:72-73), time-major
            planned_next = jnp.roll(planned_tm, -1, axis=0).at[-1].set(0.0)
        else:
            pxs = pcs = planned = None
            planned_next = planned_tm
        actions = jnp.clip(u0s, lo, hi)[:, None]  # (B, A=1)
        es = batched_env_step(keys_t, x_true, actions)
        rec = (es.observation, es.true_state, es.action, es.true_action,
               es.cost, es.done, pxs, planned, pcs)
        return (planned_next, es.true_state, es.observation), rec

    keys_t = jax.vmap(lambda k: jax.random.split(k, cfg.n_steps))(k_env)
    keys_t = jnp.swapaxes(keys_t, 0, 1)  # (N, B, key)
    _, recs = jax.lax.scan(
        step, (planned_tm, x0s, x0s), (keys_t, seeds[cfg.warmstart :])
    )
    obs, true_states, actions, true_actions, costs, dones, pxs, pus, pcs = recs
    sw = lambda a: None if a is None else jnp.swapaxes(a, 0, 1)  # noqa: E731
    return EpisodeResult(
        observations=jnp.swapaxes(obs, 0, 1),
        true_states=jnp.concatenate(
            [x0s[:, None], jnp.swapaxes(true_states, 0, 1)], axis=1
        ),
        actions=jnp.swapaxes(actions, 0, 1),
        true_actions=jnp.swapaxes(true_actions, 0, 1),
        costs=jnp.swapaxes(costs, 0, 1),
        dones=jnp.swapaxes(dones, 0, 1),
        planned_states=sw(pxs),
        planned_actions=sw(pus),
        planned_costs=sw(pcs),
        warmstart_trajectories=ws_trajs,
    )
