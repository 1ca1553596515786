"""Experiment runner — capability parity with the reference ``Experiment``.

Mirrors ``MPCBenchmark/ExperimentCore/Experiment.py:8-158``: one (or a
batch of) closed-loop rollout(s) of a (env, solver, config), returning a
results dict with the same schema (``Experiment.py:109-139``): name,
per-step computation_time, passed_time, env states/actions/costs, noise
metadata, warm-start trajectories, and the per-step planning histories.

TPU-first deltas:
- the whole episode is one jitted program (see ``episode.py``), so per-step
  wall-clock is measured either as steady-state amortized time (default;
  compile excluded) or faithfully per step with ``timed_per_step=True``
  (step-granular jit calls, like the reference's ``time.time()`` loop,
  ``Experiment.py:79-99``).
- ``repetitions`` runs as one vmapped batch instead of a serial python loop
  (``scripts/sample_test.py:26-51`` runs 5 reps serially).
- solver configs use the reference's parameter names (K, T, max_iter,
  n_elite, epsilon, alpha, std, lam, threshold, closed_loop).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.env import Env, NoiseConfig, REGISTRY as ENV_REGISTRY
from ..solvers import CEM, I2C, ILQR, MPPI, QPMPC, SQP
from .episode import EpisodeConfig, run_episode

SOLVER_REGISTRY = {"CEM": CEM, "MPPI": MPPI, "ILQR": ILQR, "QPMPC": QPMPC, "SQP": SQP, "I2C": I2C}

# reference param name -> our field name, per solver
_PARAM_MAP = {
    "CEM": {"K": "K", "T": "T", "max_iter": "max_iter", "n_elite": "n_elite",
            "epsilon": "epsilon", "alpha": "alpha", "std": "std"},
    "MPPI": {"K": "K", "T": "T", "std": "std", "lam": "lam"},
    "ILQR": {"T": "T", "max_iter": "max_iter", "threshold": "threshold",
             "closed_loop": "closed_loop",
             # extensions beyond the reference's param set (ilqr.py:52-55):
             # numerics/backward-pass variants, sweepable like any other knob
             "diag_hessian": "diag_hessian", "ddp": "ddp", "box_ddp": "box_ddp",
             "gauss_newton": "gauss_newton",
             "reference_accept": "reference_accept"},
    "QPMPC": {"T": "T", "max_iter": "iters", "method": "method", "rho": "rho",
              "linearize_at": "linearize_at", "init_std": "init_std"},
    "SQP": {"T": "T", "max_iter": "max_iter", "init_std": "init_std"},
    "I2C": {"T": "T", "max_iter": "max_iter", "alpha0": "alpha0",
            "anneal": "anneal", "alpha_max": "alpha_max",
            "sigma_u": "sigma_u", "init_std": "init_std",
            "line_search": "line_search", "prior_lag": "prior_lag"},
}


def make_solver(name: str, model, config: Dict[str, Any], **extra):
    """Build a solver from a reference-style config dict (``cem.py:20-29``,
    ``mppi.py:12-17``, ``ilqr.py:52-55`` param names)."""
    cls = SOLVER_REGISTRY[name]
    pmap = _PARAM_MAP[name]
    kwargs = {pmap[k]: v for k, v in config.items() if k in pmap}
    kwargs.update(extra)
    return cls(model=model, **kwargs)


class Experiment:
    """One benchmark configuration; ``run()`` executes it.

    params keys (reference ``Experiment.py:12-34``):
      env: Env instance or registry name
      agent: solver name ("CEM" | "MPPI" | "ILQR" | "QPMPC" | "SQP")
      agent_config: dict with reference-style parameter names
      experiment_length: int
      start_state: array
      actuation_noise / sensor_noise: float stds (0 = off)
      model_noise: bool — inject sensor_noise into the planning model
      seed: int
      repetitions: int — batch of independent episodes (vmapped)
    """

    def __init__(self, params: Dict[str, Any]):
        env = params["env"]
        self.env: Env = ENV_REGISTRY[env] if isinstance(env, str) else env
        self.agent_name: str = params["agent"]
        self.agent_config: Dict[str, Any] = dict(params["agent_config"])
        self.experiment_length: int = params["experiment_length"]
        self.start_state = np.asarray(params["start_state"], np.float32).reshape(-1)
        self.actuation_noise_std = float(params.get("actuation_noise", 0) or 0)
        self.sensor_noise_std = float(params.get("sensor_noise", 0) or 0)
        self.model_is_noised = bool(params.get("model_noise", False))
        self.seed = int(params.get("seed", 0))
        self.repetitions = int(params.get("repetitions", 1))
        self.timed_per_step = bool(params.get("timed_per_step", False))
        # fused=True runs the repetition batch through run_episodes_fused
        # instead of vmapped run_episode; the fused path records plans and
        # warm starts too, so the results dict is schema-identical. On TPU
        # MPPI/CEM dispatch to their single-kernel tier, which has its own
        # RNG stream by design; the two-stage fused path (use_kernel=False)
        # is seed-replay-identical to the vmapped path
        # (tests/test_equivalence.py). The study sweeps use fused=False.
        self.fused = bool(params.get("fused", False))
        self.params = params
        self.experiment_results: Optional[Dict[str, Any]] = None

    # -- construction ---------------------------------------------------------
    def _build(self):
        extra = {}
        if self.model_is_noised:
            # every solver plans through the noised model, like the reference
            # (Experiment.py:58-60 noises the shared planning model for
            # whichever agent runs — CEM, MPPI, and iLQR alike)
            extra["model_noise_std"] = self.sensor_noise_std
        solver = make_solver(self.agent_name, self.env.model, self.agent_config, **extra)
        noise = NoiseConfig(
            actuation_std=self.actuation_noise_std, sensor_std=self.sensor_noise_std
        )
        return solver, noise

    # -- execution ------------------------------------------------------------
    def _run_timed_per_step(self, solver, noise, warmstart: int):
        """Faithful per-step latency mode: one jitted predict_action + one
        jitted env step per loop iteration with wall-clock timing around the
        solve, exactly like the reference loop (``Experiment.py:79-99``).
        Slower end-to-end (host round-trip per step) but gives true
        per-step solve latencies instead of an amortized mean."""
        from ..envs.env import env_step
        from ..solvers.base import predict_action, warm_start as do_warm_start

        env = self.env
        model = env.model
        g_z = jnp.broadcast_to(
            jnp.zeros((model.goal_size,), jnp.float32), (solver.T, model.goal_size)
        )
        key = jax.random.PRNGKey(self.seed)
        k_solver, k_env = jax.random.split(key)
        sstate = solver.init_state(k_solver)
        ws_trajs = None
        if warmstart > 0:
            warm = jax.jit(
                lambda st, x: do_warm_start(solver, st, x, g_z, warmstart)
            )
            sstate, ws_trajs = warm(sstate, jnp.asarray(self.start_state))

        predict = jax.jit(lambda st, x: predict_action(solver, st, x, g_z))
        step_env = jax.jit(lambda k, x, u: env_step(env, k, x, u, noise))

        # warm the compile caches off the clock
        _ = jax.block_until_ready(predict(sstate, jnp.asarray(self.start_state)))

        x_true = obs = jnp.asarray(self.start_state)
        computation_time = []
        records = []
        keys = jax.random.split(k_env, self.experiment_length)
        for i in range(self.experiment_length):
            t0 = time.perf_counter()
            out = jax.block_until_ready(predict(sstate, obs))
            computation_time.append(round(time.perf_counter() - t0, 6))
            sstate = out.state
            es = step_env(keys[i], x_true, out.action)
            x_true, obs = es.true_state, es.observation
            records.append((obs, es, out))

        model = self.env.model
        passed_time = round(float(np.sum(computation_time)), 6)
        out_dict: Dict[str, Any] = {
            "name": f"{self.agent_name} solving {self.env.name} with {model.name}"
            f"\n Starting from {self.start_state} Time: {passed_time}",
            "computation_time": computation_time,
            "timing_mode": "per_step",  # true wall-clock per solve
            "passed_time": passed_time,
            "compile_time": 0.0,
            "warmstart": warmstart > 0,
            "warmstart_trajectories": np.asarray(ws_trajs)
            if ws_trajs is not None
            else np.zeros((0, solver.T, model.action_size), np.float32),
            "env_name": self.env.name,
            "model_name": model.name,
            "agent_name": self.agent_name,
            "agent_config": self.agent_config,
            "env_start_state": self.start_state.tolist(),
            "env_states": np.stack([np.asarray(r[0]) for r in records]),
            "env_actions": np.stack([np.asarray(r[1].action) for r in records]),
            "env_costs": np.array([float(r[1].cost) for r in records]),
            "actuation_noise": self.actuation_noise_std > 0,
            "sensor_noise": self.sensor_noise_std > 0,
            "model_noise": self.model_is_noised,
            "agent_planning_states": np.stack([np.asarray(r[2].planned_xs) for r in records]),
            "agent_planning_actions": np.stack([np.asarray(r[2].planned_us) for r in records]),
            "agent_planning_costs": np.array([float(r[2].planned_cost) for r in records]),
            "repetitions": 1,
        }
        if self.sensor_noise_std > 0:
            out_dict["env_true_states"] = np.stack([np.asarray(r[1].true_state) for r in records])
            out_dict["sensor_noise_std"] = self.sensor_noise_std
        if self.actuation_noise_std > 0:
            out_dict["env_true_actions"] = np.stack([np.asarray(r[1].true_action) for r in records])
            out_dict["actuation_noise_std"] = self.actuation_noise_std
        self.experiment_results = out_dict
        return out_dict

    def run(self, warmstart: Optional[int] = None) -> Dict[str, Any]:
        solver, noise = self._build()
        if self.timed_per_step:
            return self._run_timed_per_step(solver, noise, warmstart or 0)
        cfg = EpisodeConfig(
            n_steps=self.experiment_length,
            warmstart=warmstart or 0,
            noise=noise,
            record_plans=True,
        )
        x0 = jnp.asarray(self.start_state)
        keys = jax.random.split(jax.random.PRNGKey(self.seed), self.repetitions)

        if self.fused:
            from .episode import run_episodes_fused

            x0s = jnp.tile(x0, (self.repetitions, 1))
            fn = jax.jit(
                lambda ks: run_episodes_fused(self.env, solver, cfg, ks, x0s)
            )
        else:
            fn = jax.jit(
                jax.vmap(lambda k: run_episode(self.env, solver, cfg, k, x0))
            )
        t_compile0 = time.perf_counter()
        res = jax.block_until_ready(fn(keys))
        compile_and_run = time.perf_counter() - t_compile0
        t0 = time.perf_counter()
        res = jax.block_until_ready(fn(keys))
        steady = time.perf_counter() - t0

        per_step = steady / self.experiment_length
        # NOTE: amortized — a synthetic constant series (episode total / N),
        # not true per-step latencies; see "timing_mode" below and use
        # timed_per_step=True for faithful per-step wall-clock.
        computation_time = [round(per_step, 6)] * self.experiment_length
        passed_time = round(steady, 6)

        r0 = jax.tree.map(lambda a: np.asarray(a[0]), res)  # first repetition
        model = self.env.model
        name = (
            f"{self.agent_name} solving {self.env.name} with {model.name}"
            f"\n Starting from {self.start_state} Time: {passed_time}"
        )
        out: Dict[str, Any] = {
            "name": name,
            "computation_time": computation_time,
            "timing_mode": "amortized",  # constant synthetic series, see above
            "passed_time": passed_time,
            "compile_time": round(compile_and_run - steady, 3),
            "warmstart": bool(cfg.warmstart),
            "warmstart_trajectories": np.asarray(r0.warmstart_trajectories)
            if r0.warmstart_trajectories is not None
            else np.zeros((0, solver.T, model.action_size), np.float32),
            "env_name": self.env.name,
            "model_name": model.name,
            "agent_name": self.agent_name,
            "agent_config": self.agent_config,
            "env_start_state": self.start_state.tolist(),
            "env_states": np.asarray(r0.observations),
            "env_actions": np.asarray(r0.actions),
            "env_costs": np.asarray(r0.costs),
            "actuation_noise": self.actuation_noise_std > 0,
            "sensor_noise": self.sensor_noise_std > 0,
            "model_noise": self.model_is_noised,
            "agent_planning_states": np.asarray(r0.planned_states),
            "agent_planning_actions": np.asarray(r0.planned_actions),
            "agent_planning_costs": np.asarray(r0.planned_costs),
            # batched extras (all repetitions) — beyond reference parity
            "batch_costs": np.asarray(res.costs),
            "batch_total_costs": np.asarray(res.costs.sum(axis=-1)),
            "repetitions": self.repetitions,
        }
        if self.sensor_noise_std > 0:
            out["env_true_states"] = np.asarray(r0.true_states[1:])
            out["sensor_noise_std"] = self.sensor_noise_std
        if self.actuation_noise_std > 0:
            out["env_true_actions"] = np.asarray(r0.true_actions)
            out["actuation_noise_std"] = self.actuation_noise_std
        self.experiment_results = out
        return out

    def __call__(self, warmstart: Optional[int] = None) -> Dict[str, Any]:
        return self.run(warmstart=warmstart)
