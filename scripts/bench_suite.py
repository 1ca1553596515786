"""BASELINE.json benchmark suite — one JSON line per configuration.

Configs (BASELINE.json "configs"):
 1. Pendulum swing-up, linear MPC, horizon 20, single condensed QP (ADMM)
 2. Cartpole stabilization, QP MPC horizon 50, box input constraints, closed loop
 3. Cartpole swing-up via iLQR/DDP, horizon 100, batched over 1k initial states
 4. Acrobot nonlinear MPC (SQP), horizon 100
 5. Multi-solver benchmark sweep (all six solver families) x scenarios
    sharded over the mesh
 6. I2C (input-inference-for-control) pendulum swing-up — the solver family
    the reference left as a 0-byte stub (MPCBenchmark/agents/i2c.py)

Each line reports:
- solves_per_sec: throughput, slope-timed (see bench.py for why the slope —
  this environment's tunnel runtime has ~30 ms RTT per dispatch).
- p50/p90_step_latency_ms: DEVICE-SIDE per-step solve latency percentiles,
  RTT-free: each measurement chains n closed-loop MPC steps (solve for all
  B scenarios + plant step) inside ONE dispatch at two chain lengths; the
  paired difference cancels the per-dispatch constant (utils/profiling.py
  device_step_latency). Round 3's per-dispatch wall clocks were floored at
  the tunnel's ~30 ms RTT for every config (VERDICT r3 weak #5) and carried
  no information; these percentiles are consistent with the amortized mean
  by construction and distinguish the configs.
- amortized_step_ms: slope-timed episode time / n_steps (the round-2 number
  formerly mislabeled "p50").
- episode_cost, constraint_violation (max box violation of commanded u).
"""

import json

import numpy as np
from _common import std_parser  # noqa: F401  (sys.path setup)

import jax
import jax.numpy as jnp
from jax import lax

from benchmarking_mpc_solvers_tpu.envs import (
    CartPoleSwingUpEnv,
    AcrobotEnv,
    PendulumEnv,
)
from benchmarking_mpc_solvers_tpu.envs.env import env_step
from benchmarking_mpc_solvers_tpu.experiment import EpisodeConfig, run_episode
from benchmarking_mpc_solvers_tpu.solvers import CEM, I2C, ILQR, MPPI, QPMPC, SQP
from benchmarking_mpc_solvers_tpu.solvers.base import predict_action
from benchmarking_mpc_solvers_tpu.utils import device_step_latency, slope_timer


def violation(actions, lo, hi):
    a = np.asarray(actions)
    return float(np.maximum(np.maximum(a - hi, lo - a), 0.0).max())


def report(name, solves_per_sec, lat, cost, viol, extra=None):
    p50, p90, amort = lat
    print(
        json.dumps(
            {
                "config": name,
                # null = the slope timer could not resolve the runtime above
                # measurement noise (short quick-mode runs), NOT zero time
                "solves_per_sec": None if solves_per_sec is None else round(solves_per_sec, 1),
                # device-side per-step percentiles (RTT cancelled pairwise)
                "p50_step_latency_ms": None if p50 is None else round(p50, 4),
                "p90_step_latency_ms": None if p90 is None else round(p90, 4),
                # RTT-free slope-amortized mean (round 2's "p50" column)
                "amortized_step_ms": None if amort is None else round(amort, 4),
                "episode_cost": round(cost, 2),
                "constraint_violation": viol,
                **(extra or {}),
            }
        )
    )


def timed_per_call(fn, inner_reps, outer_reps):
    """Slope-timed seconds per call, or None when the measurement is
    noise-dominated (non-positive slope) and therefore unresolvable."""
    per_call = slope_timer(fn, inner_reps=inner_reps, outer_reps=outer_reps)
    return per_call if per_call > 1e-6 else None


def make_step_fn(env, solver, cfg, B, fused=False):
    """One batched MPC step (solve all B scenarios + plant step) as a plain
    traceable callable, for per-step latency measurement."""
    model = env.model
    g_z = jnp.zeros((solver.T, model.goal_size), jnp.float32)

    if fused:
        def init(key, x0s):
            k_all = jax.vmap(jax.random.split)(jax.random.split(key, B))
            return (solver.init_state_batch(k_all[:, 0]), x0s)

        def one(carry, keys_t):
            ss, obs = carry
            ss, u0s, _ = solver.solve_batch(ss, obs, g_z)
            acts = jnp.clip(u0s, model.lo, model.hi)
            es = jax.vmap(lambda k, x, u: env_step(env, k, x, u, cfg.noise))(
                keys_t, obs, acts
            )
            return (ss, es.observation), jnp.sum(es.observation)
    else:
        def init(key, x0s):
            return (jax.vmap(solver.init_state)(jax.random.split(key, B)), x0s)

        def one(carry, keys_t):
            ss, obs = carry
            out = jax.vmap(
                lambda s, x: predict_action(solver, s, x, g_z, shift=False)
            )(ss, obs)
            es = jax.vmap(lambda k, x, u: env_step(env, k, x, u, cfg.noise))(
                keys_t, obs, out.action
            )
            return (out.state, es.observation), jnp.sum(es.observation)

    return init, one


def step_latency_dist(env, solver, cfg, B, x0s, fused=False, n=30):
    """(p50_ms, p90_ms) of DEVICE-SIDE per-step solve latency: paired
    chained-scan dispatches cancel the tunnel RTT (see
    utils/profiling.device_step_latency). ``n`` scales the sample count."""
    init, one = make_step_fn(env, solver, cfg, B, fused=fused)
    carry = init(jax.random.PRNGKey(7), x0s)
    keys = jnp.stack(
        [jax.random.split(k, B) for k in jax.random.split(jax.random.PRNGKey(8), 8)]
    )
    return device_step_latency(one, carry, keys, samples=max(4, n // 2))


def episode_metrics(env, solver, cfg, B, quick, inner=None, x0s=None):
    """Batched episodes: slope-timed solves/s + true p50/p90 + cost +
    feasibility.

    The timed runs jitter x0 by a key-dependent 1e-3 perturbation —
    deterministic solvers (QP/SQP) are otherwise key-independent and XLA
    CSEs the n-repetition scan into a single episode, zeroing the slope.
    """
    x0s = jnp.tile(env.start_state, (B, 1)) if x0s is None else x0s

    def run(key, jitter=False):
        keys = jax.random.split(key, B)
        x0 = x0s + (1e-3 * jax.random.normal(key, x0s.shape) if jitter else 0.0)
        res = jax.vmap(lambda k, x0_: run_episode(env, solver, cfg, k, x0_))(keys, x0)
        return res

    def scalar_fn(key):
        return run(key, jitter=True).costs.sum()

    per_call = timed_per_call(scalar_fn,
                              inner_reps=inner or (3 if quick else 9),
                              outer_reps=1 if quick else 3)
    res = jax.jit(run)(jax.random.PRNGKey(0))
    solves = B * cfg.n_steps / per_call if per_call else None
    amort_ms = per_call / cfg.n_steps * 1e3 if per_call else None
    p50, p90 = step_latency_dist(env, solver, cfg, B, x0s,
                                 n=5 if quick else 30)
    cost = float(np.median(np.asarray(res.costs.sum(axis=-1))))
    viol = violation(res.true_actions, float(env.model.lo[0]), float(env.model.hi[0]))
    return solves, (p50, p90, amort_ms), cost, viol


def main():
    args = std_parser(__doc__).parse_args()
    q = args.quick

    # 1. pendulum linear MPC T=20, condensed dense ADMM (stable system)
    env = PendulumEnv
    solver = QPMPC(model=env.model, T=10 if q else 20, method="admm",
                   iters=20 if q else 100)
    cfg = EpisodeConfig(n_steps=5 if q else 50, record_plans=False)
    # the batched dense-ADMM episode is faster than tunnel timing noise at
    # small repetition counts; long inner scans make the slope resolvable
    s, lat, c, v = episode_metrics(env, solver, cfg, B=8 if q else 512, quick=q,
                                   inner=None if q else 81)
    report("pendulum linear MPC T=20 condensed ADMM", s, lat, c, v)

    # 2. cartpole stabilization, QP MPC T=50, box constraints, closed loop
    env = CartPoleSwingUpEnv
    solver = QPMPC(
        model=env.model, T=10 if q else 50, iters=20 if q else 60,
        goal_x=(0.0, 0.0, 0.0, 0.0),
        Q=((0.5, 0, 0, 0), (0, 0.1, 0, 0), (0, 0, 5.0, 0), (0, 0, 0, 0.5)),
        R=((0.1,),),
    )
    cfg = EpisodeConfig(n_steps=5 if q else 40, record_plans=False)
    # perturbed near-upright starts
    B = 8 if q else 256
    x0s = jnp.tile(jnp.array([0.3, 0.0, 0.4, 0.0], jnp.float32), (B, 1))

    def run2(key, jitter=False):
        # batched path: one shared Riccati factorization, linear-scan ADMM
        # iterations over the whole batch (ops/qp.py:admm_solve_riccati_batch)
        from benchmarking_mpc_solvers_tpu.experiment import run_episodes_fused

        keys = jax.random.split(key, B)
        x0 = x0s + (1e-3 * jax.random.normal(key, x0s.shape) if jitter else 0.0)
        return run_episodes_fused(env, solver, cfg, keys, x0)

    per_call = timed_per_call(lambda k: run2(k, True).costs.sum(),
                              inner_reps=3 if q else 7, outer_reps=1 if q else 2)
    res = jax.jit(run2)(jax.random.PRNGKey(0))
    p50_2, p90_2 = step_latency_dist(env, solver, cfg, B, x0s, fused=True,
                                     n=5 if q else 30)
    final_theta = float(np.abs(np.asarray(res.true_states[:, -1, 2])).max())
    report(
        "cartpole stabilization QP MPC T=50 box-constrained",
        B * cfg.n_steps / per_call if per_call else None,
        (p50_2, p90_2, per_call / cfg.n_steps * 1e3 if per_call else None),
        float(np.median(np.asarray(res.costs.sum(axis=-1)))),
        violation(res.true_actions, -1.0, 1.0),
        {"max_final_pole_angle_rad": round(final_theta, 4)},
    )

    # 3. cartpole swing-up iLQR T=100, batched over 1k initial states
    env = CartPoleSwingUpEnv
    solver = ILQR(model=env.model, T=10 if q else 100,
                  max_iter=1 if q else 5, threshold=1e-3, reference_accept=False)
    cfg = EpisodeConfig(n_steps=3 if q else 20, warmstart=1 if q else 10,
                        record_plans=False)
    s, lat, c, v = episode_metrics(env, solver, cfg, B=4 if q else 1024, quick=q)
    report("cartpole swing-up iLQR T=100 batched 1k states", s, lat, c, v)

    # 4. acrobot NMPC via SQP, T=100, batched over 1k initial states.
    # max_iter=4: receding-horizon warm starts converge the Gauss-Newton
    # iteration in <=3 steps here — median episode cost is IDENTICAL at
    # max_iter 4 vs 6 (enforced by
    # tests/test_qp.py::test_sqp_iteration_count_cost_parity); per-iteration
    # stage times in PROFILE_SQP_r04.json
    env = AcrobotEnv
    solver = SQP(model=env.model, T=10 if q else 100, max_iter=2 if q else 4)
    cfg = EpisodeConfig(n_steps=3 if q else 20, record_plans=False)
    B4 = 4 if q else 1024
    x0s4 = jnp.tile(jnp.array([0.1, 0.0, 0.2, 0.0], jnp.float32), (B4, 1))
    s, lat, c, v = episode_metrics(env, solver, cfg, B=B4, quick=q,
                                   inner=3 if q else 5, x0s=x0s4)
    report("acrobot NMPC SQP T=100 batched 1k states", s, lat, c, v)

    # 5. multi-solver sweep sharded over the device mesh — ALL SIX families
    from jax.sharding import NamedSharding, PartitionSpec as P

    from benchmarking_mpc_solvers_tpu.parallel import make_mesh, shard_batch, sharded_episodes

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    env = CartPoleSwingUpEnv
    # BASELINE.json names "10k scenarios sharded across a pod slice"; a
    # single chip holds the full 10k (the headline bench already runs
    # B=8192), sharded over however many devices are present
    B5 = 2 * n_dev if q else max(n_dev * 1280, 10240)
    spec = NamedSharding(mesh, P("batch"))
    x0s_base = jnp.tile(env.start_state, (B5, 1))
    T5 = 5 if q else 50
    rows, sps, lat5, paths = [], {}, [], {}
    for name, solver in [
        ("MPPI", MPPI(model=env.model, T=T5, K=8 if q else 64)),
        ("CEM", CEM(model=env.model, T=T5, K=8 if q else 64,
                    n_elite=2 if q else 8, max_iter=1 if q else 3)),
        ("QPMPC", QPMPC(model=env.model, T=T5, iters=10 if q else 50)),
        ("ILQR", ILQR(model=env.model, T=T5, max_iter=1 if q else 3,
                      reference_accept=False)),
        ("SQP", SQP(model=env.model, T=T5, max_iter=1 if q else 3)),
        ("I2C", I2C(model=env.model, T=T5, max_iter=1 if q else 3)),
    ]:
        cfg = EpisodeConfig(n_steps=2 if q else 10, record_plans=False)
        fn = sharded_episodes(env, solver, cfg, mesh)
        keys = jax.random.split(jax.random.PRNGKey(0), B5)
        keys, x0s = shard_batch(mesh, (keys, x0s_base))
        res = jax.block_until_ready(fn(keys, x0s))
        rows.append((name, float(np.median(np.asarray(res.costs.sum(axis=-1))))))

        # each family runs on its best production path: the single-kernel
        # tier where the solver has one (MPPI + CEM, solve_batch_tm), the
        # batched solve_batch tier otherwise (QPMPC), and the vmapped
        # scalar episode for the rest — same closed-loop semantics
        # (experiment/episode.py documents the kernel tiers' own noise
        # streams); the path used is recorded next to each number
        from benchmarking_mpc_solvers_tpu.experiment.episode import (
            run_episodes_fused,
        )
        from benchmarking_mpc_solvers_tpu.parallel import (
            sharded_episodes_kernel,
        )
        from benchmarking_mpc_solvers_tpu.solvers.base import (
            Solver as _SolverBase,
        )

        has_kernel = bool(getattr(solver, "kernel_ok", None)) and solver.kernel_ok()
        # a DEDICATED batched path, not the Solver base class's generic
        # vmap-over-solve fallback (every solver has that)
        has_batch = type(solver).solve_batch is not _SolverBase.solve_batch
        paths[name] = ("single_kernel" if has_kernel
                       else "solve_batch" if has_batch else "vmapped_scalar")

        if has_kernel:
            # pallas_call has no GSPMD partitioning rule: on a multi-device
            # mesh the kernel tier must go through shard_map
            # (parallel.sharded_episodes_kernel), each device driving its
            # own scenario tile
            kfn = sharded_episodes_kernel(env, solver, cfg, mesh)

        def scalar(k, solver=solver, cfg=cfg, has_batch=has_batch,
                   has_kernel=has_kernel):
            ks = jax.lax.with_sharding_constraint(jax.random.split(k, B5), spec)
            x0 = jax.lax.with_sharding_constraint(
                x0s_base + 1e-3 * jax.random.normal(k, x0s_base.shape), spec
            )
            if has_kernel:
                ep = kfn(ks, x0)
            elif has_batch:
                ep = run_episodes_fused(env, solver, cfg, ks, x0,
                                        use_kernel=False)
            else:
                ep = jax.vmap(
                    lambda kk, xx: run_episode(env, solver, cfg, kk, xx)
                )(ks, x0)
            return ep.costs.sum()

        per = timed_per_call(scalar, inner_reps=2 if q else 5, outer_reps=1)
        sps[name] = round(B5 * cfg.n_steps / per, 1) if per else None
        if per:
            lat5.append(per / cfg.n_steps * 1e3)
    resolved = [v for v in sps.values() if v is not None]
    p50_5, p90_5 = step_latency_dist(
        env, MPPI(model=env.model, T=T5, K=8 if q else 64), cfg, B5, x0s_base,
        n=5 if q else 20)
    report(
        f"multi-solver sweep (6 families) x {B5} scenarios sharded over {n_dev} device(s)",
        sum(resolved) / len(resolved) if resolved else None,
        (p50_5, p90_5, float(np.median(lat5)) if lat5 else None),
        rows[0][1],
        0.0,
        {
            "median_costs": {n: round(c, 1) for n, c in rows},
            "solves_per_sec_by_solver": sps,
            "episode_path_by_solver": paths,
        },
    )

    # 6. I2C pendulum swing-up — the reference's unfinished 4th solver
    # family (agents/i2c.py, 0 bytes), completed and benchmarked here
    env = PendulumEnv
    solver = I2C(model=env.model, T=10 if q else 25, max_iter=2 if q else 10)
    cfg = EpisodeConfig(n_steps=5 if q else 50, record_plans=False)
    s, lat, c, v = episode_metrics(env, solver, cfg, B=8 if q else 256, quick=q)
    report("pendulum swing-up I2C T=25", s, lat, c, v)


if __name__ == "__main__":
    main()
