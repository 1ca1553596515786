"""CEM config-5 performance adjudication (VERDICT r4 weak #3 / item 5).

Round 4's bench sweep measured CEM at ~365k solves/s — the slowest of the
six families — via the vmapped-scalar episode path, with the "algorithmic
3-iteration cost" rationale living only in session memory. This script
commits the evidence:

1. a per-stage profile of one ``solve_batch`` refinement iteration at the
   config-5 shape (cartpole, T=50, K=64, n_elite=8, B) — noise draw,
   fused-Pallas rollout scoring, top-k, elite-stat einsums — on
   chained-dispatch paired timing with stated resolution;
2. whole-batch episode throughput of the vmapped-scalar path (what
   BENCH_SUITE_r04 measured) vs the fused ``solve_batch`` path
   (``experiment/episode.py:run_episodes_fused``), wall-clocked at
   >300 ms per call so the tunnel RTT is amortized.

Writes PROFILE_CEM_r05.json.
"""

import json
import time

from _common import std_parser

import jax
import jax.numpy as jnp

from benchmarking_mpc_solvers_tpu.envs import CartPoleSwingUpEnv
from benchmarking_mpc_solvers_tpu.experiment.episode import (
    EpisodeConfig,
    run_episodes_batch,
    run_episodes_fused,
)
from benchmarking_mpc_solvers_tpu.ops.fused import fused_rollout_costs_tm
from benchmarking_mpc_solvers_tpu.solvers import CEM
from benchmarking_mpc_solvers_tpu.utils import device_step_latency


def main():
    args = std_parser(__doc__).parse_args()
    q = args.quick
    env = CartPoleSwingUpEnv
    model = env.model
    T, K, n_elite, iters = (5, 8, 2, 1) if q else (50, 64, 8, 3)
    B = 64 if q else 10240
    n_steps = 2 if q else 10
    solver = CEM(model=model, T=T, K=K, n_elite=n_elite, max_iter=iters)
    g_z = jnp.zeros((T, model.goal_size), jnp.float32)
    x0s = jnp.tile(env.start_state, (B, 1))
    S = model.state_size

    out = {"config": f"cartpole CEM T={T} K={K} n_elite={n_elite} "
                     f"max_iter={iters} B={B}"}

    # --- stage profile of one refinement iteration (solve_batch's body) ---
    stages = {}

    def timed(name, fn, max_hi):
        def step(c, k):
            v = fn(k)
            return c + v, v

        keys = jax.random.split(jax.random.PRNGKey(3), 8)
        p50, p90, res = device_step_latency(
            step, jnp.float32(0.0), keys, samples=4 if q else 10,
            max_hi=max_hi, return_stats=True,
        )
        stages[name] = {"p50_ms": round(p50, 4), "p90_ms": round(p90, 4),
                        "resolution_ms": round(res, 4)}
        if p50 <= res:
            stages[name]["below_resolution"] = True
        print(f"{name}: p50 {p50:.4f} ms (res {res:.4f})", flush=True)

    N = B * K
    x0_tm = jnp.broadcast_to(x0s.T[:, :, None], (S, B, K)).reshape(S, N)
    mean0 = jnp.zeros((B, T), jnp.float32)
    std0 = jnp.ones((B, T), jnp.float32)

    def draw(k):
        ks = jax.random.split(k, B)
        return jax.vmap(
            lambda kk: jax.random.normal(kk, (K, T), jnp.float32).T, out_axes=1
        )(ks)

    timed("noise_draw", lambda k: jnp.sum(draw(k)), max_hi=40 if q else 800)

    def score(k):
        samples_tm = jnp.clip(mean0.T[:, :, None] + std0.T[:, :, None] * draw(k),
                              float(model.bounds_low[0]),
                              float(model.bounds_high[0]))
        return jnp.sum(
            fused_rollout_costs_tm(model, x0_tm, samples_tm.reshape(T, N), g_z)
        )

    timed("noise+fused_rollout_score", score, max_hi=40 if q else 400)

    costs0 = jax.jit(
        lambda k: fused_rollout_costs_tm(
            model, x0_tm,
            jnp.clip(draw(k), -1, 1).reshape(T, N), g_z
        ).reshape(B, K)
    )(jax.random.PRNGKey(0))

    def topk_stats(k):
        costs = costs0 + 1e-6 * jax.random.normal(k, costs0.shape)
        _, elite_idx = jax.lax.top_k(-costs, n_elite)
        mask = jnp.zeros((B, K), jnp.float32).at[
            jnp.arange(B)[:, None], elite_idx
        ].set(1.0 / n_elite)
        return jnp.sum(mask * costs)

    timed("topk+elite_mask", topk_stats, max_hi=40 if q else 2000)

    # --- episode throughput: vmapped-scalar vs fused solve_batch ---
    cfg = EpisodeConfig(n_steps=n_steps, record_plans=False, warmstart=0)

    def throughput(runner, label):
        f = jax.jit(
            lambda keys: runner(env, solver, cfg, keys, x0s).costs.sum()
        )

        def call(seed):
            keys = jax.random.split(jax.random.PRNGKey(seed), B)
            # scalar fetch = host sync (block_until_ready does not await
            # remote completion on the tunneled runtime)
            return float(f(keys))

        call(0)  # compile
        ts = []
        for i in range(2 if q else 4):
            t0 = time.perf_counter()
            call(i + 1)
            ts.append(time.perf_counter() - t0)
        wall = min(ts)
        sps = B * n_steps / wall
        out[label] = {"wall_s_per_call": round(wall, 4),
                      "solves_per_s": round(sps, 1)}
        print(f"{label}: {sps:,.0f} solves/s ({wall:.3f}s per "
              f"{B}x{n_steps})", flush=True)

    throughput(run_episodes_batch, "episodes_vmapped_scalar")
    throughput(
        lambda *a, **kw: run_episodes_fused(*a, use_kernel=False, **kw),
        "episodes_fused_solve_batch",
    )
    throughput(
        lambda *a, **kw: run_episodes_fused(*a, use_kernel=True, **kw),
        "episodes_single_kernel",
    )

    out["stage_ms"] = stages
    with open("PROFILE_CEM_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
