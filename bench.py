"""Headline benchmark: batched cartpole swing-up MPC solves/s/chip at horizon 50.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric definition (BASELINE.json): full MPC solve steps per second per chip
— each solve is one MPPI predict_action (K rollout evaluations of horizon
T=50 + softmax update) plus the plant step, measured in steady state over a
batched closed-loop simulation.

vs_baseline: the reference solves serially at roughly 1 MPC step/s for this
config (BASELINE.md: MPPI cartpole T=50 aggregates ~1.5e3 s of solve time
over ~1.5e3 closed-loop steps on a 12-core host; per-step latency is
~0.5-1.5 s across the sweep tables). We use 1.0 solve/s as the reference
number, so vs_baseline == our solves/s.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_SOLVES_PER_SEC = 1.0
HORIZON = 50
K_SAMPLES = 32
BATCH = 4096
N_STEPS = 20


def main():
    from benchmarking_mpc_solvers_tpu.envs import CartPoleSwingUpEnv
    from benchmarking_mpc_solvers_tpu.experiment import EpisodeConfig, run_episode
    from benchmarking_mpc_solvers_tpu.solvers import MPPI

    env = CartPoleSwingUpEnv
    solver = MPPI(model=env.model, T=HORIZON, K=K_SAMPLES, std=1.0, lam=1.0)
    cfg = EpisodeConfig(n_steps=N_STEPS, warmstart=0, record_plans=False)

    @jax.jit
    def batch(keys, x0s):
        res = jax.vmap(lambda k, x0: run_episode(env, solver, cfg, k, x0))(keys, x0s)
        return res.costs

    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    x0s = jnp.tile(env.start_state, (BATCH, 1))

    costs = jax.block_until_ready(batch(keys, x0s))  # compile
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        keys = jax.random.split(jax.random.PRNGKey(i + 1), BATCH)
        costs = jax.block_until_ready(batch(keys, x0s))
    dt = (time.perf_counter() - t0) / reps

    solves = BATCH * N_STEPS
    solves_per_sec = solves / dt
    assert bool(jnp.all(jnp.isfinite(costs))), "non-finite costs"

    print(
        json.dumps(
            {
                "metric": f"cartpole MPC solves/s/chip (MPPI K={K_SAMPLES}, T={HORIZON}, batch={BATCH})",
                "value": round(float(solves_per_sec), 1),
                "unit": "solves/s",
                "vs_baseline": round(float(solves_per_sec / REFERENCE_SOLVES_PER_SEC), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
