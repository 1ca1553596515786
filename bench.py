"""Headline benchmark: batched cartpole swing-up MPC solves/s/chip at horizon 50.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric definition (BASELINE.json): full MPC solve steps per second per chip
— each solve is one MPPI predict_action (K rollout evaluations of horizon
T=50 + softmax update) plus the plant step, in a batched closed-loop
simulation on the fused episode path. The MPPI update runs as ONE Pallas
kernel per MPC step (in-kernel RNG + rollouts + softmax + plan update,
``ops/fused_mppi.py``) — no (B·K)-sized HBM arrays.

Timing method: device time is measured as the slope between jitted calls
that run 1 vs R episode batches internally (fresh PRNG-folded inputs per
inner batch, scalar checksum output). The single-call latency through this
environment's remote-tunnel runtime includes a ~30 ms RTT and
``block_until_ready`` does not reliably await remote completion, so naive
wall-clock timing is wrong in both directions; the slope is RTT-free.

vs_baseline: derived from BASELINE.md for the matching config (CartpoleSwingup,
MPPI, T=50). The reference's table row aggregates Σ passed_time = 1.5e3 s
(`ResultPlots/time_comparison/CartpoleSwingupEnvironment_T_table.tex:21`) over
every matching run in its four MongoDB collections
(`scripts/table_generation.py:22`): the mppi_samples sweep (5 K-values x 5
repetitions, `scripts/sample_test.py:28,36-47`) plus the temperature_exp sweep
(6 lambda-values x 5 repetitions, `scripts/mppi_temperature.py:23-29`) = 55
runs x 100 timed solves each (`ExperimentCore/Experiment.py:79-99`; warm-start
iterations are untimed) = 5,500 solves. Reference rate = 5500 / 1.5e3 s =
3.7 solves/s on its 12-core host; vs_baseline = ours / 3.7.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

REFERENCE_SOLVES_PER_SEC = 5500.0 / 1.5e3  # = 3.7, see module docstring
HORIZON = 50
K_SAMPLES = 32
BATCH = 8192
N_STEPS = 20
INNER_REPS = 9
OUTER_REPS = 3


def main():
    from benchmarking_mpc_solvers_tpu.envs import CartPoleSwingUpEnv
    from benchmarking_mpc_solvers_tpu.experiment import EpisodeConfig
    from benchmarking_mpc_solvers_tpu.experiment.episode import run_episodes_fused
    from benchmarking_mpc_solvers_tpu.solvers import MPPI

    env = CartPoleSwingUpEnv
    solver = MPPI(model=env.model, T=HORIZON, K=K_SAMPLES, std=1.0, lam=1.0)
    cfg = EpisodeConfig(n_steps=N_STEPS, warmstart=0, record_plans=False)
    x0s = jnp.tile(env.start_state, (BATCH, 1))

    def one_batch(key):
        keys = jax.random.split(key, BATCH)
        return run_episodes_fused(env, solver, cfg, keys, x0s).costs.sum()

    def repeated(key, n):
        def body(carry, i):
            return carry + one_batch(jax.random.fold_in(key, i)), None

        out, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return out

    times = {}
    checksums = []
    for n in (1, INNER_REPS):
        f = jax.jit(lambda k, n=n: repeated(k, n))
        checksums.append(float(f(jax.random.PRNGKey(0))))  # compile + warm
        t0 = time.perf_counter()
        for i in range(OUTER_REPS):
            checksums.append(float(f(jax.random.PRNGKey(i + 1))))
        times[n] = (time.perf_counter() - t0) / OUTER_REPS

    assert all(np.isfinite(checksums)), "non-finite episode costs"
    per_batch = (times[INNER_REPS] - times[1]) / (INNER_REPS - 1)
    solves_per_sec = BATCH * N_STEPS / per_batch

    print(
        json.dumps(
            {
                "metric": f"cartpole MPC solves/s/chip (MPPI K={K_SAMPLES}, T={HORIZON}, batch={BATCH}, fused pallas)",
                "value": round(float(solves_per_sec), 1),
                "unit": "solves/s",
                "vs_baseline": round(float(solves_per_sec / REFERENCE_SOLVES_PER_SEC), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
