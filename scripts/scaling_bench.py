"""Scaling-efficiency benchmark: solves/s vs device count.

BASELINE.json tracks ">=80% scaling efficiency to 2 hosts". Real multi-chip
hardware isn't present in this environment, so this script measures scaling
structure on whatever mesh exists (e.g. the 8-device virtual CPU mesh via
``--xla_force_host_platform_device_count=8``; on a pod slice the same code
shards over real chips via ICI). Scenario-parallel MPC has no cross-device
communication, so the expected curve is linear minus runtime overheads.

For real multi-host runs, initialize with
``benchmarking_mpc_solvers_tpu.parallel.distributed_init()`` on every host
first; the per-host invocation is otherwise identical.
"""

import json

from _common import std_parser

import jax
import jax.numpy as jnp
import numpy as np

from benchmarking_mpc_solvers_tpu.envs import CartPoleSwingUpEnv
from benchmarking_mpc_solvers_tpu.experiment import EpisodeConfig, run_episode
from benchmarking_mpc_solvers_tpu.parallel import make_mesh, shard_batch, sharded_episodes
from benchmarking_mpc_solvers_tpu.solvers import MPPI
from benchmarking_mpc_solvers_tpu.utils import Timer


def main():
    args = std_parser(__doc__).parse_args()
    q = args.quick
    env = CartPoleSwingUpEnv
    solver = MPPI(model=env.model, T=10 if q else 50, K=8 if q else 32)
    cfg = EpisodeConfig(n_steps=3 if q else 10, record_plans=False)
    per_dev_B = 8 if q else 512

    n_all = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8) if n <= n_all]
    base = None
    import os

    shared_host = jax.devices()[0].platform == "cpu"
    for n in counts:
        mesh = make_mesh(n)
        B = per_dev_B * n  # weak scaling: constant work per device
        fn = sharded_episodes(env, solver, cfg, mesh)
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        x0s = jnp.tile(env.start_state, (B, 1))
        keys_s, x0s_s = shard_batch(mesh, (keys, x0s))
        jax.block_until_ready(fn(keys_s, x0s_s))  # compile
        reps = 2 if q else 4
        with Timer() as t:
            for i in range(reps):
                keys2 = jax.random.split(jax.random.PRNGKey(i + 1), B)
                keys2, _ = shard_batch(mesh, (keys2, x0s))
                jax.block_until_ready(fn(keys2, x0s_s))
        solves = B * cfg.n_steps * reps / t.elapsed
        if base is None:
            base = solves
        eff = solves / (base * n)

        # Partition overhead: same total work, unsharded, on one device.
        # On a virtual CPU mesh all "devices" share the host's physical
        # cores, so weak-scaling efficiency measures core contention, not
        # the sharded path; overhead ~1.0 is the meaningful check (no
        # collectives are inserted, so real-chip scaling is linear minus
        # this overhead).
        fn1 = sharded_episodes(env, solver, cfg, make_mesh(1))
        jax.block_until_ready(fn1(keys, x0s))  # compile
        with Timer() as t1:
            for i in range(reps):
                keys2 = jax.random.split(jax.random.PRNGKey(i + 1), B)
                jax.block_until_ready(fn1(keys2, x0s))
        overhead = t.elapsed / t1.elapsed
        print(
            json.dumps(
                {
                    "devices": n,
                    "batch": B,
                    "solves_per_sec": round(solves, 1),
                    "weak_scaling_efficiency": round(eff, 3),
                    "partition_overhead_vs_1dev_same_work": round(overhead, 3),
                    "note": (
                        f"virtual devices share {os.cpu_count()} physical cores"
                        if shared_host
                        else "real devices"
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
