"""Phase breakdown of the batched SQP iteration (VERDICT r3 item 3, config 4).

Times each stage of one SQP iteration at the BASELINE config-4 shape
(acrobot NMPC, T=100) plus the whole solve at several batch sizes.

Round 3's profile used the 2-point slope timer at small rep counts and
committed a physically impossible negative stage time (rollout: -89 ms) —
sub-100us stages cannot be resolved against multi-ms dispatch jitter that
way. Every number here is a chained-dispatch paired difference instead
(utils/profiling.device_step_latency): each sample chains n key-perturbed
stage evaluations inside ONE dispatch at two chain lengths and reports
p50 over (t_hi - t_lo)/(n_hi - n_lo), which cancels the per-dispatch
constant (tunnel RTT + dispatch) and scales n until device time dominates.
Writes PROFILE_SQP_r04.json.
"""

import json

from _common import std_parser  # noqa: F401  (sys.path setup)

import jax
import jax.numpy as jnp

from benchmarking_mpc_solvers_tpu.envs import AcrobotEnv
from benchmarking_mpc_solvers_tpu.ops.linearize import linearize_dynamics, quadratize_cost
from benchmarking_mpc_solvers_tpu.ops.rollout import simulate_trajectory
from benchmarking_mpc_solvers_tpu.solvers import SQP
from benchmarking_mpc_solvers_tpu.utils import device_step_latency


def main():
    args = std_parser(__doc__).parse_args()
    q = args.quick
    env = AcrobotEnv
    model = env.model
    T, B = (10, 8) if q else (100, 1024)
    solver = SQP(model=model, T=T, max_iter=6)
    g_z = jnp.zeros((T, model.goal_size), jnp.float32)

    key = jax.random.PRNGKey(0)
    x0s = jnp.tile(jnp.array([0.1, 0.0, 0.2, 0.0], jnp.float32), (B, 1)) + (
        1e-2 * jax.random.normal(key, (B, model.state_size))
    )
    us0 = 0.1 * jax.random.normal(key, (B, T, model.action_size))

    def roll(x0, us):
        return simulate_trajectory(model, x0, us, g_z)

    xss, _ = jax.jit(jax.vmap(roll))(x0s, us0)

    stages = {}

    def timed(name, fn):
        """fn(key) -> scalar; p50/p90 device ms via chained paired dispatch."""

        def step(c, k):
            v = fn(k)
            return c + v, v

        keys = jax.random.split(jax.random.PRNGKey(3), 8)
        p50, p90 = device_step_latency(
            step, jnp.float32(0.0), keys, samples=4 if q else 10
        )
        stages[name] = {"p50_ms": round(p50, 4), "p90_ms": round(p90, 4)}
        print(f"{name}: p50 {p50:.4f} ms  p90 {p90:.4f} ms", flush=True)

    with jax.default_matmul_precision("highest"):
        vroll = jax.vmap(roll)
        timed("rollout", lambda k: jnp.sum(
            vroll(x0s + 1e-6 * jax.random.normal(k, x0s.shape), us0)[1]))

        # sum EVERY output so XLA cannot dead-code-eliminate part of the
        # stage (summing one field under-measures — cf. profile_ilqr.py)
        vlin = jax.vmap(lambda xs, us: linearize_dynamics(model, xs[:-1], us))
        timed("linearize", lambda k: sum(jnp.sum(v) for v in
            vlin(xss + 1e-6 * jax.random.normal(k, xss.shape), us0)))

        vquad = jax.vmap(
            lambda xs, us: quadratize_cost(model, xs, us, g_z,
                                           gauss_newton=True))
        timed("quadratize", lambda k: sum(jnp.sum(v) for v in
            vquad(xss + 1e-6 * jax.random.normal(k, xss.shape), us0)))

        def sub_all(xs, us):
            pol = solver._subproblem(xs, us, g_z, jnp.float32(1e-2))
            return jnp.sum(pol.k) + jnp.sum(pol.K)

        timed("subproblem(lin+quad+riccati)", lambda k: jnp.sum(jax.vmap(sub_all)(
            xss + 1e-6 * jax.random.normal(k, xss.shape), us0)))

        def ls(xs, us):
            pol = solver._subproblem(xs, us, g_z, jnp.float32(1e-2))
            _, _, costs = solver.linesearch_cv(pol, xs, us, g_z)
            return jnp.sum(costs)

        timed("subproblem+linesearch", lambda k: jnp.sum(jax.vmap(ls)(
            xss + 1e-6 * jax.random.normal(k, xss.shape), us0)))

        for mi, b in ([(6, B)] if q else [(6, 128), (6, 1024), (4, 1024), (2, 1024)]):
            x0b = jnp.tile(jnp.array([0.1, 0.0, 0.2, 0.0], jnp.float32), (b, 1))
            sv = SQP(model=model, T=T, max_iter=mi)

            def whole(k, sv=sv, b=b, x0b=x0b):
                keys = jax.random.split(k, b)
                states = jax.vmap(sv.init_state)(keys)
                x0 = x0b + 1e-3 * jax.random.normal(k, x0b.shape)
                _, u0, _ = jax.vmap(lambda s, x: sv.solve(s, x, g_z))(states, x0)
                return jnp.sum(u0)

            timed(f"solve_x{mi}iter_B{b}", whole)

    out = {"config": f"acrobot SQP T={T} stage-batch B={B}", "stage_ms": stages}
    with open("PROFILE_SQP_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
