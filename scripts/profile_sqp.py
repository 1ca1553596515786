"""Phase breakdown of the batched SQP iteration (VERDICT r2 item 2, config 4).

Times each stage of one SQP iteration at the BASELINE config-4 shape
(acrobot NMPC, T=100, B=128) with the slope timer, plus the whole solve at
several batch sizes to separate latency-bound from compute-bound regimes.
Writes PROFILE_SQP_r03.json.
"""

import json

from _common import std_parser  # noqa: F401  (sys.path setup)

import jax
import jax.numpy as jnp

from benchmarking_mpc_solvers_tpu.envs import AcrobotEnv
from benchmarking_mpc_solvers_tpu.ops.linearize import linearize_dynamics, quadratize_cost
from benchmarking_mpc_solvers_tpu.ops.rollout import simulate_trajectory
from benchmarking_mpc_solvers_tpu.solvers import SQP
from benchmarking_mpc_solvers_tpu.utils import slope_timer


def main():
    args = std_parser(__doc__).parse_args()
    q = args.quick
    env = AcrobotEnv
    model = env.model
    T, B = (10, 8) if q else (100, 128)
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

    def timed(name, make_scalar):
        per = slope_timer(make_scalar, inner_reps=3 if q else 7,
                          outer_reps=1 if q else 2)
        stages[name] = per * 1e3
        print(f"{name}: {per*1e3:.3f} ms", flush=True)

    with jax.default_matmul_precision("highest"):
        vroll = jax.vmap(roll)
        timed("rollout", lambda k: jnp.sum(
            vroll(x0s + 1e-6 * jax.random.normal(k, x0s.shape), us0)[1]))

        vlin = jax.vmap(lambda xs, us: linearize_dynamics(model, xs[:-1], us).A)
        timed("linearize", lambda k: jnp.sum(
            vlin(xss + 1e-6 * jax.random.normal(k, xss.shape), us0)))

        vquad = jax.vmap(
            lambda xs, us: quadratize_cost(model, xs, us, g_z,
                                           gauss_newton=True).Q)
        timed("quadratize", lambda k: jnp.sum(
            vquad(xss + 1e-6 * jax.random.normal(k, xss.shape), us0)))

        vsub = jax.vmap(
            lambda xs, us: solver._subproblem(xs, us, g_z, jnp.float32(1e-2)).k
        )
        timed("subproblem(lin+quad+riccati)", lambda k: jnp.sum(
            vsub(xss + 1e-6 * jax.random.normal(k, xss.shape), us0)))

        def ls(xs, us):
            pol = solver._subproblem(xs, us, g_z, jnp.float32(1e-2))
            _, _, costs = solver.linesearch_cv(pol, xs, us, g_z)
            return jnp.sum(costs)

        timed("subproblem+linesearch", lambda k: jnp.sum(jax.vmap(ls)(
            xss + 1e-6 * jax.random.normal(k, xss.shape), us0)))

        for b in ([B] if q else [128, 512, 2048]):
            x0b = jnp.tile(jnp.array([0.1, 0.0, 0.2, 0.0], jnp.float32), (b, 1))

            def whole(k, b=b, x0b=x0b):
                keys = jax.random.split(k, b)
                states = jax.vmap(solver.init_state)(keys)
                x0 = x0b + 1e-3 * jax.random.normal(k, x0b.shape)
                _, u0, _ = jax.vmap(lambda s, x: solver.solve(s, x, g_z))(states, x0)
                return jnp.sum(u0)

            timed(f"solve_x6iter_B{b}", whole)

    out = {"config": f"acrobot SQP T={T} B={B}", "stage_ms": stages}
    with open("PROFILE_SQP_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
