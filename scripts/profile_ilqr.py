"""Phase breakdown of the batched iLQR iteration (VERDICT r2 item 2).

Times each stage of one iLQR iteration at the BASELINE config-3 shape
(cartpole swing-up, T=100, B=1024) with the slope timer, so the dominant
stage is identified before optimizing. Writes PROFILE_ILQR_r03.json.
"""

import json
import sys

from _common import std_parser  # noqa: F401  (sys.path setup)

import jax
import jax.numpy as jnp
import numpy as np

from benchmarking_mpc_solvers_tpu.envs import CartPoleSwingUpEnv
from benchmarking_mpc_solvers_tpu.ops.rollout import simulate_trajectory
from benchmarking_mpc_solvers_tpu.solvers import ILQR
from benchmarking_mpc_solvers_tpu.utils import slope_timer


def main():
    args = std_parser(__doc__).parse_args()
    q = args.quick
    env = CartPoleSwingUpEnv
    model = env.model
    T, B = (10, 16) if q else (100, 1024)
    solver = ILQR(model=model, T=T, max_iter=5, reference_accept=False)
    g_z = jnp.zeros((T, model.goal_size), jnp.float32)

    key = jax.random.PRNGKey(0)
    x0s = jnp.tile(env.start_state, (B, 1)) + 1e-2 * jax.random.normal(
        key, (B, model.state_size)
    )
    us0 = 0.1 * jax.random.normal(key, (B, T, model.action_size))

    def rollout(x0, us):
        return simulate_trajectory(model, x0, us, g_z)

    xss, costs = jax.jit(jax.vmap(rollout))(x0s, us0)

    with jax.default_matmul_precision("highest"):
        derivs = jax.jit(
            jax.vmap(lambda xs, us: solver.derivatives(xs, us, g_z))
        )(xss, us0)

    mu = jnp.float32(1.0)

    stages = {}

    # slope_timer expects fn(key); wrap each stage
    def timed(name, make_scalar):
        per = slope_timer(make_scalar, inner_reps=3 if q else 5, outer_reps=1 if q else 2)
        stages[name] = per * 1e3
        print(f"{name}: {per*1e3:.3f} ms", flush=True)

    with jax.default_matmul_precision("highest"):
        # stage 1: nominal rollout
        vroll = jax.vmap(rollout)
        timed("rollout", lambda k: jnp.sum(
            vroll(x0s + 1e-6 * jax.random.normal(k, x0s.shape), us0)[1]))

        # stage 2: derivatives (current nested-autodiff implementation)
        vder = jax.vmap(lambda xs, us: solver.derivatives(xs, us, g_z))
        timed("derivatives", lambda k: jnp.sum(
            vder(xss + 1e-6 * jax.random.normal(k, xss.shape), us0).l_xx))

        # stage 3: backward pass — vmapped scan vs the Pallas kernel
        vbp = jax.vmap(lambda d: solver.backward_pass(d, mu)[0])
        timed("backward_scan", lambda k: jnp.sum(
            vbp(derivs._replace(
                l_x=derivs.l_x + 1e-6 * jax.random.normal(k, derivs.l_x.shape)))))

        from benchmarking_mpc_solvers_tpu.ops.riccati_pallas import (
            riccati_backward_batch,
        )

        mub = jnp.full((B,), 1.0, jnp.float32)
        timed("backward_pallas", lambda k: jnp.sum(riccati_backward_batch(
            derivs.l_x + 1e-6 * jax.random.normal(k, derivs.l_x.shape),
            derivs.l_u, derivs.l_xx, derivs.l_uu, derivs.l_ux,
            derivs.f_x, derivs.f_u, mub)[0]))

        # stage 4: 10-alpha line-search forward passes
        ks0 = jnp.zeros((B, T, model.action_size))
        Ks0 = jnp.zeros((B, T, model.action_size, model.state_size))
        alphas = solver.alphas

        def fwd_all(xs, us):
            return jax.vmap(
                lambda a: solver.forward_pass(a, ks0[0], Ks0[0], xs, us, g_z)[2]
            )(alphas)

        vfwd = jax.vmap(fwd_all)
        timed("forward_x10", lambda k: jnp.sum(
            vfwd(xss + 1e-6 * jax.random.normal(k, xss.shape), us0)))

        # whole solve (max_iter=5)
        def whole(k):
            keys = jax.random.split(k, B)
            states = jax.vmap(solver.init_state)(keys)
            ns, u0, _ = jax.vmap(lambda s, x: solver.solve(s, x, g_z))(states, x0s)
            return jnp.sum(u0)

        timed("solve_x5iter", whole)

    out = {"config": f"cartpole iLQR T={T} B={B}", "stage_ms": stages}
    with open("PROFILE_ILQR_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
