"""Phase breakdown of the batched iLQR iteration (config 3).

Times each stage of one iLQR iteration at the BASELINE config-3 shape
(cartpole swing-up, T=100, B=1024). All numbers are chained-dispatch
paired differences (utils/profiling.device_step_latency), RTT-free —
the r03 artifact used the 2-point slope timer at small rep counts and
recorded a physically impossible negative rollout time. Also times the
fused line-search kernel (the production path) next to the vmapped
forward passes. Writes PROFILE_ILQR_r04.json.
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
from benchmarking_mpc_solvers_tpu.utils import device_step_latency


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

    def timed(name, fn):
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
        # stage 1: nominal rollout
        vroll = jax.vmap(rollout)
        timed("rollout", lambda k: jnp.sum(
            vroll(x0s + 1e-6 * jax.random.normal(k, x0s.shape), us0)[1]))

        # stage 2: derivatives (current nested-autodiff implementation)
        vder = jax.vmap(lambda xs, us: solver.derivatives(xs, us, g_z))
        # sum EVERY output so XLA cannot dead-code-eliminate any of the
        # derivative computation (summing one field under-measures)
        timed("derivatives", lambda k: sum(
            jnp.sum(v) for v in vder(
                xss + 1e-6 * jax.random.normal(k, xss.shape), us0)))

        # stage 3: backward pass — vmapped scan vs the Pallas kernel
        def bp_scan(d):
            ks, Ks, _ok = solver.backward_pass(d, mu)
            return jnp.sum(ks) + jnp.sum(Ks)

        vbp = jax.vmap(bp_scan)
        timed("backward_scan", lambda k: jnp.sum(
            vbp(derivs._replace(
                l_x=derivs.l_x + 1e-6 * jax.random.normal(k, derivs.l_x.shape)))))

        from benchmarking_mpc_solvers_tpu.ops.riccati_pallas import (
            riccati_backward_batch,
        )

        mub = jnp.full((B,), 1.0, jnp.float32)
        def bp_pallas(k):
            ks, Ks, _ok = riccati_backward_batch(
                derivs.l_x + 1e-6 * jax.random.normal(k, derivs.l_x.shape),
                derivs.l_u, derivs.l_xx, derivs.l_uu, derivs.l_ux,
                derivs.f_x, derivs.f_u, mub)
            return jnp.sum(ks) + jnp.sum(Ks)

        timed("backward_pallas", bp_pallas)

        # stage 4: 10-alpha line-search forward passes
        ks0 = jnp.zeros((B, T, model.action_size))
        Ks0 = jnp.zeros((B, T, model.action_size, model.state_size))
        alphas = solver.alphas

        def fwd_all(xs, us):
            return jax.vmap(
                lambda a: solver.forward_pass(a, ks0[0], Ks0[0], xs, us, g_z)[2]
            )(alphas)

        vfwd = jax.vmap(fwd_all)
        timed("forward_x10_scan", lambda k: jnp.sum(
            vfwd(xss + 1e-6 * jax.random.normal(k, xss.shape), us0)))

        from benchmarking_mpc_solvers_tpu.ops.fused_linesearch import fused_linesearch

        timed("forward_x10_fused", lambda k: jnp.sum(fused_linesearch(
            model, alphas, x0s,
            us0, ks0, Ks0,
            xss + 1e-6 * jax.random.normal(k, xss.shape), g_z)[1]))

        # whole solve (max_iter=5)
        def whole(k):
            keys = jax.random.split(k, B)
            states = jax.vmap(solver.init_state)(keys)
            ns, u0, _ = jax.vmap(lambda s, x: solver.solve(s, x, g_z))(states, x0s)
            return jnp.sum(u0)

        timed("solve_x5iter", whole)

    out = {"config": f"cartpole iLQR T={T} B={B}", "stage_ms": stages}
    with open("PROFILE_ILQR_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
