"""Phase breakdown of the batched I2C solve (VERDICT r3 item 4, config 6).

Times each stage of one I2C smoothing iteration at the bench config-6
shape (pendulum, T=25, B=256) plus the whole solve with the Pallas
KF+RTS smoother ON vs OFF — the committed before/after the round-3
verdict asked for. All numbers are chained-dispatch paired differences
(utils/profiling.device_step_latency), RTT-free. Sub-0.1 ms stages use
long chains (max_hi in the thousands) so they resolve above the
estimator's noise floor, and each stage reports that floor
(resolution_ms = stddev of the per-step samples); values at or below it
are flagged below_resolution rather than committed as measurements
(VERDICT r4 weak #2: r4 published a physically impossible negative
linearize time from an under-sized chain). Writes PROFILE_I2C_r05.json.
"""

import json

from _common import std_parser  # noqa: F401  (sys.path setup)

import jax
import jax.numpy as jnp

from benchmarking_mpc_solvers_tpu.envs import PendulumEnv
from benchmarking_mpc_solvers_tpu.ops.linearize import linearize_dynamics
from benchmarking_mpc_solvers_tpu.ops.rollout import rollout
from benchmarking_mpc_solvers_tpu.solvers import I2C
from benchmarking_mpc_solvers_tpu.utils import device_step_latency


def main():
    args = std_parser(__doc__).parse_args()
    q = args.quick
    env = PendulumEnv
    model = env.model
    T, B = (10, 8) if q else (25, 256)
    g_z = jnp.zeros((T, model.goal_size), jnp.float32)

    key = jax.random.PRNGKey(0)
    x0s = jnp.tile(env.start_state, (B, 1)) + 1e-2 * jax.random.normal(
        key, (B, model.state_size)
    )
    us0 = 0.1 * jax.random.normal(key, (B, T, model.action_size))

    stages = {}

    def timed(name, fn, max_hi=160):
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
        print(f"{name}: p50 {p50:.4f} ms  p90 {p90:.4f} ms  "
              f"(resolution {res:.4f} ms)", flush=True)

    solver_on = I2C(model=model, T=T, max_iter=10, pallas_smoother=True)
    solver_off = I2C(model=model, T=T, max_iter=10, pallas_smoother=False)

    with jax.default_matmul_precision("highest"):
        # rollout/linearize are ~10 us device-time stages: chain thousands
        # of them so the paired difference resolves above the ~ms dispatch
        # jitter (160-step chains produced r4's negative linearize p50)
        deep = 160 if q else 8000
        vroll = jax.vmap(lambda x0, us: rollout(model, x0, us, g_z)[0])
        timed("rollout", lambda k: jnp.sum(
            vroll(x0s + 1e-6 * jax.random.normal(k, x0s.shape), us0)),
            max_hi=deep)

        xss = jax.jit(vroll)(x0s, us0)
        vlin = jax.vmap(lambda xs, us: linearize_dynamics(model, xs[:-1], us).A)
        timed("linearize", lambda k: jnp.sum(
            vlin(xss + 1e-6 * jax.random.normal(k, xss.shape), us0)),
            max_hi=deep)

        for name, sv in [("smooth_iter_pallas", solver_on),
                         ("smooth_iter_scan", solver_off)]:
            vsm = jax.vmap(
                lambda x0, us, sv=sv: sv._smooth_once(
                    x0, us, g_z, jnp.float32(1.0)
                )
            )
            timed(name, lambda k, vsm=vsm: jnp.sum(
                vsm(x0s + 1e-6 * jax.random.normal(k, x0s.shape), us0)),
                max_hi=160 if q else 2000)

        for name, sv in [("solve_x10iter_pallas", solver_on),
                         ("solve_x10iter_scan", solver_off)]:
            def whole(k, sv=sv):
                keys = jax.random.split(k, B)
                states = jax.vmap(sv.init_state)(keys)
                x0 = x0s + 1e-3 * jax.random.normal(k, x0s.shape)
                _, u0, _ = jax.vmap(lambda s, x: sv.solve(s, x, g_z))(states, x0)
                return jnp.sum(u0)

            timed(name, whole)

    out = {"config": f"pendulum I2C T={T} B={B}", "stage_ms": stages}
    with open("PROFILE_I2C_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
