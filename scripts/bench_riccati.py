"""Sequential vs parallel-in-horizon Riccati on the TPU.

Measures, at horizons T in {50, 100, 500} (BASELINE configs 3-4 run T=100):

1. raw TV-LQR backward pass: ``tvlqr_backward`` (lax.scan, O(T) depth) vs
   ``tvlqr_backward_assoc`` (associative_scan, O(log T) depth) — the
   long-horizon bottleneck the reference parallelized with worker processes
   (``agents/ilqr.py:309-333`` + queue fan-out).
2. the full box-QP solve: ``admm_solve_riccati_batch`` with
   ``parallel_horizon`` False/True at B in {1, 256} — the BASELINE config 2
   path, where each ADMM iteration is a linear backward/forward scan.

Prints one JSON line per (bench, T, B) with µs per call and the speedup of
the parallel variant (>1 = parallel wins). The measured crossover is
recorded in ``ops/riccati.py``'s module docstring and sets the
``parallel_horizon`` defaults.
"""

import json

import numpy as np
from _common import std_parser  # noqa: F401  (sys.path setup)

import jax
import jax.numpy as jnp

from benchmarking_mpc_solvers_tpu.ops import (
    AffineDynamics,
    QuadCost,
    admm_solve_riccati_batch,
    tvlqr_backward,
    tvlqr_backward_assoc,
)
from benchmarking_mpc_solvers_tpu.utils import slope_timer


def double_integrator(T, dt=0.02):
    A = jnp.array([[1.0, dt], [0.0, 1.0]], jnp.float32)
    B = jnp.array([[0.0], [dt]], jnp.float32)
    dyn = AffineDynamics(
        jnp.broadcast_to(A, (T, 2, 2)),
        jnp.broadcast_to(B, (T, 2, 1)),
        jnp.zeros((T, 2), jnp.float32),
    )
    Q = jnp.diag(jnp.array([1.0, 0.1], jnp.float32))
    R = jnp.array([[0.1]], jnp.float32)
    return dyn, Q, R, Q


def cost_for(T, dyn, Q, R, Qf, key):
    rng = jax.random.split(key, 2)
    return QuadCost(
        Q=jnp.broadcast_to(2 * Q, (T, 2, 2)),
        R=jnp.broadcast_to(2 * R, (T, 1, 1)),
        M=jnp.zeros((T, 1, 2), jnp.float32),
        q=0.1 * jax.random.normal(rng[0], (T, 2)),
        r=0.1 * jax.random.normal(rng[1], (T, 1)),
        Qf=2 * Qf,
        qf=jnp.zeros(2, jnp.float32),
    )


def timed(fn, inner, outer=3):
    per = slope_timer(fn, inner_reps=inner, outer_reps=outer)
    return per if per > 1e-7 else None


def main():
    args = std_parser(__doc__).parse_args()
    q = args.quick
    horizons = [50, 100] if q else [50, 100, 500]

    for T in horizons:
        dyn, Q, R, Qf = double_integrator(T)

        # 1. raw backward pass (key-dependent cost defeats CSE across reps)
        def seq_bp(key):
            pol = tvlqr_backward(dyn, cost_for(T, dyn, Q, R, Qf, key))
            return pol.k.sum()

        def par_bp(key):
            pol = tvlqr_backward_assoc(dyn, cost_for(T, dyn, Q, R, Qf, key))
            return pol.k.sum()

        t_seq = timed(seq_bp, inner=20 if q else 50)
        t_par = timed(par_bp, inner=20 if q else 50)
        print(json.dumps({
            "bench": "tvlqr_backward", "T": T,
            "seq_us": None if t_seq is None else round(t_seq * 1e6, 1),
            "assoc_us": None if t_par is None else round(t_par * 1e6, 1),
            "parallel_speedup": round(t_seq / t_par, 2) if t_seq and t_par else None,
        }))

        # 2. full riccati-ADMM box-QP solve
        for B in ([1, 32] if q else [1, 256]):
            def solve(key, par):
                x0s = jax.random.normal(key, (B, 2))
                us, _, _, _ = admm_solve_riccati_batch(
                    dyn, x0s, Q, R, Qf, jnp.zeros(2), jnp.zeros(1),
                    -1.0, 1.0, iters=10 if q else 50, eps=0.0,
                    parallel_horizon=par,
                )
                return us.sum()

            t_seq = timed(lambda k: solve(k, False), inner=5 if q else 15)
            t_par = timed(lambda k: solve(k, True), inner=5 if q else 15)
            print(json.dumps({
                "bench": "admm_solve_riccati_batch", "T": T, "B": B,
                "seq_us": None if t_seq is None else round(t_seq * 1e6, 1),
                "assoc_us": None if t_par is None else round(t_par * 1e6, 1),
                "parallel_speedup": round(t_seq / t_par, 2) if t_seq and t_par else None,
            }))


if __name__ == "__main__":
    main()
