"""Empirical roofline for the headline single-kernel MPPI bench (ROOFLINE.md).

VERDICT r4 weak #6: the "near speed-of-light" claim had no committed
arithmetic. This script measures the actual ceilings on the attached chip:

- VPU f32 throughput for FMA and for the transcendentals the MPPI kernel
  leans on (cos, log, divide): a ``lax.fori_loop`` whose body applies the
  op ``inner`` times inline — the unrolled body fuses into one kernel, so
  each HBM pass carries ``inner`` ops per element and the measurement is
  compute-dominated, not bandwidth-dominated;
- HBM stream bandwidth: the same loop with ``inner=1`` on a large array
  (one read + one write of the full array per iteration).

Timing: min wall over reps of a single dispatch, host-synced by a
one-element fetch (block_until_ready does not await remote completion on
the tunneled runtime — utils/profiling.py), long-vs-short chain paired
difference so the RTT cancels. Emits one JSON line per measurement and
writes ROOFLINE_MEASURED.json; ROOFLINE.md holds the written-up
arithmetic.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import _common  # noqa: F401,E402  (platform/cache setup)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def timed(fn, x, reps=5):
    """Min wall seconds of fn(x); host-sync via a one-element fetch."""
    sync = lambda out: float(jnp.ravel(out)[0])  # noqa: E731
    sync(fn(x))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def chained(op, n_iters, inner, x):
    """n_iters loop iterations, each applying op `inner` times inline
    (unrolled + fused into one kernel per iteration)."""

    def body(_, x):
        for _ in range(inner):
            x = op(x)
        return x

    return lax.fori_loop(0, n_iters, body, x)


def measure(op, name, inner, shape, n_long, n_short, ops_per_eval=1):
    print("measuring", name, flush=True)
    x = jnp.full(shape, 0.731, jnp.float32)
    size = x.size
    f_long = jax.jit(lambda x: chained(op, n_long, inner, x))
    f_short = jax.jit(lambda x: chained(op, n_short, inner, x))
    dt = timed(f_long, x) - timed(f_short, x)
    evals = size * inner * (n_long - n_short)
    rec = {
        "what": name,
        "elem_evals_per_s": evals / dt,
        "approx_flops_per_s": evals / dt * ops_per_eval,
        "inner": inner,
        "elems": size,
        "paired_dt_s": dt,
    }
    print(json.dumps(rec), flush=True)
    return rec


def measure_pallas_op(op, name, inner_long=2048, inner_short=256,
                      grid=256, lanes=512):
    """In-kernel transcendental rate: the MPPI kernel's cos/sin/log run
    through Mosaic's lowering, not XLA's elementwise kernels — measure a
    Pallas kernel grid whose programs each apply op `inner` times to a
    VMEM tile (enough total work to dominate the tunnel's RTT jitter)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make(inner):
        def kernel(x_ref, o_ref):
            # in-kernel fori_loop, NOT a Python unroll: Mosaic compile of a
            # 512-op straight-line transcendental chain hangs for minutes
            # (it wedged the r5 session's tunnel twice)
            o_ref[:] = lax.fori_loop(
                0, inner, lambda i, x: op(x), x_ref[:]
            )

        return jax.jit(pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, 8, lanes), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, lanes), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid, 8, lanes), jnp.float32),
        ))

    x = jnp.full((grid, 8, lanes), 0.731, jnp.float32)
    dt = timed(make(inner_long), x, reps=8) - timed(make(inner_short), x,
                                                    reps=8)
    evals = x.size * (inner_long - inner_short)
    rec = {"what": f"pallas_vpu_f32_{name}", "elem_evals_per_s": evals / dt,
           "paired_dt_s": dt}
    print(json.dumps(rec), flush=True)
    return rec


def measure_pallas_noise(inner_long=256, inner_short=32, paired=False):
    """Rate of the kernels' own noise generator: on-core PRNG draw +
    Box-Muller (ops/fused_mppi._std_normal), or the paired variant that
    keeps both the cos and sin halves (_std_normal_pair — what the
    production kernels consume). Returns normals/s."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from benchmarking_mpc_solvers_tpu.ops.fused_mppi import (
        _std_normal,
        _std_normal_pair,
    )

    lanes = 512
    shape = (8, lanes)

    def make(inner):
        def kernel(seed_ref, o_ref):
            pltpu.prng_seed(seed_ref[0])

            if paired:
                def body(i, acc):
                    a, b = _std_normal_pair(lanes)
                    return acc + a + b
            else:
                def body(i, acc):
                    return acc + _std_normal(lanes)

            o_ref[:] = lax.fori_loop(
                0, inner, body, jnp.zeros(shape, jnp.float32)
            )

        return jax.jit(pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            grid=(1024,),
        ))

    x = jnp.asarray([7], jnp.int32)
    dt = timed(make(inner_long), x) - timed(make(inner_short), x)
    per_iter = 2 if paired else 1
    evals = 8 * lanes * 1024 * per_iter * (inner_long - inner_short)
    rec = {"what": "pallas_box_muller_normals"
                   + ("_paired" if paired else ""),
           "normals_per_s": evals / dt, "paired_dt_s": dt}
    print(json.dumps(rec), flush=True)
    return rec


def measure_hbm(n_mb=256, n_long=256, n_short=32):
    n = n_mb * 1024 * 1024 // 4
    x = jnp.full((n,), 1.0, jnp.float32)
    op = lambda x: x * 1.0000001 + 1e-9  # noqa: E731
    f_long = jax.jit(lambda x: chained(op, n_long, 1, x))
    f_short = jax.jit(lambda x: chained(op, n_short, 1, x))
    dt = timed(f_long, x) - timed(f_short, x)
    bytes_moved = 2 * n * 4 * (n_long - n_short)  # read + write per pass
    rec = {"what": "hbm_stream", "bytes_moved": bytes_moved,
           "paired_dt_s": dt, "GB_per_s": bytes_moved / dt / 1e9}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    print("start", jax.devices(), flush=True)
    out = {"device": str(jax.devices()[0])}
    shape = (8, 512 * 1024)  # 4.2M f32 = 16 MB, VMEM-tileable
    # FMA: 2 flops/eval, 256 inline -> 2.1 GFLOP per HBM pass
    out["fma"] = measure(
        lambda x: x * 1.000001 + 1e-7, "vpu_f32_fma", 256, shape, 512, 64,
        ops_per_eval=2)
    # transcendentals: fewer inline (each is many ALU slots) but still
    # compute-dominated
    out["cos"] = measure(jnp.cos, "vpu_f32_cos", 64, shape, 256, 32)
    out["log"] = measure(
        lambda x: jnp.log(jnp.abs(x) + 1.0), "vpu_f32_log(abs+add+log)",
        64, shape, 256, 32)
    out["div"] = measure(
        lambda x: 0.731 / (x + 1.0), "vpu_f32_div(add+div)", 64, shape,
        256, 32)
    out["exp"] = measure(
        lambda x: jnp.exp(-jnp.abs(x)), "vpu_f32_exp(abs+neg+exp)",
        64, shape, 256, 32)
    if jax.default_backend() == "tpu":
        out["pallas_cos"] = measure_pallas_op(jnp.cos, "cos")
        out["pallas_sin"] = measure_pallas_op(jnp.sin, "sin")
        out["pallas_log"] = measure_pallas_op(
            lambda x: jnp.log(jnp.abs(x) + 1.0), "log(abs+add+log)")
        out["pallas_noise"] = measure_pallas_noise()
        out["pallas_noise_paired"] = measure_pallas_noise(paired=True)
    out["hbm"] = measure_hbm()
    path = pathlib.Path(__file__).resolve().parents[1] / "ROOFLINE_MEASURED.json"
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
