"""Profiling and timing utilities.

The reference's only instrumentation is ``time.time()`` around
``predict_action`` (``ExperimentCore/Experiment.py:80-89``). Here:

- ``trace`` wraps ``jax.profiler`` for real device traces (view in
  TensorBoard / xprof);
- ``slope_timer`` measures device time via in-jit repetition slopes — the
  only honest method on remote-tunneled runtimes where per-call wall clock
  includes a large RTT and ``block_until_ready`` may not await remote
  completion (measured ~30 ms RTT on this environment's axon tunnel);
- ``Timer`` is a simple wall-clock context manager for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler device trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    def __init__(self, name: str = ""):
        self.name = name
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        return False


def device_step_latency(
    step_fn: Callable,
    carry,
    keys: jax.Array,
    n_lo: int = 4,
    samples: int = 12,
    target_s: float = 0.35,
    max_hi: int = 160,
    return_stats: bool = False,
):
    """True device-side per-step latency percentiles (RTT-free), in ms.

    The reference times each ``predict_action`` with ``time.time()``
    (``ExperimentCore/Experiment.py:80-89``); on this environment's tunneled
    runtime a per-dispatch wall clock is floored by ~30 ms RTT, so sub-30ms
    solves all measure alike. Here each measurement chains ``n`` steps of
    ``step_fn(carry, keys[i]) -> (carry, scalar)`` inside ONE dispatch via
    ``lax.scan`` and wall-clock times the dispatch at two chain lengths;
    per-step samples ``(t_hi - t_lo) / (n_hi - n_lo)`` cancel the
    per-dispatch constant (RTT + dispatch overhead) pairwise. Returns
    ``(p50_ms, p90_ms)`` over ``samples`` interleaved lo/hi pairs.

    ``keys``: (n_keys, ...) per-step key batches; steps fold through them
    cyclically so both chain lengths see identical per-step inputs.

    Resolution: the estimator's noise floor is the dispatch wall-clock
    jitter divided by the chain-length difference — per-step values below
    it are indistinguishable from zero, and raw paired differences can
    even go slightly negative (r3's PROFILE_SQP, r4's PROFILE_I2C bug
    class). Percentiles are therefore clamped at 0, and with
    ``return_stats=True`` the function returns ``(p50_ms, p90_ms,
    resolution_ms)`` where ``resolution_ms`` is the sample standard
    deviation of the per-step estimates — any reported latency at or
    below it should be read as "< resolution", not as a measurement.
    Stages expected under ~0.1 ms need ``max_hi`` raised (chains of
    thousands) so the chain's device time dominates the jitter.
    """

    def chained(carry, ks, n):
        n_keys = jax.tree.leaves(ks)[0].shape[0]

        def body(c, i):
            c2, chk = step_fn(c, jax.tree.map(lambda a: a[i % n_keys], ks))
            return c2, chk

        c, chks = lax.scan(body, carry, jnp.arange(n))
        return c, jnp.sum(chks)

    fns = {}

    def run(n):
        if n not in fns:
            fns[n] = jax.jit(lambda c, ks, n=n: chained(c, ks, n))
            float(fns[n](carry, keys)[1])  # compile + warm
        t0 = time.perf_counter()
        float(fns[n](carry, keys)[1])  # scalar fetch = host sync
        return time.perf_counter() - t0

    # size the long chain so device time dominates the RTT (~30 ms). Two
    # passes: the n_lo dispatch gives an RTT-inflated first guess; one
    # paired difference at that guess then gives an RTT-FREE per-step
    # estimate to size the final chain (for sub-ms steps the first guess
    # is dominated by RTT/n_lo and would under-size the chain ~100x,
    # leaving the percentiles dispatch-jitter-shaped).
    def size_hi(est):
        return n_lo + int(max(8, min(max_hi, round(target_s / max(est, 1e-5)))))

    est = run(n_lo) / n_lo
    n_hi = size_hi(est)
    est2 = max((run(n_hi) - run(n_lo)) / (n_hi - n_lo), 1e-7)
    n_hi2 = size_hi(est2)
    if n_hi2 > 2 * n_hi:
        n_hi = n_hi2

    per_step = []
    for _ in range(samples):
        t_lo = run(n_lo)
        t_hi = run(n_hi)
        per_step.append((t_hi - t_lo) / (n_hi - n_lo))
    import numpy as np

    # the paired-difference estimator is unbiased but can go slightly
    # negative on sub-microsecond device times; a latency cannot
    p50 = max(0.0, float(np.percentile(per_step, 50) * 1e3))
    p90 = max(0.0, float(np.percentile(per_step, 90) * 1e3))
    if return_stats:
        resolution = float(np.std(per_step, ddof=1) * 1e3)
        return p50, p90, resolution
    return p50, p90


def slope_timer(
    fn: Callable,
    key: Optional[jax.Array] = None,
    inner_reps: int = 9,
    outer_reps: int = 3,
) -> float:
    """Device seconds per call of ``fn(key) -> scalar``.

    Jits ``lambda k: sum_i fn(fold_in(k, i))`` for 1 and ``inner_reps``
    inner repetitions and returns the slope — per-call overhead (dispatch,
    tunnel RTT, host sync) cancels out. ``fn`` must consume the key (fresh
    inputs per repetition) and return a scalar (forces full evaluation).
    """
    key = jax.random.PRNGKey(0) if key is None else key

    def repeated(k, n):
        def body(c, i):
            return c + fn(jax.random.fold_in(k, i)), None

        out, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return out

    times = {}
    for n in (1, inner_reps):
        f = jax.jit(lambda k, n=n: repeated(k, n))
        float(f(key))  # compile + warm
        t0 = time.perf_counter()
        for i in range(outer_reps):
            float(f(jax.random.fold_in(key, 1000 + i)))
        times[n] = (time.perf_counter() - t0) / outer_reps
    return (times[inner_reps] - times[1]) / (inner_reps - 1)
