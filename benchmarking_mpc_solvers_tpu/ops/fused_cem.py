"""Single-kernel CEM step: in-kernel RNG, rollouts, top-k, mean/std update.

CEM was the config-5 perf tail (~365k solves/s, BENCH_SUITE_r04 /
PROFILE_CEM_r05.json): its ``solve_batch`` path materializes the
(T, B·K) sample and noise tensors in HBM every refinement iteration, and
the score pass alone costs 4.5 ms/iteration at B=10240. This kernel runs
the *entire* multi-iteration CEM refinement for a tile of scenarios with
zero large HBM arrays, the same way ``fused_mppi.py`` does for MPPI:

  per refinement iteration (``max_iter`` total, in VMEM throughout):
    pass 1 (score):  for k in K: regenerate the sample's noise
                     step-by-step from the on-core PRNG, roll the
                     dynamics with u = clip(mean_t + std_t·δ), accumulate
                     the stage cost into a per-lane (K, 8, TL) cost plane.
    select:          per-lane n-elite selection over the K cost planes by
                     iterated masked-min (K·n_elite vector ops — ties are
                     all marked and the weights renormalized by the
                     actual count; exact ties of continuous rollout costs
                     do not occur in practice).
    pass 2 (update): reseed identically, regenerate the same samples,
                     accumulate elite-weighted Σw·u and Σw·u² in VMEM;
                     then the reference's exponential smoothing
                     mean ← α·mean + (1−α)·elite_mean (same for std,
                     ``MPCBenchmark/agents/cem.py:69-73``).

Differences from ``CEM.solve_batch`` (both documented episode-tier
divergences, cf. ``ops/fused_mppi.py``): the noise stream is the
kernel's own (per (seed, iteration, k, program) streams), and the ε
early-exit is dropped — refinement always runs ``max_iter`` iterations
(with the study/bench configs std never reaches ε within max_iter; the
scalar and two-stage paths keep the exit).

HBM per step: the (T, B) mean plan read+write + (S, B) states — same
~2 MB at B=8192 as the MPPI kernel, vs ~0.7 GB/iteration streamed by
the two-stage path. Restricted to action_size == 1 + quad_cost models.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.base import Model
from .fused_mppi import (
    SUBLANES,
    _round_up,
    _std_normal,
    _std_normal_pair,
    interp_normals,
)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6))
def fused_cem_step(
    model: Model,
    K: int,
    n_elite: int,
    max_iter: int,
    alpha: float,
    std0: float,
    lanes: int,
    planned_tm,  # (T, B) current plan means, time-major
    x0_tm,  # (S, B) current states
    gz,  # (T, Z) goal features
    seed,  # int32 scalar — vary per MPC step
):
    """One full CEM refinement (max_iter iterations) for B scenarios;
    returns the new (T, B) plan means."""
    if model.action_size != 1:
        raise NotImplementedError("fused CEM supports action_size == 1")
    W = np.asarray(model.state_cost.W, np.float32)
    Z = W.shape[0]
    Wsym = 0.5 * (W + W.T)
    nz = [
        (i, j, float(Wsym[i, j] * (1.0 if i == j else 2.0)))
        for i in range(Z)
        for j in range(i, Z)
        if Wsym[i, j] != 0.0
    ]
    T, B = planned_tm.shape
    S = x0_tm.shape[0]
    lo = float(model.bounds_low[0])
    hi = float(model.bounds_high[0])
    tile = SUBLANES * lanes
    Bp = _round_up(max(B, tile), tile)
    if Bp != B:
        planned_tm = jnp.zeros((T, Bp), jnp.float32).at[:, :B].set(planned_tm)
        x0_tm = jnp.zeros((S, Bp), jnp.float32).at[:, :B].set(x0_tm)
    planned_p = planned_tm.reshape(T, SUBLANES, Bp // SUBLANES)
    x0_p = x0_tm.reshape(S, SUBLANES, Bp // SUBLANES)

    interpret = jax.default_backend() != "tpu"

    # cache the clipped samples of the current iteration in VMEM when they
    # fit (K·T·8·lanes f32): pass 2 then reads them back instead of paying
    # the Box-Muller regeneration again — the noise generator is the
    # kernel's single largest cost (ROOFLINE.md: ~26 G normals/s ceiling).
    # Budget: samples + cost/sel planes + 4 (T,8,lanes) stats against a
    # raised 100 MB scoped-vmem limit (the 16 MB default rejects the
    # cache; v5e has 128 MB physical); fall back to regeneration when over.
    sample_bytes = K * T * SUBLANES * lanes * 4
    other_bytes = (2 * K + 4 * T) * SUBLANES * lanes * 4
    cache_samples = sample_bytes + other_bytes <= 90 * 1024 * 1024

    def kernel(seed_ref, gz_ref, x0_ref, plan_ref, out_ref,
               cost_vmem, sel_vmem, mean_vmem, std_vmem, m1_vmem, m2_vmem,
               *maybe_samples):
        samp_vmem = maybe_samples[0] if cache_samples else None
        pid = pl.program_id(0)
        x0 = x0_ref[:]  # (S, 8, TL)
        mean_vmem[:] = plan_ref[:]
        std_vmem[:] = jnp.full((T, SUBLANES, lanes), std0, jnp.float32)

        def stream_seed(it, k):
            # distinct stream per (step seed, refinement iteration, sample
            # k, grid program); single combined scalar (multi-arg
            # prng_seed crashes the Mosaic backend, cf. fused_mppi.py)
            return seed_ref[0] + it * 15485863 + k * 7919 + pid * 104729

        def seed_for(it, k):
            if not interpret:
                pltpu.prng_seed(stream_seed(it, k))

        def noise_pair(it, k, t):
            # TPU: one Box-Muller draw yields the normals for timesteps t
            # and t+1 (cos and sin halves, _std_normal_pair — halves the
            # dominant trig/log cost). Interpret: stateless per-t stream.
            if interpret:
                s = stream_seed(it, k)
                return interp_normals(s, t, lanes), interp_normals(s, t + 1, lanes)
            return _std_normal_pair(lanes)

        def noise_last(it, k, t):
            if interpret:
                return interp_normals(stream_seed(it, k), t, lanes)
            return _std_normal(lanes)

        def sample_from(d, t):
            # (1, 8, TL) clipped sample — the clip happens on the SAMPLE
            # (agents/cem.py:58: samples are clipped before scoring and
            # before the elite statistics), not only inside the dynamics
            return jnp.clip(
                mean_vmem[pl.ds(t, 1)] + std_vmem[pl.ds(t, 1)] * d[None],
                lo, hi,
            )

        def iter_body(it, _):
            # ---- pass 1: score all K samples ----
            def score_k(k, _):
                seed_for(it, k)

                def step(t, d, carry):
                    x, acc = carry
                    u = sample_from(d, t)
                    if cache_samples:
                        samp_vmem[k, pl.ds(t, 1)] = u
                    z = model.transform(x, u)
                    c = jnp.zeros((SUBLANES, lanes), jnp.float32)
                    for i, j, w in nz:
                        zi = z[i] - gz_ref[t, i]
                        zj = zi if i == j else z[j] - gz_ref[t, j]
                        c = c + w * (zi * zj)
                    c = jnp.clip(c, -1e30, 1e30)  # quad_cost saturation
                    x_new = model.dynamics(x, u)
                    return x_new, acc + c

                def body(i, carry):
                    t = 2 * i
                    d0, d1 = noise_pair(it, k, t)
                    carry = step(t, d0, carry)
                    return step(t + 1, d1, carry)

                carry = lax.fori_loop(
                    0, T // 2, body,
                    (x0, jnp.zeros((SUBLANES, lanes), jnp.float32)),
                )
                if T % 2:
                    carry = step(T - 1, noise_last(it, k, T - 1), carry)
                cost_vmem[pl.ds(k, 1)] = carry[1][None]
                return 0

            lax.fori_loop(0, K, score_k, 0)

            # ---- per-lane n-elite selection over the K cost planes ----
            costs = cost_vmem[:]  # (K, 8, TL)
            # failure guard (cf. solvers/cem.py): nan-cost candidates are
            # infinitely bad, never elite
            costs = jnp.where(jnp.isfinite(costs), costs, jnp.float32(1e30))
            sel_vmem[:] = jnp.zeros((K, SUBLANES, lanes), jnp.float32)

            # exclusion offset must exceed the largest possible cost GAP:
            # per-step costs saturate at +-1e30 (quad_cost) and sum over T,
            # so finite totals reach T*1e30 — a fixed 1e30-scale offset
            # would let an already-picked low-cost candidate win again and
            # under-select elites on saturated-cost lanes
            excl = jnp.float32(4.0 * T * 1e30)

            def pick(j, _):
                cur = costs + sel_vmem[:] * excl
                mn = jnp.min(cur, axis=0)
                is_new = (cur == mn[None]) & (sel_vmem[:] < 0.5)
                sel_vmem[:] = jnp.where(is_new, 1.0, sel_vmem[:])
                return 0

            lax.fori_loop(0, n_elite, pick, 0)
            wsum = jnp.maximum(jnp.sum(sel_vmem[:], axis=0), 1.0)  # (8, TL)

            # ---- pass 2: elite-weighted mean / second moment ----
            m1_vmem[:] = jnp.zeros((T, SUBLANES, lanes), jnp.float32)
            m2_vmem[:] = jnp.zeros((T, SUBLANES, lanes), jnp.float32)

            def acc_k(k, _):
                if not cache_samples:
                    seed_for(it, k)
                w = sel_vmem[pl.ds(k, 1)][0] / wsum  # (8, TL)

                def add(t, u):
                    m1_vmem[pl.ds(t, 1)] += w[None] * u
                    m2_vmem[pl.ds(t, 1)] += w[None] * (u * u)

                if cache_samples:
                    def body(t, _):
                        add(t, samp_vmem[k, pl.ds(t, 1)])
                        return 0

                    lax.fori_loop(0, T, body, 0)
                else:
                    def body(i, _):
                        t = 2 * i
                        d0, d1 = noise_pair(it, k, t)
                        add(t, sample_from(d0, t))
                        add(t + 1, sample_from(d1, t + 1))
                        return 0

                    lax.fori_loop(0, T // 2, body, 0)
                    if T % 2:
                        add(T - 1, sample_from(noise_last(it, k, T - 1), T - 1))
                return 0

            lax.fori_loop(0, K, acc_k, 0)

            e_mean = m1_vmem[:]
            e_std = jnp.sqrt(jnp.maximum(m2_vmem[:] - e_mean * e_mean, 0.0))
            a = jnp.float32(alpha)
            mean_vmem[:] = a * mean_vmem[:] + (1.0 - a) * e_mean
            std_vmem[:] = a * std_vmem[:] + (1.0 - a) * e_std
            return 0

        lax.fori_loop(0, max_iter, iter_body, 0)
        out_ref[:] = mean_vmem[:]

    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec((T, Z), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, SUBLANES, lanes), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, SUBLANES, lanes), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, SUBLANES, lanes), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, SUBLANES, Bp // SUBLANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K, SUBLANES, lanes), jnp.float32),  # cost planes
            pltpu.VMEM((K, SUBLANES, lanes), jnp.float32),  # elite mask
            pltpu.VMEM((T, SUBLANES, lanes), jnp.float32),  # mean
            pltpu.VMEM((T, SUBLANES, lanes), jnp.float32),  # std
            pltpu.VMEM((T, SUBLANES, lanes), jnp.float32),  # Σ w·u
            pltpu.VMEM((T, SUBLANES, lanes), jnp.float32),  # Σ w·u²
        ] + ([pltpu.VMEM((K, T, SUBLANES, lanes), jnp.float32)]
             if cache_samples else []),  # clipped-sample cache
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), gz, x0_p, planned_p)
    return out.reshape(T, Bp)[:, :B]
