"""Single-kernel MPPI step: in-kernel RNG, rollout, softmax, update.

The two-stage fused path (``fused.py`` + XLA softmax/einsums) still streams
~500 MB of (T, B·K) arrays through HBM per MPC step (noise, perturbed
action sequences, control-penalty and update einsums). This kernel performs
the *entire* MPPI step for a tile of scenarios with zero large HBM arrays:

  pass 1 (score):  for k in range(K): regenerate δₖ step-by-step from the
                   on-core PRNG (Box-Muller over ``pltpu.prng_random_bits``),
                   roll the dynamics, accumulate stage cost + λ·u·δ/std².
  softmax:         β = min_k, w = exp(−(c−β)/λ)/Σ — per-lane over the K
                   accumulators held in VMEM (lanes are scenarios, so this
                   is the exact per-scenario softmax).
  pass 2 (update): reseed identically, regenerate the same δₖ, accumulate
                   Σₖ wₖ δₖ into the plan update.

HBM per step: read/write of the (T, B) plan + the (S, B) states — ~2 MB at
B=8192 vs ~500 MB for the two-stage path, at the price of 2x the rollout
compute (the VPU has the headroom). Layout identical to ``fused.py``:
scenarios pack into (8 sublanes × TL lanes) tiles and the unmodified model
functions run inside the kernel.

Determinism: the PRNG is seeded per (step_seed, k, program) — both passes
regenerate identical noise; different step seeds give fresh noise per MPC
step. Restricted to action_size == 1 + quad_cost models, like ``fused.py``.
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

SUBLANES = 8
DEFAULT_LANES = 512


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def pick_lanes(B: int) -> int:
    """Lane count whose (8·lanes) tile divides B — padding tiles are real
    kernel compute (B=10240 at 512 lanes pads to 3x4096 = 20% waste); fall
    back to the wide/narrow default when nothing divides."""
    for lanes in (512, 256, 128):
        if B % (SUBLANES * lanes) == 0:
            return lanes
    return 512 if B >= 4096 else 128


def _u01(shape):
    """Uniforms in (0,1) from the on-core PRNG: take 24 high bits (via a
    uint32 bitcast — the raw bits are int32 and an arithmetic shift would
    corrupt them; uint32->f32 casts are unsupported so the positive 24-bit
    value routes back through int32)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24)
    )


def _box_muller(u: jnp.ndarray) -> jnp.ndarray:
    """(2*8, lanes) uniforms in [0,1) -> (8, lanes) standard normals."""
    u1 = u[:SUBLANES] + 1e-7  # strictly positive for the log
    u2 = u[SUBLANES:]
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.float32(np.pi) * u2)


def _std_normal(lanes: int):
    """(8, lanes) Box-Muller standard normals (two uint32 draws each)."""
    return _box_muller(_u01((2 * SUBLANES, lanes)))


def _std_normal_pair(lanes: int):
    """Two independent (8, lanes) standard-normal tiles from ONE
    Box-Muller draw: the transform's cosine AND sine halves (exactly
    jointly Gaussian). sin/cos are the chip's most expensive VPU ops by
    far (ROOFLINE.md: ~31 G evals/s vs 2.2 T FMA evals/s), and the
    kernels' noise generation is their single largest cost — pairing
    halves the log/sqrt/trig work per normal."""
    u = _u01((2 * SUBLANES, lanes))
    u1 = u[:SUBLANES] + 1e-7
    u2 = u[SUBLANES:]
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = 2.0 * jnp.float32(np.pi) * u2
    return r * jnp.cos(ang), r * jnp.sin(ang)


def interp_normals(seed_c, t, lanes: int):
    """Interpret-mode noise: counter-based (murmur3-finalizer) normals as a
    pure function of (combined seed, timestep, element index).

    The TPU path's stateful on-core PRNG (seeded per sample k, advanced per
    timestep) is unavailable off-TPU (``prng_seed`` has no CPU lowering), so
    interpret mode uses this stateless equivalent. Being a plain-jnp pure
    function, tests can call it *outside* the kernel to reproduce the exact
    noise stream and check the whole MPPI update closed-form
    (tests/test_fused.py).
    """
    idx = jax.lax.broadcasted_iota(jnp.uint32, (2 * SUBLANES, lanes), 0) * jnp.uint32(
        lanes
    ) + jax.lax.broadcasted_iota(jnp.uint32, (2 * SUBLANES, lanes), 1)
    x = (
        jnp.asarray(seed_c).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        + jnp.asarray(t).astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
        + idx
    )
    x ^= x >> 16
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> 16
    u = (x >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return _box_muller(u)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def fused_mppi_step(
    model: Model,
    K: int,
    std: float,
    lam: float,
    lanes: int,
    planned_tm,  # (T, B) current plans, time-major
    x0_tm,  # (S, B) current states
    gz,  # (T, Z) goal features
    seed,  # int32 scalar — vary per MPC step
):
    """One full MPPI update for B scenarios; returns new (T, B) plans."""
    if model.action_size != 1:
        raise NotImplementedError("fused MPPI supports action_size == 1")
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
    tile = SUBLANES * lanes
    Bp = _round_up(max(B, tile), tile)
    if Bp != B:
        planned_tm = jnp.zeros((T, Bp), jnp.float32).at[:, :B].set(planned_tm)
        x0_tm = jnp.zeros((S, Bp), jnp.float32).at[:, :B].set(x0_tm)
    planned_p = planned_tm.reshape(T, SUBLANES, Bp // SUBLANES)
    x0_p = x0_tm.reshape(S, SUBLANES, Bp // SUBLANES)
    inv_var = 1.0 / (std * std)

    interpret = jax.default_backend() != "tpu"

    # cache pass 1's noise in VMEM when it fits (K·T·8·lanes f32, plus the
    # cost planes, against a raised scoped-vmem limit — cf. fused_cem.py's
    # sample cache): pass 2 then reads the identical deltas back instead of
    # paying the Box-Muller regeneration again. Pure optimization — the
    # noise stream is bit-identical either way.
    noise_bytes = K * T * SUBLANES * lanes * 4
    cache_noise = noise_bytes + K * SUBLANES * lanes * 4 <= 90 * 1024 * 1024

    def kernel(seed_ref, gz_ref, x0_ref, plan_ref, out_ref, cost_vmem,
               *maybe_noise):
        noise_vmem = maybe_noise[0] if cache_noise else None
        pid = pl.program_id(0)
        x0 = x0_ref[:]  # (S, 8, TL)

        def seed_for(k):
            # distinct stream per (step seed, sample k, grid program);
            # multi-arg prng_seed crashes the Mosaic backend, so combine
            # into one scalar with large odd strides
            if not interpret:
                pltpu.prng_seed(seed_ref[0] + k * 7919 + pid * 104729)

        def noise_pair(k, t):
            # TPU: stateful on-core PRNG, seeded by seed_for(k); one
            # Box-Muller draw yields the normals for timesteps t and t+1
            # (cos and sin halves — see _std_normal_pair). Interpret: the
            # stateless counter-based equivalent, still one value per
            # timestep (reproducible outside the kernel for tests).
            if interpret:
                s = seed_ref[0] + k * 7919 + pid * 104729
                return interp_normals(s, t, lanes), interp_normals(s, t + 1, lanes)
            return _std_normal_pair(lanes)

        def noise_last(k, t):
            if interpret:
                return interp_normals(
                    seed_ref[0] + k * 7919 + pid * 104729, t, lanes
                )
            return _std_normal(lanes)

        def rollout_cost(k, _):
            seed_for(k)

            def step(t, d, carry):
                x, acc = carry
                if cache_noise:
                    noise_vmem[k, pl.ds(t, 1)] = d[None]
                u = plan_ref[pl.ds(t, 1)] + std * d  # (1, 8, TL)
                z = model.transform(x, u)
                c = jnp.zeros((SUBLANES, lanes), jnp.float32)
                for i, j, w in nz:
                    zi = z[i] - gz_ref[t, i]
                    zj = zi if i == j else z[j] - gz_ref[t, j]
                    c = c + w * (zi * zj)
                # same +-1e30 saturation as models.base.quad_cost
                c = jnp.clip(c, -1e30, 1e30)
                # control penalty λ uᵀ Σ⁻¹ δ with δ = std·d
                c = c + lam * inv_var * (u[0] * (std * d))
                x_new = model.dynamics(x, u)
                return x_new, acc + c

            def body(i, carry):
                t = 2 * i
                d0, d1 = noise_pair(k, t)
                carry = step(t, d0, carry)
                return step(t + 1, d1, carry)

            carry = lax.fori_loop(
                0, T // 2, body, (x0, jnp.zeros((SUBLANES, lanes), jnp.float32))
            )
            if T % 2:
                carry = step(T - 1, noise_last(k, T - 1), carry)
            cost_vmem[pl.ds(k, 1)] = carry[1][None]
            return 0

        lax.fori_loop(0, K, rollout_cost, 0)

        # per-lane softmax over the K cost planes; normalized weights are
        # written back into the scratch so pass 2 can read them by dynamic
        # index (value-level dynamic_slice is not lowerable on TPU)
        costs = cost_vmem[:]  # (K, 8, TL)
        # failure guard (cf. solvers/mppi.py): nan-cost candidates
        # (overflowed rollouts) score 1e30 instead of poisoning min/softmax
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.float32(1e30))
        beta = jnp.min(costs, axis=0)
        wts = jnp.exp(-(costs - beta[None]) / lam)
        cost_vmem[:] = wts / jnp.sum(wts, axis=0)[None]

        # pass 2: regenerate the same noise, accumulate the weighted update
        out_ref[:] = plan_ref[:]

        def accumulate(k, _):
            w_k = cost_vmem[pl.ds(k, 1)][0]  # (8, TL)

            if cache_noise:
                def body(t, _):
                    d = noise_vmem[k, pl.ds(t, 1)][0]
                    out_ref[pl.ds(t, 1)] += (w_k * (std * d))[None]
                    return 0

                lax.fori_loop(0, T, body, 0)
                return 0

            seed_for(k)

            def add(t, d):
                out_ref[pl.ds(t, 1)] += (w_k * (std * d))[None]

            def body(i, _):
                t = 2 * i
                d0, d1 = noise_pair(k, t)
                add(t, d0)
                add(t + 1, d1)
                return 0

            lax.fori_loop(0, T // 2, body, 0)
            if T % 2:
                add(T - 1, noise_last(k, T - 1))
            return 0

        lax.fori_loop(0, K, accumulate, 0)

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
        scratch_shapes=[pltpu.VMEM((K, SUBLANES, lanes), jnp.float32)]
        + ([pltpu.VMEM((K, T, SUBLANES, lanes), jnp.float32)]
           if cache_noise else []),  # pass-1 noise cache
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray([seed], jnp.int32), gz, x0_p, planned_p)
    return out.reshape(T, Bp)[:, :B]
