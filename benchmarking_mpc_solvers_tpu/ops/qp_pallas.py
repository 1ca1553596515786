"""Blocked Pallas ADMM for batched box-QPs — the QP-MPC hot loop on-chip.

BASELINE.json's north star asks for "ADMM iterations run as blocked Pallas
linear-algebra kernels"; this module is that kernel. It solves B independent
condensed box-QPs

    min_U  ½ Uᵀ H_b U + g_bᵀ U   s.t.  lo ≤ U ≤ hi      (n = T·A variables)

by OSQP-style ADMM with a *precomputed* inverse M = (H + ρI)⁻¹ (computed
once outside, on the MXU via batched Cholesky/inverse). The iteration

    u   = M (ρ(z − y) − g)
    u'  = α u + (1−α) z
    z⁺  = clip(u' + y, lo, hi)
    y⁺  = y + u' − z⁺

is pure (matvec + elementwise); the XLA scan path re-reads the (B, n, n)
factorization from HBM on every one of the ``iters`` iterations
(B=512, n=50: ~5 MB × iters), while this kernel loads each block's
factorizations into VMEM once and runs every iteration on-chip.

Two layouts, chosen by ``Minv.ndim``:

- **shared** (2-D Minv): all B problems share H (linear MPC linearized at
  the goal — only g varies with x₀). The matvec is one (n, n) @ (n, BB)
  MXU matmul per iteration; problems pack the lane dimension.
- **per-problem** (3-D Minv): LTV MPC, one H per scenario. Minv is staged
  as (n_j, n_i, BB) — problems on lanes, rows on sublanes — and the matvec
  unrolls over j as BB-wide fused multiply-adds (VPU), so each block's
  n²·BB working set is read from VMEM, not HBM, per iteration.

Fixed iteration count (no early exit): the batch runs lock-step, matching
``qp.admm_solve`` with eps=0. Runs in interpreter mode off-TPU (tests).

Reference relative: none — the reference has no QP solvers (SURVEY.md §2);
this is new machinery owed by BASELINE.json configs 1-2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


VMEM_BUDGET_BYTES = 12 * 1024 * 1024  # conservative slice of the ~16MB VMEM


def _admm_iterate_xla(Minv, g, lo, hi, rho, alpha, iters):
    """Plain-XLA fallback with identical iteration semantics (used when the
    per-program VMEM footprint would exceed the budget)."""
    matvec = (lambda v: v @ Minv.T) if Minv.ndim == 2 else (
        lambda v: jnp.einsum("bij,bj->bi", Minv, v)
    )

    def body(_, zy):
        z, y = zy
        u = matvec(rho * (z - y) - g)
        u_rel = alpha * u + (1.0 - alpha) * z
        z_new = jnp.clip(u_rel + y, lo, hi)
        return z_new, y + u_rel - z_new

    z0 = jnp.zeros_like(g)
    z, _ = lax.fori_loop(0, iters, body, (z0, z0))
    return z


@functools.partial(
    jax.jit, static_argnames=("rho", "alpha", "iters", "lanes", "interpret")
)
def admm_iterate(
    Minv,
    g,
    lo,
    hi,
    rho: float = 1.0,
    alpha: float = 1.6,
    iters: int = 100,
    lanes: int = 128,
    interpret: bool | None = None,
):
    """Run ``iters`` ADMM iterations for B box-QPs in one kernel launch.

    Args:
      Minv: (n, n) shared or (B, n, n) per-problem inverse of (H + ρI).
      g: (B, n) linear terms.
      lo, hi: (n,) or (B, n) box bounds.
      rho, alpha: ADMM penalty and over-relaxation (OSQP defaults).
      iters: fixed iteration count (static).
      lanes: problems per kernel program (lane-dim block).
      interpret: run the kernel in interpreter mode (for CPU tests). Default
        (None) picks by the process default backend; pass explicitly when
        the computation is committed to a device that differs from it.

    Returns: z (B, n) — the projected (always box-feasible) iterate,
    matching ``qp.admm_solve(..., eps=0).U``.

    Falls back to an equivalent plain-XLA loop when the per-program VMEM
    footprint (per-problem M block + 4 vector blocks) would exceed
    ``VMEM_BUDGET_BYTES`` — e.g. per-problem layouts with n = T·A ≳ 170.
    """
    B, n = g.shape
    shared = Minv.ndim == 2
    n_pad = _round_up(n, SUBLANES)
    Bp = _round_up(max(B, lanes), lanes)

    m_bytes = (n_pad * n_pad * 4) if shared else (n * n_pad * lanes * 4)
    vmem_bytes = m_bytes + 5 * n_pad * lanes * 4  # 4 vec inputs + 1 output
    if vmem_bytes > VMEM_BUDGET_BYTES:
        lo_b = jnp.broadcast_to(lo, (B, n)).astype(jnp.float32)
        hi_b = jnp.broadcast_to(hi, (B, n)).astype(jnp.float32)
        return _admm_iterate_xla(Minv, g, lo_b, hi_b, rho, alpha, iters)

    lo = jnp.broadcast_to(lo, (B, n)).astype(jnp.float32)
    hi = jnp.broadcast_to(hi, (B, n)).astype(jnp.float32)

    def pad_tm(a):  # (B, n) -> (n_pad, Bp) time-major, zero-padded
        out = jnp.zeros((n_pad, Bp), jnp.float32)
        return out.at[:n, :B].set(a.T)

    g_tm, lo_tm, hi_tm = pad_tm(g), pad_tm(lo), pad_tm(hi)

    if shared:
        M = jnp.zeros((n_pad, n_pad), jnp.float32).at[:n, :n].set(Minv)
        m_spec = pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    else:
        # (B, n_i, n_j) -> (n_j, n_pad_i, Bp): row blocks on sublanes,
        # problems on lanes, contraction index j as the leading (unrolled) axis
        M = jnp.zeros((n, n_pad, Bp), jnp.float32).at[:, :n, :B].set(
            jnp.transpose(Minv, (2, 1, 0))
        )
        m_spec = pl.BlockSpec(
            (n, n_pad, lanes), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    vec_spec = pl.BlockSpec((n_pad, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)

    def kernel(m_ref, g_ref, lo_ref, hi_ref, out_ref):
        g_b = g_ref[:]
        lo_b = lo_ref[:]
        hi_b = hi_ref[:]

        def matvec(v):
            if shared:
                return jnp.dot(m_ref[:], v, preferred_element_type=jnp.float32)
            u = m_ref[0] * v[0:1]
            for j in range(1, n):
                u = u + m_ref[j] * v[j : j + 1]
            return u

        def body(_, zy):
            z, y = zy
            u = matvec(rho * (z - y) - g_b)
            u_rel = alpha * u + (1.0 - alpha) * z
            z_new = jnp.clip(u_rel + y, lo_b, hi_b)
            return z_new, y + u_rel - z_new

        z0 = jnp.zeros_like(g_b)
        z, _ = lax.fori_loop(0, iters, body, (z0, z0))
        out_ref[:] = z

    z = pl.pallas_call(
        kernel,
        grid=(Bp // lanes,),
        in_specs=[m_spec, vec_spec, vec_spec, vec_spec],
        out_specs=vec_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, Bp), jnp.float32),
        interpret=(jax.default_backend() != "tpu") if interpret is None else interpret,
    )(M, g_tm, lo_tm, hi_tm)
    return z[:n, :B].T
