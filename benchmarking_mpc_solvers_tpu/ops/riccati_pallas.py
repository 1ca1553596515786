"""Batched Riccati backward pass as a single Pallas kernel.

Motivation (round-3 profile, PROFILE_ILQR_r03.json): at the BASELINE
config-3 shape (cartpole iLQR, T=100, B=1024) the backward Riccati scan is
the dominant stage of the batched solve — 5.3 ms per iteration vs 0.23 ms
for the derivative stage and 0.1 ms for all ten line-search forward passes.
The vmapped ``lax.scan`` lowers to ~15 tiny (B, S, S) batched matmuls per
timestep; at S=4 each does tens of FLOPs per scenario and the whole stage is
dispatch/latency-bound, not compute-bound.

This kernel instead lays the batch out on the VPU lanes — scenarios pack
into (8 sublanes x 128 lanes) tiles like ``ops/fused.py`` — and unrolls the
tiny state dimension (S <= 8, static) into scalar-per-lane arithmetic: the
entire Riccati step becomes a few hundred elementwise VPU ops on (8, 128)
tiles with NO matmuls and no lax.linalg calls. The horizon is the
(sequential) inner grid dimension with the value function V_x/V_xx carried
in VMEM scratch, so the whole T-step recursion is ONE kernel launch whose
cost is the HBM read of the per-step derivatives (~16 MB at T=100, B=1024).

Semantics are exactly ``solvers/ilqr.py:ILQR.backward_pass`` (scalar-action
case: regularized gain solve, UNregularized value recursion, Q_uu > 0 PD
check — reference numerics per ``MPCBenchmark/agents/ilqr.py:280-333``) and,
with ``mu=0``/``check_pd=False``/``with_c=True``, ``ops/riccati.py:
tvlqr_backward`` at ``reg=0`` (the SQP subproblem, ``solvers/sqp.py:77``).

Scalar-action only (every shipped benchmark plant has action_size == 1);
multi-input systems keep the general scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8
LANES = 128
TILE = SUBLANES * LANES  # scenarios per grid step


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _to_lanes(x, Bp):
    """(B, T, *rest) -> (T, *rest, 8, Bp//8), zero-padded on the batch."""
    x = jnp.moveaxis(jnp.asarray(x, jnp.float32), 0, -1)  # (T, *rest, B)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, Bp - x.shape[-1])]
    x = jnp.pad(x, pad)
    return x.reshape(x.shape[:-1] + (SUBLANES, Bp // SUBLANES))


@functools.partial(
    jax.jit, static_argnames=("check_pd", "with_c", "interpret")
)
def riccati_backward_batch(
    l_x,  # (B, T+1, S)
    l_u,  # (B, T, 1)
    l_xx,  # (B, T+1, S, S)
    l_uu,  # (B, T, 1, 1)
    l_ux,  # (B, T, 1, S)
    f_x,  # (B, T, S, S)
    f_u,  # (B, T, S, 1)
    mu,  # (B,) trust-region weight (gain solve only)
    c=None,  # (B, T, S) affine dynamics residual (TVLQR) or None
    check_pd: bool = True,
    with_c: bool = False,
    interpret: bool | None = None,
):
    """Batched backward Riccati recursion; returns ``(ks, Ks, ok)`` with
    shapes ``(B, T, 1)``, ``(B, T, 1, S)``, ``(B,)`` — the batched outputs
    of ``jax.vmap(ILQR.backward_pass)`` (``ok`` is per-scenario)."""
    B, Tp1, S = l_x.shape
    T = Tp1 - 1
    if S > SUBLANES:
        raise NotImplementedError(f"state_size {S} > {SUBLANES}")
    if l_u.shape[-1] != 1:
        raise NotImplementedError("Pallas Riccati kernel is scalar-action only")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Bp = _round_up(max(B, TILE), TILE)
    LB = Bp // SUBLANES

    lx_t = _to_lanes(l_x[:, :T], Bp)  # (T, S, 8, LB)
    tlx = _to_lanes(l_x[:, T], Bp)  # (S, 8, LB)
    lu_t = _to_lanes(l_u[:, :, 0], Bp)  # (T, 8, LB)
    lxx_t = _to_lanes(l_xx[:, :T], Bp)  # (T, S, S, 8, LB)
    tlxx = _to_lanes(l_xx[:, T], Bp)  # (S, S, 8, LB)
    luu_t = _to_lanes(l_uu[:, :, 0, 0], Bp)  # (T, 8, LB)
    lux_t = _to_lanes(l_ux[:, :, 0], Bp)  # (T, S, 8, LB)
    fx_t = _to_lanes(f_x, Bp)  # (T, S, S, 8, LB)
    fu_t = _to_lanes(f_u[..., 0], Bp)  # (T, S, 8, LB)
    # padding lanes get mu=1 so the guarded reciprocal stays finite there
    mu_t = _to_lanes(
        jnp.pad(jnp.asarray(mu, jnp.float32), (0, Bp - B), constant_values=1.0)[
            :, None
        ],
        Bp,
    )[0]  # (8, LB)
    inputs = [mu_t, tlx, tlxx, lx_t, lu_t, lxx_t, luu_t, lux_t, fx_t, fu_t]
    if with_c:
        inputs.append(_to_lanes(c, Bp))  # (T, S, 8, LB)

    def kernel(*refs):
        if with_c:
            (mu_r, tlx_r, tlxx_r, lx_r, lu_r, lxx_r, luu_r, lux_r, fx_r,
             fu_r, c_r, ks_r, Ks_r, ok_r, Vx, Vxx) = refs
        else:
            (mu_r, tlx_r, tlxx_r, lx_r, lu_r, lxx_r, luu_r, lux_r, fx_r,
             fu_r, ks_r, Ks_r, ok_r, Vx, Vxx) = refs
        it = pl.program_id(1)

        @pl.when(it == 0)
        def _():
            Vx[:] = tlx_r[:]
            Vxx[:] = tlxx_r[:]
            ok_r[:] = jnp.ones((SUBLANES, LANES), jnp.float32)

        mu_v = mu_r[:]
        vx = [Vx[i] for i in range(S)]
        vxx = [[Vxx[i, j] for j in range(S)] for i in range(S)]
        fx = [[fx_r[0, i, j] for j in range(S)] for i in range(S)]
        fu = [fu_r[0, i] for i in range(S)]
        lx = [lx_r[0, i] for i in range(S)]
        lxx = [[lxx_r[0, i, j] for j in range(S)] for i in range(S)]
        lux = [lux_r[0, i] for i in range(S)]
        lu_v = lu_r[0]
        luu_v = luu_r[0]

        # affine term: Q_x/Q_u contract V_x + V_xx @ c (tvlqr_backward's
        # ``Pc_p``); iLQR has no residual (with_c=False)
        if with_c:
            cv = [c_r[0, i] for i in range(S)]
            vxc = [
                vx[i] + sum(vxx[i][k] * cv[k] for k in range(S))
                for i in range(S)
            ]
        else:
            vxc = vx

        # Q-terms, all elementwise over the (8, LANES) scenario tile
        q_x = [lx[j] + sum(fx[i][j] * vxc[i] for i in range(S)) for j in range(S)]
        q_u = lu_v + sum(fu[i] * vxc[i] for i in range(S))
        m = [
            [sum(vxx[i][k] * fx[k][j] for k in range(S)) for j in range(S)]
            for i in range(S)
        ]  # V_xx @ f_x
        q_xx = [
            [
                lxx[j][jp] + sum(fx[i][j] * m[i][jp] for i in range(S))
                for jp in range(S)
            ]
            for j in range(S)
        ]
        w = [sum(vxx[i][k] * fu[k] for k in range(S)) for i in range(S)]
        q_uu = luu_v + sum(fu[i] * w[i] for i in range(S))
        q_ux = [lux[j] + sum(fu[i] * m[i][j] for i in range(S)) for j in range(S)]
        # mu enters the gain solve only (V_reg = V_xx + mu I)
        fufu = sum(fu[i] * fu[i] for i in range(S))
        q_uu_r = q_uu + mu_v * fufu
        q_ux_r = [
            q_ux[j] + mu_v * sum(fu[i] * fx[i][j] for i in range(S))
            for j in range(S)
        ]

        if check_pd:
            okf = (q_uu_r > 0.0).astype(jnp.float32)
            inv = 1.0 / jnp.where(q_uu_r > 0.0, q_uu_r, 1.0)
            ok_r[:] = ok_r[:] * okf
        else:
            inv = 1.0 / q_uu_r
        k = -q_u * inv
        K = [-q_ux_r[j] * inv for j in range(S)]

        # UNregularized value recursion (Tassa 2012 eq. 10 split — see
        # solvers/ilqr.py:199-213)
        for j in range(S):
            Vx[j] = q_x[j] + K[j] * (q_uu * k + q_u) + q_ux[j] * k
        vnew = [
            [
                q_xx[j][jp] + K[j] * q_uu * K[jp] + K[j] * q_ux[jp] + q_ux[j] * K[jp]
                for jp in range(S)
            ]
            for j in range(S)
        ]
        for j in range(S):
            for jp in range(S):
                Vxx[j, jp] = 0.5 * (vnew[j][jp] + vnew[jp][j])

        ks_r[0] = k
        for j in range(S):
            Ks_r[0, j] = K[j]

    def im(*blk):
        """index map factory: per-t blocks step backwards through time."""
        ndim = len(blk)

        def f(ib, it):
            return (T - 1 - it,) + (0,) * (ndim - 2) + (ib,)

        return f

    const = lambda ndim: (lambda ib, it: (0,) * (ndim - 1) + (ib,))  # noqa: E731
    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((SUBLANES, LANES), const(2), memory_space=vm),  # mu
        pl.BlockSpec((S, SUBLANES, LANES), const(3), memory_space=vm),  # tlx
        pl.BlockSpec((S, S, SUBLANES, LANES), const(4), memory_space=vm),  # tlxx
        pl.BlockSpec((1, S, SUBLANES, LANES), im(1, S, 8, 1), memory_space=vm),
        pl.BlockSpec((1, SUBLANES, LANES), im(1, 8, 1), memory_space=vm),  # lu
        pl.BlockSpec((1, S, S, SUBLANES, LANES), im(1, S, S, 8, 1), memory_space=vm),
        pl.BlockSpec((1, SUBLANES, LANES), im(1, 8, 1), memory_space=vm),  # luu
        pl.BlockSpec((1, S, SUBLANES, LANES), im(1, S, 8, 1), memory_space=vm),
        pl.BlockSpec((1, S, S, SUBLANES, LANES), im(1, S, S, 8, 1), memory_space=vm),
        pl.BlockSpec((1, S, SUBLANES, LANES), im(1, S, 8, 1), memory_space=vm),  # fu
    ]
    if with_c:
        in_specs.append(
            pl.BlockSpec((1, S, SUBLANES, LANES), im(1, S, 8, 1), memory_space=vm)
        )

    ks_t, Ks_t, ok_t = pl.pallas_call(
        kernel,
        grid=(Bp // TILE, T),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, SUBLANES, LANES), im(1, 8, 1), memory_space=vm),
            pl.BlockSpec((1, S, SUBLANES, LANES), im(1, S, 8, 1), memory_space=vm),
            pl.BlockSpec((SUBLANES, LANES), const(2), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, SUBLANES, LB), jnp.float32),
            jax.ShapeDtypeStruct((T, S, SUBLANES, LB), jnp.float32),
            jax.ShapeDtypeStruct((SUBLANES, LB), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, SUBLANES, LANES), jnp.float32),
            pltpu.VMEM((S, S, SUBLANES, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)

    ks = jnp.moveaxis(ks_t.reshape(T, Bp)[:, :B], -1, 0)[..., None]  # (B, T, 1)
    Ks = jnp.moveaxis(Ks_t.reshape(T, S, Bp)[:, :, :B], -1, 0)[:, :, None, :]
    ok = ok_t.reshape(Bp)[:B] > 0.5
    return ks, Ks, ok


def pallas_riccati_applicable(state_size: int, action_size: int) -> bool:
    """Static shape gate shared by the ILQR/SQP dispatchers."""
    return action_size == 1 and state_size <= SUBLANES


def use_pallas_riccati(flag: "bool | None") -> bool:
    """Resolve a solver's ``pallas_backward`` tri-state: ``None`` = auto
    (on for the TPU backend, off elsewhere — the interpret-mode kernel
    unrolls the horizon into the jaxpr at trace time, which is only
    acceptable for the small shapes used in tests)."""
    if flag is None:
        return jax.default_backend() == "tpu"
    return flag


def tvlqr_backward_cv(dyn, cost):
    """Drop-in for ``ops.riccati.tvlqr_backward(dyn, cost, reg=0.0)`` that
    dispatches to the single-launch Pallas kernel when the call is batched
    (``jax.custom_batching.custom_vmap``); unbatched calls keep the
    sequential scan. Scalar-action only (callers gate on
    ``pallas_riccati_applicable``)."""
    from .riccati import TVLQRPolicy, tvlqr_backward
    from .linearize import AffineDynamics, QuadCost

    @jax.custom_batching.custom_vmap
    def bw(A, Bm, c, Q, R, M, q, r, Qf, qf):
        return tuple(
            tvlqr_backward(
                AffineDynamics(A, Bm, c), QuadCost(Q, R, M, q, r, Qf, qf), reg=0.0
            )
        )

    @bw.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        ]
        A, Bm, c, Q, R, M, q, r, Qf, qf = args
        l_x = jnp.concatenate([q, qf[:, None]], axis=1)  # (B, T+1, S)
        l_xx = jnp.concatenate([Q, Qf[:, None]], axis=1)  # (B, T+1, S, S)
        ks, Ks, _ok = riccati_backward_batch(
            l_x, r, l_xx, R, M, A, Bm,
            mu=jnp.zeros((axis_size,), jnp.float32),
            c=c, check_pd=False, with_c=True,
        )
        return (Ks, ks), (True, True)

    K, k = bw(dyn.A, dyn.B, dyn.c, cost.Q, cost.R, cost.M, cost.q, cost.r,
              cost.Qf, cost.qf)
    return TVLQRPolicy(K, k)
