"""Fused trajectory-derivative Pallas kernel: linearize + GN-quadratize.

After the Pallas Riccati backward pass (``riccati_pallas.py``) and the
fused line search (``fused_linesearch.py``), the batched SQP iteration's
remaining dominant stage is the derivative stage: per (scenario, timestep)
point, the dynamics Jacobians (A_t, B_t, residual c_t) and the
Gauss-Newton cost expansion (Q, R, M, q, r). As XLA-fused vmapped autodiff
at B=1024 x T=100 this costs ~5.6 ms per SQP iteration — dozens of small
elementwise kernels streaming (B, T)-sized intermediates through HBM
(see PROFILE_SQP_r04.json).

This kernel computes everything in ONE launch: points pack onto the VPU
lanes ((8 x 128) tiles over the scenario batch, horizon as a parallel grid
dimension — unlike the line-search kernel there is no sequential carry),
and the *unmodified* model functions run on the (S, 8, LANES) tile layout.
Per point it pushes the S+A basis tangents through ``jax.jvp`` of the
dynamics (one shared primal) and of the feature transform, then forms the
closed-form GN terms grad = 2 Jᵀ W_sym (z−g), H = 2 Jᵀ W_sym J with the
compile-time weight matrix (``quad_cost`` exposes ``.W``).

Scope: action_size == 1 + ``quad_cost`` stage costs (every shipped
benchmark plant) — same gate as the fused line search
(``fused_linesearch.linesearch_applicable``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.base import Model

SUBLANES = 8
LANES = 128
TILE = SUBLANES * LANES


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnums=(0, 4))
def fused_derivs(model: Model, xs, us, g_z, interpret: bool | None = None):
    """Batched linearize + GN-quadratize in one kernel launch.

    Args:
      model: quad_cost model with action_size == 1.
      xs: (B, T+1, S) nominal trajectories (xs[:, :T] used).
      us: (B, T, 1) nominal controls.
      g_z: (T, Z) goal features (shared across the batch).

    Returns ``(A, Bd, c, Q, R, M, q, r)`` with the shapes of
    ``vmap(linearize_dynamics)`` / ``vmap(quadratize_cost)`` (stage terms
    only — the terminal Qf/qf is one point per scenario and stays outside):
    A (B,T,S,S), Bd (B,T,S,1), c (B,T,S), Q (B,T,S,S), R (B,T,1,1),
    M (B,T,1,S), q (B,T,S), r (B,T,1).
    """
    if model.action_size != 1:
        raise NotImplementedError("fused_derivs supports action_size == 1")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Wsym = np.asarray(model.state_cost.W, np.float32)
    Wsym = 0.5 * (Wsym + Wsym.T)

    B, T, _ = us.shape
    S = xs.shape[2]
    Z = g_z.shape[1]
    D = S + 1
    Bp = _round_up(max(B, TILE), TILE)
    LB = Bp // SUBLANES

    def lanes(x):
        """(B, T, ...) -> (T, ..., 8, LB) zero-padded component rows."""
        x = jnp.moveaxis(jnp.asarray(x, jnp.float32), 0, -1)  # (T, ..., B)
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)])
        return x.reshape(x.shape[:-1] + (SUBLANES, LB))

    xs_t = lanes(xs[:, :T])  # (T, S, 8, LB)
    us_t = lanes(us[..., 0])  # (T, 8, LB)

    def kernel(gz_ref, xs_ref, us_ref,
               A_r, Bd_r, c_r, Q_r, R_r, M_r, q_r, r_r):
        t = pl.program_id(1)
        x = [xs_ref[0, i] for i in range(S)]  # S x (8, L)
        u = us_ref[0]  # (8, L)
        xst = jnp.stack(x)  # (S, 8, L)

        def dyn(xc, uc):
            return model.dynamics(xc, uc[None])

        def trans(xc, uc):
            return model.transform(xc, uc[None])

        one = jnp.ones_like(u)
        zero = jnp.zeros_like(u)
        # basis tangents as static stacks (scatter doesn't lower on TPU)
        unit_x = [
            jnp.stack([one if i == j else zero for i in range(S)])
            for j in range(S)
        ]
        zeros_x = jnp.stack([zero] * S)

        # basis-tangent pushes: columns j of the Jacobians wrt (x_0..x_{S-1}, u)
        y = None
        z = None
        Jf_cols = []  # each (S, 8, L): dynamics Jacobian column j
        Jz_cols = []  # each (Z, 8, L): transform Jacobian column j
        for j in range(D):
            if j < S:
                dx, du = unit_x[j], zero
            else:
                dx, du = zeros_x, one
            y, df = jax.jvp(dyn, (xst, u), (dx, du))
            z, dz = jax.jvp(trans, (xst, u), (dx, du))
            Jf_cols.append(df)
            Jz_cols.append(dz)

        # affine residual c = f(x,u) - A x - B u
        resid = y
        for j in range(S):
            resid = resid - Jf_cols[j] * x[j][None]
        resid = resid - Jf_cols[S] * u[None]

        for i in range(S):
            for j in range(S):
                A_r[0, i, j] = Jf_cols[j][i]
            Bd_r[0, i] = Jf_cols[S][i]
            c_r[0, i] = resid[i]

        # closed-form GN terms from the compile-time W (see module doc)
        # Wv = W_sym @ (z - g): unrolled over nonzero W entries
        zd = [z[i] - gz_ref[t, i] for i in range(Z)]
        Wv = []
        for i in range(Z):
            acc = None
            for k in range(Z):
                w = float(Wsym[i, k])
                if w != 0.0:
                    term = w * zd[k]
                    acc = term if acc is None else acc + term
            Wv.append(acc)
        # WJ[i][j] = (W_sym @ Jz_col_j)[i]
        WJ = []
        for j in range(D):
            col = []
            for i in range(Z):
                acc = None
                for k in range(Z):
                    w = float(Wsym[i, k])
                    if w != 0.0:
                        term = w * Jz_cols[j][k]
                        acc = term if acc is None else acc + term
                col.append(acc)
            WJ.append(col)

        def dot_z(a_rows, b_rows):
            acc = None
            for i in range(Z):
                if a_rows[i] is None or b_rows[i] is None:
                    continue
                term = a_rows[i] * b_rows[i]
                acc = term if acc is None else acc + term
            return zero if acc is None else acc

        Jz_rows = [[Jz_cols[j][i] for i in range(Z)] for j in range(D)]
        grad = [2.0 * dot_z(Jz_rows[j], Wv) for j in range(D)]
        H = [[2.0 * dot_z(Jz_rows[j1], WJ[j2]) for j2 in range(D)]
             for j1 in range(D)]

        for i in range(S):
            q_r[0, i] = grad[i]
            for j in range(S):
                Q_r[0, i, j] = H[i][j]
            M_r[0, i] = H[S][i]
        r_r[0] = grad[S]
        R_r[0] = H[S][S]

    vm = pltpu.VMEM
    im_t = lambda nd: (lambda ib, it: (it,) + (0,) * (nd - 2) + (ib,))  # noqa: E731

    out_specs = (
        pl.BlockSpec((1, S, S, SUBLANES, LANES), im_t(5), memory_space=vm),  # A
        pl.BlockSpec((1, S, SUBLANES, LANES), im_t(4), memory_space=vm),  # Bd
        pl.BlockSpec((1, S, SUBLANES, LANES), im_t(4), memory_space=vm),  # c
        pl.BlockSpec((1, S, S, SUBLANES, LANES), im_t(5), memory_space=vm),  # Q
        pl.BlockSpec((1, SUBLANES, LANES), im_t(3), memory_space=vm),  # R
        pl.BlockSpec((1, S, SUBLANES, LANES), im_t(4), memory_space=vm),  # M
        pl.BlockSpec((1, S, SUBLANES, LANES), im_t(4), memory_space=vm),  # q
        pl.BlockSpec((1, SUBLANES, LANES), im_t(3), memory_space=vm),  # r
    )
    out_shape = (
        jax.ShapeDtypeStruct((T, S, S, SUBLANES, LB), jnp.float32),
        jax.ShapeDtypeStruct((T, S, SUBLANES, LB), jnp.float32),
        jax.ShapeDtypeStruct((T, S, SUBLANES, LB), jnp.float32),
        jax.ShapeDtypeStruct((T, S, S, SUBLANES, LB), jnp.float32),
        jax.ShapeDtypeStruct((T, SUBLANES, LB), jnp.float32),
        jax.ShapeDtypeStruct((T, S, SUBLANES, LB), jnp.float32),
        jax.ShapeDtypeStruct((T, S, SUBLANES, LB), jnp.float32),
        jax.ShapeDtypeStruct((T, SUBLANES, LB), jnp.float32),
    )

    A_t, Bd_t, c_t, Q_t, R_t, M_t, q_t, r_t = pl.pallas_call(
        kernel,
        grid=(Bp // TILE, T),
        in_specs=[
            pl.BlockSpec((T, Z), lambda ib, it: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S, SUBLANES, LANES), im_t(4), memory_space=vm),
            pl.BlockSpec((1, SUBLANES, LANES), im_t(3), memory_space=vm),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(g_z, xs_t, us_t)

    def delanes(x_t, lead):  # (T, *lead, 8, LB) -> (B, T, *lead)
        x = x_t.reshape((T,) + lead + (Bp,))[..., :B]
        return jnp.moveaxis(x, -1, 0)

    A = delanes(A_t, (S, S))
    Bd = delanes(Bd_t, (S,))[..., None]  # (B, T, S, 1)
    c = delanes(c_t, (S,))
    Q = delanes(Q_t, (S, S))
    R = delanes(R_t, ())[..., None, None]  # (B, T, 1, 1)
    M = delanes(M_t, (S,))[..., None, :]  # (B, T, 1, S)
    q = delanes(q_t, (S,))
    r = delanes(r_t, ())[..., None]  # (B, T, 1)
    return A, Bd, c, Q, R, M, q, r
