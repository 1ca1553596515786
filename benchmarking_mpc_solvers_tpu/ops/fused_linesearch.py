"""Fused feedback-rollout (line-search) Pallas kernel for ILQR/SQP.

After the Pallas Riccati backward pass (``riccati_pallas.py``) removed the
backward scan from the batched iLQR iteration, the remaining scan-shaped
stages are the forward passes: the n_alpha line-search candidates
``u = u_t + alpha*k_t + K_t(x - x_ref_t)`` each roll the plant out
sequentially over the horizon (``solvers/ilqr.py:forward_pass``,
``solvers/sqp.py:_try_step``). Batched over B scenarios these are vmapped
``lax.scan``s of tiny elementwise ops — dispatch-latency-bound exactly like
the backward scan was.

This kernel evaluates ALL n_alpha x B candidates in one launch: candidates
pack onto the VPU lanes ((8 sublanes x lanes) tiles, alpha-major), the
state lives in VMEM scratch across the horizon grid, and the *unmodified*
model functions run on the (S, 8, TL) tile layout (same trick as
``ops/fused.py`` — layout, not arithmetic, is the speedup). Per timestep it
applies the feedback law, clips to the box bounds, accumulates the
quadratic stage cost over the nonzero entries of ``model.state_cost.W``,
and steps the dynamics; the clipped controls are streamed back out so the
accepting caller can adopt the winning candidate.

Scope: action_size == 1 + ``quad_cost`` stage/terminal costs (every shipped
benchmark plant). ``with_terminal=True`` adds the terminal cost at zero
action (SQP's line-search objective, ``sqp.py:_try_step``); iLQR's forward
pass omits it (reference ``agents/ilqr.py:340-350``).
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


def _nz_pairs(W):
    W = np.asarray(W, np.float32)
    Wsym = 0.5 * (W + W.T)
    return [
        (i, j, float(Wsym[i, j] * (1.0 if i == j else 2.0)))
        for i in range(W.shape[0])
        for j in range(i, W.shape[0])
        if Wsym[i, j] != 0.0
    ]


@functools.partial(jax.jit, static_argnums=(0, 8, 9, 10))
def fused_linesearch(
    model: Model,
    alphas,  # (n_a,) step sizes
    x0,  # (B, S) initial states
    us,  # (B, T, 1) nominal controls
    ks,  # (B, T, 1) feedforward gains
    Ks,  # (B, T, 1, S) feedback gains
    xref,  # (B, T+1, S) nominal trajectory (xref[:, :T] used)
    g_z,  # (T, Z) goal features
    with_terminal: bool = False,
    interpret: bool | None = None,
    return_states: bool = False,
):
    """All line-search candidates of a batched iLQR/SQP iteration in one
    kernel launch. Returns ``(us_hat, costs)`` with shapes
    ``(n_a, B, T, 1)`` and ``(n_a, B)`` — the batched outputs of
    ``vmap_alpha(vmap_B(forward_pass))`` (controls clipped, cost summed
    over the horizon, + terminal when ``with_terminal``).

    ``return_states=True`` additionally streams each candidate's state
    trajectory back out — ``(us_hat, xs_hat, costs)`` with ``xs_hat`` of
    shape ``(n_a, B, T+1, S)`` — so the accepting caller can adopt the
    winning candidate's rollout and skip re-simulating it (the iteration's
    only remaining sequential scan, ``solvers/sqp.py:_solve`` /
    ``solvers/ilqr.py:_solve``)."""
    if model.action_size != 1:
        raise NotImplementedError("fused line search supports action_size == 1")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nz = _nz_pairs(model.state_cost.W)
    nzT = _nz_pairs(model.terminal_cost.W) if with_terminal else []
    lo = float(model.bounds_low[0])
    hi = float(model.bounds_high[0])
    B, T, _ = us.shape
    S = x0.shape[1]
    Z = g_z.shape[1]
    n_a = alphas.shape[0]
    N = n_a * B
    Np = _round_up(max(N, TILE), TILE)
    LB = Np // SUBLANES

    def lanes_const(x):  # (N,) -> (8, LB) zero-padded
        return jnp.pad(x, (0, Np - N)).reshape(SUBLANES, LB)

    def lanes_bcast(x):
        """(B, T, ...) per-scenario stream -> (T, ..., 8, LB), alpha-major
        lanes (lane = a*B + b), zero-padded."""
        x = jnp.moveaxis(jnp.asarray(x, jnp.float32), 0, -1)  # (T, ..., B)
        x = jnp.broadcast_to(
            x[..., None, :], x.shape[:-1] + (n_a, B)
        ).reshape(x.shape[:-1] + (N,))
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Np - N)])
        return x.reshape(x.shape[:-1] + (SUBLANES, LB))

    alpha_t = lanes_const(jnp.repeat(jnp.asarray(alphas, jnp.float32), B))
    x0_t = lanes_bcast(x0[:, None])[0]  # (S, 8, LB)
    us_t = lanes_bcast(us[..., 0])  # (T, 8, LB)
    ks_t = lanes_bcast(ks[..., 0])  # (T, 8, LB)
    Ks_t = lanes_bcast(Ks[:, :, 0])  # (T, S, 8, LB)
    xref_t = lanes_bcast(xref[:, :T])  # (T, S, 8, LB)

    def kernel(gz_ref, alpha_r, x0_r, us_r, ks_r, Ks_r, xref_r,
               ushat_r, cost_r, *rest):
        if return_states:
            xsout_r, xT_r, x_s, acc_s = rest
        else:
            x_s, acc_s = rest
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            for i in range(S):
                x_s[i] = x0_r[i]
            acc_s[:] = jnp.zeros((SUBLANES, LANES), jnp.float32)

        x = [x_s[i] for i in range(S)]
        fb = jnp.zeros((SUBLANES, LANES), jnp.float32)
        for i in range(S):
            fb = fb + Ks_r[0, i] * (x[i] - xref_r[0, i])
        u_hat = us_r[0] + alpha_r[:] * ks_r[0] + fb
        u_hat = jnp.clip(u_hat, lo, hi)
        ushat_r[0] = u_hat
        if return_states:
            for i in range(S):
                xsout_r[0, i] = x[i]

        # stage cost at the current (x, u_hat) (reference predict contract)
        xs = jnp.stack(x)  # (S, 8, LANES) — model fns index component rows
        z = model.transform(xs, u_hat[None])
        dc = jnp.zeros((SUBLANES, LANES), jnp.float32)
        for i, j, w in nz:
            zi = z[i] - gz_ref[t, i]
            zj = zi if i == j else z[j] - gz_ref[t, j]
            dc = dc + w * (zi * zj)
        # same +-1e30 saturation as models.base.quad_cost: diverged
        # rollouts must stay finite through the horizon sum
        c = acc_s[:] + jnp.clip(dc, -1e30, 1e30)
        x_new = model.dynamics(xs, u_hat[None])
        for i in range(S):
            x_s[i] = x_new[i]
        if return_states:
            @pl.when(t == T - 1)
            def _():
                for i in range(S):
                    xT_r[i] = x_new[i]

        if nzT:
            @pl.when(t == T - 1)
            def _():
                zT = model.transform(x_new, jnp.zeros_like(u_hat)[None])
                cT = jnp.zeros((SUBLANES, LANES), jnp.float32)
                for i, j, w in nzT:
                    zi = zT[i] - gz_ref[T - 1, i]
                    zj = zi if i == j else zT[j] - gz_ref[T - 1, j]
                    cT = cT + w * (zi * zj)
                cT = jnp.clip(cT, -1e30, 1e30)
                acc_s[:] = c + cT
                cost_r[:] = c + cT

            @pl.when(t != T - 1)
            def _():
                acc_s[:] = c
        else:
            acc_s[:] = c
            cost_r[:] = c

    vm = pltpu.VMEM
    im_t = lambda nd: (lambda ib, it: (it,) + (0,) * (nd - 2) + (ib,))  # noqa: E731
    const = lambda nd: (lambda ib, it: (0,) * (nd - 1) + (ib,))  # noqa: E731

    out_specs = [
        pl.BlockSpec((1, SUBLANES, LANES), im_t(3), memory_space=vm),
        pl.BlockSpec((SUBLANES, LANES), const(2), memory_space=vm),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, SUBLANES, LB), jnp.float32),
        jax.ShapeDtypeStruct((SUBLANES, LB), jnp.float32),
    ]
    if return_states:
        out_specs += [
            pl.BlockSpec((1, S, SUBLANES, LANES), im_t(4), memory_space=vm),
            pl.BlockSpec((S, SUBLANES, LANES), const(3), memory_space=vm),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((T, S, SUBLANES, LB), jnp.float32),
            jax.ShapeDtypeStruct((S, SUBLANES, LB), jnp.float32),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(Np // TILE, T),
        in_specs=[
            pl.BlockSpec((T, Z), lambda ib, it: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((SUBLANES, LANES), const(2), memory_space=vm),  # alpha
            pl.BlockSpec((S, SUBLANES, LANES), const(3), memory_space=vm),  # x0
            pl.BlockSpec((1, SUBLANES, LANES), im_t(3), memory_space=vm),  # us
            pl.BlockSpec((1, SUBLANES, LANES), im_t(3), memory_space=vm),  # ks
            pl.BlockSpec((1, S, SUBLANES, LANES), im_t(4), memory_space=vm),
            pl.BlockSpec((1, S, SUBLANES, LANES), im_t(4), memory_space=vm),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((S, SUBLANES, LANES), jnp.float32),
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(g_z, alpha_t, x0_t, us_t, ks_t, Ks_t, xref_t)
    ushat_t, cost_t = outs[0], outs[1]

    def delanes(x_t, lead):  # (*lead, 8, LB) -> (*lead, n_a, B)
        return x_t.reshape(lead + (Np,))[..., :N].reshape(lead + (n_a, B))

    us_hat = jnp.moveaxis(delanes(ushat_t, (T,)), 0, -1)[..., None]  # (n_a,B,T,1)
    costs = delanes(cost_t, ())
    if not return_states:
        return us_hat, costs
    xs_t = delanes(outs[2], (T, S))  # (T, S, n_a, B)
    xT_t = delanes(outs[3], (S,))  # (S, n_a, B)
    xs_hat = jnp.concatenate([xs_t, xT_t[None]], axis=0)  # (T+1, S, n_a, B)
    xs_hat = jnp.transpose(xs_hat, (2, 3, 0, 1))  # (n_a, B, T+1, S)
    return us_hat, xs_hat, costs


def linesearch_applicable(model: Model) -> bool:
    """Static gate for the custom_vmap dispatchers in ILQR/SQP."""
    return (
        model.action_size == 1
        and hasattr(model.state_cost, "W")
        and hasattr(model.terminal_cost, "W")
    )
