"""Fused derivative kernel (ops/fused_derivs.py) vs vmapped autodiff.

The kernel computes, in one launch, exactly what
``vmap(linearize_dynamics)`` + ``vmap(quadratize_cost(gauss_newton=True))``
compute for the stage terms — equality here (interpret mode on CPU) plus
``test_riccati_pallas.test_sqp_batched_solve_pallas_vs_scan`` (which runs
the whole SQP solve through the kernel path) certify the production path.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from benchmarking_mpc_solvers_tpu.envs import (
    AcrobotEnv,
    CartPoleSwingUpEnv,
    PendulumEnv,
)
from benchmarking_mpc_solvers_tpu.ops.fused_derivs import fused_derivs
from benchmarking_mpc_solvers_tpu.ops.linearize import (
    linearize_dynamics,
    quadratize_cost,
)

# slow tier: interpret-mode Pallas (see pytest.ini markers)
pytestmark = pytest.mark.slow


@pytest.mark.parametrize(
    "env", [PendulumEnv, CartPoleSwingUpEnv, AcrobotEnv],
    ids=lambda e: e.name,
)
def test_fused_derivs_matches_autodiff(env):
    m = env.model
    B, T = 5, 7
    rng = np.random.default_rng(0)
    xs = jnp.float32(rng.uniform(-1.2, 1.2, (B, T + 1, m.state_size)))
    us = jnp.float32(rng.uniform(-1, 1, (B, T, 1)))
    g_z = jnp.float32(rng.uniform(-0.2, 0.2, (T, m.goal_size)))

    A, Bd, c, Q, R, M, q, r = fused_derivs(m, xs, us, g_z)
    dyn = jax.vmap(lambda x, u: linearize_dynamics(m, x[:-1], u))(xs, us)
    cost = jax.vmap(
        lambda x, u: quadratize_cost(m, x, u, g_z, gauss_newton=True)
    )(xs, us)

    for name, got, want in [
        ("A", A, dyn.A), ("B", Bd, dyn.B), ("c", c, dyn.c),
        ("Q", Q, cost.Q), ("R", R, cost.R), ("M", M, cost.M),
        ("q", q, cost.q), ("r", r, cost.r),
    ]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5,
            err_msg=name,
        )


def test_quadratize_closed_form_matches_autodiff_fallback():
    """The closed-form GN path (quad_cost .W present) equals the autodiff
    GN fallback (no .W attribute) on a nonlinear plant."""
    import dataclasses

    m = CartPoleSwingUpEnv.model
    T = 6
    rng = np.random.default_rng(1)
    xs = jnp.float32(rng.uniform(-1.5, 1.5, (T + 1, m.state_size)))
    us = jnp.float32(rng.uniform(-1, 1, (T, m.action_size)))
    g_z = jnp.float32(rng.uniform(-0.3, 0.3, (T, m.goal_size)))

    class _NoW:
        def __init__(self, f):
            self._f = f

        def __call__(self, *args):
            return self._f(*args)

    m2 = dataclasses.replace(
        m, state_cost=_NoW(m.state_cost), terminal_cost=_NoW(m.terminal_cost)
    )
    a = quadratize_cost(m, xs, us, g_z, gauss_newton=True)
    b = quadratize_cost(m2, xs, us, g_z, gauss_newton=True)
    for name, got, want in zip(a._fields, a, b):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6,
            err_msg=name,
        )


def test_ilqr_gn_derivatives_fused_matches_scan():
    """ILQR's Gauss-Newton derivative stage through the fused kernel
    (pallas_backward=True, interpret on CPU) equals the vmapped autodiff
    stage (pallas_backward=False)."""
    from benchmarking_mpc_solvers_tpu.solvers import ILQR

    m = CartPoleSwingUpEnv.model
    T, B = 7, 4
    rng = np.random.default_rng(0)
    xs = jnp.float32(rng.uniform(-1.2, 1.2, (B, T + 1, m.state_size)))
    us = jnp.float32(rng.uniform(-1, 1, (B, T, 1)))
    g_z = jnp.zeros((T, m.goal_size), jnp.float32)

    s_on = ILQR(model=m, T=T, gauss_newton=True, pallas_backward=True)
    s_off = ILQR(model=m, T=T, gauss_newton=True, pallas_backward=False)
    d_on = jax.vmap(lambda x, u: s_on.derivatives(x, u, g_z))(xs, us)
    d_off = jax.vmap(lambda x, u: s_off.derivatives(x, u, g_z))(xs, us)
    for name, got, want in zip(d_on._fields, d_on, d_off):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5,
            err_msg=name,
        )
