"""Fused line-search kernel vs the scan forward passes (ILQR / SQP)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from benchmarking_mpc_solvers_tpu.envs import CartPoleSwingUpEnv, PendulumEnv
from benchmarking_mpc_solvers_tpu.ops.fused_linesearch import fused_linesearch
from benchmarking_mpc_solvers_tpu.ops.rollout import simulate_trajectory
from benchmarking_mpc_solvers_tpu.solvers import ILQR, SQP

# slow tier: excluded from the fast default run (see pytest.ini markers)
pytestmark = pytest.mark.slow


def _setup(env, T, B, key=0):
    model = env.model
    ks_rng = jax.random.split(jax.random.PRNGKey(key), 5)
    x0 = jnp.tile(env.start_state, (B, 1)) + 0.1 * jax.random.normal(
        ks_rng[0], (B, model.state_size)
    )
    us = 0.5 * jax.random.normal(ks_rng[1], (B, T, 1))
    ks = 0.3 * jax.random.normal(ks_rng[2], (B, T, 1))
    Ks = 0.2 * jax.random.normal(ks_rng[3], (B, T, 1, model.state_size))
    g_z = jnp.zeros((T, model.goal_size), jnp.float32)
    xref = jax.vmap(lambda x, u: simulate_trajectory(model, x, u, g_z)[0])(x0, us)
    return model, x0, us, ks, Ks, xref, g_z


def test_matches_vmapped_ilqr_forward_pass():
    env = CartPoleSwingUpEnv
    T, B = 12, 5
    model, x0, us, ks, Ks, xref, g_z = _setup(env, T, B)
    solver = ILQR(model=model, T=T)
    alphas = solver.alphas  # 10 candidates

    def scan_all(us_b, ks_b, Ks_b, xref_b):
        return jax.vmap(
            lambda a: solver.forward_pass(a, ks_b, Ks_b, xref_b, us_b, g_z)
        )(alphas)

    _, uss_s, costs_s = jax.vmap(scan_all)(us, ks, Ks, xref)  # (B, n_a, ...)
    uss_p, costs_p = fused_linesearch(
        model, alphas, x0, us, ks, Ks, xref, g_z, with_terminal=False
    )  # (n_a, B, ...)
    np.testing.assert_allclose(
        jnp.swapaxes(uss_p, 0, 1), uss_s, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        jnp.swapaxes(costs_p, 0, 1), costs_s, rtol=1e-4, atol=1e-4
    )


def test_matches_vmapped_sqp_try_step():
    env = PendulumEnv
    T, B = 10, 4
    model, x0, us, ks, Ks, xref, g_z = _setup(env, T, B, key=1)
    solver = SQP(model=model, T=T)
    alphas = solver.alphas  # 8 candidates

    from benchmarking_mpc_solvers_tpu.ops.riccati import TVLQRPolicy

    def scan_all(us_b, ks_b, Ks_b, xref_b):
        # _try_step's policy indexing: K rows are (A, S)
        def one(a):
            return solver._try_step(
                a, TVLQRPolicy(K=Ks_b.reshape(T, 1, model.state_size), k=ks_b),
                xref_b, us_b, g_z,
            )

        return jax.vmap(one)(alphas)

    uss_s, xss_s, costs_s = jax.vmap(scan_all)(us, ks, Ks, xref)
    uss_p, xss_p, costs_p = fused_linesearch(
        model, alphas, x0, us, ks, Ks, xref, g_z, with_terminal=True,
        return_states=True,
    )
    np.testing.assert_allclose(
        jnp.swapaxes(uss_p, 0, 1), uss_s, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        jnp.swapaxes(xss_p, 0, 1), xss_s, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        jnp.swapaxes(costs_p, 0, 1), costs_s, rtol=1e-4, atol=1e-4
    )


def test_return_states_matches_forward_pass_trajectories():
    env = CartPoleSwingUpEnv
    T, B = 9, 3
    model, x0, us, ks, Ks, xref, g_z = _setup(env, T, B, key=2)
    solver = ILQR(model=model, T=T)
    alphas = solver.alphas

    def scan_all(us_b, ks_b, Ks_b, xref_b):
        return jax.vmap(
            lambda a: solver.forward_pass(a, ks_b, Ks_b, xref_b, us_b, g_z)
        )(alphas)

    xss_s, uss_s, costs_s = jax.vmap(scan_all)(us, ks, Ks, xref)  # (B, n_a, ...)
    uss_p, xss_p, costs_p = fused_linesearch(
        model, alphas, x0, us, ks, Ks, xref, g_z, with_terminal=False,
        return_states=True,
    )  # (n_a, B, ...)
    np.testing.assert_allclose(
        jnp.swapaxes(uss_p, 0, 1), uss_s, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        jnp.swapaxes(xss_p, 0, 1), xss_s, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        jnp.swapaxes(costs_p, 0, 1), costs_s, rtol=1e-4, atol=1e-4
    )
