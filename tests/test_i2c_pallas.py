"""Pallas KF+RTS smoother kernels vs the I2C scan path."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from benchmarking_mpc_solvers_tpu.envs import CartPoleSwingUpEnv, PendulumEnv
from benchmarking_mpc_solvers_tpu.ops.i2c_pallas import i2c_smooth_batch
from benchmarking_mpc_solvers_tpu.solvers import I2C

# slow tier: excluded from the fast default run (see pytest.ini markers)
pytestmark = pytest.mark.slow


def _random_problem(key, B, T, S, A, Z):
    D = S + A
    ks = jax.random.split(key, 6)
    F = jnp.zeros((B, T, D, D))
    F = F.at[:, :, :S, :S].set(
        jnp.eye(S) * 0.9 + 0.05 * jax.random.normal(ks[0], (B, T, S, S))
    )
    F = F.at[:, :, :S, S:].set(0.3 * jax.random.normal(ks[1], (B, T, S, A)))
    m = 0.1 * jax.random.normal(ks[2], (B, T, D))
    J = jax.random.normal(ks[3], (B, T, Z, D))
    z0 = 0.2 * jax.random.normal(ks[4], (B, T, Z))
    Rm = jax.random.normal(ks[5], (B, Z, Z))
    R = jnp.einsum("bij,bkj->bik", Rm, Rm) * 0.1 + 0.5 * jnp.eye(Z)
    mu0 = jnp.concatenate(
        [jax.random.normal(ks[0], (B, S)), jnp.zeros((B, A))], axis=1
    )
    return F, m, J, z0, R, mu0


def test_kernel_matches_vmapped_scans():
    env = CartPoleSwingUpEnv
    S, A = env.model.state_size, env.model.action_size
    Z = S + A
    B, T = 4, 9
    solver = I2C(model=env.model, T=T)
    F, m, J, z0, R, mu0 = _random_problem(jax.random.PRNGKey(0), B, T, S, A, Z)
    g_z = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (T, Z))

    with jax.default_matmul_precision("highest"):
        want = jax.vmap(
            lambda F_, m_, J_, z_, R_, mu_: solver._kf_rts(F_, m_, J_, z_, R_, mu_, g_z)
        )(F, m, J, z0, R, mu0)
    got = i2c_smooth_batch(F, m, J, z0, R, mu0, *solver._prior_covs(), g_z)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_i2c_batched_solve_pallas_vs_scan():
    env = PendulumEnv
    T, B = 8, 5
    g_z = jnp.zeros((T, env.model.goal_size), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    x0 = jnp.tile(env.start_state, (B, 1)) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(3), (B, env.model.state_size)
    )

    def run(pallas):
        s = I2C(model=env.model, T=T, max_iter=3, pallas_smoother=pallas)
        st = jax.vmap(s.init_state)(keys)
        _, u0, _ = jax.vmap(lambda ss, xx: s.solve(ss, xx, g_z))(st, x0)
        return u0

    np.testing.assert_allclose(run(True), run(False), rtol=2e-3, atol=2e-3)
