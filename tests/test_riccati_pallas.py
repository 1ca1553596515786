"""Pallas batched-Riccati kernel vs the scan backward passes.

The kernel (``ops/riccati_pallas.py``) must reproduce, bit-for-bit up to f32
rounding, (a) ``jax.vmap(ILQR.backward_pass)`` including the mu-regularized
gain solve and Q_uu>0 failure semantics, and (b)
``jax.vmap(tvlqr_backward)`` at reg=0 including the affine residual c — so
the custom_vmap dispatch in ILQR/SQP is a pure perf substitution.

Runs on CPU in interpret mode (small shapes; the horizon unrolls into the
jaxpr at trace time, so tests keep T modest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benchmarking_mpc_solvers_tpu.envs import CartPoleSwingUpEnv, PendulumEnv
from benchmarking_mpc_solvers_tpu.ops.linearize import AffineDynamics, QuadCost
from benchmarking_mpc_solvers_tpu.ops.riccati import tvlqr_backward
from benchmarking_mpc_solvers_tpu.ops.riccati_pallas import (
    riccati_backward_batch,
    tvlqr_backward_cv,
)
from benchmarking_mpc_solvers_tpu.solvers import ILQR, SQP
from benchmarking_mpc_solvers_tpu.solvers.ilqr import _Derivs

# slow tier: excluded from the fast default run (see pytest.ini markers)
pytestmark = pytest.mark.slow


def _random_derivs(key, B, T, S):
    ks = jax.random.split(key, 9)
    sym = lambda m: 0.5 * (m + jnp.swapaxes(m, -1, -2))  # noqa: E731
    eye = jnp.eye(S)
    return _Derivs(
        l_x=jax.random.normal(ks[0], (B, T + 1, S)),
        l_u=jax.random.normal(ks[1], (B, T, 1)),
        l_xx=sym(jax.random.normal(ks[2], (B, T + 1, S, S))) + 2.0 * eye,
        l_uu=0.5 + jax.random.uniform(ks[3], (B, T, 1, 1)),
        l_ux=jax.random.normal(ks[4], (B, T, 1, S)),
        # spectral radius < 1 keeps the value recursion bounded so f32
        # rounding differences don't amplify geometrically over the horizon
        f_x=0.5 * eye + 0.1 * jax.random.normal(ks[5], (B, T, S, S)),
        f_u=jax.random.normal(ks[6], (B, T, S, 1)),
    )


@pytest.mark.parametrize("S", [2, 4])
def test_kernel_matches_vmapped_scan(S):
    B, T = 5, 12
    d = _random_derivs(jax.random.PRNGKey(0), B, T, S)
    mu = jnp.array([0.0, 1e-3, 1.0, 32.0, 1024.0], jnp.float32)

    # the pass only reads model.state_size off the solver
    model = PendulumEnv.model if S == 2 else CartPoleSwingUpEnv.model
    solver = ILQR(model=model, T=T)
    with jax.default_matmul_precision("highest"):
        ks_s, Ks_s, ok_s = jax.vmap(
            lambda dd, m: ILQR.backward_pass(solver, dd, m)
        )(d, mu)
    ks_p, Ks_p, ok_p = riccati_backward_batch(
        d.l_x, d.l_u, d.l_xx, d.l_uu, d.l_ux, d.f_x, d.f_u, mu
    )
    np.testing.assert_allclose(ks_p, ks_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Ks_p, Ks_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_s))


def test_kernel_failure_semantics():
    """Rows with an indefinite Q_uu must flag ok=False, like the scan."""
    B, T, S = 3, 6, 4
    d = _random_derivs(jax.random.PRNGKey(1), B, T, S)
    # force a negative Q_uu on row 1 by a large negative l_uu at one step
    d = d._replace(l_uu=d.l_uu.at[1, 2].set(-50.0))
    mu = jnp.zeros((B,), jnp.float32)
    solver = ILQR(model=CartPoleSwingUpEnv.model, T=T)
    with jax.default_matmul_precision("highest"):
        ks_s, Ks_s, ok_s = jax.vmap(
            lambda dd, m: ILQR.backward_pass(solver, dd, m)
        )(d, mu)
    ks_p, Ks_p, ok_p = riccati_backward_batch(
        d.l_x, d.l_u, d.l_xx, d.l_uu, d.l_ux, d.f_x, d.f_u, mu
    )
    assert not bool(ok_p[1]) and bool(ok_p[0]) and bool(ok_p[2])
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_s))
    np.testing.assert_allclose(ks_p, ks_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Ks_p, Ks_s, rtol=1e-5, atol=1e-5)


def test_tvlqr_cv_matches_scan_with_residual():
    """custom_vmap TVLQR (with_c path) == vmapped sequential tvlqr_backward,
    including a nonzero affine residual c."""
    B, T, S, A = 4, 10, 4, 1
    k = jax.random.split(jax.random.PRNGKey(2), 10)
    sym = lambda m: 0.5 * (m + jnp.swapaxes(m, -1, -2))  # noqa: E731
    eye = jnp.eye(S)
    dyn = AffineDynamics(
        A=eye + 0.1 * jax.random.normal(k[0], (B, T, S, S)),
        B=jax.random.normal(k[1], (B, T, S, A)),
        c=0.3 * jax.random.normal(k[2], (B, T, S)),
    )
    cost = QuadCost(
        Q=sym(jax.random.normal(k[3], (B, T, S, S))) + 2.0 * eye,
        R=0.5 + jax.random.uniform(k[4], (B, T, A, A)),
        M=0.1 * jax.random.normal(k[5], (B, T, A, S)),
        q=jax.random.normal(k[6], (B, T, S)),
        r=jax.random.normal(k[7], (B, T, A)),
        Qf=sym(jax.random.normal(k[8], (B, S, S))) + 2.0 * eye,
        qf=jax.random.normal(k[9], (B, S)),
    )
    with jax.default_matmul_precision("highest"):
        K_s, k_s = jax.vmap(lambda d, c: tuple(tvlqr_backward(d, c, reg=0.0)))(
            dyn, cost
        )
        K_p, k_p = jax.vmap(lambda d, c: tuple(tvlqr_backward_cv(d, c)))(
            dyn, cost
        )
    np.testing.assert_allclose(K_p, K_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(k_p, k_s, rtol=1e-5, atol=1e-5)


def test_tvlqr_cv_unbatched_is_scan():
    """Unbatched call takes the primal (sequential scan) path."""
    T, S, A = 8, 3, 1
    k = jax.random.split(jax.random.PRNGKey(3), 10)
    eye = jnp.eye(S)
    dyn = AffineDynamics(
        A=eye + 0.1 * jax.random.normal(k[0], (T, S, S)),
        B=jax.random.normal(k[1], (T, S, A)),
        c=jnp.zeros((T, S)),
    )
    cost = QuadCost(
        Q=jnp.broadcast_to(2.0 * eye, (T, S, S)),
        R=jnp.ones((T, A, A)),
        M=jnp.zeros((T, A, S)),
        q=jax.random.normal(k[6], (T, S)),
        r=jax.random.normal(k[7], (T, A)),
        Qf=2.0 * eye,
        qf=jax.random.normal(k[9], (S,)),
    )
    ref = tvlqr_backward(dyn, cost, reg=0.0)
    got = tvlqr_backward_cv(dyn, cost)
    np.testing.assert_allclose(got.K, ref.K, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got.k, ref.k, rtol=1e-6, atol=1e-6)


def test_ilqr_batched_solve_pallas_vs_scan():
    """End-to-end: vmapped ILQR.solve with the Pallas backward equals the
    scan backward (same keys, same controls) — the dispatch is semantics-
    preserving on the actual benchmark plant."""
    env = CartPoleSwingUpEnv
    T, B = 10, 6
    g_z = jnp.zeros((T, env.model.goal_size), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(4), B)
    x0 = jnp.tile(env.start_state, (B, 1)) + 0.05 * jax.random.normal(
        jax.random.PRNGKey(5), (B, env.model.state_size)
    )

    def run(pallas):
        s = ILQR(model=env.model, T=T, max_iter=3, reference_accept=False,
                 pallas_backward=pallas)
        st = jax.vmap(s.init_state)(keys)
        _, u0, _ = jax.vmap(lambda ss, xx: s.solve(ss, xx, g_z))(st, x0)
        return u0

    u_scan = run(False)
    u_pal = run(True)
    np.testing.assert_allclose(u_pal, u_scan, rtol=1e-4, atol=1e-4)


def test_sqp_batched_solve_pallas_vs_scan():
    env = CartPoleSwingUpEnv
    T, B = 10, 5
    g_z = jnp.zeros((T, env.model.goal_size), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(6), B)
    x0 = jnp.tile(env.start_state, (B, 1)) + 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), (B, env.model.state_size)
    )

    def run(pallas):
        s = SQP(model=env.model, T=T, max_iter=3, pallas_backward=pallas)
        st = jax.vmap(s.init_state)(keys)
        _, u0, _ = jax.vmap(lambda ss, xx: s.solve(ss, xx, g_z))(st, x0)
        return u0

    # algebraically identical, but elementwise-vs-matmul op order drifts at
    # the f32 ulp level and 3 SQP iterations + argmin line search amplify it
    np.testing.assert_allclose(run(True), run(False), rtol=2e-3, atol=2e-3)
