"""iLQR tests: exact agreement with the closed-form finite-horizon LQR on
linear-quadratic problems, plus nonlinear improvement checks."""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarking_mpc_solvers_tpu.models import PendulumModel, make_linear_model
from benchmarking_mpc_solvers_tpu.ops import simulate_trajectory
from benchmarking_mpc_solvers_tpu.solvers import ILQR


def lqr_optimal_us(A, B, Q, R, Qf, x0, T):
    """Finite-horizon discrete LQR via backward Riccati recursion (numpy).

    Cost convention matches the framework: Σ_{t=0}^{T-1} xᵀQx + uᵀRu with
    terminal xᵀQf x evaluated at x_T.
    """
    P = Qf.copy()
    Ks = []
    for _ in range(T):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ A - A.T @ P @ B @ K
        Ks.append(K)
    Ks = Ks[::-1]
    us, x = [], x0.copy()
    for t in range(T):
        u = -Ks[t] @ x
        us.append(u)
        x = A @ x + B @ u
    return np.array(us)


def make_problem():
    A = np.array([[1.0, 0.1], [0.0, 1.0]], dtype=np.float32)
    B = np.array([[0.0], [0.1]], dtype=np.float32)
    Q = np.diag([1.0, 0.1]).astype(np.float32)
    R = np.array([[0.1]], dtype=np.float32)
    Qf = np.diag([5.0, 1.0]).astype(np.float32)
    return A, B, Q, R, Qf


def test_ilqr_matches_lqr_on_linear_system():
    A, B, Q, R, Qf = make_problem()
    T = 20
    model = make_linear_model(A, B, Q, R, Qf, bounds=1e6)
    solver = ILQR(model=model, T=T, max_iter=50, threshold=1e-9, reference_accept=False)
    x0 = jnp.array([1.0, 0.5], dtype=jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)

    state = solver.init_state(jax.random.PRNGKey(0))
    state = state._replace(planned_us=jnp.zeros((T, 1), jnp.float32))
    for _ in range(5):  # a few solve calls; LQ problem converges in one
        state, u0, _ = solver.solve(state, x0, g_z)

    want = lqr_optimal_us(A, B, Q, R, Qf, np.array([1.0, 0.5], np.float32), T)
    np.testing.assert_allclose(np.asarray(state.planned_us), want, rtol=1e-3, atol=1e-4)


def test_ilqr_reduces_pendulum_cost():
    T = 25
    solver = ILQR(model=PendulumModel, T=T, max_iter=10, threshold=1e-6, reference_accept=False)
    x0 = jnp.array([np.pi, 0.0], dtype=jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    state = solver.init_state(jax.random.PRNGKey(1))
    state = state._replace(planned_us=jnp.zeros((T, 1), jnp.float32))
    _, cost0 = simulate_trajectory(PendulumModel, x0, state.planned_us, g_z)
    for _ in range(10):
        state, _, _ = solver.solve(state, x0, g_z)
        state = state._replace(
            planned_us=jnp.clip(state.planned_us, PendulumModel.lo, PendulumModel.hi)
        )
    _, cost1 = simulate_trajectory(PendulumModel, x0, state.planned_us, g_z)
    assert float(cost1) < 0.9 * float(cost0)


def test_ilqr_reference_accept_mode_runs():
    T = 10
    solver = ILQR(model=PendulumModel, T=T, max_iter=5, threshold=1e-3, reference_accept=True)
    state = solver.init_state(jax.random.PRNGKey(2))
    g_z = jnp.zeros((T, 3), jnp.float32)
    x0 = jnp.array([1.0, 0.0], dtype=jnp.float32)
    new_state, u0, _ = jax.jit(solver.solve)(state, x0, g_z)
    assert np.all(np.isfinite(np.asarray(new_state.planned_us)))
    assert u0.shape == (1,)


def test_ilqr_derivatives_match_fd():
    """Autodiff derivative stage vs central finite differences."""
    T = 4
    solver = ILQR(model=PendulumModel, T=T)
    rng = np.random.default_rng(0)
    xs = jnp.float32(rng.uniform(-1, 1, (T + 1, 2)))
    us = jnp.float32(rng.uniform(-1, 1, (T, 1)))
    g_z = jnp.zeros((T, 3), jnp.float32)
    d = solver.derivatives(xs, us, g_z)

    eps = 1e-3
    t = 2
    xu = np.concatenate([np.asarray(xs[t]), np.asarray(us[t])]).astype(np.float64)

    def c(v):
        return float(PendulumModel.cost(jnp.float32(v[:2]), jnp.float32(v[2:]), g_z[t]))

    for i in range(3):
        e = np.zeros(3)
        e[i] = eps
        fd = (c(xu + e) - c(xu - e)) / (2 * eps)
        grad = np.concatenate([np.asarray(d.l_x[t]), np.asarray(d.l_u[t])])
        np.testing.assert_allclose(grad[i], fd, rtol=1e-2, atol=1e-3)
