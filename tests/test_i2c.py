"""i2c solver tests: convergence to LQR on linear-quadratic problems and
improvement on nonlinear swing-up."""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarking_mpc_solvers_tpu.models import PendulumModel, make_linear_model
from benchmarking_mpc_solvers_tpu.ops import simulate_trajectory
from benchmarking_mpc_solvers_tpu.solvers import I2C


def test_i2c_approaches_lqr_on_linear_system():
    A = np.array([[1.0, 0.1], [0.0, 1.0]], np.float32)
    B = np.array([[0.0], [0.1]], np.float32)
    Q = np.diag([1.0, 0.1]).astype(np.float32)
    R = np.array([[0.1]], np.float32)
    model = make_linear_model(A, B, Q, R, Q, bounds=1e6)
    T = 15
    solver = I2C(model=model, T=T, max_iter=25, alpha0=1.0, anneal=1.6, sigma_u=1.0)
    x0 = jnp.array([1.0, 0.0], jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    state = solver.init_state(jax.random.PRNGKey(0))
    state, u0, _ = jax.jit(solver.solve)(state, x0, g_z)

    # closed-form stage-cost LQR reference (no terminal, matching
    # simulate_trajectory's objective); compare costs not raw controls
    P = np.zeros((2, 2), np.float32)
    Ks = []
    for _ in range(T):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ A - A.T @ P @ B @ K
        Ks.append(K)
    Ks = Ks[::-1]
    us, xx = [], np.array([1.0, 0.0], np.float32)
    for t in range(T):
        u = -Ks[t] @ xx
        us.append(u)
        xx = A @ xx + B @ u
    _, c_lqr = simulate_trajectory(model, x0, jnp.asarray(np.array(us)), g_z)
    _, c_i2c = simulate_trajectory(model, x0, state.planned_us, g_z)
    # i2c's Gaussian prior keeps it slightly regularized; within 2% of LQR
    assert float(c_i2c) <= 1.02 * float(c_lqr), (float(c_i2c), float(c_lqr))
    np.testing.assert_allclose(
        np.asarray(state.planned_us), np.array(us), atol=0.08
    )


def test_i2c_improves_pendulum():
    T = 25
    solver = I2C(model=PendulumModel, T=T, max_iter=15, sigma_u=1.0)
    x0 = jnp.array([np.pi, 0.0], jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    state = solver.init_state(jax.random.PRNGKey(0))
    _, c0 = simulate_trajectory(PendulumModel, x0, state.planned_us, g_z)
    state, _, _ = jax.jit(solver.solve)(state, x0, g_z)
    _, c1 = simulate_trajectory(PendulumModel, x0, state.planned_us, g_z)
    assert float(c1) < 0.9 * float(c0)
    assert np.abs(np.asarray(state.planned_us)).max() <= 2.0 + 1e-5


def test_i2c_line_search_inactive_on_lq():
    """On an LQ problem every smoothing step improves the true rollout
    cost, so the backtracked acceptance (solve()'s line_search) must take
    the full step everywhere and reproduce the ungated solver exactly."""
    A = np.array([[1.0, 0.1], [0.0, 1.0]], np.float32)
    B = np.array([[0.0], [0.1]], np.float32)
    Q = np.diag([1.0, 0.1]).astype(np.float32)
    R = np.array([[0.1]], np.float32)
    model = make_linear_model(A, B, Q, R, Q, bounds=1e6)
    T = 12
    x0 = jnp.array([1.0, 0.0], jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    plans = {}
    for ls in (True, False):
        solver = I2C(model=model, T=T, max_iter=10, line_search=ls)
        state, _, _ = jax.jit(solver.solve)(
            solver.init_state(jax.random.PRNGKey(0)), x0, g_z
        )
        plans[ls] = np.asarray(state.planned_us)
    np.testing.assert_allclose(plans[True], plans[False], atol=1e-6)


def test_i2c_prior_lag_still_solves_lq():
    """prior_lag=True (the one-step-lagged control prior kept as a damping
    option, see solvers/i2c.py) must still reach the LQR optimum on an LQ
    problem: annealing makes the optimality observation dominate the
    (mis-centered) prior."""
    A = np.array([[1.0, 0.1], [0.0, 1.0]], np.float32)
    B = np.array([[0.0], [0.1]], np.float32)
    Q = np.diag([1.0, 0.1]).astype(np.float32)
    R = np.array([[0.1]], np.float32)
    model = make_linear_model(A, B, Q, R, Q, bounds=1e6)
    T = 15
    x0 = jnp.array([1.0, 0.0], jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    lagged = I2C(model=model, T=T, max_iter=25, sigma_u=1.0, prior_lag=True)
    exact = I2C(model=model, T=T, max_iter=25, sigma_u=1.0)
    c = {}
    for name, solver in (("lag", lagged), ("exact", exact)):
        state, _, _ = jax.jit(solver.solve)(
            solver.init_state(jax.random.PRNGKey(0)), x0, g_z
        )
        _, c[name] = simulate_trajectory(model, x0, state.planned_us, g_z)
    assert float(c["lag"]) <= 1.05 * float(c["exact"]), (c["lag"], c["exact"])


def test_i2c_pendulum_long_horizon_swingup():
    """Open-loop quality guard for the r4 T>=25 regression class: one
    10-iteration solve from hanging must find a plan well below the
    do-nothing cost, and the line-searched plan must be at least as good
    as the best intermediate (monotone acceptance)."""
    T = 25
    solver = I2C(model=PendulumModel, T=T, max_iter=10, init_std=1.0)
    x0 = jnp.array([np.pi, 0.0], jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    state = solver.init_state(jax.random.PRNGKey(0))
    zeros = jnp.zeros_like(state.planned_us)
    _, c_nothing = simulate_trajectory(PendulumModel, x0, zeros, g_z)
    state, _, _ = jax.jit(solver.solve)(state, x0, g_z)
    _, c1 = simulate_trajectory(PendulumModel, x0, state.planned_us, g_z)
    assert float(c1) < 0.8 * float(c_nothing), (float(c1), float(c_nothing))
