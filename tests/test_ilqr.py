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
    # atol 5e-4: the f32 line search stops accepting once candidate-cost
    # deltas fall below the ~1e-7 relative resolution of the episode cost,
    # flooring the control error around 1e-4-scale (u-scale is ~4, so this
    # is ~1e-4 relative — far inside the <1e-3 control-error gate)
    np.testing.assert_allclose(np.asarray(state.planned_us), want, rtol=1e-3, atol=5e-4)


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


def _reference_backward_numpy(l_x, l_u, l_xx, l_uu, l_ux, f_x, f_u, mu):
    """Independent numpy replica of the reference backward pass semantics
    (``MPCBenchmark/agents/ilqr.py:280-333``): diagonal-vector cost Hessians
    assembled per ``ilqr.py:24-27,269-271`` (so V_xx starts as a *vector* and
    the l_xx/l_uu/l_ux rows broadcast-add), elementwise Q_uu**-1 gains.

    Inputs here use the reference's shapes: l_xx (T+1, S) diag rows,
    l_uu (T, A) diag rows, l_ux (T, S) rows.
    """
    T, S = f_x.shape[0], f_x.shape[1]
    A = f_u.shape[2]
    V_x = l_x[-1]
    V_xx = l_xx[-1]  # vector, as in the reference
    ks = np.zeros((T, A))
    Ks = np.zeros((T, A, S))
    for t in range(T - 1, -1, -1):
        Q_x = l_x[t] + f_x[t].T @ V_x
        Q_u = l_u[t] + f_u[t].T @ V_x
        Q_xx = l_xx[None, t] + f_x[t].T @ V_xx @ f_x[t]
        V_reg = V_xx + mu * np.eye(S)
        Q_uu = l_uu[None, t] + f_u[t].T @ V_reg @ f_u[t]
        Q_ux = l_ux[None, t] + f_u[t].T @ V_reg @ f_x[t]
        ks[t] = k = -(Q_uu**-1) @ Q_u
        Ks[t] = K = -(Q_uu**-1) @ Q_ux
        V_x = Q_x + K.T @ Q_uu @ k + K.T @ Q_u + Q_ux.T @ k
        V_xx = Q_xx + K.T @ Q_uu @ K + K.T @ Q_ux + Q_ux.T @ K
        V_xx = 0.5 * (V_xx + V_xx.T)
    return ks, Ks


def test_ilqr_diag_hessian_matches_reference_numerics():
    """backward_pass_ref reproduces the reference's diag-Hessian recursion
    (including the terminal vector-V_xx broadcasting quirk) bit-for-bit in
    f64-vs-f32 tolerance, on pendulum derivatives at a random trajectory."""
    T = 8
    solver = ILQR(model=PendulumModel, T=T, diag_hessian=True)
    rng = np.random.default_rng(3)
    x0 = jnp.float32([np.pi, 0.0])
    us = jnp.float32(rng.uniform(-1.5, 1.5, (T, 1)))
    g_z = jnp.zeros((T, 3), jnp.float32)
    xs, _ = simulate_trajectory(PendulumModel, x0, us, g_z)
    d = solver.derivatives(xs, us, g_z)

    mu = 0.37
    with jax.default_matmul_precision("highest"):
        ks, Ks, ok = solver.backward_pass_ref(d, jnp.float32(mu))
    assert bool(ok)

    want_ks, want_Ks = _reference_backward_numpy(
        np.asarray(d.l_x, np.float64),
        np.asarray(d.l_u, np.float64),
        np.diagonal(np.asarray(d.l_xx, np.float64), axis1=-2, axis2=-1),
        np.diagonal(np.asarray(d.l_uu, np.float64), axis1=-2, axis2=-1),
        np.asarray(d.l_ux, np.float64)[:, -1, :],
        np.asarray(d.f_x, np.float64),
        np.asarray(d.f_u, np.float64),
        mu,
    )
    np.testing.assert_allclose(np.asarray(ks), want_ks, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Ks), want_Ks, rtol=1e-4, atol=1e-5)


def test_ilqr_diag_hessian_solve_improves():
    """The compat mode is still a working solver on the pendulum."""
    T = 25
    solver = ILQR(model=PendulumModel, T=T, max_iter=10, threshold=1e-6,
                  reference_accept=False, diag_hessian=True)
    x0 = jnp.array([np.pi, 0.0], dtype=jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    state = solver.init_state(jax.random.PRNGKey(4))
    state = state._replace(planned_us=jnp.zeros((T, 1), jnp.float32))
    _, cost0 = simulate_trajectory(PendulumModel, x0, state.planned_us, g_z)
    solve = jax.jit(solver.solve)
    for _ in range(10):
        state, _, _ = solve(state, x0, g_z)
        state = state._replace(
            planned_us=jnp.clip(state.planned_us, PendulumModel.lo, PendulumModel.hi)
        )
    _, cost1 = simulate_trajectory(PendulumModel, x0, state.planned_us, g_z)
    assert float(cost1) < 0.9 * float(cost0)


def test_ddp_matches_lqr_on_linear_system():
    """Second-order dynamics terms vanish for linear dynamics, so DDP must
    reproduce the closed-form LQR exactly, like plain iLQR."""
    A, B, Q, R, Qf = make_problem()
    T = 20
    model = make_linear_model(A, B, Q, R, Qf, bounds=1e6)
    solver = ILQR(model=model, T=T, max_iter=50, threshold=1e-9,
                  reference_accept=False, ddp=True)
    x0 = jnp.array([1.0, 0.5], dtype=jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    state = solver.init_state(jax.random.PRNGKey(0))
    state = state._replace(planned_us=jnp.zeros((T, 1), jnp.float32))
    for _ in range(5):
        state, _, _ = solver.solve(state, x0, g_z)
    want = lqr_optimal_us(A, B, Q, R, Qf, np.array([1.0, 0.5], np.float32), T)
    # atol 5e-4: f32 line-search acceptance floor (see the iLQR golden above)
    np.testing.assert_allclose(np.asarray(state.planned_us), want, rtol=1e-3, atol=5e-4)


def test_ddp_improves_pendulum_at_least_as_much_as_ilqr():
    T = 25
    x0 = jnp.array([np.pi, 0.0], dtype=jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    finals = {}
    for ddp in (False, True):
        solver = ILQR(model=PendulumModel, T=T, max_iter=10, threshold=1e-8,
                      reference_accept=False, ddp=ddp)
        state = solver.init_state(jax.random.PRNGKey(1))
        state = state._replace(planned_us=jnp.zeros((T, 1), jnp.float32))
        solve = jax.jit(solver.solve)
        for _ in range(15):
            state, _, _ = solve(state, x0, g_z)
            state = state._replace(
                planned_us=jnp.clip(state.planned_us, PendulumModel.lo, PendulumModel.hi)
            )
        _, c = simulate_trajectory(PendulumModel, x0, state.planned_us, g_z)
        finals[ddp] = float(c)
    # DDP must be a working solver in the same cost ballpark or better
    assert finals[True] < 1.1 * finals[False]
    assert np.isfinite(finals[True])


def test_dynamics_hessian_matches_fd():
    """DDP's dynamics Hessian vs central finite differences of the Jacobian."""
    T = 3
    solver = ILQR(model=PendulumModel, T=T, ddp=True)
    rng = np.random.default_rng(7)
    xs = jnp.float32(rng.uniform(-1, 1, (T + 1, 2)))
    us = jnp.float32(rng.uniform(-1, 1, (T, 1)))
    H = np.asarray(solver.dynamics_hessian(xs, us))  # (T, S, S+A, S+A)
    t = 1
    xu = np.concatenate([np.asarray(xs[t]), np.asarray(us[t])]).astype(np.float64)

    def jac(v):
        import jax as _jax
        f = lambda w: PendulumModel.dynamics(w[:2], w[2:])
        return np.asarray(_jax.jacfwd(f)(jnp.float32(v)))

    eps = 1e-3
    for j in range(3):
        e = np.zeros(3)
        e[j] = eps
        fd = (jac(xu + e) - jac(xu - e)) / (2 * eps)  # (S, S+A)
        np.testing.assert_allclose(H[t, :, :, j], fd, rtol=2e-2, atol=2e-3)


def test_ilqr_descends_on_unstable_cartpole():
    """Regression: with reference-style regularization (μ folded into the
    value recursion) the backward pass overflows on cartpole at every μ and
    the solver silently no-ops. Gains-only regularization must descend."""
    from benchmarking_mpc_solvers_tpu.models import CartPoleSwingUpModel as M

    T = 50
    x0 = jnp.array([0.0, 0.0, np.pi, 0.0], jnp.float32)
    g_z = jnp.zeros((T, M.goal_size), jnp.float32)
    solver = ILQR(model=M, T=T, max_iter=8, threshold=1e-8, reference_accept=False)
    state = solver.init_state(jax.random.PRNGKey(0))
    us0 = jnp.clip(state.planned_us, M.lo, M.hi)
    _, c0 = simulate_trajectory(M, x0, us0, g_z)
    solve = jax.jit(solver.solve)
    for _ in range(6):
        state, _, _ = solve(state, x0, g_z)
        state = state._replace(planned_us=jnp.clip(state.planned_us, M.lo, M.hi))
    _, c1 = simulate_trajectory(M, x0, state.planned_us, g_z)
    assert float(c1) < 0.85 * float(c0), (float(c0), float(c1))


def test_box_ddp_matches_lqr_when_bounds_inactive():
    A, B, Q, R, Qf = make_problem()
    T = 20
    model = make_linear_model(A, B, Q, R, Qf, bounds=1e6)
    solver = ILQR(model=model, T=T, max_iter=50, threshold=1e-9,
                  reference_accept=False, box_ddp=True)
    x0 = jnp.array([1.0, 0.5], dtype=jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    state = solver.init_state(jax.random.PRNGKey(0))
    state = state._replace(planned_us=jnp.zeros((T, 1), jnp.float32))
    for _ in range(5):
        state, _, _ = solver.solve(state, x0, g_z)
    want = lqr_optimal_us(A, B, Q, R, Qf, np.array([1.0, 0.5], np.float32), T)
    # atol 5e-4: f32 line-search acceptance floor (see the iLQR golden above)
    np.testing.assert_allclose(np.asarray(state.planned_us), want, rtol=1e-3, atol=5e-4)


def test_box_ddp_respects_tight_bounds_and_descends():
    """Torque-limited pendulum swing-up: bounds are genuinely active, the
    plan stays feasible, and box-aware gains descend at least as well as
    clip-only iLQR."""
    T = 40
    x0 = jnp.array([np.pi, 0.0], dtype=jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    finals = {}
    for box in (False, True):
        solver = ILQR(model=PendulumModel, T=T, max_iter=10, threshold=1e-8,
                      reference_accept=False, box_ddp=box)
        state = solver.init_state(jax.random.PRNGKey(3))
        state = state._replace(planned_us=jnp.zeros((T, 1), jnp.float32))
        solve = jax.jit(solver.solve)
        for _ in range(12):
            state, _, _ = solve(state, x0, g_z)
            state = state._replace(
                planned_us=jnp.clip(state.planned_us, PendulumModel.lo, PendulumModel.hi)
            )
        _, c = simulate_trajectory(PendulumModel, x0, state.planned_us, g_z)
        finals[box] = float(c)
        us = np.asarray(state.planned_us)
        assert us.min() >= float(PendulumModel.lo[0]) - 1e-6
        assert us.max() <= float(PendulumModel.hi[0]) + 1e-6
    assert finals[True] < 1.05 * finals[False], finals


def test_ilqr_default_path_closed_loop_matches_lqr():
    """Closed-loop golden for the MODERN default path (full Hessians,
    Pallas backward where available, fused line search) — the bench_suite
    config-3 producer — driven through ``run_episodes_fused``.

    Receding-horizon MPC on a time-invariant LQ problem applies
    u_k = -K_0 x_k with K_0 the FIRST-step gain of the T-horizon Riccati
    recursion, so the closed-loop plant follows x_{k+1} = (A - B K_0) x_k —
    an analytic oracle independent of the solver (the parity gate only
    certifies the diag-Hessian compat path, tests/test_parity_gate.py).
    """
    import dataclasses

    from benchmarking_mpc_solvers_tpu.envs.env import Env, NoiseConfig
    from benchmarking_mpc_solvers_tpu.experiment import (
        EpisodeConfig,
        run_episodes_fused,
    )

    A, B, Q, R, Qf = make_problem()
    T, n_steps, nB = 20, 15, 4
    # bounds=50: never active (|u*| < 6), but keeps the reference-quirk
    # N(0, bounds_high) random init at a physical scale — with bounds=1e6
    # the f32 cost loses resolution against the 1e12-scale init cost and
    # the line search plateaus ~1% from the optimum
    model = make_linear_model(A, B, Q, R, Qf, bounds=50.0)
    env = Env(
        name="lqr-golden",
        model=model,
        done_fn=lambda x: jnp.bool_(False),
        default_start=(1.0, 0.5),
    )
    solver = ILQR(model=model, T=T, max_iter=8, threshold=1e-9,
                  reference_accept=False)
    cfg = EpisodeConfig(n_steps=n_steps, warmstart=10, noise=NoiseConfig(),
                        record_plans=True)
    x0s = jnp.tile(jnp.array([1.0, 0.5], jnp.float32), (nB, 1)) * (
        1.0 + 0.1 * jnp.arange(nB, dtype=jnp.float32)[:, None]
    )
    keys = jax.random.split(jax.random.PRNGKey(0), nB)
    res = jax.jit(lambda ks: run_episodes_fused(env, solver, cfg, ks, x0s))(keys)

    # float64 oracle: T-horizon Riccati; the last K computed is the t=0 gain
    A64, B64 = A.astype(np.float64), B.astype(np.float64)
    P = Qf.astype(np.float64)
    for _ in range(T):
        K0 = np.linalg.solve(R + B64.T @ P @ B64, B64.T @ P @ A64)
        P = Q + A64.T @ P @ A64 - A64.T @ P @ B64 @ K0

    actions = np.asarray(res.actions)
    for b in range(nB):
        x = np.asarray(x0s[b], np.float64)
        for k in range(n_steps):
            u = -K0 @ x
            np.testing.assert_allclose(
                actions[b, k], u, rtol=1e-3, atol=1e-4,
                err_msg=f"scenario {b} step {k}",
            )
            x = A64 @ x + B64 @ u
