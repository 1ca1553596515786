"""QP stack tests: condensing, ADMM, interior-point, Riccati (sequential and
parallel-in-horizon), SQP — validated against closed forms and each other."""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from benchmarking_mpc_solvers_tpu.models import (
    CartPoleSwingUpModel,
    PendulumModel,
    make_linear_model,
)
from benchmarking_mpc_solvers_tpu.ops import (
    AffineDynamics,
    QuadCost,
    admm_solve,
    condense,
    ip_solve,
    kkt_residual,
    linearize_dynamics,
    qp_objective,
    quadratize_cost,
    simulate_trajectory,
    tvlqr_backward,
    tvlqr_backward_assoc,
    tvlqr_rollout,
)
from benchmarking_mpc_solvers_tpu.solvers import QPMPC, SQP


def double_integrator(T=20, dt=0.1):
    A = jnp.array([[1.0, dt], [0.0, 1.0]], jnp.float32)
    B = jnp.array([[0.0], [dt]], jnp.float32)
    c = jnp.zeros(2, jnp.float32)
    dyn = AffineDynamics(
        jnp.broadcast_to(A, (T, 2, 2)),
        jnp.broadcast_to(B, (T, 2, 1)),
        jnp.broadcast_to(c, (T, 2)),
    )
    Q = jnp.diag(jnp.array([1.0, 0.1], jnp.float32))
    R = jnp.array([[0.1]], jnp.float32)
    Qf = jnp.diag(jnp.array([10.0, 1.0], jnp.float32))
    return dyn, Q, R, Qf


def test_condense_reconstructs_states():
    T = 8
    dyn, Q, R, Qf = double_integrator(T)
    x0 = jnp.array([1.0, -0.5], jnp.float32)
    qp = condense(dyn, x0, Q, R, Qf, jnp.zeros(2), jnp.zeros(1), -1.0, 1.0)
    rng = np.random.default_rng(0)
    U = jnp.float32(rng.uniform(-1, 1, T))
    # X = Su U + Xfree must equal explicit forward simulation
    X = jnp.einsum("tsi,i->ts", qp.Su, U) + qp.Xfree
    x = x0
    for t in range(T):
        x = dyn.A[t] @ x + dyn.B[t] @ U[t : t + 1] + dyn.c[t]
        np.testing.assert_allclose(np.asarray(X[t]), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_condensed_objective_matches_simulation():
    T = 6
    dyn, Q, R, Qf = double_integrator(T)
    x0 = jnp.array([0.7, 0.2], jnp.float32)
    qp = condense(dyn, x0, Q, R, Qf, jnp.zeros(2), jnp.zeros(1), -1.0, 1.0)
    rng = np.random.default_rng(1)
    U = jnp.float32(rng.uniform(-1, 1, T))
    X = jnp.einsum("tsi,i->ts", qp.Su, U) + qp.Xfree
    direct = (
        sum(float(X[t] @ Q @ X[t]) for t in range(T - 1))
        + float(X[-1] @ Qf @ X[-1])
        + float(U @ (0.1 * U))
    )
    # ½UᵀHU + gᵀU + const, const = Xfreeᵀ Q̄ Xfree (x0 stage cost excluded both sides)
    const = sum(float(qp.Xfree[t] @ Q @ qp.Xfree[t]) for t in range(T - 1)) + float(
        qp.Xfree[-1] @ Qf @ qp.Xfree[-1]
    )
    via_qp = float(qp_objective(qp, U)) + const
    np.testing.assert_allclose(via_qp, direct, rtol=1e-4)


def test_admm_matches_unconstrained_solution_inside_box():
    T = 10
    dyn, Q, R, Qf = double_integrator(T)
    x0 = jnp.array([0.1, 0.0], jnp.float32)  # small x0 -> solution inside box
    qp = condense(dyn, x0, Q, R, Qf, jnp.zeros(2), jnp.zeros(1), -5.0, 5.0)
    res = admm_solve(qp, iters=500, eps=1e-8)
    U_free = jnp.linalg.solve(qp.H, -qp.g)
    np.testing.assert_allclose(np.asarray(res.U), np.asarray(U_free), rtol=1e-3, atol=1e-5)
    assert float(kkt_residual(qp, res.U)) < 1e-4


def test_admm_respects_active_box_and_kkt():
    T = 10
    dyn, Q, R, Qf = double_integrator(T)
    x0 = jnp.array([3.0, 1.0], jnp.float32)  # large x0 -> saturating controls
    qp = condense(dyn, x0, Q, R, Qf, jnp.zeros(2), jnp.zeros(1), -1.0, 1.0)
    res = admm_solve(qp, iters=1000, eps=1e-9)
    U = np.asarray(res.U)
    assert U.min() >= -1.0 - 1e-6 and U.max() <= 1.0 + 1e-6
    assert U.min() <= -1.0 + 1e-3  # the lower bound actually activates
    assert float(kkt_residual(qp, res.U)) < 1e-3


def test_ip_agrees_with_admm():
    T = 10
    dyn, Q, R, Qf = double_integrator(T)
    x0 = jnp.array([2.0, -1.0], jnp.float32)
    qp = condense(dyn, x0, Q, R, Qf, jnp.zeros(2), jnp.zeros(1), -1.0, 1.0)
    U_admm = admm_solve(qp, iters=1000, eps=1e-9).U
    U_ip = ip_solve(qp, iters=60, kappa=0.5)
    # near the optimum the objective is flat in U; require matching
    # objectives, feasibility and small KKT residual rather than identical U
    f_admm = float(qp_objective(qp, U_admm))
    f_ip = float(qp_objective(qp, U_ip))
    assert abs(f_ip - f_admm) <= 1e-3 * abs(f_admm) + 1e-6, (f_ip, f_admm)
    assert float(U_ip.min()) >= -1.0 - 1e-6 and float(U_ip.max()) <= 1.0 + 1e-6
    assert float(kkt_residual(qp, U_ip)) < 5e-2
    np.testing.assert_allclose(np.asarray(U_ip), np.asarray(U_admm), atol=5e-2)


def test_tvlqr_matches_qp_unconstrained():
    """Riccati solution == condensed-QP analytic solution (both ½-convention)."""
    T = 12
    dyn, Q, R, Qf = double_integrator(T)
    x0 = jnp.array([1.0, 0.5], jnp.float32)
    qp = condense(dyn, x0, Q, R, Qf, jnp.zeros(2), jnp.zeros(1), -99.0, 99.0)
    U_qp = jnp.linalg.solve(qp.H, -qp.g)

    cost = QuadCost(
        Q=jnp.broadcast_to(2 * Q, (T, 2, 2)),
        R=jnp.broadcast_to(2 * R, (T, 1, 1)),
        M=jnp.zeros((T, 1, 2), jnp.float32),
        q=jnp.zeros((T, 2), jnp.float32),
        r=jnp.zeros((T, 1), jnp.float32),
        Qf=2 * Qf,
        qf=jnp.zeros(2, jnp.float32),
    )
    # Riccati stage cost hits x_0..x_{T-1}; QP stage cost hits x_1..x_{T-1}.
    # x_0 is fixed so both describe the same optimization over U.
    policy = tvlqr_backward(dyn, cost)
    xs, us = tvlqr_rollout(dyn, policy, x0)
    np.testing.assert_allclose(np.asarray(us[:, 0]), np.asarray(U_qp), rtol=1e-3, atol=1e-4)


def test_assoc_riccati_matches_sequential():
    T = 16
    dyn, Q, R, Qf = double_integrator(T)
    rng = np.random.default_rng(3)
    cost = QuadCost(
        Q=jnp.broadcast_to(2 * Q, (T, 2, 2)),
        R=jnp.broadcast_to(2 * R, (T, 1, 1)),
        M=jnp.zeros((T, 1, 2), jnp.float32),
        q=jnp.float32(rng.uniform(-1, 1, (T, 2))),
        r=jnp.float32(rng.uniform(-1, 1, (T, 1))),
        Qf=2 * Qf,
        qf=jnp.float32(rng.uniform(-1, 1, 2)),
    )
    seq = tvlqr_backward(dyn, cost)
    par = tvlqr_backward_assoc(dyn, cost)
    np.testing.assert_allclose(np.asarray(par.K), np.asarray(seq.K), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(par.k), np.asarray(seq.k), rtol=1e-3, atol=1e-4)


def test_linearize_dynamics_exact_for_linear_model():
    A = np.array([[1.0, 0.2], [0.1, 0.9]], np.float32)
    B = np.array([[0.0], [0.5]], np.float32)
    model = make_linear_model(A, B, np.eye(2), np.eye(1))
    xs = jnp.float32(np.random.default_rng(0).uniform(-1, 1, (5, 2)))
    us = jnp.float32(np.random.default_rng(1).uniform(-1, 1, (4, 1)))
    dyn = linearize_dynamics(model, xs[:-1], us)
    for t in range(4):
        np.testing.assert_allclose(np.asarray(dyn.A[t]), A, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dyn.B[t]), B, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dyn.c[t]), 0, atol=1e-6)


def test_qpmpc_stabilizes_cartpole_upright():
    """BASELINE config 2: cartpole stabilization, QP MPC horizon 50, box
    input constraints, closed-loop."""
    from benchmarking_mpc_solvers_tpu.envs import CartPoleSwingUpEnv
    from benchmarking_mpc_solvers_tpu.experiment import EpisodeConfig, run_episode

    env = CartPoleSwingUpEnv
    # cartpole's feature cost is quartic around upright, so the Gauss-Newton
    # weights vanish at the goal — stabilization needs explicit LQR weights
    solver = QPMPC(
        model=env.model,
        T=50,
        iters=60,
        goal_x=(0.0, 0.0, 0.0, 0.0),
        Q=((0.5, 0, 0, 0), (0, 0.1, 0, 0), (0, 0, 5.0, 0), (0, 0, 0, 0.5)),
        R=((0.1,),),
    )
    cfg = EpisodeConfig(n_steps=40, record_plans=False)
    x0 = jnp.array([0.3, 0.0, 0.4, 0.0], jnp.float32)  # near-upright perturbation
    res = jax.jit(lambda k: run_episode(env, solver, cfg, k, x0))(jax.random.PRNGKey(0))
    final = np.asarray(res.true_states[-1])
    assert np.abs(final[2]) < 0.1, final  # pole angle re-stabilized
    assert np.abs(np.asarray(res.true_actions)).max() <= 1.0 + 1e-5


def test_qpmpc_pendulum_admm_config():
    """BASELINE config 1: pendulum, linear MPC, horizon 20, condensed ADMM."""
    solver = QPMPC(model=PendulumModel, T=20, method="admm", iters=100)
    state = solver.init_state(jax.random.PRNGKey(0))
    x = jnp.array([0.4, 0.0], jnp.float32)
    new_state, u0, _ = jax.jit(solver.solve)(state, x, jnp.zeros((20, 3)))
    assert np.all(np.isfinite(np.asarray(new_state.planned_us)))
    # from a small positive angle the controller should push back
    assert float(u0[0]) < 0.0


def test_sqp_improves_acrobot_plan():
    """BASELINE config 4: acrobot NMPC via SQP."""
    from benchmarking_mpc_solvers_tpu.models import AcrobotModel

    T = 25
    solver = SQP(model=AcrobotModel, T=T, max_iter=8)
    # hanging rest (x=0) is a stationary point with zero gradient; perturb
    # slightly so SQP has a descent direction
    x0 = jnp.array([0.1, 0.0, 0.2, 0.0], jnp.float32)
    g_z = jnp.zeros((T, 5), jnp.float32)
    state = solver.init_state(jax.random.PRNGKey(0))
    _, cost0 = simulate_trajectory(AcrobotModel, x0, state.planned_us, g_z)
    state, u0, _ = jax.jit(solver.solve)(state, x0, g_z)
    _, cost1 = simulate_trajectory(AcrobotModel, x0, state.planned_us, g_z)
    assert float(cost1) < float(cost0)
    assert np.abs(np.asarray(state.planned_us)).max() <= 1.0 + 1e-6


def test_sqp_matches_lqr_on_linear_problem():
    A = np.array([[1.0, 0.1], [0.0, 1.0]], np.float32)
    B = np.array([[0.0], [0.1]], np.float32)
    Q = np.diag([1.0, 0.1]).astype(np.float32)
    R = np.array([[0.1]], np.float32)
    model = make_linear_model(A, B, Q, R, Q, bounds=1e6)
    T = 15
    solver = SQP(model=model, T=T, max_iter=10)
    x0 = jnp.array([1.0, 0.0], jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    state = solver.init_state(jax.random.PRNGKey(0))
    state, _, _ = solver.solve(state, x0, g_z)

    # closed-form LQR reference
    P = Q.copy()
    Ks = []
    for _ in range(T):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ A - A.T @ P @ B @ K
        Ks.append(K)
    Ks = Ks[::-1]
    us, x = [], np.array([1.0, 0.0], np.float32)
    for t in range(T):
        u = -Ks[t] @ x
        us.append(u)
        x = A @ x + B @ u
    np.testing.assert_allclose(
        np.asarray(state.planned_us), np.array(us), rtol=1e-3, atol=1e-4
    )


def test_riccati_admm_matches_condensed_admm_on_stable_system():
    from benchmarking_mpc_solvers_tpu.ops import admm_solve_riccati

    T = 10
    dyn, Q, R, Qf = double_integrator(T)
    x0 = jnp.array([3.0, 1.0], jnp.float32)
    qp = condense(dyn, x0, Q, R, Qf, jnp.zeros(2), jnp.zeros(1), -1.0, 1.0)
    U_dense = admm_solve(qp, iters=1000, eps=1e-9).U
    us, r_p, r_d, _ = admm_solve_riccati(
        dyn, x0, Q, R, Qf, jnp.zeros(2), jnp.zeros(1), -1.0, 1.0,
        iters=1000, eps=1e-9,
    )
    np.testing.assert_allclose(np.asarray(us.ravel()), np.asarray(U_dense), atol=2e-3)
    assert float(r_p) < 1e-6 and float(r_d) < 1e-6


def test_riccati_admm_batch_matches_scalar():
    """The batched shared-factor path (one quadratic Riccati, per-iteration
    linear scans — ops/qp.py:admm_solve_riccati_batch) must agree with B
    independent scalar solves."""
    from benchmarking_mpc_solvers_tpu.ops import (
        admm_solve_riccati,
        admm_solve_riccati_batch,
    )

    T = 12
    dyn, Q, R, Qf = double_integrator(T)
    rng = np.random.default_rng(0)
    x0s = jnp.float32(rng.uniform(-3, 3, (5, 2)))
    us_b, r_p, r_d, _ = admm_solve_riccati_batch(
        dyn, x0s, Q, R, Qf, jnp.zeros(2), jnp.zeros(1), -1.0, 1.0,
        iters=400, eps=1e-8,
    )
    for b in range(5):
        us_s, _, _, _ = admm_solve_riccati(
            dyn, x0s[b], Q, R, Qf, jnp.zeros(2), jnp.zeros(1), -1.0, 1.0,
            iters=400, eps=1e-8,
        )
        np.testing.assert_allclose(
            np.asarray(us_b[b]), np.asarray(us_s), rtol=1e-4, atol=1e-5
        )
    assert float(r_p) < 1e-6 and float(r_d) < 1e-6


def test_riccati_admm_parallel_horizon_matches_sequential():
    """parallel_horizon=True (associative-scan P precompute + linear
    backward/forward) must reproduce the sequential solution."""
    from benchmarking_mpc_solvers_tpu.ops import admm_solve_riccati_batch

    T = 32
    dyn, Q, R, Qf = double_integrator(T)
    rng = np.random.default_rng(1)
    x0s = jnp.float32(rng.uniform(-3, 3, (4, 2)))
    kw = dict(iters=300, eps=1e-8)
    us_seq, _, _, _ = admm_solve_riccati_batch(
        dyn, x0s, Q, R, Qf, jnp.zeros(2), jnp.zeros(1), -1.0, 1.0, **kw
    )
    us_par, _, _, _ = admm_solve_riccati_batch(
        dyn, x0s, Q, R, Qf, jnp.zeros(2), jnp.zeros(1), -1.0, 1.0,
        parallel_horizon=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(us_par), np.asarray(us_seq), rtol=1e-3, atol=1e-4
    )


def test_riccati_factors_linear_solve_matches_tvlqr():
    """riccati_factors + tvlqr_solve_linear_batch == full tvlqr_backward +
    rollout for shared dynamics with per-scenario linear terms."""
    from benchmarking_mpc_solvers_tpu.ops import (
        riccati_factors,
        tvlqr_rollout as _roll,
        tvlqr_solve_linear_batch,
    )

    T, B = 10, 3
    dyn, Q, R, Qf = double_integrator(T)
    rng = np.random.default_rng(2)
    q = jnp.float32(rng.uniform(-1, 1, (T, 2)))
    qf = jnp.float32(rng.uniform(-1, 1, 2))
    rs = jnp.float32(rng.uniform(-1, 1, (T, B, 1)))
    x0s = jnp.float32(rng.uniform(-2, 2, (B, 2)))
    cost0 = QuadCost(
        Q=jnp.broadcast_to(Q, (T, 2, 2)), R=jnp.broadcast_to(R, (T, 1, 1)),
        M=jnp.zeros((T, 1, 2), jnp.float32), q=q, r=rs[:, 0], Qf=Qf, qf=qf,
    )
    with jax.default_matmul_precision("highest"):
        f = riccati_factors(dyn, cost0)
        us = tvlqr_solve_linear_batch(dyn, f, q, qf, rs, x0s)
        for b in range(B):
            cost_b = cost0._replace(r=rs[:, b])
            pol = tvlqr_backward(dyn, cost_b)
            _, want = _roll(dyn, pol, x0s[b])
            np.testing.assert_allclose(
                np.asarray(us[:, b]), np.asarray(want), rtol=1e-4, atol=1e-5
            )


def test_qpmpc_batched_riccati_admm_matches_scalar_solve():
    """QPMPC.solve_batch on the default riccati_admm method (BASELINE
    config 2's path) == vmapped scalar QPMPC.solve."""
    solver = QPMPC(model=PendulumModel, T=15, iters=80)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    state_b = solver.init_state_batch(keys)
    rng = np.random.default_rng(3)
    xs = jnp.float32(rng.uniform(-0.5, 0.5, (4, 2)))
    g_z = jnp.zeros((15, 3), jnp.float32)
    _, u0_b, _ = solver.solve_batch(state_b, xs, g_z)
    for b in range(4):
        st = solver.init_state(keys[b])
        _, u0_s, _ = solver.solve(st, xs[b], g_z)
        np.testing.assert_allclose(
            np.asarray(u0_b[b]), np.asarray(u0_s), rtol=1e-4, atol=1e-5
        )


def test_assoc_riccati_general_handles_cross_terms():
    """tvlqr_backward_assoc_general (ũ = u + R⁻¹Mx substitution) == the
    sequential recursion on a problem with nonzero cross terms M."""
    from benchmarking_mpc_solvers_tpu.ops.riccati import tvlqr_backward_assoc_general

    T = 12
    dyn, Q, R, Qf = double_integrator(T)
    rng = np.random.default_rng(5)
    cost = QuadCost(
        Q=jnp.broadcast_to(2 * Q, (T, 2, 2)),
        R=jnp.broadcast_to(2 * R, (T, 1, 1)),
        M=jnp.float32(rng.uniform(-0.3, 0.3, (T, 1, 2))),
        q=jnp.float32(rng.uniform(-1, 1, (T, 2))),
        r=jnp.float32(rng.uniform(-1, 1, (T, 1))),
        Qf=2 * Qf,
        qf=jnp.float32(rng.uniform(-1, 1, 2)),
    )
    with jax.default_matmul_precision("highest"):
        seq = tvlqr_backward(dyn, cost)
        par = tvlqr_backward_assoc_general(dyn, cost)
    np.testing.assert_allclose(np.asarray(par.K), np.asarray(seq.K), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(par.k), np.asarray(seq.k), rtol=1e-3, atol=1e-4)


def test_sqp_parallel_horizon_matches_sequential():
    from benchmarking_mpc_solvers_tpu.models import AcrobotModel

    T = 20
    x0 = jnp.array([0.1, 0.0, 0.2, 0.0], jnp.float32)
    g_z = jnp.zeros((T, 5), jnp.float32)
    plans = {}
    for par in (False, True):
        solver = SQP(model=AcrobotModel, T=T, max_iter=4, parallel_horizon=par)
        state = solver.init_state(jax.random.PRNGKey(0))
        state, _, _ = jax.jit(solver.solve)(state, x0, g_z)
        plans[par] = np.asarray(state.planned_us)
    np.testing.assert_allclose(plans[True], plans[False], rtol=1e-3, atol=2e-4)


def test_qpmpc_fused_episode_matches_vmapped():
    """run_episodes_fused with QPMPC (batched shared-factor riccati_admm)
    == the vmapped scalar run_episode closed loop."""
    from benchmarking_mpc_solvers_tpu.envs import PendulumEnv
    from benchmarking_mpc_solvers_tpu.experiment import (
        EpisodeConfig,
        run_episodes_batch,
        run_episodes_fused,
    )

    env = PendulumEnv
    solver = QPMPC(model=env.model, T=12, iters=60)
    cfg = EpisodeConfig(n_steps=6, record_plans=True)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    rng = np.random.default_rng(7)
    x0s = jnp.float32(rng.uniform(-0.5, 0.5, (3, 2)))
    fused = jax.jit(lambda k, x: run_episodes_fused(env, solver, cfg, k, x))(keys, x0s)
    plain = jax.jit(lambda k, x: run_episodes_batch(env, solver, cfg, k, x))(keys, x0s)
    np.testing.assert_allclose(
        np.asarray(fused.true_actions), np.asarray(plain.true_actions),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fused.costs), np.asarray(plain.costs), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_sqp_iteration_count_cost_parity():
    """bench_suite config 4 runs max_iter=4 (down from 6) on the claim
    that warm-started Gauss-Newton converges in <=3 iterations; assert the
    claim instead of leaving it as a comment (ADVICE r3): closed-loop
    median episode cost must agree between max_iter 4 and 6."""
    from benchmarking_mpc_solvers_tpu.envs import AcrobotEnv
    from benchmarking_mpc_solvers_tpu.experiment import EpisodeConfig, run_episode
    from benchmarking_mpc_solvers_tpu.solvers import SQP

    env = AcrobotEnv
    B = 8
    x0s = jnp.tile(jnp.array([0.1, 0.0, 0.2, 0.0], jnp.float32), (B, 1))
    cfg = EpisodeConfig(n_steps=6, record_plans=False)
    medians = {}
    for mi in (4, 6):
        solver = SQP(model=env.model, T=50, max_iter=mi)
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        res = jax.jit(
            lambda ks, s=solver: jax.vmap(
                lambda k, x: run_episode(env, s, cfg, k, x)
            )(ks, x0s)
        )(keys)
        medians[mi] = float(np.median(np.asarray(res.costs.sum(axis=-1))))
    assert abs(medians[4] - medians[6]) <= 0.01 * abs(medians[6]), medians


def test_qpmpc_ltv_plan_mode_matches_goal_on_linear_model():
    """On a linear model every linearization point gives the same affine
    dynamics, so linearize_at='plan' (the LTV real-time-iteration mode)
    must produce the same plan as the classic goal-linearized solve, and
    its rollout-cost acceptance must take the full QP step."""
    A = np.array([[1.0, 0.1], [0.0, 1.0]], np.float32)
    B = np.array([[0.0], [0.1]], np.float32)
    Q = np.diag([1.0, 0.1]).astype(np.float32)
    R = np.array([[0.1]], np.float32)
    model = make_linear_model(A, B, Q, R, Q, bounds=1e6)
    T = 12
    x0 = jnp.array([0.8, -0.3], jnp.float32)
    g_z = jnp.zeros((T, 3), jnp.float32)
    plans = {}
    for mode in ("goal", "plan"):
        solver = QPMPC(model=model, T=T, iters=120, linearize_at=mode)
        st, _, _ = jax.jit(solver.solve)(
            solver.init_state(jax.random.PRNGKey(0)), x0, g_z
        )
        plans[mode] = np.asarray(st.planned_us)
    np.testing.assert_allclose(plans["plan"], plans["goal"],
                               rtol=1e-4, atol=1e-5)


def test_qpmpc_ltv_beats_goal_linearization_on_swingup():
    """On cartpole swing-up the goal linearization cannot plan (its rows
    document the limit of linear MPC); the LTV mode must do strictly
    better in open-loop plan cost after a few receding-horizon updates."""
    from benchmarking_mpc_solvers_tpu.models import CartPoleSwingUpModel
    from benchmarking_mpc_solvers_tpu.ops import simulate_trajectory

    model = CartPoleSwingUpModel
    T = 25
    x0 = jnp.array([0.0, 0.0, np.pi, 0.0], jnp.float32)
    g_z = jnp.zeros((T, model.goal_size), jnp.float32)
    costs = {}
    for mode, kw in (("goal", {}), ("plan", {"init_std": 1.0})):
        solver = QPMPC(model=model, T=T, iters=50, linearize_at=mode, **kw)
        st = solver.init_state(jax.random.PRNGKey(0))
        for _ in range(6):
            st, _, _ = jax.jit(solver.solve)(st, x0, g_z)
        us = jnp.clip(st.planned_us, model.lo, model.hi)
        _, c = simulate_trajectory(model, x0, us, g_z)
        costs[mode] = float(c)
    assert costs["plan"] < 0.8 * costs["goal"], costs
