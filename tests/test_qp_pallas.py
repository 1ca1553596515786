"""Blocked Pallas ADMM kernel (ops/qp_pallas.py) vs the XLA reference path.

The kernel must reproduce ``qp.admm_solve`` (eps=0, fixed iterations) on
both layouts — shared-H (MXU matvec) and per-problem (VMEM-resident
factorizations) — and the batched QPMPC solver built on it must match the
scalar solver through the fused episode runner.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benchmarking_mpc_solvers_tpu.envs import PendulumEnv
from benchmarking_mpc_solvers_tpu.experiment import EpisodeConfig
from benchmarking_mpc_solvers_tpu.experiment.episode import (
    run_episodes_batch,
    run_episodes_fused,
)
from benchmarking_mpc_solvers_tpu.ops.linearize import AffineDynamics
from benchmarking_mpc_solvers_tpu.ops.qp import (
    CondensedQP,
    admm_solve,
    condense,
    condense_batch,
    kkt_residual,
)
from benchmarking_mpc_solvers_tpu.ops.qp_pallas import admm_iterate
from benchmarking_mpc_solvers_tpu.solvers import QPMPC

# slow tier: excluded from the fast default run (see pytest.ini markers)
pytestmark = pytest.mark.slow


def _random_spd(key, n):
    A = jax.random.normal(key, (n, n), jnp.float32)
    return A @ A.T / n + jnp.eye(n, dtype=jnp.float32)


def _qp(H, g, lo, hi):
    n = g.shape[0]
    return CondensedQP(H, g, lo, hi,
                       jnp.zeros((1, 1, n), jnp.float32),
                       jnp.zeros((1, 1), jnp.float32))


@pytest.mark.parametrize("iters", [10, 60])
def test_admm_iterate_shared_matches_xla(iters):
    key = jax.random.PRNGKey(0)
    n, B, rho = 20, 7, 1.0
    H = _random_spd(key, n)
    g = jax.random.normal(jax.random.fold_in(key, 1), (B, n), jnp.float32)
    lo, hi = -jnp.ones(n), jnp.ones(n)
    Minv = jnp.linalg.inv(H + rho * jnp.eye(n))
    z = admm_iterate(Minv, g, lo, hi, rho=rho, iters=iters)
    assert z.shape == (B, n)
    ref = jax.vmap(
        lambda gb: admm_solve(_qp(H, gb, lo, hi), rho=rho, iters=iters, eps=0.0).U
    )(g)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref), atol=2e-5)
    # box-feasible by construction
    assert float(jnp.max(jnp.abs(z))) <= 1.0 + 1e-6


def test_admm_iterate_per_problem_matches_xla():
    key = jax.random.PRNGKey(2)
    n, B, rho = 12, 5, 2.0
    Hs = jax.vmap(lambda k: _random_spd(k, n))(jax.random.split(key, B))
    g = jax.random.normal(jax.random.fold_in(key, 3), (B, n), jnp.float32)
    lo, hi = -0.5 * jnp.ones(n), 0.5 * jnp.ones(n)
    Minv = jnp.linalg.inv(Hs + rho * jnp.eye(n))
    z = admm_iterate(Minv, g, lo, hi, rho=rho, iters=80)
    ref = jax.vmap(
        lambda Hb, gb: admm_solve(_qp(Hb, gb, lo, hi), rho=rho, iters=80, eps=0.0).U
    )(Hs, g)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref), atol=2e-5)
    # converged iterates satisfy the KKT conditions of their own QP
    res = jax.vmap(lambda Hb, gb, zb: kkt_residual(_qp(Hb, gb, lo, hi), zb))(Hs, g, z)
    assert float(jnp.max(res)) < 1e-2


def test_admm_iterate_batch_padding():
    """B not a multiple of the lane block still returns exact per-problem
    solutions (padding lanes must not leak)."""
    key = jax.random.PRNGKey(4)
    n, B = 6, 3
    H = _random_spd(key, n)
    g = jax.random.normal(jax.random.fold_in(key, 5), (B, n), jnp.float32)
    lo, hi = -jnp.ones(n), jnp.ones(n)
    Minv = jnp.linalg.inv(H + jnp.eye(n))
    z3 = admm_iterate(Minv, g, lo, hi, iters=40)
    z1 = admm_iterate(Minv, g[:1], lo, hi, iters=40)
    np.testing.assert_allclose(np.asarray(z3[0]), np.asarray(z1[0]), atol=1e-6)


def test_condense_batch_matches_condense():
    key = jax.random.PRNGKey(7)
    T, S, A_, B = 6, 3, 1, 4
    ks = jax.random.split(key, 6)
    dyn = AffineDynamics(
        jnp.eye(S) + 0.1 * jax.random.normal(ks[0], (T, S, S)),
        jax.random.normal(ks[1], (T, S, A_)),
        0.1 * jax.random.normal(ks[2], (T, S)),
    )
    Q = _random_spd(ks[3], S)
    R = jnp.eye(A_)
    Qf = 2.0 * Q
    xref = jax.random.normal(ks[4], (S,))
    uref = jnp.zeros((A_,))
    x0s = jax.random.normal(ks[5], (B, S))
    batch = condense_batch(dyn, x0s, Q, R, Qf, xref, uref, -jnp.ones(A_), jnp.ones(A_))
    for b in range(B):
        ref = condense(dyn, x0s[b], Q, R, Qf, xref, uref, -jnp.ones(A_), jnp.ones(A_))
        np.testing.assert_allclose(np.asarray(batch.H), np.asarray(ref.H), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(batch.g[b]), np.asarray(ref.g), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(batch.Xfree[b]), np.asarray(ref.Xfree), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("linearize_at", ["goal", "state"])
def test_qpmpc_solve_batch_matches_scalar(linearize_at):
    env = PendulumEnv
    solver = QPMPC(
        model=env.model, T=10, method="admm", iters=60, eps=0.0,
        linearize_at=linearize_at,
    )
    B = 3
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    xs = env.start_state + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, 2))
    g_z = jnp.zeros((solver.T, env.model.goal_size), jnp.float32)
    states = solver.init_state_batch(keys)
    new_states, u0s, _ = solver.solve_batch(states, xs, g_z)
    ref_states, ref_u0s, _ = jax.vmap(lambda s, x: solver.solve(s, x, g_z))(states, xs)
    np.testing.assert_allclose(
        np.asarray(new_states.planned_us), np.asarray(ref_states.planned_us), atol=5e-4
    )
    np.testing.assert_allclose(np.asarray(u0s), np.asarray(ref_u0s), atol=5e-4)


def test_qpmpc_fused_episode_matches_generic():
    env = PendulumEnv
    solver = QPMPC(model=env.model, T=8, method="admm", iters=50, eps=0.0)
    cfg = EpisodeConfig(n_steps=5, warmstart=0, record_plans=False)
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    x0s = jnp.tile(env.start_state, (B, 1))
    fused = run_episodes_fused(env, solver, cfg, keys, x0s)
    generic = run_episodes_batch(env, solver, cfg, keys, x0s)
    np.testing.assert_allclose(
        np.asarray(fused.costs), np.asarray(generic.costs), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(fused.true_actions), np.asarray(generic.true_actions), atol=2e-3
    )
