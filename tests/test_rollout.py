"""Rollout engine tests: the scan-based rollout must equal a python loop of
the same step contract (reference Agent.simulate_trajectory, agent.py:97-108)."""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarking_mpc_solvers_tpu.models import PendulumModel
from benchmarking_mpc_solvers_tpu.ops import (
    rollout,
    rollout_batch,
    rollout_cost,
    rollout_cost_samples,
    simulate_trajectory,
)


def python_rollout(model, x0, us, g_z):
    xs = [np.asarray(x0)]
    costs = []
    x = x0
    for t in range(us.shape[0]):
        c = model.cost(x, us[t], g_z[t])
        x = model.dynamics(x, us[t])
        xs.append(np.asarray(x))
        costs.append(float(c))
    return np.stack(xs), np.array(costs)


def test_rollout_matches_python_loop():
    T = 15
    rng = np.random.default_rng(0)
    x0 = jnp.float32(rng.uniform(-1, 1, 2))
    us = jnp.float32(rng.uniform(-2, 2, (T, 1)))
    g_z = jnp.zeros((T, 3), jnp.float32)
    xs, costs = rollout(PendulumModel, x0, us, g_z)
    want_xs, want_costs = python_rollout(PendulumModel, x0, us, g_z)
    np.testing.assert_allclose(np.asarray(xs), want_xs, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(costs), want_costs, rtol=1e-5, atol=1e-6)


def test_rollout_cost_consistent():
    T = 10
    rng = np.random.default_rng(1)
    x0 = jnp.float32(rng.uniform(-1, 1, 2))
    us = jnp.float32(rng.uniform(-2, 2, (T, 1)))
    g_z = jnp.zeros((T, 3), jnp.float32)
    _, costs = rollout(PendulumModel, x0, us, g_z)
    total, x_last = rollout_cost(PendulumModel, x0, us, g_z)
    np.testing.assert_allclose(float(total), float(jnp.sum(costs)), rtol=1e-6)
    xs, tot2 = simulate_trajectory(PendulumModel, x0, us, g_z)
    np.testing.assert_allclose(float(tot2), float(total), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xs[-1]), np.asarray(x_last), rtol=1e-6)


def test_batched_rollouts_match_unbatched():
    T, B, K = 8, 4, 6
    rng = np.random.default_rng(2)
    x0s = jnp.float32(rng.uniform(-1, 1, (B, 2)))
    uss = jnp.float32(rng.uniform(-2, 2, (B, T, 1)))
    g_z = jnp.zeros((T, 3), jnp.float32)
    xs_b, costs_b = rollout_batch(PendulumModel, x0s, uss, g_z)
    for b in range(B):
        xs, costs = rollout(PendulumModel, x0s[b], uss[b], g_z)
        np.testing.assert_allclose(np.asarray(xs_b[b]), np.asarray(xs), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(costs_b[b]), np.asarray(costs), rtol=1e-6)

    samples = jnp.float32(rng.uniform(-2, 2, (K, T, 1)))
    totals, _ = rollout_cost_samples(PendulumModel, x0s[0], samples, g_z)
    for k in range(K):
        t, _ = rollout_cost(PendulumModel, x0s[0], samples[k], g_z)
        np.testing.assert_allclose(float(totals[k]), float(t), rtol=1e-6)


def test_rollout_jits_once():
    T = 5
    g_z = jnp.zeros((T, 3), jnp.float32)
    f = jax.jit(lambda x0, us: rollout(PendulumModel, x0, us, g_z))
    x0 = jnp.zeros(2)
    us = jnp.zeros((T, 1))
    xs, costs = f(x0, us)
    assert xs.shape == (T + 1, 2) and costs.shape == (T,)
