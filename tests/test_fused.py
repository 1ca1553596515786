"""Fused Pallas rollout kernel vs the scan rollout engine (interpret mode
on CPU; the same code compiles to a real TPU kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benchmarking_mpc_solvers_tpu.models import (
    AcrobotModel,
    CartPoleSwingUpModel,
    PendulumModel,
)
from benchmarking_mpc_solvers_tpu.ops import rollout_cost_samples
from benchmarking_mpc_solvers_tpu.ops.fused import (
    fused_rollout_cost_samples,
    fused_rollout_costs,
)

MODELS = [PendulumModel, CartPoleSwingUpModel, AcrobotModel]


@pytest.mark.parametrize("model", MODELS, ids=lambda m: m.name)
def test_fused_matches_scan(model):
    T, K = 12, 24
    rng = np.random.default_rng(0)
    x0 = jnp.float32(rng.uniform(-1, 1, model.state_size))
    samples = jnp.float32(rng.uniform(-1.5, 1.5, (K, T, 1)))
    g_z = jnp.float32(rng.uniform(-0.5, 0.5, (T, model.goal_size)))
    want, _ = rollout_cost_samples(model, x0, samples, g_z)
    got = fused_rollout_cost_samples(model, x0, samples, g_z, tile=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=1e-4)


def test_fused_handles_nonaligned_batch():
    model = PendulumModel
    T, N = 7, 200  # not a multiple of the tile
    rng = np.random.default_rng(1)
    x0b = jnp.float32(rng.uniform(-1, 1, (N, 2)))
    usb = jnp.float32(rng.uniform(-2, 2, (N, T)))
    g_z = jnp.zeros((T, 3), jnp.float32)
    got = fused_rollout_costs(model, x0b, usb, g_z, 128)
    assert got.shape == (N,)
    from benchmarking_mpc_solvers_tpu.ops import rollout_cost

    for n in [0, 57, 199]:
        want, _ = rollout_cost(model, x0b[n], usb[n][:, None], g_z)
        np.testing.assert_allclose(float(got[n]), float(want), rtol=2e-4, atol=1e-4)


def test_solve_batch_matches_per_scenario_math():
    """Batched fused MPPI must implement the same update law (checked
    against manual numpy computation on its own sampled noise)."""
    import jax

    from benchmarking_mpc_solvers_tpu.solvers import MPPI

    model = PendulumModel
    solver = MPPI(model=model, T=6, K=8, std=0.7, lam=0.5)
    B = 3
    sstates = solver.init_state_batch(jax.random.split(jax.random.PRNGKey(0), B))
    xs = jnp.float32(np.random.default_rng(0).uniform(-1, 1, (B, 2)))
    g_z = jnp.zeros((6, 3), jnp.float32)
    new_states, u0s, aux = solver.solve_batch(sstates, xs, g_z, use_fused=True)

    # recompute scenario 1 by hand from the same (single, time-major) draw
    split = jax.vmap(jax.random.split)(sstates.key)
    k_delta = split[0, 0]
    delta_tm = 0.7 * jax.random.normal(k_delta, (6, B * 8), jnp.float32)
    delta = jnp.transpose(delta_tm.reshape(6, B, 8), (1, 2, 0))[..., None]  # (B,K,T,1)
    samples = sstates.planned_us[1][None] + delta[1]
    roll, _ = rollout_cost_samples(model, xs[1], samples, g_z)
    ctrl = 0.5 * jnp.einsum("kta,kta->k", samples, delta[1]) / 0.7**2
    costs = roll + ctrl
    w = jax.nn.softmax(-(costs - costs.min()) / 0.5)
    want = np.asarray(sstates.planned_us[1] + jnp.einsum("k,kta->ta", w, delta[1]))
    np.testing.assert_allclose(np.asarray(new_states.planned_us[1]), want, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u0s[1]), want[0], rtol=2e-4, atol=1e-5)


def test_run_episodes_fused_swings_up():
    import jax

    from benchmarking_mpc_solvers_tpu.envs import PendulumEnv
    from benchmarking_mpc_solvers_tpu.experiment import EpisodeConfig
    from benchmarking_mpc_solvers_tpu.experiment.episode import run_episodes_fused
    from benchmarking_mpc_solvers_tpu.solvers import MPPI

    env = PendulumEnv
    solver = MPPI(model=env.model, T=20, K=64)
    cfg = EpisodeConfig(n_steps=40, warmstart=2, record_plans=False)
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    x0s = jnp.tile(env.start_state, (B, 1))
    res = jax.jit(lambda k, x: run_episodes_fused(env, solver, cfg, k, x))(keys, x0s)
    assert res.costs.shape == (B, 40)
    assert np.all(np.isfinite(np.asarray(res.costs)))
    c = np.asarray(res.costs)
    # making progress toward the swing-up in every scenario
    assert (c[:, -5:].mean(axis=1) < c[:, :5].mean(axis=1)).all()

    # behavioral agreement with the generic per-scenario path: the noise
    # streams differ (single time-major draw vs per-scenario keys), so the
    # comparison is closed-loop quality, not bit-equality
    from benchmarking_mpc_solvers_tpu.experiment import run_episode

    want = run_episode(env, solver, cfg, keys[0], x0s[0])
    c_ref = float(np.asarray(want.costs).sum())
    assert abs(c[0].sum() - c_ref) < 0.5 * c_ref, (c[0].sum(), c_ref)
