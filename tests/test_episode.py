"""Episode runner + environment tests."""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarking_mpc_solvers_tpu.envs import (
    AcrobotEnv,
    CartPoleSwingUpEnv,
    NoiseConfig,
    PendulumEnv,
    env_step,
)
from benchmarking_mpc_solvers_tpu.experiment import EpisodeConfig, run_episode, run_episodes_batch
from benchmarking_mpc_solvers_tpu.solvers import MPPI


def test_env_step_noiseless_matches_model():
    env = PendulumEnv
    x = jnp.array([1.0, 0.5], jnp.float32)
    u = jnp.array([0.3], jnp.float32)
    es = env_step(env, jax.random.PRNGKey(0), x, u, NoiseConfig())
    want_next = env.model.dynamics(x, u)
    np.testing.assert_allclose(np.asarray(es.true_state), np.asarray(want_next), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(es.observation), np.asarray(es.true_state), rtol=1e-6)
    want_cost = float(env.model.cost(x, u, jnp.zeros(3)))
    np.testing.assert_allclose(float(es.cost), want_cost, rtol=1e-6)
    assert not bool(es.done)


def test_env_noise_applied():
    env = PendulumEnv
    x = jnp.array([1.0, 0.5], jnp.float32)
    u = jnp.array([0.0], jnp.float32)
    noise = NoiseConfig(actuation_std=0.5, sensor_std=0.2)
    es = env_step(env, jax.random.PRNGKey(1), x, u, noise)
    # actuated action differs from commanded; observation differs from truth
    assert abs(float(es.action[0]) - float(es.true_action[0])) > 1e-4
    assert np.abs(np.asarray(es.observation) - np.asarray(es.true_state)).max() > 1e-4
    # cost uses the actuated action
    want_cost = float(env.model.cost(x, es.action, jnp.zeros(3)))
    np.testing.assert_allclose(float(es.cost), want_cost, rtol=1e-5)


def test_done_predicates():
    assert bool(CartPoleSwingUpEnv.done_fn(jnp.array([3.0, 0, 0, 0])))
    assert not bool(CartPoleSwingUpEnv.done_fn(jnp.array([1.0, 0, 0, 0])))
    # acrobot: both links up => tip height 2 > 1
    assert bool(AcrobotEnv.done_fn(jnp.array([np.pi, 0.0, 0, 0])))
    assert not bool(AcrobotEnv.done_fn(jnp.zeros(4)))


def test_run_episode_shapes_and_finiteness():
    env = PendulumEnv
    solver = MPPI(model=env.model, T=10, K=16)
    cfg = EpisodeConfig(n_steps=7, warmstart=3, record_plans=True)
    res = jax.jit(lambda k: run_episode(env, solver, cfg, k))(jax.random.PRNGKey(0))
    assert res.observations.shape == (7, 2)
    assert res.true_states.shape == (8, 2)
    assert res.actions.shape == (7, 1)
    assert res.costs.shape == (7,)
    assert res.planned_states.shape == (7, 11, 2)
    assert res.planned_actions.shape == (7, 10, 1)
    assert res.warmstart_trajectories.shape == (3, 10, 1)
    assert np.all(np.isfinite(np.asarray(res.costs)))
    # actions respect bounds
    assert np.abs(np.asarray(res.true_actions)).max() <= 2.0 + 1e-6


def test_run_episode_noise_changes_trajectory():
    env = PendulumEnv
    solver = MPPI(model=env.model, T=8, K=8)
    base = EpisodeConfig(n_steps=5, record_plans=False)
    noisy = EpisodeConfig(n_steps=5, noise=NoiseConfig(actuation_std=1.0), record_plans=False)
    key = jax.random.PRNGKey(0)
    r0 = run_episode(env, solver, base, key)
    r1 = run_episode(env, solver, noisy, key)
    assert np.abs(np.asarray(r0.true_states) - np.asarray(r1.true_states)).max() > 1e-4


def test_run_episodes_batch_matches_single():
    env = PendulumEnv
    solver = MPPI(model=env.model, T=6, K=8)
    cfg = EpisodeConfig(n_steps=4, record_plans=False)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    x0s = jnp.stack([env.start_state] * 3)
    batch = run_episodes_batch(env, solver, cfg, keys, x0s)
    single = run_episode(env, solver, cfg, keys[1], x0s[1])
    np.testing.assert_allclose(
        np.asarray(batch.costs[1]), np.asarray(single.costs), rtol=1e-4, atol=1e-5
    )


def test_fused_episode_generic_fallback_ilqr():
    """run_episodes_fused works for solvers without a dedicated batched path
    via the base-class vmapped solve_batch, and matches run_episodes_batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarking_mpc_solvers_tpu.envs import PendulumEnv
    from benchmarking_mpc_solvers_tpu.experiment import (
        EpisodeConfig,
        run_episodes_batch,
        run_episodes_fused,
    )
    from benchmarking_mpc_solvers_tpu.solvers import ILQR

    env = PendulumEnv
    solver = ILQR(model=env.model, T=8, max_iter=2, reference_accept=False)
    cfg = EpisodeConfig(n_steps=4, record_plans=True)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    x0s = jnp.tile(jnp.array([np.pi, 0.0], jnp.float32), (3, 1))
    fused = jax.jit(lambda k, x: run_episodes_fused(env, solver, cfg, k, x))(keys, x0s)
    plain = jax.jit(lambda k, x: run_episodes_batch(env, solver, cfg, k, x))(keys, x0s)
    np.testing.assert_allclose(
        np.asarray(fused.true_actions), np.asarray(plain.true_actions),
        rtol=1e-5, atol=1e-6,
    )
