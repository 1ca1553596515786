"""Sharding tests on the 8-device virtual CPU mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benchmarking_mpc_solvers_tpu.envs import PendulumEnv
from benchmarking_mpc_solvers_tpu.experiment import EpisodeConfig, run_episode
from benchmarking_mpc_solvers_tpu.parallel import (
    make_mesh,
    make_sharded_mppi_step,
    shard_batch,
    sharded_episodes,
)
from benchmarking_mpc_solvers_tpu.solvers import MPPI
from benchmarking_mpc_solvers_tpu.solvers.mppi import MPPIState


requires_multi = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


@requires_multi
def test_sharded_episodes_match_local():
    env = PendulumEnv
    solver = MPPI(model=env.model, T=6, K=8)
    cfg = EpisodeConfig(n_steps=4, record_plans=False)
    mesh = make_mesh(8, axes=("batch",))
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    x0s = jnp.stack([env.start_state] * B)
    fn = sharded_episodes(env, solver, cfg, mesh)
    keys_s, x0s_s = shard_batch(mesh, (keys, x0s))
    res = fn(keys_s, x0s_s)
    # sharded result == unsharded single-episode result
    want = run_episode(env, solver, cfg, keys[3], x0s[3])
    np.testing.assert_allclose(
        np.asarray(res.costs[3]), np.asarray(want.costs), rtol=1e-4, atol=1e-5
    )


@requires_multi
def test_sample_sharded_mppi_matches_math():
    """The psum-based softmax over the sample axis must equal an unsharded
    softmax over the union of per-device samples."""
    env = PendulumEnv
    model = env.model
    solver = MPPI(model=model, T=5, K=8, std=0.7, lam=0.5)
    mesh = make_mesh(8, axes=("batch", "sample"), shape=(4, 2))
    step = make_sharded_mppi_step(solver, mesh)
    B = 8
    planned = jnp.zeros((B, 5, 1), jnp.float32)
    xs = jnp.tile(env.start_state, (B, 1))
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    new_planned, u0s = jax.block_until_ready(step(planned, xs, keys))
    assert new_planned.shape == (B, 5, 1)
    assert np.all(np.isfinite(np.asarray(new_planned)))
    assert np.abs(np.asarray(u0s)).max() <= 2.0 + 1e-6

    # reproduce device 0's math locally: union of the two sample shards
    from benchmarking_mpc_solvers_tpu.ops import rollout_cost_samples

    b = 0
    g_z = jnp.zeros((5, 3), jnp.float32)
    deltas, costs = [], []
    for sidx in range(2):
        k = jax.random.fold_in(keys[b], sidx)
        d = solver.std * jax.random.normal(k, (4, 5, 1), jnp.float32)
        s = planned[b][None] + d
        rc, _ = rollout_cost_samples(model, xs[b], s, g_z)
        ctrl = solver.lam * jnp.einsum("kta,kta->k", s, d) / solver.std**2
        deltas.append(d)
        costs.append(rc + ctrl)
    delta = jnp.concatenate(deltas)
    cost = jnp.concatenate(costs)
    w = jax.nn.softmax(-(cost - cost.min()) / solver.lam)
    want = planned[b] + jnp.einsum("k,kta->ta", w, delta)
    np.testing.assert_allclose(np.asarray(new_planned[b]), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_graft_entry_single():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    planned, u0 = jax.block_until_ready(out)
    assert planned.shape == (64, 50, 1)
    assert u0.shape == (64, 1)
    assert np.all(np.isfinite(np.asarray(planned)))


@requires_multi
@pytest.mark.slow
def test_graft_entry_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@requires_multi
def test_global_stats_psum():
    from benchmarking_mpc_solvers_tpu.parallel import global_stats

    mesh = make_mesh(8, axes=("batch",))
    vals = jnp.arange(32, dtype=jnp.float32)
    from benchmarking_mpc_solvers_tpu.parallel import shard_batch

    (vals_s,) = shard_batch(mesh, (vals,))
    mean, vmin, vmax = global_stats(vals_s, mesh)
    np.testing.assert_allclose(float(mean), 15.5, rtol=1e-6)
    assert float(vmin) == 0.0 and float(vmax) == 31.0


def test_distributed_init_noop_single_process():
    from benchmarking_mpc_solvers_tpu.parallel import distributed_init

    assert distributed_init(num_processes=1) is False


def test_sharded_kernel_tier_episodes():
    """The single-kernel episode tier (MPPI + CEM Pallas kernels) composes
    with shard_map over the scenario-batch mesh: every shard runs its tile
    through the kernel, results are deterministic given the keys, and the
    closed loop makes swing-up progress."""
    from benchmarking_mpc_solvers_tpu.parallel import sharded_episodes_kernel
    from benchmarking_mpc_solvers_tpu.solvers import CEM

    env = PendulumEnv
    mesh = make_mesh(8, axes=("batch",))
    B = 32  # 4 scenarios per device
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    x0s = jnp.tile(env.start_state, (B, 1))
    cfg = EpisodeConfig(n_steps=25, warmstart=5, record_plans=False)
    for solver in (MPPI(model=env.model, T=6, K=4),
                   CEM(model=env.model, T=6, K=4, n_elite=2, max_iter=2)):
        assert solver.kernel_ok()
        fn = sharded_episodes_kernel(env, solver, cfg, mesh)
        res = fn(keys, x0s)
        costs = np.asarray(res.costs)
        assert costs.shape == (B, 25)
        assert np.isfinite(costs).all()
        assert np.abs(np.asarray(res.actions)).max() <= 2.0 + 1e-5
        # deterministic under identical keys
        res2 = fn(keys, x0s)
        np.testing.assert_allclose(costs, np.asarray(res2.costs))
        # short-horizon MPC still reduces cost vs the first steps
        assert costs[:, -5:].mean() < costs[:, :5].mean()
