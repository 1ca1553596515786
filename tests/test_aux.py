"""Auxiliary subsystem tests: rendering, gym interop, logging, profiling,
checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benchmarking_mpc_solvers_tpu.envs import (
    HAVE_GYMNASIUM,
    GymWrapperEnv,
    render_episode,
    render_state,
)
from benchmarking_mpc_solvers_tpu.utils import (
    RunLogger,
    SweepCheckpoint,
    Timer,
    load_pytree,
    save_pytree,
)


def test_render_all_envs():
    f1 = render_state("pendulum", np.array([0.5, 0.0]), last_u=1.0)
    f2 = render_state("cartpole_swingup", np.array([0.3, 0, 0.4, 0]))
    f3 = render_state("acrobot", np.array([0.4, 0.8, 0, 0]))
    for f in (f1, f2, f3):
        assert f.dtype == np.uint8 and f.ndim == 3 and f.shape[2] == 3
        assert f.std() > 0  # not a blank frame


def test_render_episode_writes_frames(tmp_path):
    states = [np.array([t * 0.2, 0.0]) for t in range(5)]
    actions = [np.array([0.5])] * 5
    frames = render_episode("pendulum", states, actions,
                            path=str(tmp_path / "ep.gif"), stride=2)
    assert len(frames) == 3
    # either a gif (pillow available) or a frame directory was written
    assert (tmp_path / "ep.gif").exists() or (tmp_path / "ep").exists()


@pytest.mark.skipif(not HAVE_GYMNASIUM, reason="gymnasium not installed")
def test_gym_wrapper_records_history():
    env = GymWrapperEnv("Pendulum-v1", seed=0)
    env.reset()
    for _ in range(3):
        env.step(np.array([0.5], np.float32))
    assert len(env.history) == 3
    row = env.history[0]
    assert {"state", "true_state", "action", "true_action", "cost"} <= set(row)
    with pytest.raises(ValueError):
        env.step(np.array([99.0], np.float32))  # out of bounds
    env.close()


@pytest.mark.skipif(not HAVE_GYMNASIUM, reason="gymnasium not installed")
def test_mujoco_wrapper_tracks_physics_state():
    pytest.importorskip("mujoco")
    from benchmarking_mpc_solvers_tpu.envs import MujocoWrapperEnv

    env = MujocoWrapperEnv("InvertedPendulum-v5", seed=0)
    s = env.reset()
    assert s.shape == (4,)  # qpos(2) + qvel(2), the full physics state
    env.step(np.array([0.5]))
    assert len(env.history) == 1
    assert env.history[0]["true_state"].shape == (4,)
    # reset to an exact physics state
    s2 = env.reset(np.array([0.0, 0.1, 0.0, 0.0]))
    np.testing.assert_allclose(s2, [0.0, 0.1, 0.0, 0.0], atol=1e-6)
    with pytest.raises(ValueError):
        env.step(np.array([99.0]))
    env.close()


def test_run_logger(tmp_path):
    log = RunLogger(path=str(tmp_path / "m.jsonl"), verbose=False)
    for i in range(4):
        log.log(i, cost=float(10 - i), note="x")
    assert len(log.series("cost")) == 4
    s = log.summary()
    assert s["cost_last"] == 7.0
    lines = open(tmp_path / "m.jsonl").read().strip().splitlines()
    assert len(lines) == 4


def test_timer():
    with Timer("t") as t:
        sum(range(1000))
    assert t.elapsed > 0


def test_checkpoint_roundtrip(tmp_path):
    from benchmarking_mpc_solvers_tpu.solvers import MPPI
    from benchmarking_mpc_solvers_tpu.models import PendulumModel

    solver = MPPI(model=PendulumModel, T=5, K=4)
    state = solver.init_state(jax.random.PRNGKey(0))
    state = state._replace(planned_us=jnp.ones((5, 1)))
    save_pytree(str(tmp_path / "ck"), state, meta={"step": 7})
    like = solver.init_state(jax.random.PRNGKey(1))
    restored = load_pytree(str(tmp_path / "ck"), like)
    np.testing.assert_allclose(np.asarray(restored.planned_us), 1.0)
    np.testing.assert_allclose(np.asarray(restored.key), np.asarray(state.key))

    from benchmarking_mpc_solvers_tpu.utils import load_meta

    assert load_meta(str(tmp_path / "ck"))["step"] == 7


def test_sweep_checkpoint(tmp_path):
    ck = SweepCheckpoint(str(tmp_path / "sweep.json"))
    assert not ck.is_done("cfg1")
    ck.mark("cfg1")
    ck2 = SweepCheckpoint(str(tmp_path / "sweep.json"))
    assert ck2.is_done("cfg1") and not ck2.is_done("cfg2")
