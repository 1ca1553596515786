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

    # recompute scenario 1 by hand from its own per-scenario draw
    split = jax.vmap(jax.random.split)(sstates.key)
    # the batched path draws in the scalar solve's (K, T) shape
    delta1 = 0.7 * jax.random.normal(split[1, 0], (8, 6), jnp.float32)[:, :, None]
    samples = sstates.planned_us[1][None] + delta1
    roll, _ = rollout_cost_samples(model, xs[1], samples, g_z)
    ctrl = 0.5 * jnp.einsum("kta,kta->k", samples, delta1) / 0.7**2
    costs = roll + ctrl
    w = jax.nn.softmax(-(costs - costs.min()) / 0.5)
    want = np.asarray(sstates.planned_us[1] + jnp.einsum("k,kta->ta", w, delta1))
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


def test_cem_solve_batch_matches_update_law():
    """Batched fused CEM: elite selection + smoothing recomputed by hand
    from the same key must match (single iteration)."""
    import jax
    from benchmarking_mpc_solvers_tpu.solvers import CEM

    model = PendulumModel
    solver = CEM(model=model, T=5, K=16, max_iter=1, n_elite=4, epsilon=1e-9,
                 alpha=0.3, std=0.8)
    B = 3
    st = solver.init_state_batch(jax.random.split(jax.random.PRNGKey(5), B))
    xs = jnp.float32(np.random.default_rng(1).uniform(-1, 1, (B, 2)))
    g_z = jnp.zeros((5, 3), jnp.float32)
    new_st, u0, _ = solver.solve_batch(st, xs, g_z)

    # hand recompute scenario 2 from its own per-scenario draw
    b = 2
    splits = jax.vmap(jax.random.split)(st.key)
    # the batched path draws in the scalar solve's (K, T) shape
    noise_b = jax.random.normal(splits[b, 0], (16, 5), jnp.float32)  # (K, T)
    mean0 = st.planned_us[..., 0]
    samples_b = jnp.clip(mean0[b][None, :] + 0.8 * noise_b, -2.0, 2.0)[:, :, None]
    costs, _ = rollout_cost_samples(model, xs[b], samples_b, g_z)
    elite = jnp.argsort(costs)[:4]
    elites = samples_b[elite]  # (4, T, 1)
    e_mean = elites.mean(axis=0)[:, 0]
    e_std = elites.std(axis=0)[:, 0]
    want_mean = 0.3 * mean0[b] + 0.7 * e_mean
    np.testing.assert_allclose(np.asarray(new_st.planned_us[b, :, 0]), np.asarray(want_mean),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u0[b]), np.asarray(want_mean[:1]), rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("solver_name", ["MPPI", "CEM"])
def test_solve_batch_rng_permutation_equivariant(solver_name):
    """A scenario's result must be a function of its key, not its batch
    slot: permuting (keys, xs) permutes the outputs."""
    import jax
    from benchmarking_mpc_solvers_tpu.solvers import CEM, MPPI

    model = PendulumModel
    if solver_name == "MPPI":
        solver = MPPI(model=model, T=6, K=8, std=0.7, lam=0.5)
    else:
        solver = CEM(model=model, T=6, K=16, max_iter=2, n_elite=4,
                     epsilon=0.0, alpha=0.3, std=0.8)
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    xs = jnp.float32(np.random.default_rng(3).uniform(-1, 1, (B, 2)))
    g_z = jnp.zeros((6, 3), jnp.float32)
    perm = jnp.array([2, 0, 3, 1])

    st = solver.init_state_batch(keys)
    _, u0, _ = solver.solve_batch(st, xs, g_z)
    st_p = solver.init_state_batch(keys[perm])
    _, u0_p, _ = solver.solve_batch(st_p, xs[perm], g_z)
    np.testing.assert_allclose(
        np.asarray(u0_p), np.asarray(u0)[np.asarray(perm)], rtol=1e-5, atol=1e-6
    )


def test_cem_fused_episode_runs():
    import jax
    from benchmarking_mpc_solvers_tpu.envs import PendulumEnv
    from benchmarking_mpc_solvers_tpu.experiment import EpisodeConfig
    from benchmarking_mpc_solvers_tpu.experiment.episode import run_episodes_fused
    from benchmarking_mpc_solvers_tpu.solvers import CEM

    env = PendulumEnv
    # CEM needs the reference's warm-start regime (50 pre-episode solves,
    # sample_test.py) plus a few refinement iterations to make closed-loop
    # progress on the swing-up robustly (max_iter=1 is key-luck territory)
    solver = CEM(model=env.model, T=25, K=128, max_iter=3, n_elite=16,
                 epsilon=1e-5, alpha=0.2, std=1.0)
    cfg = EpisodeConfig(n_steps=50, warmstart=50, record_plans=True)
    B = 2
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    x0s = jnp.tile(env.start_state, (B, 1))
    res = jax.jit(lambda k, x: run_episodes_fused(env, solver, cfg, k, x))(keys, x0s)
    c = np.asarray(res.costs)
    assert np.all(np.isfinite(c))
    assert (c[:, -5:].mean(axis=1) < c[:, :5].mean(axis=1)).all()


# --- single-kernel MPPI step (ops/fused_mppi.py) ----------------------------


def _expected_mppi_update(model, plan_tm, x0_tm, g_z, seed, K, std, lam, lanes):
    """Closed-form MPPI update using the kernel's interpret-mode noise
    stream (``interp_normals`` is a pure function, so the exact per-sample
    perturbations are reproducible outside the kernel)."""
    from benchmarking_mpc_solvers_tpu.ops.fused_mppi import interp_normals

    T, B = plan_tm.shape
    S = x0_tm.shape[0]
    W = jnp.asarray(model.state_cost.W)
    Bp = 8 * lanes  # single grid program
    assert B <= Bp
    x0p = jnp.zeros((S, Bp)).at[:, :B].set(x0_tm).reshape(S, 8, lanes)
    planp = jnp.zeros((T, Bp)).at[:, :B].set(plan_tm).reshape(T, 8, lanes)
    deltas = jnp.stack(
        [
            jnp.stack([interp_normals(seed + k * 7919, t, lanes) for t in range(T)])
            for k in range(K)
        ]
    )  # (K, T, 8, lanes)

    def rollout_cost(k):
        x, acc = x0p, jnp.zeros((8, lanes))
        for t in range(T):
            u = (planp[t] + std * deltas[k, t])[None]
            z = model.transform(x, u)
            zd = z - g_z[t][:, None, None]
            c = jnp.einsum("isl,ij,jsl->sl", zd, W, zd)
            acc = acc + c + lam * (1.0 / std**2) * (u[0] * (std * deltas[k, t]))
            x = model.dynamics(x, u)
        return acc

    costs = jnp.stack([rollout_cost(k) for k in range(K)])
    beta = costs.min(axis=0)
    w = jnp.exp(-(costs - beta[None]) / lam)
    w = w / w.sum(axis=0)
    upd = jnp.einsum("ksl,ktsl->tsl", w, std * deltas)
    return plan_tm + upd.reshape(T, Bp)[:, :B]


@pytest.mark.parametrize("model", [PendulumModel, CartPoleSwingUpModel],
                         ids=lambda m: m.name)
def test_fused_mppi_step_matches_closed_form(model):
    from benchmarking_mpc_solvers_tpu.ops.fused_mppi import fused_mppi_step

    T, K, B, lanes = 5, 4, 16, 128
    std, lam, seed = 0.7, 0.5, 7
    rng = np.random.default_rng(1)
    g_z = jnp.float32(rng.uniform(-0.2, 0.2, (T, model.goal_size)))
    x0_tm = jnp.float32(rng.uniform(-1, 1, (model.state_size, B)))
    plan_tm = jnp.float32(rng.uniform(-0.5, 0.5, (T, B)))

    got = fused_mppi_step(model, K, std, lam, lanes, plan_tm, x0_tm, g_z, seed)
    want = _expected_mppi_update(model, plan_tm, x0_tm, g_z, seed, K, std, lam, lanes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_fused_mppi_step_multi_tile_distinct_noise():
    """Scenarios in different grid programs must see different noise (the
    pid-strided seed), and padding lanes must not leak into real outputs."""
    from benchmarking_mpc_solvers_tpu.ops.fused_mppi import fused_mppi_step

    model = PendulumModel
    T, K, lanes = 4, 3, 128
    tile = 8 * lanes
    B = 2 * tile  # two grid programs
    g_z = jnp.zeros((T, model.goal_size), jnp.float32)
    x0_tm = jnp.tile(jnp.array([np.pi, 0.0], jnp.float32)[:, None], (1, B))
    plan_tm = jnp.zeros((T, B), jnp.float32)
    out = fused_mppi_step(model, K, 1.0, 1.0, lanes, plan_tm, x0_tm, g_z, 3)
    assert bool(jnp.all(jnp.isfinite(out)))
    # identical states, but different programs -> different noise -> the two
    # tiles' updates must differ
    assert not np.allclose(np.asarray(out[:, :tile]), np.asarray(out[:, tile:]))


def test_mppi_kernel_episode_swingup_progress():
    """Closed-loop episode on the single-kernel path: pendulum swing-up cost
    must drop over the episode (controller is actually controlling)."""
    from benchmarking_mpc_solvers_tpu.envs import PendulumEnv
    from benchmarking_mpc_solvers_tpu.experiment import EpisodeConfig
    from benchmarking_mpc_solvers_tpu.experiment.episode import run_episodes_fused
    from benchmarking_mpc_solvers_tpu.solvers import MPPI

    env = PendulumEnv
    solver = MPPI(model=env.model, T=15, K=16, std=1.0, lam=1.0)
    assert solver.kernel_ok()
    cfg = EpisodeConfig(n_steps=40, warmstart=20, record_plans=False)
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    x0s = jnp.tile(env.start_state, (B, 1))
    res = jax.jit(lambda k, x: run_episodes_fused(env, solver, cfg, k, x))(keys, x0s)
    c = np.asarray(res.costs)
    assert c.shape == (B, 40) and np.all(np.isfinite(c))
    # T=15/K=16 is a weak controller (kept small for interpret-mode CI):
    # it pumps the pendulum substantially but can't fully stabilize in 40
    # steps — require clear cost reduction, not a completed swing-up
    assert c[:, -10:].mean() < 0.75 * c[:, :10].mean()


# --- single-kernel CEM step (ops/fused_cem.py) ------------------------------


def _expected_cem_refinement(model, plan_tm, x0_tm, g_z, seed, K, n_elite,
                             max_iter, alpha, std0, lanes):
    """Closed-form CEM refinement using the kernel's interpret-mode noise
    stream (pure-function ``interp_normals``; pid=0 single tile)."""
    from benchmarking_mpc_solvers_tpu.ops.fused_mppi import interp_normals

    T, B = plan_tm.shape
    S = x0_tm.shape[0]
    W = jnp.asarray(model.state_cost.W)
    lo, hi = float(model.bounds_low[0]), float(model.bounds_high[0])
    Bp = 8 * lanes
    assert B <= Bp
    x0p = jnp.zeros((S, Bp)).at[:, :B].set(x0_tm).reshape(S, 8, lanes)
    mean = jnp.zeros((T, Bp)).at[:, :B].set(plan_tm).reshape(T, 8, lanes)
    std = jnp.full((T, 8, lanes), std0)

    for it in range(max_iter):
        deltas = jnp.stack([
            jnp.stack([
                interp_normals(seed + it * 15485863 + k * 7919, t, lanes)
                for t in range(T)
            ])
            for k in range(K)
        ])  # (K, T, 8, lanes)
        samples = jnp.clip(mean[None] + std[None] * deltas, lo, hi)

        def rollout_cost(k):
            x, acc = x0p, jnp.zeros((8, lanes))
            for t in range(T):
                u = samples[k, t][None]
                z = model.transform(x, u)
                zd = z - g_z[t][:, None, None]
                acc = acc + jnp.clip(
                    jnp.einsum("isl,ij,jsl->sl", zd, W, zd), -1e30, 1e30
                )
                x = model.dynamics(x, u)
            return acc

        costs = jnp.stack([rollout_cost(k) for k in range(K)])  # (K, 8, L)
        order = jnp.argsort(costs, axis=0)
        elite_mask = jnp.zeros_like(costs).at[
            order[:n_elite],
            jnp.arange(8)[None, :, None],
            jnp.arange(lanes)[None, None, :],
        ].set(1.0 / n_elite)
        e_mean = jnp.einsum("ksl,ktsl->tsl", elite_mask, samples)
        e_sq = jnp.einsum("ksl,ktsl->tsl", elite_mask, samples**2)
        e_std = jnp.sqrt(jnp.maximum(e_sq - e_mean**2, 0.0))
        mean = alpha * mean + (1 - alpha) * e_mean
        std = alpha * std + (1 - alpha) * e_std
    return mean.reshape(T, Bp)[:, :B]


@pytest.mark.parametrize("model", [PendulumModel, CartPoleSwingUpModel],
                         ids=lambda m: m.name)
def test_fused_cem_step_matches_closed_form(model):
    from benchmarking_mpc_solvers_tpu.ops.fused_cem import fused_cem_step

    T, K, B, lanes = 5, 6, 16, 128
    n_elite, max_iter, alpha, std0, seed = 2, 2, 0.2, 0.9, 11
    rng = np.random.default_rng(2)
    g_z = jnp.float32(rng.uniform(-0.2, 0.2, (T, model.goal_size)))
    x0_tm = jnp.float32(rng.uniform(-1, 1, (model.state_size, B)))
    plan_tm = jnp.float32(rng.uniform(-0.5, 0.5, (T, B)))

    got = fused_cem_step(model, K, n_elite, max_iter, alpha, std0, lanes,
                         plan_tm, x0_tm, g_z, seed)
    want = _expected_cem_refinement(model, plan_tm, x0_tm, g_z, seed, K,
                                    n_elite, max_iter, alpha, std0, lanes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_cem_kernel_episode_swingup_progress():
    """CEM kernel tier end-to-end: a short pendulum episode via the
    single-kernel path must make swing-up progress (cost decreasing) and
    stay inside the actuation box."""
    from benchmarking_mpc_solvers_tpu.envs import PendulumEnv
    from benchmarking_mpc_solvers_tpu.experiment.episode import (
        EpisodeConfig,
        run_episodes_fused,
    )
    from benchmarking_mpc_solvers_tpu.solvers import CEM

    env = PendulumEnv
    solver = CEM(model=env.model, T=10, K=16, n_elite=4, max_iter=3)
    assert solver.kernel_ok()
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    x0s = jnp.tile(env.start_state, (B, 1))
    cfg = EpisodeConfig(n_steps=40, warmstart=10, record_plans=False)
    res = run_episodes_fused(env, solver, cfg, keys, x0s, use_kernel=True)
    costs = np.asarray(res.costs)
    assert np.isfinite(costs).all()
    assert np.abs(np.asarray(res.actions)).max() <= 2.0 + 1e-5
    # energy pumping lowers the late-episode cost well below the start
    assert costs[:, -10:].mean() < 0.8 * costs[:, :10].mean()
