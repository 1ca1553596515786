"""MPPI and CEM solver tests: exact update-law checks against manual numpy
computation, plus closed-loop improvement checks."""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarking_mpc_solvers_tpu.models import PendulumModel, make_dummy_model
from benchmarking_mpc_solvers_tpu.ops import rollout_cost_samples
from benchmarking_mpc_solvers_tpu.solvers import CEM, MPPI, predict_action


def test_mppi_update_matches_manual_softmax():
    """With resample=False the perturbations are in the state, so the update
    planned += Σ w_k δ_k (mppi.py:59-69 semantics) can be recomputed by hand."""
    model = PendulumModel
    solver = MPPI(model=model, T=6, K=16, std=0.8, lam=0.5, resample=False)
    state = solver.init_state(jax.random.PRNGKey(0))
    x = jnp.array([np.pi, 0.0], dtype=jnp.float32)
    g_z = jnp.zeros((6, 3), jnp.float32)

    new_state, u0, aux = solver.solve(state, x, g_z)

    delta = np.asarray(state.delta_u)
    samples = np.asarray(state.planned_us)[None] + delta
    roll_costs = np.asarray(rollout_cost_samples(model, x, jnp.float32(samples), g_z)[0])
    ctrl = 0.5 * np.einsum("kta,kta->k", samples, delta) / 0.8**2
    costs = roll_costs + ctrl
    beta = costs.min()
    w = np.exp(-(costs - beta) / 0.5)
    w = w / w.sum()
    want = np.asarray(state.planned_us) + np.einsum("k,kta->ta", w, delta)

    np.testing.assert_allclose(np.asarray(new_state.planned_us), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u0), want[0], rtol=1e-4, atol=1e-5)


def test_mppi_resample_changes_perturbations():
    solver = MPPI(model=PendulumModel, T=4, K=8, std=1.0, lam=1.0, resample=True)
    state = solver.init_state(jax.random.PRNGKey(1))
    x = jnp.zeros(2)
    g_z = jnp.zeros((4, 3))
    s1, _, _ = solver.solve(state, x, g_z)
    s2, _, _ = solver.solve(s1, x, g_z)
    # keys must advance so successive steps draw fresh noise
    assert not np.array_equal(np.asarray(s1.key), np.asarray(state.key))
    assert not np.array_equal(np.asarray(s2.key), np.asarray(s1.key))


def test_cem_converges_to_zero_on_dummy():
    """Identity dynamics + quadratic cost ⇒ optimal action sequence is 0."""
    model = make_dummy_model(2, 1)
    solver = CEM(model=model, T=5, K=64, max_iter=20, n_elite=8, epsilon=1e-4, alpha=0.1, std=1.0)
    state = solver.init_state(jax.random.PRNGKey(2))
    x = jnp.array([1.0, -1.0], dtype=jnp.float32)
    g_z = jnp.zeros((5, 3), jnp.float32)
    for _ in range(5):
        state, u0, _ = solver.solve(state, x, g_z)
    assert np.abs(np.asarray(state.planned_us)).max() < 0.15


def test_cem_respects_bounds():
    model = make_dummy_model(1, 1)
    solver = CEM(model=model, T=3, K=32, max_iter=3, n_elite=4, epsilon=1e-6, alpha=0.0, std=5.0)
    state = solver.init_state(jax.random.PRNGKey(3))
    state, _, _ = solver.solve(state, jnp.zeros(1), jnp.zeros((3, 2)))
    # elites are drawn from clipped samples, so the mean stays inside bounds
    assert np.abs(np.asarray(state.planned_us)).max() <= 1.0 + 1e-6


def test_mppi_closed_loop_swings_up_pendulum():
    """MPPI with warm planning should reduce pendulum cost vs doing nothing."""
    model = PendulumModel
    T, steps = 25, 60
    solver = MPPI(model=model, T=T, K=128, std=1.0, lam=1.0, resample=True)
    state = solver.init_state(jax.random.PRNGKey(4))
    g_z = jnp.zeros((T, 3), jnp.float32)

    @jax.jit
    def run(state, x0):
        def step(carry, _):
            st, x = carry
            out = predict_action(solver, st, x, g_z, shift=True)
            x_next, c = model.step_and_cost(x, out.action, jnp.zeros(3))
            return (out.state, x_next), c

        (_, _), costs = jax.lax.scan(step, (state, x0), None, length=steps)
        return costs

    x0 = jnp.array([np.pi, 0.0], dtype=jnp.float32)  # hanging down
    costs = np.asarray(run(state, x0))
    passive = float(model.cost(x0, jnp.zeros(1), jnp.zeros(3))) * steps
    assert costs.sum() < 0.8 * passive
    # should approach upright eventually: late costs well below early costs
    assert costs[-10:].mean() < costs[:10].mean()
