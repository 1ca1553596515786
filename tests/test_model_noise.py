"""Planning-model noise must reach every solver family.

The reference noises the shared planning model for whichever agent runs
(``ExperimentCore/Experiment.py:58-60`` + ``models/model.py:42-43``): every
``model.predict`` in rollouts/forward passes adds N(0, std) to the next
state. These tests pin that the `model_noise_std` field perturbs the plan
for ILQR / SQP / QPMPC / I2C (round 1 only wired CEM/MPPI), that the noise
is keyed (different keys → different plans), and that the experiment layer
passes it through for every agent.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benchmarking_mpc_solvers_tpu.models import PendulumModel
from benchmarking_mpc_solvers_tpu.solvers import I2C, ILQR, MPPI, QPMPC, SQP

def _plan(solver, key=0):
    state = solver.init_state(jax.random.PRNGKey(key))
    g_z = jnp.zeros((solver.T, solver.model.goal_size), jnp.float32)
    # near-goal start for QPMPC: from x0=[π,0] the linear-MPC plan saturates
    # at the torque bound, where residual noise can't move it
    x0 = (
        jnp.array([0.4, 0.0], jnp.float32)
        if isinstance(solver, QPMPC)
        else jnp.array([np.pi, 0.0], jnp.float32)
    )
    new_state, _u0, _ = jax.jit(solver.solve)(state, x0, g_z)
    return np.asarray(new_state.planned_us)


SOLVERS = [
    ILQR(model=PendulumModel, T=8, max_iter=3),
    SQP(model=PendulumModel, T=8, max_iter=3),
    QPMPC(model=PendulumModel, T=8, iters=30),
    I2C(model=PendulumModel, T=8, max_iter=3),
]


@pytest.mark.parametrize("solver", SOLVERS, ids=lambda s: type(s).__name__)
def test_model_noise_perturbs_plan(solver):
    noisy = dataclasses.replace(solver, model_noise_std=0.5)
    clean_plan = _plan(solver)
    noisy_plan = _plan(noisy)
    assert not np.allclose(clean_plan, noisy_plan, atol=1e-6), (
        f"{type(solver).__name__}: model noise did not perturb the plan"
    )
    # keyed: a different key gives a different noisy plan
    assert not np.allclose(noisy_plan, _plan(noisy, key=1), atol=1e-6)
    # deterministic given the key
    np.testing.assert_allclose(noisy_plan, _plan(noisy), atol=0)


@pytest.mark.parametrize("agent", ["ILQR", "SQP", "QPMPC", "I2C", "CEM", "MPPI"])
def test_experiment_passes_model_noise_to_all_solvers(agent):
    """`model_noise: True` must noise the planning model for EVERY agent
    (reference `Experiment.py:58-60`), not just the sampling ones."""
    from benchmarking_mpc_solvers_tpu.experiment.experiment import Experiment

    cfgs = {
        "ILQR": {"T": 5, "max_iter": 2, "threshold": 1e-3, "closed_loop": False},
        "SQP": {"T": 5, "max_iter": 2},
        "QPMPC": {"T": 5, "max_iter": 20},
        "I2C": {"T": 5, "max_iter": 2},
        "CEM": {"K": 8, "T": 5, "max_iter": 1, "n_elite": 3, "epsilon": 1e-2,
                "alpha": 0.2, "std": 1.0},
        "MPPI": {"K": 8, "T": 5, "std": 1.0, "lam": 1.0},
    }
    exp = Experiment({
        "env": "pendulum",
        "agent": agent,
        "agent_config": cfgs[agent],
        "experiment_length": 3,
        "start_state": [np.pi, 0.0],
        "sensor_noise": 0.3,
        "model_noise": True,
        "seed": 0,
    })
    solver, _noise = exp._build()
    assert solver.model_noise_std == pytest.approx(0.3)


def test_diverged_cartpole_rollout_costs_stay_finite():
    """Heavy planning-model noise can push cartpole far outside its envelope,
    where (x/2.4)^10 squared overflows f32. The cost must saturate at
    f32-max (the f64 reference stays finite there too), never become
    inf/nan — nan poisons MPPI's baselined softmax and every aggregation
    median downstream (observed in the noise_tests sweep)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarking_mpc_solvers_tpu.models import CartPoleSwingUpModel
    from benchmarking_mpc_solvers_tpu.solvers import MPPI, predict_action

    model = CartPoleSwingUpModel
    # absurd state: cost saturates finite instead of inf -> nan
    x_far = jnp.array([5e3, 0.0, 0.0, 0.0], jnp.float32)
    g = jnp.zeros((model.goal_size,), jnp.float32)
    c = model.cost(x_far, jnp.zeros((1,), jnp.float32), g)
    assert np.isfinite(float(c))

    # full MPPI solve planning through a heavily noised model from a
    # diverged plant state: the returned action and plan must be finite
    solver = MPPI(model=model, T=10, K=16, std=1.0, lam=0.1,
                  model_noise_std=1.0)
    g_z = jnp.zeros((10, model.goal_size), jnp.float32)
    st = solver.init_state(jax.random.PRNGKey(0))
    out = jax.jit(lambda s, x: predict_action(solver, s, x, g_z))(st, x_far)
    assert np.isfinite(np.asarray(out.action)).all()
    assert np.isfinite(np.asarray(out.state.planned_us)).all()


def test_i2c_smoother_divergence_keeps_previous_plan():
    """I2C's failure guard: at states where the feature linearization
    overflows, the smoother output is non-finite — the solve must keep the
    previous (finite) plan rather than adopt nan controls."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarking_mpc_solvers_tpu.models import CartPoleSwingUpModel
    from benchmarking_mpc_solvers_tpu.solvers import I2C, predict_action

    model = CartPoleSwingUpModel
    solver = I2C(model=model, T=10, max_iter=3)
    g_z = jnp.zeros((10, model.goal_size), jnp.float32)
    x_far = jnp.array([1e20, 0.0, 0.0, 0.0], jnp.float32)
    st = solver.init_state(jax.random.PRNGKey(0))
    out = jax.jit(lambda s, x: predict_action(solver, s, x, g_z))(st, x_far)
    assert np.isfinite(np.asarray(out.action)).all()
    assert np.isfinite(np.asarray(out.state.planned_us)).all()


def test_mppi_softmax_survives_exploding_candidates():
    """A single planning candidate whose rollout hits Euler instability
    (theta_dot^2 feedback -> inf -> sin(inf)=nan) must not poison the
    baselined softmax: with the nan guard the update ignores it. From a
    state where EVERY candidate explodes, the plan must still come back
    finite (all candidates scored 1e30, uniform weights)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarking_mpc_solvers_tpu.models import CartPoleSwingUpModel
    from benchmarking_mpc_solvers_tpu.solvers import MPPI, predict_action

    model = CartPoleSwingUpModel
    solver = MPPI(model=model, T=25, K=32, std=1.0, lam=0.1)
    g_z = jnp.zeros((25, model.goal_size), jnp.float32)
    x_unstable = jnp.array([0.0, 0.0, 1.0, 1e5], jnp.float32)
    st = solver.init_state(jax.random.PRNGKey(3))
    out = jax.jit(lambda s, x: predict_action(solver, s, x, g_z))(st, x_unstable)
    assert np.isfinite(np.asarray(out.action)).all()
    assert np.isfinite(np.asarray(out.state.planned_us)).all()

    # batched fast path takes the same guard
    st_b = solver.init_state_batch(jax.random.split(jax.random.PRNGKey(4), 3))
    xs = jnp.tile(x_unstable, (3, 1))
    st2, u0, _ = jax.jit(lambda s, x: solver.solve_batch(s, x, g_z))(st_b, xs)
    assert np.isfinite(np.asarray(u0)).all()
    assert np.isfinite(np.asarray(st2.planned_us)).all()
