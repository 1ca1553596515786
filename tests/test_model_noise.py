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
