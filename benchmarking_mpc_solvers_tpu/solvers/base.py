"""Solver interface and the MPC agent-layer semantics.

The reference wraps every solver in a stateful ``Agent``
(``MPCBenchmark/agents/agent.py:5-108``) whose ``predict_action`` does:
build goal trajectory → run ``_calc_action`` → clip planned controls →
simulate & log the plan → receding-horizon shift (roll −1, zero last) →
return clipped u0 (``agent.py:50-76``). Here all of that is pure:

- a Solver is a frozen dataclass with ``init_state(key) -> state`` and
  ``solve(state, x, g_z) -> (state, u0, aux)``;
- ``predict_action`` composes those with the clip/shift/log semantics so a
  whole closed-loop episode (solver + plant) compiles into one ``lax.scan``
  (see ``experiment/``), batched over thousands of initial states.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..models.base import Model
from ..ops.rollout import simulate_trajectory


@dataclasses.dataclass(frozen=True, eq=False)
class Solver:
    """Base class: holds the planning model and the horizon length."""

    model: Model
    T: int  # horizon length (reference: params["T"])

    # -- to implement ---------------------------------------------------------
    def init_state(self, key) -> Any:
        raise NotImplementedError

    def solve(self, state, x, g_z):
        """One full solver invocation (the reference ``_calc_action``)."""
        raise NotImplementedError

    # -- shared init helper ---------------------------------------------------
    def _init_plan(self, key, init_std: float):
        """(plan, remaining key): zeros when ``init_std == 0``
        (deterministic), else ~ N(0, init_std) clipped to the box — the
        symmetric-equilibrium break SQP/I2C opt into (cf. the reference
        iLQR's unconditional N(0, bounds_high) init, agents/ilqr.py:90-91)."""
        T, A = self.T, self.model.action_size
        if init_std > 0.0:
            k_init, key = jax.random.split(key)
            us = jnp.clip(
                init_std * jax.random.normal(k_init, (T, A), jnp.float32),
                self.model.lo, self.model.hi,
            )
        else:
            us = jnp.zeros((T, A), jnp.float32)
        return us, key

    # -- batched fallbacks (overridden by solvers with fused fast paths) ------
    def init_state_batch(self, keys):
        """Batched state from per-scenario keys (B, 2); generic vmap."""
        return jax.vmap(self.init_state)(keys)

    def solve_batch(self, state, xs, g_z):
        """One solve for B scenarios; generic vmap over ``solve``. Solvers
        with dedicated batched paths (MPPI/CEM fused Pallas, QPMPC
        shared-factor Riccati-ADMM) override this."""
        return jax.vmap(lambda s, x: self.solve(s, x, g_z))(state, xs)

    # -- shared helpers -------------------------------------------------------
    @property
    def goal_size(self) -> int:
        return self.model.goal_size

    def goal_traj(self, goal_state):
        """Repeat a goal state over the horizon (``agent.py:51-60``)."""
        goal_state = jnp.asarray(goal_state, dtype=jnp.float32)
        return jnp.broadcast_to(goal_state, (self.T, self.goal_size))


class StepOutput(NamedTuple):
    state: Any  # updated solver state
    action: jnp.ndarray  # (A,) clipped first action
    planned_xs: jnp.ndarray  # (T+1, S) simulated plan
    planned_us: jnp.ndarray  # (T, A) clipped plan (pre-shift)
    planned_cost: jnp.ndarray  # scalar plan cost


def _clip_plan(solver: Solver, state):
    us = jnp.clip(state.planned_us, solver.model.lo, solver.model.hi)
    return state._replace(planned_us=us)


def predict_action(solver: Solver, state, x, g_z, shift: bool = True) -> StepOutput:
    """Reference ``Agent.predict_action`` semantics (``agent.py:50-76``).

    With ``shift=True`` (the reference's ``logging`` default) the plan is
    simulated for logging and receding-horizon shifted: roll(-1) with the
    last action zeroed (``agent.py:72-73``).
    """
    state, u0, _aux = solver.solve(state, x, g_z)
    state = _clip_plan(solver, state)
    planned_us = state.planned_us
    planned_xs, planned_cost = simulate_trajectory(solver.model, x, planned_us, g_z)
    if shift:
        shifted = jnp.roll(planned_us, -1, axis=0).at[-1].set(0.0)
        state = state._replace(planned_us=shifted)
    action = jnp.clip(u0, solver.model.lo, solver.model.hi)
    return StepOutput(state, action, planned_xs, planned_us, planned_cost)


def warm_start(solver: Solver, state, x, g_z, n_iter: int):
    """Run the solver n_iter times without shifting (``agent.py:30-48``).

    Returns the warmed state and the stacked (n_iter, T, A) warm-start
    trajectories the reference records per iteration.
    """

    def body(state, _):
        state, _u0, _aux = solver.solve(state, x, g_z)
        state = _clip_plan(solver, state)
        return state, state.planned_us

    return jax.lax.scan(body, state, None, length=n_iter)
