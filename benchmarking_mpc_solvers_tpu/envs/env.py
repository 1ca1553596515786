"""Closed-loop environments (plant + noise + termination).

TPU-first redesign of the reference ``Environment``
(``MPCBenchmark/envs/env.py:7-65``): instead of a stateful object appending
to a pandas DataFrame per step, an Env here is a thin declarative bundle
(model + done-predicate + default start state) and ``env_step`` is a pure
function suitable for ``lax.scan``/``vmap``. History is materialized as the
stacked scan outputs (see ``experiment/episode.py``) with the same columns
the reference records (state, true_state, action, true_action, cost —
``env.py:48-49``).

Noise semantics match ``env.py:35-50``:
- actuation noise: u_true = u + N(0, actuation_std) applied *before* the
  dynamics; the noisy u is what gets recorded as "action" and the commanded
  u as "true_action" (the reference's naming, kept for schema parity).
- sensor noise: observation = true_state + N(0, sensor_std); the solver sees
  the observation, the plant evolves the true state.
- cost is the model stage cost at (true_state, u_noisy) with zero goal,
  exactly the reference's ``model.predict(true_state, u)`` (``env.py:43``).

Randomness is explicit via jax.random keys (the reference used global
unseeded ``np.random``, ``env.py:39,45``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.base import Model
from ..models import AcrobotModel, CartPoleSwingUpModel, PendulumModel


class NoiseConfig(NamedTuple):
    """Gaussian noise std-devs; 0 disables a source (reference toggles at
    ``env.py:24-30`` + planning-model noise at ``models/model.py:20-24``)."""

    actuation_std: float = 0.0
    sensor_std: float = 0.0
    model_sensor_std: float = 0.0  # planning-model noise (scripts/noise_tests.py)


class EnvStep(NamedTuple):
    true_state: jnp.ndarray  # plant state after the step
    observation: jnp.ndarray  # true_state (+ sensor noise)
    action: jnp.ndarray  # actuated (noisy) action — reference "action" column
    true_action: jnp.ndarray  # commanded action — reference "true_action"
    cost: jnp.ndarray  # stage cost at (prev true_state, actuated action)
    done: jnp.ndarray  # termination predicate of the new state


@dataclasses.dataclass(frozen=True, eq=False)
class Env:
    name: str
    model: Model
    done_fn: Callable[[jnp.ndarray], jnp.ndarray]  # (S,) -> bool
    default_start: tuple  # canonical benchmark start state

    @property
    def start_state(self) -> jnp.ndarray:
        return jnp.asarray(self.default_start, dtype=jnp.float32)

    def reset(self, key, state: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Random-uniform state when none given. Mirrors the reference quirk
        of drawing state init ranges from the *action* bounds
        (``env.py:53-54``)."""
        if state is not None:
            return jnp.asarray(state, dtype=jnp.float32)
        lo = jnp.full((self.model.state_size,), self.model.bounds_low[0], jnp.float32)
        hi = jnp.full((self.model.state_size,), self.model.bounds_high[0], jnp.float32)
        return jax.random.uniform(
            key, (self.model.state_size,), jnp.float32, minval=lo, maxval=hi
        )


def env_step(env: Env, key, true_state, u, noise: NoiseConfig) -> EnvStep:
    """One plant step: actuation noise → dynamics → sensor noise → cost."""
    model = env.model
    k_act, k_sense = jax.random.split(key)
    true_u = u
    u = u + noise.actuation_std * jax.random.normal(k_act, u.shape, u.dtype)
    g0 = jnp.zeros((model.goal_size,), jnp.float32)
    next_state, cost = model.step_and_cost(true_state, u, g0)
    obs = next_state + noise.sensor_std * jax.random.normal(
        k_sense, next_state.shape, next_state.dtype
    )
    return EnvStep(next_state, obs, u, true_u, cost, env.done_fn(next_state))


# --- concrete environments ---------------------------------------------------

def _pendulum_done(x):
    # reference PendulumEnv._done is always False (pendulum_env.py:51-52)
    return jnp.bool_(False)


def _cartpole_done(x):
    # |cart position| > 2.4 (cartpole_swingup_env.py:140-146)
    return jnp.abs(x[0]) > 2.4


def _acrobot_done(x):
    # tip height -cos(th1) - cos(th1+th2) > 1 (acrobot_env.py:60-62)
    return (-jnp.cos(x[0]) - jnp.cos(x[1] + x[0])) > 1.0


PendulumEnv = Env(
    name="PendulumEnvironment",
    model=PendulumModel,
    done_fn=_pendulum_done,
    default_start=(jnp.pi, 0.0),
)

CartPoleSwingUpEnv = Env(
    name="CartpoleSwingupEnvironment",
    model=CartPoleSwingUpModel,
    done_fn=_cartpole_done,
    default_start=(0.0, 0.0, jnp.pi, 0.0),
)

AcrobotEnv = Env(
    name="AcrobotEnvironment",
    model=AcrobotModel,
    done_fn=_acrobot_done,
    default_start=(0.0, 0.0, 0.0, 0.0),
)

REGISTRY = {
    "pendulum": PendulumEnv,
    "cartpole_swingup": CartPoleSwingUpEnv,
    "acrobot": AcrobotEnv,
}
