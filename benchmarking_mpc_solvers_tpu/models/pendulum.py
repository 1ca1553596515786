"""Torque-limited pendulum swing-up model.

Behavioral parity target: ``MPCBenchmark/models/pendulum_model.py:7-59``.
Semantics reproduced exactly (needed for the <1e-3 control-error gate):

- semi-implicit Euler with dt=0.05: thdot' computed first, th' uses the
  *unclipped* thdot', then thdot' is clipped to ±8
  (``pendulum_model.py:28-38`` — note the clip happens after th update).
- torque clipped to ±2 inside the dynamics (``pendulum_model.py:31``).
- features z = -(angle_normalize(th), thdot, u) (``pendulum_model.py:40-44``).
- stage cost zᵀ diag(1, .1, .001) z; terminal zᵀ diag(1, 2, 0) z
  (``pendulum_model.py:21-22,46-55``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Model, quad_cost

MAX_TORQUE = 2.0
MAX_SPEED = 8.0
DT = 0.05
G = 10.0
M = 1.0
L = 1.0

W = np.diag(np.array([1.0, 0.1, 0.001], dtype=np.float32))
W_T = np.diag(np.array([1.0, 2.0, 0.0], dtype=np.float32))


def angle_normalize(x):
    return ((x + jnp.pi) % (2.0 * jnp.pi)) - jnp.pi


def dynamics(x, u):
    """x = (th, thdot); u = (torque,)."""
    torque = jnp.clip(u[0], -MAX_TORQUE, MAX_TORQUE)
    th, thdot = x[0], x[1]
    newthdot = thdot + (
        -3.0 * G / (2.0 * L) * jnp.sin(th + jnp.pi) + 3.0 / (M * L**2) * torque
    ) * DT
    newth = th + newthdot * DT
    newthdot = jnp.clip(newthdot, -MAX_SPEED, MAX_SPEED)
    return jnp.stack([newth, newthdot])


def transform(x, u):
    return -jnp.stack([angle_normalize(x[0]), x[1], u[0]])


PendulumModel = Model(
    name="pendulum",
    state_size=2,
    action_size=1,
    bounds_low=(-MAX_TORQUE,),
    bounds_high=(MAX_TORQUE,),
    dynamics=dynamics,
    transform=transform,
    state_cost=quad_cost(W),
    terminal_cost=quad_cost(W_T),
)
