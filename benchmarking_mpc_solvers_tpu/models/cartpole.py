"""Cart-pole swing-up model (DeepPILCO-style physics).

Behavioral parity target: ``MPCBenchmark/models/cartpole_swingup_model.py:15-110``.
Semantics reproduced exactly:

- action clipped to ±1 then scaled by force_mag=10 (``:66-67``).
- Euler integration dt=0.05 where the *position* updates use the old
  velocities, then the velocities update (``:79-83``).
- friction b=0.1 on cart velocity (``:33,75-78``).
- features z = ((x/2.4)² + (x/2.4)¹⁰, ẋ, 1-cosθ, θ̇, u) (``:87-93``).
- stage cost: the reference stores W = -diag(1,0,5,0,0) and returns
  ``-(zᵀWz)`` (``:45,95-104``) — a double negation that nets to the positive
  quadratic zᵀ diag(1,0,5,0,0) z, which is what we implement directly.
- terminal cost: W_t = -diag(5,0,10,0,0) *without* the sign flip (``:46,106-110``)
  — i.e. the reference terminal cost is genuinely negative; we reproduce it
  verbatim for parity (it is only used by iLQR-style solvers).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Model, quad_cost

G = 9.82
M_C = 0.5
M_P = 0.5
TOTAL_M = M_P + M_C
L = 0.6
M_P_L = M_P * L
FORCE_MAG = 10.0
DT = 0.05
B_FRICTION = 0.1
X_THRESHOLD = 2.4

W = np.diag(np.array([1.0, 0.0, 5.0, 0.0, 0.0], dtype=np.float32))
W_T = np.diag(np.array([-5.0, 0.0, -10.0, 0.0, 0.0], dtype=np.float32))


def dynamics(x, u):
    """x = (pos, pos_dot, theta, theta_dot); u = (force in [-1,1],)."""
    action = jnp.clip(u[0], -1.0, 1.0) * FORCE_MAG
    xc, x_dot, theta, theta_dot = x[0], x[1], x[2], x[3]
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    xdot_update = (
        -2.0 * M_P_L * theta_dot**2 * s
        + 3.0 * M_P * G * s * c
        + 4.0 * action
        - 4.0 * B_FRICTION * x_dot
    ) / (4.0 * TOTAL_M - 3.0 * M_P * c**2)
    thetadot_update = (
        -3.0 * M_P_L * theta_dot**2 * s * c
        + 6.0 * TOTAL_M * G * s
        + 6.0 * (action - B_FRICTION * x_dot) * c
    ) / (4.0 * L * TOTAL_M - 3.0 * M_P_L * c**2)
    new_x = xc + x_dot * DT
    new_theta = theta + theta_dot * DT
    new_x_dot = x_dot + xdot_update * DT
    new_theta_dot = theta_dot + thetadot_update * DT
    return jnp.stack([new_x, new_x_dot, new_theta, new_theta_dot])


def transform(x, u):
    xc = (x[0] / X_THRESHOLD) ** 2 + (x[0] / X_THRESHOLD) ** 10
    return jnp.stack([xc, x[1], 1.0 - jnp.cos(x[2]), x[3], u[0]])


CartPoleSwingUpModel = Model(
    name="cartpole_swingup",
    state_size=4,
    action_size=1,
    bounds_low=(-1.0,),
    bounds_high=(1.0,),
    dynamics=dynamics,
    transform=transform,
    state_cost=quad_cost(W),
    terminal_cost=quad_cost(W_T),
)
