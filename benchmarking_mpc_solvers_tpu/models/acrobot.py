"""Acrobot (2-link underactuated pendulum) model.

Behavioral parity target: ``MPCBenchmark/models/acrobot_model.py:19-282``
(itself derived from the public RLPy acrobot, "book" dynamics variant).
Semantics reproduced exactly, but *batch-safe and jittable* — the reference
``_dynamics`` is explicitly batch-unsafe (uses ``x[0]``, ``acrobot_model.py:144``)
and its ``wrap`` uses Python while-loops (``:185-205``); here wrap is modular
arithmetic and everything vmaps.

- single RK4 step with dt=0.2 of the manipulator equations (``:60,99-160``;
  the reference integrates the action-augmented state whose derivative is 0,
  equivalent to holding u constant over the step).
- theta1, theta2 wrapped to [-pi, pi]; velocities bounded to ±4π / ±9π (``:155-158``).
- torque is NOT clipped inside the dynamics (unlike pendulum/cartpole).
- features z = (-cosθ1 - cos(θ1+θ2) - 2, 0, 0, 0, u) (``:162-170``).
- stage and terminal cost both zᵀ diag(1,0,0,0,0) z (``:94-95,172-182``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Model, quad_cost

DT = 0.2
L1 = 1.0
M1 = 1.0
M2 = 1.0
LC1 = 0.5
LC2 = 0.5
I1 = 1.0
I2 = 1.0
GRAV = 9.8
MAX_VEL_1 = 4.0 * np.pi
MAX_VEL_2 = 9.0 * np.pi

W = np.diag(np.array([1.0, 0.0, 0.0, 0.0, 0.0], dtype=np.float32))


def _dsdt(s, a):
    """Manipulator-equation derivative, "book" variant."""
    theta1, theta2, dtheta1, dtheta2 = s[0], s[1], s[2], s[3]
    d1 = (
        M1 * LC1**2
        + M2 * (L1**2 + LC2**2 + 2.0 * L1 * LC2 * jnp.cos(theta2))
        + I1
        + I2
    )
    d2 = M2 * (LC2**2 + L1 * LC2 * jnp.cos(theta2)) + I2
    phi2 = M2 * LC2 * GRAV * jnp.cos(theta1 + theta2 - jnp.pi / 2.0)
    phi1 = (
        -M2 * L1 * LC2 * dtheta2**2 * jnp.sin(theta2)
        - 2.0 * M2 * L1 * LC2 * dtheta2 * dtheta1 * jnp.sin(theta2)
        + (M1 * LC1 + M2 * L1) * GRAV * jnp.cos(theta1 - jnp.pi / 2.0)
        + phi2
    )
    ddtheta2 = (
        a
        + d2 / d1 * phi1
        - M2 * L1 * LC2 * dtheta1**2 * jnp.sin(theta2)
        - phi2
    ) / (M2 * LC2**2 + I2 - d2**2 / d1)
    ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
    return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2])


def wrap(x, lo, hi):
    """Wrap x into [lo, hi) by modular arithmetic (batch-safe equivalent of
    the reference's while-loop wrap, ``acrobot_model.py:185-205``)."""
    return ((x - lo) % (hi - lo)) + lo


def dynamics(x, u):
    """x = (theta1, theta2, dtheta1, dtheta2); u = (torque,). One RK4 step."""
    a = u[0]
    k1 = _dsdt(x, a)
    k2 = _dsdt(x + DT / 2.0 * k1, a)
    k3 = _dsdt(x + DT / 2.0 * k2, a)
    k4 = _dsdt(x + DT * k3, a)
    ns = x + DT / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    return jnp.stack(
        [
            wrap(ns[0], -jnp.pi, jnp.pi),
            wrap(ns[1], -jnp.pi, jnp.pi),
            jnp.clip(ns[2], -MAX_VEL_1, MAX_VEL_1),
            jnp.clip(ns[3], -MAX_VEL_2, MAX_VEL_2),
        ]
    )


def transform(x, u):
    tip = -jnp.cos(x[0]) - jnp.cos(x[1] + x[0]) - 2.0
    # zeros_like keeps this transform valid on row-stacked tile layouts
    # (x rows are (lanes,) vectors inside the fused Pallas kernel)
    zeros = jnp.zeros_like(tip)
    return jnp.stack([tip, zeros, zeros, zeros, u[0] + zeros])


AcrobotModel = Model(
    name="acrobot",
    state_size=4,
    action_size=1,
    bounds_low=(-1.0,),
    bounds_high=(1.0,),
    dynamics=dynamics,
    transform=transform,
    state_cost=quad_cost(W),
    terminal_cost=quad_cost(W),
)
