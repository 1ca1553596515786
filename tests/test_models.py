"""Model parity tests.

Each JAX model is checked against an independent numpy implementation of the
same published physics (pendulum: gym classic-control swing-up; cartpole:
DeepPILCO swing-up; acrobot: RLPy/Sutton book RK4), including the reference's
quirky clip ordering, so trajectories track the reference semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from benchmarking_mpc_solvers_tpu.models import (
    AcrobotModel,
    CartPoleSwingUpModel,
    DummyModel,
    PendulumModel,
)


# --- independent numpy references ------------------------------------------


def np_pendulum_step(x, u):
    g, m, l, dt = 10.0, 1.0, 1.0, 0.05
    torque = np.clip(u[0], -2.0, 2.0)
    th, thdot = x
    newthdot = thdot + (-3 * g / (2 * l) * np.sin(th + np.pi) + 3.0 / (m * l**2) * torque) * dt
    newth = th + newthdot * dt  # uses unclipped newthdot
    newthdot = np.clip(newthdot, -8.0, 8.0)
    return np.array([newth, newthdot])


def np_cartpole_step(x, u):
    g, m_c, m_p, l, dt, b = 9.82, 0.5, 0.5, 0.6, 0.05, 0.1
    total_m, m_p_l = m_c + m_p, m_p * l
    a = np.clip(u[0], -1.0, 1.0) * 10.0
    xc, x_dot, th, th_dot = x
    s, c = np.sin(th), np.cos(th)
    xdot_up = (-2 * m_p_l * th_dot**2 * s + 3 * m_p * g * s * c + 4 * a - 4 * b * x_dot) / (
        4 * total_m - 3 * m_p * c**2
    )
    thdot_up = (-3 * m_p_l * th_dot**2 * s * c + 6 * total_m * g * s + 6 * (a - b * x_dot) * c) / (
        4 * l * total_m - 3 * m_p_l * c**2
    )
    return np.array([xc + x_dot * dt, x_dot + xdot_up * dt, th + th_dot * dt, th_dot + thdot_up * dt])


def np_acrobot_dsdt(s, a):
    m1 = m2 = 1.0
    l1, lc1, lc2 = 1.0, 0.5, 0.5
    I1 = I2 = 1.0
    g = 9.8
    t1, t2, dt1, dt2 = s
    d1 = m1 * lc1**2 + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * np.cos(t2)) + I1 + I2
    d2 = m2 * (lc2**2 + l1 * lc2 * np.cos(t2)) + I2
    phi2 = m2 * lc2 * g * np.cos(t1 + t2 - np.pi / 2)
    phi1 = (
        -m2 * l1 * lc2 * dt2**2 * np.sin(t2)
        - 2 * m2 * l1 * lc2 * dt2 * dt1 * np.sin(t2)
        + (m1 * lc1 + m2 * l1) * g * np.cos(t1 - np.pi / 2)
        + phi2
    )
    dd2 = (a + d2 / d1 * phi1 - m2 * l1 * lc2 * dt1**2 * np.sin(t2) - phi2) / (
        m2 * lc2**2 + I2 - d2**2 / d1
    )
    dd1 = -(d2 * dd2 + phi1) / d1
    return np.array([dt1, dt2, dd1, dd2])


def np_acrobot_step(x, u):
    dt = 0.2
    y = x.astype(np.float64)
    k1 = np_acrobot_dsdt(y, u[0])
    k2 = np_acrobot_dsdt(y + dt / 2 * k1, u[0])
    k3 = np_acrobot_dsdt(y + dt / 2 * k2, u[0])
    k4 = np_acrobot_dsdt(y + dt * k3, u[0])
    ns = y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    def wrap(v):
        return ((v + np.pi) % (2 * np.pi)) - np.pi

    return np.array(
        [
            wrap(ns[0]),
            wrap(ns[1]),
            np.clip(ns[2], -4 * np.pi, 4 * np.pi),
            np.clip(ns[3], -9 * np.pi, 9 * np.pi),
        ]
    )


CASES = [
    (PendulumModel, np_pendulum_step, 2),
    (CartPoleSwingUpModel, np_cartpole_step, 4),
    (AcrobotModel, np_acrobot_step, 4),
]


@pytest.mark.parametrize("model,np_step,S", CASES, ids=lambda c: getattr(c, "name", ""))
def test_dynamics_match_numpy(model, np_step, S):
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = rng.uniform(-2, 2, size=S)
        u = rng.uniform(-3, 3, size=1)
        got = np.asarray(jax.jit(model.dynamics)(jnp.float32(x), jnp.float32(u)))
        want = np_step(x, u)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("model,np_step,S", CASES, ids=lambda c: getattr(c, "name", ""))
def test_dynamics_batch_safe(model, np_step, S):
    rng = np.random.default_rng(1)
    xs = jnp.float32(rng.uniform(-2, 2, size=(16, S)))
    us = jnp.float32(rng.uniform(-2, 2, size=(16, 1)))
    batched = jax.vmap(model.dynamics)(xs, us)
    looped = jnp.stack([model.dynamics(xs[i], us[i]) for i in range(16)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(looped), rtol=1e-6)


def test_pendulum_transform_and_cost():
    x = jnp.array([0.3, -1.0], dtype=jnp.float32)
    u = jnp.array([0.5], dtype=jnp.float32)
    z = PendulumModel.transform(x, u)
    np.testing.assert_allclose(np.asarray(z), [-0.3, 1.0, -0.5], rtol=1e-6)
    g = jnp.zeros(3)
    c = PendulumModel.state_cost(z, g)
    want = 1.0 * 0.3**2 + 0.1 * 1.0**2 + 0.001 * 0.5**2
    np.testing.assert_allclose(float(c), want, rtol=1e-5)
    ct = PendulumModel.terminal_cost(z, g)
    np.testing.assert_allclose(float(ct), 0.3**2 + 2 * 1.0**2, rtol=1e-5)


def test_cartpole_transform_and_cost():
    x = jnp.array([1.2, 0.4, np.pi / 3, -0.2], dtype=jnp.float32)
    u = jnp.array([0.7], dtype=jnp.float32)
    z = np.asarray(CartPoleSwingUpModel.transform(x, u))
    want_z0 = (1.2 / 2.4) ** 2 + (1.2 / 2.4) ** 10
    np.testing.assert_allclose(z[0], want_z0, rtol=1e-5)
    np.testing.assert_allclose(z[2], 1 - np.cos(np.pi / 3), rtol=1e-5)
    c = float(CartPoleSwingUpModel.state_cost(jnp.asarray(z), jnp.zeros(5)))
    np.testing.assert_allclose(c, z[0] ** 2 + 5 * z[2] ** 2, rtol=1e-5)
    # terminal cost keeps the reference's negative W_t verbatim
    ct = float(CartPoleSwingUpModel.terminal_cost(jnp.asarray(z), jnp.zeros(5)))
    np.testing.assert_allclose(ct, -5 * z[0] ** 2 - 10 * z[2] ** 2, rtol=1e-5)


def test_acrobot_transform_zeroes_mid_features():
    x = jnp.array([0.5, 0.8, 1.0, -2.0], dtype=jnp.float32)
    u = jnp.array([0.9], dtype=jnp.float32)
    z = np.asarray(AcrobotModel.transform(x, u))
    tip = -np.cos(0.5) - np.cos(1.3) - 2
    np.testing.assert_allclose(z, [tip, 0, 0, 0, 0.9], rtol=1e-5, atol=1e-6)
    c = float(AcrobotModel.state_cost(jnp.asarray(z), jnp.zeros(5)))
    np.testing.assert_allclose(c, tip**2, rtol=1e-5)


def test_dummy_model_identity_and_quadratic():
    x = jnp.array([1.0, -2.0])
    u = jnp.array([0.5])
    np.testing.assert_allclose(np.asarray(DummyModel.dynamics(x, u)), [1.0, -2.0])
    c = float(DummyModel.cost(x, u, jnp.zeros(3)))
    np.testing.assert_allclose(c, 1 + 4 + 0.25, rtol=1e-6)


def test_step_and_cost_orders_cost_before_step():
    # cost must be evaluated at the *current* (x, u), matching model.py:26-44
    x = jnp.array([1.0, 0.0], dtype=jnp.float32)
    u = jnp.array([2.0], dtype=jnp.float32)
    x_next, c = PendulumModel.step_and_cost(x, u, jnp.zeros(3))
    z = PendulumModel.transform(x, u)
    np.testing.assert_allclose(float(c), float(PendulumModel.state_cost(z, jnp.zeros(3))))
    assert not np.allclose(np.asarray(x_next), np.asarray(x))
