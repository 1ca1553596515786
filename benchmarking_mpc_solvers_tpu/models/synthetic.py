"""Synthetic test models: identity-dynamics dummy and generic linear systems.

``DummyModel`` mirrors the reference's test fixture
(``MPCBenchmark/models/model.py:83-117``): identity dynamics and quadratic
cost (z-g)ᵀ I (z-g) over z = (x, u), used to isolate solver logic from
dynamics.

``make_linear_model`` has no reference counterpart — it exists so solvers can
be validated against closed-form finite-horizon LQR solutions (the test
strategy upgrade promised in SURVEY.md §4).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Model, quad_cost


def make_dummy_model(state_size: int, action_size: int) -> Model:
    W = np.eye(state_size + action_size, dtype=np.float32)

    def dynamics(x, u):
        return x

    def transform(x, u):
        return jnp.concatenate([x, u])

    return Model(
        name="dummy",
        state_size=state_size,
        action_size=action_size,
        bounds_low=tuple([-1.0] * action_size),
        bounds_high=tuple([1.0] * action_size),
        dynamics=dynamics,
        transform=transform,
        state_cost=quad_cost(W),
        terminal_cost=quad_cost(W),
    )


DummyModel = make_dummy_model(2, 1)


def make_linear_model(
    A,
    B,
    Q,
    R,
    Qf=None,
    bounds: float = 1e9,
    name: str = "linear",
) -> Model:
    """Linear dynamics x' = A x + B u with cost xᵀQx + uᵀRu.

    The feature vector is z = (x, u) and the cost weight is blockdiag(Q, R)
    (terminal blockdiag(Qf, 0)), so this slots into the same Model contract
    as the physical systems.
    """
    A = jnp.asarray(A, dtype=jnp.float32)
    B = jnp.asarray(B, dtype=jnp.float32)
    Q = np.asarray(Q, dtype=np.float32)
    R = np.asarray(R, dtype=np.float32)
    Qf = Q if Qf is None else np.asarray(Qf, dtype=np.float32)
    S, na = A.shape[0], B.shape[1]

    W = np.zeros((S + na, S + na), dtype=np.float32)
    W[:S, :S] = Q
    W[S:, S:] = R
    W_T = np.zeros_like(W)
    W_T[:S, :S] = Qf

    def dynamics(x, u):
        return A @ x + B @ u

    def transform(x, u):
        return jnp.concatenate([x, u])

    return Model(
        name=name,
        state_size=S,
        action_size=na,
        bounds_low=tuple([-bounds] * na),
        bounds_high=tuple([bounds] * na),
        dynamics=dynamics,
        transform=transform,
        state_cost=quad_cost(W),
        terminal_cost=quad_cost(W_T),
    )
