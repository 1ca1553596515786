"""Pure-function dynamics & cost models.

TPU-first redesign of the reference's stateful ``Model`` class
(``MPCBenchmark/models/model.py:5-80``): instead of ``predict`` mutating
``last_reward``/``last_observation``, a model here is a bundle of *pure,
jittable, vmappable, differentiable* functions operating on single samples:

    dynamics(x, u)        -> x_next          (S,), (A,) -> (S,)
    transform(x, u)       -> z               (S,), (A,) -> (Z,)   with Z = S + A
    state_cost(z, g_z)    -> scalar cost
    terminal_cost(z, g_z) -> scalar cost

Batching is obtained with ``jax.vmap`` (replacing the reference's
``batch_predict``, ``model.py:50-60``), derivatives with ``jax.jacfwd`` /
``jax.hessian`` (replacing numdifftools in ``agents/ilqr.py:83-88``), and
randomness is explicit via ``jax.random`` keys (the reference used unseeded
``np.random`` for its noise, ``model.py:42-43``).

Cost convention (matches reference ``model.py:26-44``): the stage cost is
evaluated at the *current* ``(x, u)`` before stepping the dynamics; reward is
``-cost``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True, eq=False)
class Model:
    """A pure-function model definition.

    ``eq=False`` gives identity-based hashing so a Model can be closed over /
    passed as a static argument to ``jax.jit`` without retracing per call.
    All functions take/return single (unbatched) samples.
    """

    name: str
    state_size: int
    action_size: int
    bounds_low: tuple  # per-action lower bounds, length action_size
    bounds_high: tuple  # per-action upper bounds, length action_size
    dynamics: Callable[[Array, Array], Array]
    transform: Callable[[Array, Array], Array]
    state_cost: Callable[[Array, Array], Array]
    terminal_cost: Callable[[Array, Array], Array]

    @property
    def goal_size(self) -> int:
        """Size of the feature vector z (= state_size + action_size)."""
        return self.state_size + self.action_size

    @property
    def lo(self) -> Array:
        return jnp.asarray(self.bounds_low, dtype=jnp.float32)

    @property
    def hi(self) -> Array:
        return jnp.asarray(self.bounds_high, dtype=jnp.float32)

    # -- convenience composites ------------------------------------------------

    def cost(self, x: Array, u: Array, g_z: Array) -> Array:
        """Stage cost of (x, u) against goal features g_z."""
        return self.state_cost(self.transform(x, u), g_z)

    def final_cost(self, x: Array, g_z: Array) -> Array:
        """Terminal cost: features of (x, 0) against g_z.

        Mirrors the reference terminal-cost closure which evaluates the
        transform at zero action (``agents/ilqr.py:66-73``).
        """
        z = self.transform(x, jnp.zeros((self.action_size,), x.dtype))
        return self.terminal_cost(z, g_z)

    def step_and_cost(self, x: Array, u: Array, g_z: Array):
        """(cost at current (x,u), next state) — the reference ``predict``
        contract (``model.py:26-44``)."""
        c = self.cost(x, u, g_z)
        x_next = self.dynamics(x, u)
        return x_next, c

    def clip_action(self, u: Array) -> Array:
        return jnp.clip(u, self.lo, self.hi)


def quad_cost(W: Array) -> Callable[[Array, Array], Array]:
    """Quadratic cost (z-g)ᵀ W (z-g) as a pure function of (z, g_z).

    The weight matrix is attached as ``cost.W`` so batched/fused paths
    (e.g. the Pallas rollout kernel in ``ops/fused.py``) can evaluate the
    same quadratic on row-stacked tiles without re-deriving it.
    """
    W = np.asarray(W, dtype=np.float32)
    # Contract over the NONZERO entries of W only (same trick as the fused
    # Pallas kernels): mathematically identical to zd @ W @ zd for every
    # shipped (symmetric) W, but an overflowed feature (cartpole's
    # (x/2.4)^10 squared exceeds f32 range once |x| ≳ 400 under heavy
    # noise) yields +inf instead of the inf*0=nan the dense einsum produces
    # on W's zero entries — and inf survives the reference aggregation's
    # per-step clip to [-20, 20] (table_generation.py:37-43) where nan
    # would poison every median.
    Wsym = 0.5 * (W + W.T)
    nz = [
        (i, j, float(Wsym[i, j] * (1.0 if i == j else 2.0)))
        for i in range(W.shape[0])
        for j in range(i, W.shape[0])
        if Wsym[i, j] != 0.0
    ]

    def cost(z: Array, g_z: Array) -> Array:
        zd = z - g_z
        out = jnp.zeros(zd.shape[:-1], dtype=jnp.float32)
        for i, j, w in nz:
            out = out + w * (zd[..., i] * zd[..., j])
        # saturate at +-1e30 instead of +-inf: a fully-diverged rollout
        # must still produce a FINITE (astronomically bad) cost, or
        # downstream baselined softmaxes hit inf-inf=nan (MPPI's
        # w=exp(-(c-beta)/lam) with every candidate inf) and the nan
        # propagates into the plan. The cap leaves ~8 orders of headroom
        # below f32-max so horizon sums of capped stage costs stay finite
        # too; both sides are clamped because negated-W costs (cartpole's
        # double negation) overflow to -inf first. The reference computes
        # the same quadratic in f64 where these regimes stay finite
        # (~1e40); values are only affected beyond 1e30, astronomically
        # outside any comparable regime. In the saturated regime the clip
        # also zeroes the cost gradient — gradient-based solvers recover
        # via their own finite-guards (iLQR mu-escalation, SQP/I2C
        # keep-previous-plan), not via the gradient.
        return jnp.clip(out, -1e30, 1e30)

    cost.W = W
    return cost
