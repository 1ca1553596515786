"""Sample-sharded MPPI: solver-level collectives over the device mesh.

Shards the K rollout samples of a batched MPPI step over a ``sample`` mesh
axis (in addition to the ``batch`` scenario axis), with the softmax
weighting done via ``pmin``/``psum`` collectives over ICI — the TPU-native
equivalent of the reference's sample fan-out to a multiprocessing pool
(``agents/mppi.py:24,55-62``), but spanning chips.

This matters when K × rollout cost exceeds one chip (large K, long
horizons): each device evaluates K/n_sample rollouts, then

    beta  = pmin_k(cost)                       (global baseline, mppi.py:59)
    eta   = psum_k(exp(-(c-beta)/lam))         (normalizer,     mppi.py:61)
    update= psum_k(w_k * delta_k)              (weighted mean,  mppi.py:64-69)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.rollout import rollout_cost_samples
from ..solvers.mppi import MPPI
from .mesh import BATCH_AXIS, SAMPLE_AXIS


def make_sharded_mppi_step(solver: MPPI, mesh: Mesh):
    """Return a jitted (planned_us, xs, keys) -> (new_planned_us, u0s) step.

    planned_us: (B, T, A); xs: (B, S); keys: (B, 2) uint32 — all sharded
    over BATCH_AXIS on their leading dim and replicated over SAMPLE_AXIS.
    """
    model = solver.model
    n_sample = mesh.shape[SAMPLE_AXIS]
    if solver.K % n_sample:
        raise ValueError(f"K={solver.K} not divisible by sample axis {n_sample}")
    k_local = solver.K // n_sample

    def local_step(planned_us, x, key):
        """Runs per (batch-shard element, sample-shard): k_local rollouts."""
        sidx = lax.axis_index(SAMPLE_AXIS)
        key = jax.random.fold_in(key, sidx)
        T, A = solver.T, model.action_size
        delta = solver.std * jax.random.normal(key, (k_local, T, A), jnp.float32)
        samples = planned_us[None] + delta
        g_z = jnp.zeros((T, model.goal_size), jnp.float32)
        roll, _ = rollout_cost_samples(model, x, samples, g_z)
        ctrl = solver.lam * jnp.einsum("kta,kta->k", samples, delta) / solver.std**2
        costs = roll + ctrl

        beta = lax.pmin(jnp.min(costs), SAMPLE_AXIS)
        expw = jnp.exp(-(costs - beta) / solver.lam)
        eta = lax.psum(jnp.sum(expw), SAMPLE_AXIS)
        w = expw / eta
        update = lax.psum(jnp.einsum("k,kta->ta", w, delta), SAMPLE_AXIS)
        new_planned = planned_us + update
        return new_planned, jnp.clip(new_planned[0], model.lo, model.hi)

    def sharded(planned_us, xs, keys):
        # vmap over the local batch shard; sample axis handled by collectives
        return jax.vmap(local_step)(planned_us, xs, keys)

    fn = shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(BATCH_AXIS), P(BATCH_AXIS), P(BATCH_AXIS)),
        out_specs=(P(BATCH_AXIS), P(BATCH_AXIS)),
        check_vma=False,
    )
    batch_spec = NamedSharding(mesh, P(BATCH_AXIS))
    return jax.jit(fn, out_shardings=(batch_spec, batch_spec))
