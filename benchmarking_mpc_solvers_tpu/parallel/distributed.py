"""Multi-host initialization and cross-host collectives helpers.

The reference's cross-process story is host-local ``multiprocessing``
(SURVEY.md §2.3); the TPU-native equivalent for crossing *hosts* is
``jax.distributed`` + a global mesh whose scenario axis spans every chip in
the job — per-scenario MPC programs stay chip-local, while global
reductions (sweep statistics, line-search accept votes, residual norms)
ride ``psum`` over ICI/DCN.

Single-process environments (this dev box, unit tests) use these helpers as
no-ops over the local mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .mesh import BATCH_AXIS, make_mesh


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host.

    With no arguments, relies on the cluster environment (TPU pods
    auto-detect); returns False (no-op) when the job is single-process so
    local development paths need no branches.
    """
    if num_processes is not None and num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (ValueError, RuntimeError):
        # already initialized or single-process environment
        return jax.process_count() > 1


def global_mesh(axis: str = BATCH_AXIS):
    """Mesh over every device in the job (all hosts)."""
    return make_mesh(len(jax.devices()), axes=(axis,))


def global_stats(values, mesh, axis: str = BATCH_AXIS):
    """Cross-host mean/min/max of per-scenario scalars via psum — the
    pattern for sweep statistics and global line-search decisions.

    values: (B,) sharded over ``axis``; returns (mean, min, max) replicated.
    """

    def inner(v):
        n = lax.psum(jnp.asarray(v.shape[0], jnp.float32), axis)
        total = lax.psum(jnp.sum(v), axis)
        vmin = lax.pmin(jnp.min(v), axis)
        vmax = lax.pmax(jnp.max(v), axis)
        return total / n, vmin, vmax

    fn = jax.shard_map(
        inner, mesh=mesh, in_specs=P(axis), out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(values)
