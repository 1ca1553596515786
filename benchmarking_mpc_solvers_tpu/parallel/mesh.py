"""Device meshes and sharded scenario batching.

The reference's entire parallelism story is single-host
``multiprocessing`` — pools over MPC samples (``agents/cem.py:31,61-64``,
``agents/mppi.py:24,55-57``) and worker queues over iLQR derivative jobs
(``agents/ilqr.py:10-11,240-253``). On TPU those axes fuse on-chip
(vmap + scan); the axis that *does* span chips is the scenario batch — the
reference's serial sweep repetitions (``scripts/sample_test.py:26-51``).
Here scenarios shard over a ``jax.sharding.Mesh`` with ``shard_map``;
per-scenario programs need no cross-device communication, so scaling is
embarrassingly parallel over ICI/DCN, while solver-level collectives (e.g.
sample-sharded MPPI softmax) use ``psum`` (see ``mppi_sharded.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


BATCH_AXIS = "batch"
SAMPLE_AXIS = "sample"


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = (BATCH_AXIS,),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first n devices. Default: 1-D scenario-batch
    mesh over all local devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    devs = devs[:n]
    if shape is None:
        shape = (n,) if len(axes) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.array(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axes))


def shard_batch(mesh: Mesh, tree, axis: str = BATCH_AXIS):
    """Place a pytree of batched arrays with the leading axis sharded over
    ``axis`` (XLA then keeps every per-scenario program chip-local)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_episodes(env, solver, cfg, mesh: Mesh, axis: str = BATCH_AXIS):
    """Return a jitted fn (keys, x0s) -> EpisodeResult batch with the
    scenario axis sharded over ``mesh``.

    Uses pjit-style sharding constraints rather than shard_map: each
    scenario's program is independent, so XLA partitions the whole scan
    without inserting collectives.
    """
    from ..experiment.episode import run_episode

    spec = NamedSharding(mesh, P(axis))

    def batch_fn(keys, x0s):
        keys = jax.lax.with_sharding_constraint(keys, spec)
        x0s = jax.lax.with_sharding_constraint(x0s, spec)
        return jax.vmap(lambda k, x0: run_episode(env, solver, cfg, k, x0))(keys, x0s)

    return jax.jit(batch_fn, out_shardings=spec)


def sharded_episodes_kernel(env, solver, cfg, mesh: Mesh, axis: str = BATCH_AXIS):
    """Single-kernel episode tier sharded over the mesh with ``shard_map``:
    each device runs its scenario tile through the solver's Pallas kernel
    (``ops/fused_mppi.py`` / ``ops/fused_cem.py``), so the headline
    solves/s path scales across chips the same embarrassingly-parallel way
    as ``sharded_episodes`` — per-scenario programs are independent and no
    collectives are inserted. Each shard draws its own kernel seeds from
    its local keys, so shards have distinct noise streams.

    Requires a solver with the kernel tier (``kernel_ok``/``solve_batch_tm``)
    and a per-device batch that is a multiple of the kernel tile (the
    kernel pads otherwise).
    """
    from ..experiment.episode import run_episodes_fused

    spec = P(axis)

    def local_fn(keys, x0s):
        return run_episodes_fused(env, solver, cfg, keys, x0s, use_kernel=True)

    return jax.jit(
        # check_vma=False: the varying-mesh-axes checker cannot infer vma
        # for pallas_call outputs; per-shard independence holds by
        # construction (no collectives in the episode body)
        jax.shard_map(local_fn, mesh=mesh, in_specs=(spec, spec),
                      out_specs=spec, check_vma=False)
    )
