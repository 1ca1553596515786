"""Two-process ``jax.distributed`` test on the CPU backend.

Strengthens the multi-host evidence beyond the single-process no-op test
(``test_parallel.py``): two real OS processes rendezvous through
``distributed_init`` (coordinator on localhost), form one global mesh over
their 2+2 virtual CPU devices, and compute ``global_stats`` — whose psum /
pmin / pmax must therefore cross the process boundary (DCN-equivalent) to
be correct. The TPU equivalent is one process per host with ICI/DCN
collectives; the code path (jax.distributed + shard_map + psum) is
identical.
"""

import os
import subprocess
import sys

import pytest

# slow tier: excluded from the fast default run (see pytest.ini markers)
pytestmark = pytest.mark.slow

WORKER = r"""
import os, sys, json
port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from benchmarking_mpc_solvers_tpu.parallel import (
    distributed_init, global_mesh, global_stats,
)

ok = distributed_init(coordinator_address=f"localhost:{port}",
                      num_processes=2, process_id=pid)
assert ok, "distributed_init returned False in a 2-process job"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

mesh = global_mesh()
B = 8  # 2 rows per device
data = np.arange(B, dtype=np.float32)
sharding = NamedSharding(mesh, P("batch"))
vals = jax.make_array_from_callback(data.shape, sharding, lambda idx: data[idx])
mean, vmin, vmax = global_stats(vals, mesh)
print(json.dumps({"pid": pid, "mean": float(mean), "min": float(vmin),
                  "max": float(vmax)}))
"""


def test_two_process_global_stats(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out.strip().splitlines()[-1])

    import json

    for line in outs:
        res = json.loads(line)
        # global stats over np.arange(8): only correct if the psum crossed
        # the process boundary (each process holds half the rows)
        assert res["mean"] == pytest.approx(3.5)
        assert res["min"] == 0.0 and res["max"] == 7.0
