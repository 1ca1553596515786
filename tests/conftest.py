"""Test configuration: force CPU with an 8-device virtual mesh.

Mirrors the SURVEY.md §4 plan — multi-device sharding is validated without
TPUs by faking an 8-device topology with
``--xla_force_host_platform_device_count``. XLA_FLAGS must be set before the
first backend initialization; the platform choice must go through
``jax.config`` because the environment's TPU plugin overrides
``JAX_PLATFORMS`` at import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# BMPC_TEST_TPU=1 runs the suite on the real chip instead (used to certify
# the batched-vs-scalar equivalence chain on TPU — see test_equivalence.py)
if not os.environ.get("BMPC_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
