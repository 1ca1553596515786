"""Shared plumbing for the sweep scripts.

The reference scripts hard-code MongoDB clients and serial nested sweep
loops (e.g. ``scripts/sample_test.py:10-51``); here each script takes
--results-dir/--quick flags, persists into a local ResultStore and runs
batched repetitions on-device.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# Platform override must land before the first jax computation: the TPU
# plugin in this environment re-forces jax_platforms at import, so honor
# BMPC_PLATFORM=cpu here (useful for quick smoke runs off-TPU).
import os as _os  # noqa: E402
import jax as _jax  # noqa: E402

if _os.environ.get("BMPC_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["BMPC_PLATFORM"])

# Persistent compilation cache: the study sweeps compile one XLA program per
# (solver, T, K, length) shape; caching makes interrupted sweeps resume in
# seconds and de-duplicates shapes shared across scripts.
_cache_dir = _os.environ.get("BMPC_COMPILE_CACHE",
                             str(pathlib.Path.home() / ".bmpc_xla_cache"))
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarking_mpc_solvers_tpu.experiment import Experiment, ResultStore  # noqa: E402

START_STATES = {
    "pendulum": np.array([np.pi, 0.0]),
    "cartpole_swingup": np.array([0.0, 0.0, np.pi, 0.0]),
    "acrobot": np.array([0.0, 0.0, 0.0, 0.0]),
}

ENV_NAMES = {
    "pendulum": "PendulumEnvironment",
    "cartpole_swingup": "CartpoleSwingupEnvironment",
    "acrobot": "AcrobotEnvironment",
}


def std_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--results-dir", default="results")
    p.add_argument("--plots-dir", default="ResultPlots")
    p.add_argument("--quick", action="store_true",
                   help="tiny sweep for smoke-testing (seconds instead of minutes)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-data", action="store_true", help="skip data generation")
    p.add_argument("--no-plots", action="store_true", help="skip plot generation")
    return p


def run_and_store(store: ResultStore, params: dict, warmstart: int | None = 50) -> dict | None:
    """Run one experiment config into the store, with crash-resume: each
    completed config is marked in a checkpoint file next to the collection,
    so re-running a killed sweep skips finished work (the reference sweeps
    restart from scratch)."""
    import json as _json

    from benchmarking_mpc_solvers_tpu.utils import SweepCheckpoint

    ckpt = SweepCheckpoint(str(store.dir / "sweep_checkpoint.json"))
    cfg_key = _json.dumps(
        {k: v for k, v in params.items() if k != "start_state"}
        | {"start_state": np.asarray(params["start_state"]).tolist(), "ws": warmstart},
        sort_keys=True, default=str,
    )
    if ckpt.is_done(cfg_key):
        print(f"[skip – done] {params['agent']} on {params['env']} {params['agent_config']}")
        return None
    exp = Experiment(params)
    result = exp(warmstart=warmstart)
    store.insert(result)
    ckpt.mark(cfg_key)
    total = float(np.sum(result["env_costs"]))
    print(
        f"[{params['agent']} on {params['env']}] cfg={params['agent_config']} "
        f"cost={total:.1f} time={result['passed_time']}s (compile {result.get('compile_time')}s)"
    )
    return result
