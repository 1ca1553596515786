"""Purge non-finite runs from a ResultStore collection and un-mark them in
the sweep checkpoint so the sweep script regenerates them.

Used once in round 3 after fixing the f32 cost-overflow nan (see
models/base.py quad_cost saturation): the poisoned runs were already
checkpointed as done, so a plain rerun would skip them.
"""

import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from benchmarking_mpc_solvers_tpu.experiment import ResultStore  # noqa: E402


def purge(root: str, collection: str) -> int:
    store = ResultStore(root, collection)
    bad_meta = []
    keep_lines = []
    for meta in store._iter_meta():
        npz = store.dir / f"{meta['_id']}.npz"
        if not npz.exists():
            # index entry whose payload vanished (partial copy / crashed
            # insert): drop the dangling line rather than crash
            print(f"warning: {npz.name} missing, dropping index entry")
            bad_meta.append(meta)
            continue
        with np.load(npz, allow_pickle=False) as z:
            finite = all(np.isfinite(z[k]).all() for k in z.files)
        if finite:
            keep_lines.append(json.dumps(meta, default=str))
        else:
            bad_meta.append(meta)
    if not bad_meta:
        print(f"{collection}: all runs finite")
        return 0
    for meta in bad_meta:
        npz = store.dir / f"{meta['_id']}.npz"
        if npz.exists():
            npz.unlink()
        print(f"purged {meta['agent_name']} on {meta['env_name']} "
              f"(sensor={meta.get('sensor_noise')}, "
              f"act={meta.get('actuation_noise')})")
    # atomic index rewrite: a crash mid-write must not lose the collection
    tmp = store.index_path.with_suffix(".jsonl.tmp")
    tmp.write_text("\n".join(keep_lines) + "\n")
    os.replace(tmp, store.index_path)

    ckpt_path = store.dir / "sweep_checkpoint.json"
    if ckpt_path.exists():
        entries = json.loads(ckpt_path.read_text())
        env_map = {"PendulumEnvironment": "pendulum",
                   "CartpoleSwingupEnvironment": "cartpole_swingup",
                   "AcrobotEnvironment": "acrobot"}

        def matches(cfg: dict, m: dict) -> bool:
            """Exact config match — agent, env, agent_config, and the noise
            std values (meta stores them in *_noise_std; the checkpoint
            entry carries the raw floats). Over-broad matching here causes
            duplicate rows when finished configs get rerun."""
            if cfg.get("agent") != m["agent_name"]:
                return False
            if cfg.get("env") != env_map.get(m["env_name"]):
                return False
            if cfg.get("agent_config") != m.get("agent_config"):
                return False
            act = float(cfg.get("actuation_noise", 0) or 0)
            sens = float(cfg.get("sensor_noise", 0) or 0)
            return (act == float(m.get("actuation_noise_std", 0) or 0)
                    and sens == float(m.get("sensor_noise_std", 0) or 0))

        kept = [e for e in entries
                if not any(matches(json.loads(e), m) for m in bad_meta)]
        ckpt_tmp = ckpt_path.with_suffix(".json.tmp")
        ckpt_tmp.write_text(json.dumps(kept))
        os.replace(ckpt_tmp, ckpt_path)
        print(f"checkpoint: {len(entries) - len(kept)} entries un-marked")
    return len(bad_meta)


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "results"
    cols = sys.argv[2:] or ["noise_test", "cem_ratios", "mppi_samples",
                            "temperature_exp", "ilqr_runs2"]
    total = sum(purge(root, c) for c in cols)
    print(f"total purged: {total}")
