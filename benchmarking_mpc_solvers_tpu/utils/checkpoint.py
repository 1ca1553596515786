"""Checkpoint / resume for long sweeps and episodes.

The reference has no in-flight checkpointing (SURVEY.md §5) — a crashed
sweep reruns from scratch; persistence is post-hoc MongoDB inserts. Here any
pytree (solver state, episode carry, sweep cursor) round-trips through a
single ``.npz`` + structure sidecar, so a killed sweep script resumes at the
last completed configuration.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Optional

import jax
import numpy as np


def save_pytree(path: str, tree: Any, meta: Optional[dict] = None) -> None:
    """Save an arbitrary pytree of arrays (+ JSON-able metadata)."""
    leaves, treedef = jax.tree.flatten(tree)
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        p.with_suffix(".npz"),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )
    p.with_suffix(".json").write_text(
        json.dumps({"treedef": str(treedef), "n_leaves": len(leaves),
                    "meta": meta or {}})
    )


def load_pytree(path: str, like: Any) -> Any:
    """Load into the structure of ``like`` (the treedef string is a
    fingerprint check only — reconstruction uses ``like``'s structure)."""
    p = pathlib.Path(path)
    info = json.loads(p.with_suffix(".json").read_text())
    leaves_like, treedef = jax.tree.flatten(like)
    if info["n_leaves"] != len(leaves_like):
        raise ValueError(
            f"checkpoint has {info['n_leaves']} leaves, expected {len(leaves_like)}"
        )
    with np.load(p.with_suffix(".npz")) as z:
        leaves = [z[f"leaf_{i}"] for i in range(info["n_leaves"])]
    return jax.tree.unflatten(treedef, leaves)


def load_meta(path: str) -> dict:
    return json.loads(pathlib.Path(path).with_suffix(".json").read_text())["meta"]


class SweepCheckpoint:
    """Resume marker for sweep scripts: records completed config keys."""

    def __init__(self, path: str):
        self.path = pathlib.Path(path)
        self.done: set = set()
        if self.path.exists():
            self.done = set(json.loads(self.path.read_text()))

    def is_done(self, key: str) -> bool:
        return key in self.done

    def mark(self, key: str) -> None:
        self.done.add(key)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(sorted(self.done)))
