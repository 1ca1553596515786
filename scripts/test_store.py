"""Result-store connectivity smoke test.

Analog of the reference's ``scripts/test_pymongo.py:1-13`` (a MongoDB
insert/find roundtrip): verifies the local ResultStore — which replaces
MongoDB (``ExperimentCore/DBTools.py:7-25``) — can insert a result dict
with ndarray payloads, find it back via a pymongo-style dotted query, and
decode the arrays bit-exactly.

Usage: python scripts/test_store.py [--results-dir DIR]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from benchmarking_mpc_solvers_tpu.experiment import ResultStore  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", default=None)
    args = ap.parse_args()

    root = args.results_dir or tempfile.mkdtemp(prefix="bmpc_store_smoke_")
    store = ResultStore(root, collection="smoke")

    costs = np.arange(12, dtype=np.float32).reshape(3, 4)
    doc_id = store.insert(
        {
            "name": "store-smoke",
            "agent_config": {"K": 7, "T": 5, "lam": 0.1},
            "env_costs": costs,
        }
    )
    print(f"inserted {doc_id} into {root}/smoke")

    hits = store.find({"agent_config.K": 7, "name": "store-smoke"})
    assert len(hits) >= 1, "dotted-path query found nothing"
    got = hits[-1]["env_costs"]
    assert np.array_equal(got, costs), "array roundtrip mismatch"
    assert store.count({"agent_config.K": 7}) >= 1

    print(f"found {len(hits)} doc(s); array roundtrip exact; count OK")
    print("store smoke test passed")


if __name__ == "__main__":
    main()
