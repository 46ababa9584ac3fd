#!/usr/bin/env python
"""ANN recall at scale: recall@k of every registered approximate
nearest-neighbor plan against the registered brute-force plan, per
scale factor.

Why: the ANN plans adapt their geometry to the data size (LSH active
plane count and IVF centroid count both derive from COUNT(*)), so a
recall floor pinned at the sf0.01 gate does NOT certify sf1/sf5
behavior — more planes means smaller buckets and a different
recall/scan-fraction trade at every rung.  This tool measures the
actual curve and records it; tests/test_similarity.py pins per-scale
floors from it (skip-if-absent for rungs whose data isn't generated).

Usage:
    python tools/ann_recall.py [sf_dir ...]     # default: the ladder
Writes tools/ann_recall.json keyed by sf dir.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

DEFAULT_DIRS = [
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    ".localdata/sf1",
    ".localdata/sf5",
]
ANN_PLANS = [
    "sim_lsh_ann_topk",
    "sim_ivf_ann_topk",
    "sim_pq_ann_topk",
    "sim_ivfpq_ann_topk",
]


def topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["nbr_id"])
    return out


def recall(approx: dict, exact: dict) -> float:
    hits = total = 0
    for qid, nbrs in exact.items():
        total += len(nbrs)
        hits += len(nbrs & approx.get(qid, set()))
    return hits / total


def main() -> None:
    from omniengine_spark.plans import QUERIES
    from omniengine_spark.session import get_spark

    dirs = sys.argv[1:] or DEFAULT_DIRS
    spark = get_spark(app_name="ann-recall", shuffle_partitions=32)
    spark.range(1000).selectExpr("sum(id)").collect()

    out_path = _REPO / "tools" / "ann_recall.json"
    blob = json.loads(out_path.read_text()) if out_path.exists() else {}
    for sf_dir in dirs:
        if not Path(sf_dir, "embeddings.parquet").exists():
            print(f"skip {sf_dir}: no embeddings", file=sys.stderr)
            continue
        exact = topk_sets(
            QUERIES["sim_bruteforce_cosine_topk"](spark, sf_dir)
        )
        row = {}
        for name in ANN_PLANS:
            t0 = time.perf_counter()
            r = recall(topk_sets(QUERIES[name](spark, sf_dir)), exact)
            row[name] = {
                "recall_at_5": round(r, 3),
                "sec": round(time.perf_counter() - t0, 2),
            }
            print(f"{sf_dir:24s} {name:22s} recall@5={r:.3f}", flush=True)
        blob[sf_dir] = row
    out_path.write_text(json.dumps(blob, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
