#!/usr/bin/env python
"""Benchmark runner: every registered plan at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via a count-collect (df.count() after the
plan's own actions) so the full plan executes; results are not pulled
to the driver beyond the count.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # a "0.1" from ".../sf0.1"
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from omniengine_spark.plans import QUERIES
    from omniengine_spark.session import get_spark

    spark = get_spark(app_name="omniengine-bench")

    # Warm the JVM / codegen / parquet reader paths once so the first
    # measured query isn't charged for session startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    from omniengine_spark.sources import load_table

    load_table(spark, sf_dir, "region").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in sorted(QUERIES.items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt

    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
