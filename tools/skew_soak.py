#!/usr/bin/env python
"""Skewed-key soak: run the fold/join/window-heavy plans on a
Zipf-distributed events table and record the straggler ratio —
bottleneck-stage max task time over median task time.

Why: uniform synthetic keys hide the dominant failure mode of real
100 TB runs — one hot entity (a celebrity user, an exchange address)
that funnels 20% of a shuffle through a single reducer.  Wall clock
then tracks the ONE straggling task, not the cluster.  AQE splits
skewed JOIN partitions but not skewed groupBy/window partitions, so
fold and running-window plans need algorithmic mitigation (salting /
chunked prefix-sum), and this soak is the proof it works: ratio ~1
means every task finished together, ratio ~N_tasks means one task WAS
the job.

Data: tools/gen_testdata.py --zipf 1.2 (hot user ≈ 20% of all rows
at sf1).  Records per plan, for uniform AND zipf inputs: wall secs,
bottleneck-stage straggler ratio (max/median executorRunTime over
tasks of the stage with the largest max), and that stage's task
count, into tools/scale_soak_skew.json.

Usage:
    python tools/skew_soak.py [--uniform DIR] [--zipf DIR]
        [--out FILE] [plan ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

# the events-keyed plans where a hot user_id concentrates work
DEFAULT_PLANS = [
    "a10_user_balance_fold",
    "a10_salted_balance_fold",
    "w2_running_user_value",
    "w2b_running_value_chunked",
    "j9_trailing_24h_purchase_volume",
    "d7c_freeze_pipeline",
    "a15_address_stats",
    "w1_latest_event_per_user",
    "w6_user_watermark",
]


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--uniform", default=".localdata/sf1")
    ap.add_argument("--zipf", default=".localdata/sf1_zipf")
    ap.add_argument("--out", default=str(_REPO / "tools" / "scale_soak_skew.json"))
    ap.add_argument("plans", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from omniengine_spark.plans import QUERIES
    from omniengine_spark.session import get_spark

    spark = get_spark(
        app_name="skew-soak",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    sc = spark.sparkContext
    ui, app = sc.uiWebUrl, sc.applicationId
    base = f"{ui}/api/v1/applications/{app}"
    spark.range(1000).selectExpr("sum(id)").collect()

    def stages() -> dict:
        return {
            (s["stageId"], s["attemptId"]): s
            for s in _get(f"{base}/stages?status=complete")
        }

    def run(name: str, sf_dir: str) -> dict:
        seen = set(stages())
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h")
        ).agg(F.expr("bit_xor(_h)"), F.count("_h")).collect()
        wall = time.perf_counter() - t0
        new = {k: s for k, s in stages().items() if k not in seen}
        # Straggler ratio = max/median of per-task SHUFFLE-READ
        # RECORDS on the heaviest shuffle stage.  Records, not time:
        # at this scale reducer tasks are sub-second, so time ratios
        # measure scheduler noise (measured r≈40-100 on perfectly
        # UNIFORM keys); record counts are deterministic and directly
        # expose the key distribution a 1000-executor run would
        # straggle on.  Scan stages are excluded by construction
        # (no shuffle read).
        best = None
        for (sid, att), s in new.items():
            if s["numCompleteTasks"] < 4 or s["shuffleReadBytes"] <= 0:
                continue
            q = _get(
                f"{base}/stages/{sid}/{att}/taskSummary"
                f"?quantiles=0.0,0.5,1.0"
            )
            rec = q.get("shuffleReadMetrics", {}).get("readRecords")
            if not rec:
                continue
            mx, md = rec[2], max(rec[1], 1.0)
            if best is None or mx > best["max_records"]:
                best = {
                    "max_records": mx,
                    "ratio": round(mx / md, 2),
                    "n_tasks": s["numCompleteTasks"],
                    "max_ms": q["executorRunTime"][2],
                }
        return {
            "sec": round(wall, 2),
            "straggler": best["ratio"] if best else None,
            "bottleneck_max_records": best["max_records"] if best else None,
            "bottleneck_max_ms": best["max_ms"] if best else None,
            "bottleneck_tasks": best["n_tasks"] if best else None,
        }

    names = args.plans or DEFAULT_PLANS
    rows = []
    for name in names:
        if name not in QUERIES:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        run(name, args.uniform)  # warm
        u = run(name, args.uniform)
        z = run(name, args.zipf)
        rows.append({"plan": name, "uniform": u, "zipf": z})
        print(
            f"{name:32s} uni {u['sec']:6.2f}s r={u['straggler']}"
            f"   zipf {z['sec']:6.2f}s r={z['straggler']}",
            flush=True,
        )

    out = Path(args.out)
    out.write_text(json.dumps({
        "uniform": args.uniform, "zipf": args.zipf, "rows": rows,
    }, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
