#!/usr/bin/env python
"""Scale soak: time plans at two scale factors in one warmed session
and report the per-plan scaling exponent  e = log(t_big/t_small) /
log(sf_big/sf_small)  — e ≈ 1 is linear in data volume, e < 1 means
fixed overhead still dominates at these sizes, e > 1 flags
super-linear work (the thing that kills a 100× scale-up).

Usage: python tools/scale_soak.py [plan ...]
Defaults to the plans that dominate bench wall time.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

SMALL = "/root/testdata/sf0.01"
BIG = "/root/testdata/sf0.1"
RATIO = 10.0

DEFAULT_PLANS = [
    "dedup_clusters",
    "sim_lsh_ann_topk",
    "x10_stream_stream_join",
    "a15_address_stats",
    "a15b_address_stats_preagg",
    "sim_ivfpq_ann_topk",
    "dedup_ngram_jaccard",
    "x2_reorg_recompute",
    "d4_dex_accept_lifecycle",
    "sim_pq_ann_topk",
    "x12_stream_timer_expiry",
    "dedup_simhash",
    "dedup_semantic_prune",
    "btc_wallet_clusters",
    "s18_zorder_pointscan",
    "text_bpe_pair_stats",
    "docpipe_chunk_sliding",
]


def main() -> None:
    from pyspark.sql import functions as F

    from omniengine_spark.plans import QUERIES
    from omniengine_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT_PLANS
    spark = get_spark(app_name="scale-soak", shuffle_partitions=32)
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(name: str, sf_dir: str) -> float:
        # build INSIDE the timer: iterative plans (connected
        # components) execute jobs eagerly during construction
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h")
        ).agg(F.expr("bit_xor(_h)"), F.count("_h")).collect()
        return time.perf_counter() - t0

    rows = []
    for name in names:
        if name not in QUERIES:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        run(name, SMALL)  # warm codegen/readers for this plan shape
        t_small = min(run(name, SMALL) for _ in range(2))
        t_big = min(run(name, BIG) for _ in range(2))
        exp = math.log(t_big / t_small) / math.log(RATIO)
        rows.append(
            {
                "plan": name,
                "t_sf001": round(t_small, 2),
                "t_sf01": round(t_big, 2),
                "exponent": round(exp, 2),
            }
        )
        print(
            f"{name:32s} {t_small:6.2f}s -> {t_big:6.2f}s   e={exp:+.2f}"
        )
    out = _REPO / "tools" / "scale_soak.json"
    out.write_text(json.dumps(rows, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
