#!/usr/bin/env python
"""Scale soak: time plans at two scale factors in one warmed session
and report the per-plan scaling exponent  e = log(t_big/t_small) /
log(sf_big/sf_small)  — e ≈ 1 is linear in data volume, e < 1 means
fixed overhead still dominates at these sizes, e > 1 flags
super-linear work (the thing that kills a 100× scale-up).

Usage:
    python tools/scale_soak.py [--small DIR] [--big DIR] [--ratio R]
        [--out FILE] [--runs N] [plan ...]

Defaults to the driver sf0.01 -> sf0.1 pair and the plans that
dominate bench wall time.  For the decade that actually matters
(bench sf -> 10x bench sf), generate matched data first:

    python tools/gen_testdata.py 0.1 .localdata/sf0.1
    python tools/gen_testdata.py 1   .localdata/sf1
    python tools/scale_soak.py --small .localdata/sf0.1 \
        --big .localdata/sf1 --out tools/scale_soak_sf1.json

Using one generator family for both rungs keeps distributions
identical, so the exponent measures the engine, not the data.

``--fresh`` runs each plan's whole measurement (warm-up + both
rungs) in its OWN subprocess, i.e. its own JVM.  Round 7 found the
shared-session design inflates late-running big-rung measurements:
the 69M-row md5 stage measured 54s late in a churned session vs
20s in a fresh one (same data, same plan) — accumulated shuffle
state + old-gen pressure penalize whichever rung runs last, and the
big rung always runs last.  Exponents quoted for the 100 TB story
should come from --fresh runs; the shared-session mode remains for
quick relative checks.
"""

from __future__ import annotations

import argparse
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

# the 25 plans that dominate BENCH_r04 wall clock, plus the layout /
# text / docpipe shapes whose scaling differs from any of them
DEFAULT_PLANS = [
    "dedup_clusters",
    "graph_pagerank",
    "sim_lsh_ann_topk",
    "btc_wallet_clusters",
    "sim_ivfpq_ann_topk",
    "a15_address_stats",
    "graph_taint_reach",
    "sim_pq_ann_topk",
    "x2_reorg_recompute",
    "dedup_simhash",
    "x12_stream_timer_expiry",
    "x10_stream_stream_join",
    "dedup_minhash_lsh",
    "quality_column_profile",
    "d4_dex_accept_lifecycle",
    "stats_value_profile_approx",
    "dedup_semantic_prune",
    "d7c_freeze_pipeline",
    "dedup_ngram_jaccard",
    "quality_observed_metrics",
    "d2_pro_rata_allocation",
    "x7b_consensus_hash",
    "a15b_address_stats_preagg",
    "omni_genesis_fold",
    "text_lm_fluency",
    "s18_zorder_pointscan",
    "text_bpe_pair_stats",
    "docpipe_chunk_sliding",
]


def measure_one(name: str, small: str, big: str, runs: int) -> dict:
    """Warm-up + best-of-``runs`` at both rungs for one plan, in THIS
    process's session."""
    from pyspark.sql import functions as F

    from omniengine_spark.plans import QUERIES
    from omniengine_spark.session import get_spark

    spark = get_spark(app_name="scale-soak", shuffle_partitions=32)
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(sf_dir: str) -> float:
        spark.catalog.clearCache()  # no cross-run persist() reuse
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h")
        ).agg(F.expr("bit_xor(_h)"), F.count("_h")).collect()
        return time.perf_counter() - t0

    run(small)  # warm codegen/readers for this plan shape
    t_small = min(run(small) for _ in range(runs))
    t_big = min(run(big) for _ in range(runs))
    return {"t_small": t_small, "t_big": t_big}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default=SMALL)
    ap.add_argument("--big", default=BIG)
    ap.add_argument("--ratio", type=float, default=RATIO)
    ap.add_argument("--out", default=str(_REPO / "tools" / "scale_soak.json"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--fresh", action="store_true",
        help="one subprocess (fresh JVM) per plan measurement",
    )
    ap.add_argument(
        "--measure-one", default=None, help=argparse.SUPPRESS
    )
    ap.add_argument("plans", nargs="*")
    args = ap.parse_args()
    small, big, ratio = args.small, args.big, args.ratio

    if args.measure_one:
        # child mode: print one JSON line with the timings
        r = measure_one(args.measure_one, small, big, args.runs)
        print("SOAK_RESULT " + json.dumps(r), flush=True)
        return

    names = args.plans or DEFAULT_PLANS

    if args.fresh:
        import subprocess

        rows = []
        for name in names:
            cmd = [
                sys.executable, __file__,
                "--small", small, "--big", big,
                "--runs", str(args.runs),
                "--measure-one", name,
            ]
            proc = subprocess.run(
                cmd, capture_output=True, text=True
            )
            line = next(
                (
                    ln for ln in proc.stdout.splitlines()
                    if ln.startswith("SOAK_RESULT ")
                ),
                None,
            )
            if line is None:
                print(f"{name}: FAILED\n{proc.stderr[-2000:]}",
                      file=sys.stderr, flush=True)
                continue
            r = json.loads(line[len("SOAK_RESULT "):])
            exp = math.log(r["t_big"] / r["t_small"]) / math.log(ratio)
            rows.append({
                "plan": name,
                "t_small": round(r["t_small"], 2),
                "t_big": round(r["t_big"], 2),
                "exponent": round(exp, 2),
            })
            print(
                f"{name:32s} {r['t_small']:6.2f}s -> "
                f"{r['t_big']:6.2f}s   e={exp:+.2f}",
                flush=True,
            )
        out = Path(args.out)
        out.write_text(json.dumps(
            {"small": small, "big": big, "ratio": ratio,
             "fresh_jvm_per_plan": True, "rows": rows},
            indent=1,
        ))
        print(f"wrote {out}")
        return

    from pyspark.sql import functions as F

    from omniengine_spark.plans import QUERIES
    from omniengine_spark.session import get_spark
    spark = get_spark(app_name="scale-soak", shuffle_partitions=32)
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(name: str, sf_dir: str) -> float:
        # build INSIDE the timer: iterative plans (connected
        # components) execute jobs eagerly during construction
        spark.catalog.clearCache()  # no cross-run persist() reuse
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
        run(name, small)  # warm codegen/readers for this plan shape
        t_small = min(run(name, small) for _ in range(args.runs))
        t_big = min(run(name, big) for _ in range(args.runs))
        exp = math.log(t_big / t_small) / math.log(ratio)
        rows.append(
            {
                "plan": name,
                "t_small": round(t_small, 2),
                "t_big": round(t_big, 2),
                "exponent": round(exp, 2),
            }
        )
        print(
            f"{name:32s} {t_small:6.2f}s -> {t_big:6.2f}s   e={exp:+.2f}",
            flush=True,
        )
    out = Path(args.out)
    out.write_text(json.dumps(
        {"small": small, "big": big, "ratio": ratio, "rows": rows},
        indent=1,
    ))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
