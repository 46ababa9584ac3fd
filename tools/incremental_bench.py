#!/usr/bin/env python
"""Shard-ingest vs one-shot dedup at rv scale — the number the
incremental MinHash index exists to make small.

Three phases, each in its OWN subprocess (fresh JVM, same rationale
as scale_soak --fresh):

    build    corpus-day index build over doc_id % 10 != 7 (the one
             full-corpus scan the lifecycle ever performs)
    ingest   shard ingest of doc_id % 10 = 7 against the persisted
             index: band-join vs stored entries + candidate-pruned
             verify + delta commits
    oneshot  dedup_minhash_lsh over the FULL corpus — what a
             pipeline without the index pays on every run

Production runs `build` once and `ingest` per crawl shard, so the
claim to verify is  t_ingest ≪ t_oneshot  (the shard here is ~10% of
the corpus by construction; at a real 0.1% shard the gap widens —
ingest cost is shard-proportional plus candidate traffic).

Usage:
    python tools/incremental_bench.py [--data .localdata/rv25]
        [--out tools/incremental_bench.json]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
import time
from fractions import Fraction
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

MOD, REM = 10, 7
PARAMS = dict(n=3, num_hashes=128, band_rows=4)


def _spark():
    from omniengine_spark.session import get_spark

    spark = get_spark(app_name="inc-bench", shuffle_partitions=32)
    spark.range(1000).selectExpr("sum(id)").collect()
    return spark


def _docs(spark, data: str):
    from pyspark.sql import functions as F

    from omniengine_spark.sources import fan_out, load_table

    docs = fan_out(load_table(spark, data, "documents"))
    return (
        docs,
        docs.filter(F.col("doc_id") % MOD != REM),
        docs.filter(F.col("doc_id") % MOD == REM),
    )


def phase_build(data: str, root: str) -> float:
    from omniengine_spark.operators import minhash_index as MI

    spark = _spark()
    _, corpus, _ = _docs(spark, data)
    t0 = time.perf_counter()
    MI.build_index(
        spark, root, corpus, "doc_id", "text",
        threshold=Fraction(4, 5), tag="bench base", **PARAMS,
    )
    return time.perf_counter() - t0


def phase_ingest(data: str, root: str) -> float:
    from omniengine_spark.operators import minhash_index as MI

    spark = _spark()
    _, _, shard = _docs(spark, data)
    t0 = time.perf_counter()
    pairs = MI.ingest_shard(
        spark, root, shard, "doc_id", "text",
        threshold=Fraction(4, 5), tag="bench +shard", **PARAMS,
    )
    n = pairs.count()
    dt = time.perf_counter() - t0
    print(f"ingest pairs={n}", file=sys.stderr)
    return dt


def phase_oneshot(data: str) -> float:
    from omniengine_spark.operators import dedup as D

    spark = _spark()
    docs, _, _ = _docs(spark, data)
    t0 = time.perf_counter()
    n = D.minhash_lsh_pairs(
        docs, "doc_id", "text",
        threshold=Fraction(4, 5), **PARAMS,
    ).count()
    dt = time.perf_counter() - t0
    print(f"oneshot pairs={n}", file=sys.stderr)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=str(_REPO / ".localdata" / "rv25"))
    ap.add_argument(
        "--out", default=str(_REPO / "tools" / "incremental_bench.json")
    )
    ap.add_argument("--phase", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--root", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.phase:
        dt = {
            "build": lambda: phase_build(args.data, args.root),
            "ingest": lambda: phase_ingest(args.data, args.root),
            "oneshot": lambda: phase_oneshot(args.data),
        }[args.phase]()
        print(f"PHASE_RESULT {json.dumps({'t': dt})}", flush=True)
        return

    root = tempfile.mkdtemp(prefix="incbench-")
    times = {}
    for phase in ("build", "ingest", "oneshot"):
        cmd = [
            sys.executable, __file__,
            "--data", args.data, "--phase", phase, "--root", root,
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        line = next(
            (
                ln for ln in proc.stdout.splitlines()
                if ln.startswith("PHASE_RESULT ")
            ),
            None,
        )
        if line is None:
            sys.exit(f"{phase} FAILED\n{proc.stderr[-3000:]}")
        times[phase] = round(
            json.loads(line[len("PHASE_RESULT "):])["t"], 2
        )
        print(f"{phase:8s} {times[phase]:7.2f}s", flush=True)

    out = {
        "data": args.data,
        "fresh_jvm_per_phase": True,
        "params": {**PARAMS, "threshold": "4/5",
                   "shard": f"doc_id % {MOD} = {REM}"},
        "t_build": times["build"],
        "t_ingest": times["ingest"],
        "t_oneshot": times["oneshot"],
        "ingest_over_oneshot": round(
            times["ingest"] / times["oneshot"], 3
        ),
        "note": (
            "build runs once per corpus; ingest is the per-shard "
            "steady state. The shard is ~10% of the corpus here; "
            "production shards are smaller, widening the gap."
        ),
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
