#!/usr/bin/env python
"""Shard-ingest vs one-shot SemDeDup at rv scale — the embedding-side
twin of tools/incremental_bench.py (which measures the MinHash index).

Three phases, each in its OWN subprocess (fresh JVM):

    build    corpus-day: seed frozen centroids from vec_id % 10 != 7,
             assign the base, self-prune, persist all three tables —
             the one full pass the lifecycle ever performs
    ingest   shard ingest of vec_id % 10 = 7 against the persisted
             frozen quantizer: |shard|·k assignment dots, in-cluster
             pairs against touched lists only, two delta commits
    oneshot  the frozen-quantizer prune over the FULL corpus (seeds
             from the base subset, assignment + in-cluster pass over
             everything) — what a pipeline without the index pays

Run at two rungs (rv5 = 100k vectors, rv25 = 500k) to measure the
ingest phase's scaling exponent; the JSON row feeds
tools/scale_soak_rv.json.

Usage:
    python tools/seminc_bench.py [--small .localdata/rv5]
        [--big .localdata/rv25] [--out tools/seminc_bench.json]
"""

from __future__ import annotations

import argparse
import json
import math
import subprocess
import sys
import tempfile
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

MOD, REM = 10, 7
# fixed-ABSOLUTE-size shard at the big rung: rv25 has 5x rv5's
# vectors, so % 50 == 7 there is the same 10k vectors rv5's % 10 == 7
# shard holds — the production shape (a day's crawl doesn't grow 5x
# because the archive did), isolating the corpus-growth term alone
FIXED_MOD = 50
TAU = 0.4
K_FLOOR = 32


def _spark():
    from omniengine_spark.session import get_spark

    spark = get_spark(app_name="seminc-bench", shuffle_partitions=32)
    spark.range(1000).selectExpr("sum(id)").collect()
    return spark


def _emb(spark, data: str, mod: int = MOD):
    from pyspark.sql import functions as F

    from omniengine_spark.sources import fan_out, load_table

    emb = fan_out(load_table(spark, data, "embeddings"))
    return (
        emb,
        emb.filter(F.col("vec_id") % mod != REM),
        emb.filter(F.col("vec_id") % mod == REM),
    )


def phase_build(data: str, root: str, mod: int = MOD) -> float:
    from omniengine_spark.operators import ann_index as AI
    from omniengine_spark.sources.versioned import commit, read_version

    spark = _spark()
    _, base, _ = _emb(spark, data, mod)
    t0 = time.perf_counter()
    k = max(K_FLOOR, math.ceil(math.sqrt(base.count() / 2.0)))
    cpath, lpath, dpath = (
        f"{root}/centroids", f"{root}/lists", f"{root}/drops",
    )
    commit(
        AI.seeded_centroids(base, "vec_id", "embedding", k),
        cpath, "base",
    )
    commit(
        AI.assign_lists(
            base, read_version(spark, cpath), "vec_id", "embedding"
        ),
        lpath, "base",
    )
    commit(
        AI.in_cluster_drops(
            read_version(spark, lpath), read_version(spark, lpath), TAU
        ),
        dpath, "base",
    )
    return time.perf_counter() - t0


def phase_ingest(data: str, root: str, mod: int = MOD) -> float:
    from pyspark.sql import functions as F

    from omniengine_spark.operators import ann_index as AI
    from omniengine_spark.sources.versioned import (
        commit,
        current_version,
        read_version,
    )

    spark = _spark()
    _, _, shard = _emb(spark, data, mod)
    cpath, lpath, dpath = (
        f"{root}/centroids", f"{root}/lists", f"{root}/drops",
    )
    t0 = time.perf_counter()
    lv = commit(
        AI.assign_lists(
            shard, read_version(spark, cpath), "vec_id", "embedding"
        ),
        lpath, "base +shard", base_version=current_version(lpath),
    )
    shard_lists = spark.read.parquet(f"{lpath}/v={lv}")
    new_drops = AI.in_cluster_drops(
        F.broadcast(shard_lists), read_version(spark, lpath), TAU
    )
    stored = read_version(spark, dpath)
    commit(
        new_drops.join(stored, "vec_id", "left_anti"),
        dpath, "base +shard", base_version=current_version(dpath),
    )
    n = read_version(spark, dpath).count()
    dt = time.perf_counter() - t0
    print(f"ingest drops={n}", file=sys.stderr)
    return dt


def phase_oneshot(data: str) -> float:
    from omniengine_spark.operators import ann_index as AI

    spark = _spark()
    emb, base, _ = _emb(spark, data)
    t0 = time.perf_counter()
    k = max(K_FLOOR, math.ceil(math.sqrt(base.count() / 2.0)))
    cents = AI.seeded_centroids(base, "vec_id", "embedding", k)
    lists = AI.assign_lists(emb, cents, "vec_id", "embedding")
    n = AI.in_cluster_drops(lists, lists, TAU).count()
    dt = time.perf_counter() - t0
    print(f"oneshot drops={n}", file=sys.stderr)
    return dt


def run_rung(data: str, mod: int = MOD,
             phases=("build", "ingest", "oneshot")) -> dict:
    root = tempfile.mkdtemp(prefix="semincbench-")
    times = {}
    for phase in phases:
        cmd = [
            sys.executable, __file__,
            "--phase", phase, "--data", data, "--root", root,
            "--mod", str(mod),
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
            sys.exit(f"{phase} FAILED on {data}\n{proc.stderr[-3000:]}")
        times[phase] = round(
            json.loads(line[len("PHASE_RESULT "):])["t"], 2
        )
        print(f"{data} {phase:8s} {times[phase]:7.2f}s", flush=True)
    if "oneshot" in times:
        times["ingest_over_oneshot"] = round(
            times["ingest"] / times["oneshot"], 3
        )
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default=str(_REPO / ".localdata" / "rv5"))
    ap.add_argument("--big", default=str(_REPO / ".localdata" / "rv25"))
    ap.add_argument(
        "--out", default=str(_REPO / "tools" / "seminc_bench.json")
    )
    ap.add_argument("--phase", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--data", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--root", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--mod", type=int, default=MOD, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.phase:
        dt = {
            "build": lambda: phase_build(args.data, args.root, args.mod),
            "ingest": lambda: phase_ingest(args.data, args.root, args.mod),
            "oneshot": lambda: phase_oneshot(args.data),
        }[args.phase]()
        print(f"PHASE_RESULT {json.dumps({'t': dt})}", flush=True)
        return

    small = run_rung(args.small)
    big = run_rung(args.big)
    # the production rung: SAME absolute shard size (10k vectors) at
    # the big corpus — a day's crawl doesn't grow because the archive
    # did; only the corpus-growth term (avg cluster size ~ sqrt(2N))
    # remains.  No oneshot needed: the comparator is small["ingest"].
    big_fixed = run_rung(
        args.big, mod=FIXED_MOD, phases=("build", "ingest")
    )
    ratio = 5.0  # rv5 -> rv25 data ratio
    out = {
        "small": args.small,
        "big": args.big,
        "fresh_jvm_per_phase": True,
        "params": {"tau": TAU, "k": "max(32, ceil(sqrt(N/2)))",
                   "shard": f"vec_id % {MOD} = {REM}",
                   "fixed_shard": f"vec_id % {FIXED_MOD} = {REM}"},
        "rungs": {"small": small, "big": big,
                  "big_fixed_shard": big_fixed},
        "ingest_exponent_fixed_fraction": round(
            math.log(big["ingest"] / small["ingest"]) / math.log(ratio),
            2,
        ),
        "ingest_exponent_fixed_size": round(
            math.log(big_fixed["ingest"] / small["ingest"])
            / math.log(ratio),
            2,
        ),
        "note": (
            "build runs once per corpus; ingest is the per-shard "
            "steady state (assign-only vs frozen centroids + drops "
            "delta). oneshot = frozen-quantizer prune over the union, "
            "what a pipeline without the persisted tables pays per "
            "run. Two exponents: holding the shard FRACTION at 10% "
            "the shard itself grows 5x and ingest scales ~N^1.5 by "
            "design (|shard|*k dots + |shard|*sqrt(2N) pair dots, "
            "k=sqrt(N/2)); holding the shard SIZE fixed (the "
            "production shape) only the sqrt(2N) cluster-size term "
            "remains — expected e~0.5."
        ),
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
