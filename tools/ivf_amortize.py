#!/usr/bin/env python
"""Measure the persisted-IVF amortization claim:

    T_build + Q * T_query   vs   Q * T_oneshot

A serving deployment builds the index once and answers many query
batches from the persisted tables; the alternative re-runs the
one-shot plan (re-seed + re-assign all N vectors) per batch.  The
crossover Q* = T_build / (T_oneshot - T_query) is the number of
query batches after which the index pays for itself.

Two subprocesses (fresh JVM each, as in scale_soak --fresh): one
builds the index then times Q query batches against the persisted
tables (distinct query slices per batch so no result reuse); one
times the same Q batches through the one-shot path.

Usage:
    python tools/ivf_amortize.py [--data .localdata/rv25] [--q 10]
        [--out tools/ivf_amortize.json]
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

K_TOP, N_QUERIES, NPROBE = 5, 20, 4


def _spark():
    from omniengine_spark.session import get_spark

    spark = get_spark(app_name="ivf-amortize", shuffle_partitions=32)
    spark.range(1000).selectExpr("sum(id)").collect()
    return spark


def _emb(spark, data: str):
    from omniengine_spark.sources import fan_out, load_table

    return fan_out(load_table(spark, data, "embeddings"))


def _query_slice(emb, i: int):
    # batch i queries rows [i*N, (i+1)*N) of the id order
    return (
        emb.orderBy("vec_id")
        .limit((i + 1) * N_QUERIES)
        .orderBy("vec_id", ascending=False)
        .limit(N_QUERIES)
    )


def _k(n: int) -> int:
    return max(16, math.ceil(math.sqrt(n / 2.0)))


def phase_index(data: str, root: str, q: int) -> dict:
    from omniengine_spark.operators import ann_index as AI
    from omniengine_spark.sources.versioned import commit, read_version

    spark = _spark()
    emb = _emb(spark, data)
    n = emb.count()
    k = _k(n)

    t0 = time.perf_counter()
    cents = AI.seeded_centroids(emb, "vec_id", "embedding", k)
    commit(cents, f"{root}/centroids", "bench")
    commit(
        AI.assign_lists(emb, cents, "vec_id", "embedding"),
        f"{root}/lists",
        "bench",
        partition_cols=["cluster"],
    )
    t_build = time.perf_counter() - t0

    pcents = read_version(spark, f"{root}/centroids")
    t_queries = []
    for i in range(q):
        lists = read_version(spark, f"{root}/lists")
        t0 = time.perf_counter()
        AI.query_index(
            _query_slice(emb, i), pcents, lists,
            "vec_id", "embedding", k=K_TOP, nprobe=NPROBE,
        ).count()
        t_queries.append(time.perf_counter() - t0)
    return {"t_build": t_build, "t_queries": t_queries, "n": n, "k": k}


def phase_oneshot(data: str, q: int) -> dict:
    from omniengine_spark.operators import similarity as S

    spark = _spark()
    emb = _emb(spark, data)
    k = _k(emb.count())
    ts = []
    for i in range(q):
        t0 = time.perf_counter()
        S.ivf_ann_topk_portable(
            emb, _query_slice(emb, i), "vec_id", "embedding",
            k=K_TOP, n_clusters=k, nprobe=NPROBE,
        ).count()
        ts.append(time.perf_counter() - t0)
    return {"t_oneshots": ts}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=str(_REPO / ".localdata" / "rv25"))
    ap.add_argument("--q", type=int, default=10)
    ap.add_argument(
        "--out", default=str(_REPO / "tools" / "ivf_amortize.json")
    )
    ap.add_argument("--phase", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--root", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.phase:
        r = (
            phase_index(args.data, args.root, args.q)
            if args.phase == "index"
            else phase_oneshot(args.data, args.q)
        )
        print(f"PHASE_RESULT {json.dumps(r)}", flush=True)
        return

    root = tempfile.mkdtemp(prefix="ivfamort-")
    results = {}
    for phase in ("index", "oneshot"):
        proc = subprocess.run(
            [
                sys.executable, __file__, "--data", args.data,
                "--q", str(args.q), "--phase", phase, "--root", root,
            ],
            capture_output=True, text=True,
        )
        line = next(
            (
                ln for ln in proc.stdout.splitlines()
                if ln.startswith("PHASE_RESULT ")
            ),
            None,
        )
        if line is None:
            sys.exit(f"{phase} FAILED\n{proc.stderr[-3000:]}")
        results.update(json.loads(line[len("PHASE_RESULT "):]))
        print(f"{phase} done", flush=True)

    t_build = results["t_build"]
    # steady-state per-batch costs: drop the first batch on each side
    # (codegen/reader warm-up) when Q allows
    tq = results["t_queries"][1:] or results["t_queries"]
    to = results["t_oneshots"][1:] or results["t_oneshots"]
    t_query = sum(tq) / len(tq)
    t_oneshot = sum(to) / len(to)
    q = args.q
    out = {
        "data": args.data,
        "n_vectors": results["n"],
        "k": results["k"],
        "q_batches": q,
        "fresh_jvm_per_phase": True,
        "t_build": round(t_build, 2),
        "t_query_mean": round(t_query, 3),
        "t_oneshot_mean": round(t_oneshot, 3),
        "indexed_total": round(t_build + q * t_query, 2),
        "oneshot_total": round(q * t_oneshot, 2),
        "crossover_q": (
            round(t_build / (t_oneshot - t_query), 1)
            if t_oneshot > t_query
            else None
        ),
        "speedup_per_batch": round(t_oneshot / t_query, 1),
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
