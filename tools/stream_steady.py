#!/usr/bin/env python
"""Steady-state streamed index ingest: per-batch cost across many
batches with compaction mid-run — the evidence that the LSM loop's
per-batch cost does NOT creep with delta-chain length (it does grow
mildly with corpus size: the band join scans the stored entries
table, which is the operator's honest O(corpus-index) term), not
just that one ingest is cheaper than one rebuild
(tools/incremental_bench.py).

Layout: the base corpus (doc_id % 10 < 5, 50%) builds the index
once; five 10% shards then ingest sequentially through
``minhash_index.ingest_shard`` (each a delta commit, so later
batches dedup against corpus + earlier batches); ``compact_index`` +
``vacuum`` run after batch 3 — mid-run, so the artifact shows
per-batch cost both on a growing chain AND right after a squash.
Finally the compacted snapshot's pair set is checked engine-side
against a one-shot ``minhash_lsh_pairs`` over ALL docs — equality is
what makes the loop trustworthy (the plan-level DuckDB oracle is
all-pairs/quadratic: measured >58 min at sf1's 50k docs before
timeout, so sf1 oracle parity is excluded by documented policy and
THIS engine-vs-engine equality at 25× that scale is the check).

Every phase runs in its OWN subprocess (fresh JVM): a first cut ran
the loop in one JVM and per-batch noise from GC / accumulated
shuffle state swamped the chain-length signal (165 s vs 59 s at
equal chain length).  Fresh JVMs also match the production shape — a
daily ingest is its own job run.  Each phase records loadavg at
start; absolute seconds on this sandbox vary run-to-run (BENCH_r09's
lesson), the comparable signals are WITHIN-run: batch-over-batch
shape and the post-compaction drop.

Usage:
    python tools/stream_steady.py [--data .localdata/rv25]
        [--out tools/stream_steady.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from fractions import Fraction
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

MOD = 10
BASE_REMS = tuple(range(5))
BATCH_REMS = (5, 6, 7, 8, 9)
COMPACT_AFTER = 3  # batches ingested before the mid-run squash
PARAMS = dict(n=3, num_hashes=128, band_rows=4)
THRESH = Fraction(4, 5)


def _spark():
    from omniengine_spark.session import get_spark

    spark = get_spark(app_name="stream-steady", shuffle_partitions=32)
    spark.range(1000).selectExpr("sum(id)").collect()
    return spark


def _docs(spark, data: str):
    from omniengine_spark.sources import fan_out, load_table

    return fan_out(load_table(spark, data, "documents"))


def phase_build(data: str, root: str) -> float:
    from pyspark.sql import functions as F

    from omniengine_spark.operators import minhash_index as MI

    spark = _spark()
    docs = _docs(spark, data)
    base = docs.filter((F.col("doc_id") % MOD).isin(*BASE_REMS))
    t0 = time.perf_counter()
    MI.build_index(
        spark, root, base, "doc_id", "text",
        threshold=THRESH, tag="base", **PARAMS,
    )
    return time.perf_counter() - t0


def phase_batch(data: str, root: str, rem: int) -> float:
    from pyspark.sql import functions as F

    from omniengine_spark.operators import minhash_index as MI

    spark = _spark()
    docs = _docs(spark, data)
    shard = docs.filter(F.col("doc_id") % MOD == rem)
    t0 = time.perf_counter()
    MI.ingest_shard(
        spark, root, shard, "doc_id", "text",
        threshold=THRESH, tag=f"base +b{rem}", **PARAMS,
    )
    return time.perf_counter() - t0


def phase_compact(data: str, root: str) -> float:
    from omniengine_spark.operators import minhash_index as MI
    from omniengine_spark.sources import versioned as V

    spark = _spark()
    t0 = time.perf_counter()
    MI.compact_index(spark, root)
    for path in MI.index_paths(root):
        V.vacuum(path, keep_last=1)
    return time.perf_counter() - t0


def phase_equality(data: str, root: str) -> float:
    from omniengine_spark.operators import dedup as D
    from omniengine_spark.operators import minhash_index as MI
    from omniengine_spark.sources import versioned as V

    spark = _spark()
    docs = _docs(spark, data)

    def pair_set(df):
        return {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 12))
            for r in df.collect()
        }

    t0 = time.perf_counter()
    final = pair_set(V.read_version(spark, MI.index_paths(root)[1]))
    one_shot = pair_set(
        D.minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=THRESH, **PARAMS
        )
    )
    assert final == one_shot and final, (
        f"stream loop diverged: {len(final)} vs {len(one_shot)} pairs"
    )
    print(f"equality OK pairs={len(final)}", file=sys.stderr)
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=str(_REPO / ".localdata" / "rv25"))
    ap.add_argument(
        "--out", default=str(_REPO / "tools" / "stream_steady.json")
    )
    ap.add_argument("--phase", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--root", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--rem", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.phase:
        dt = {
            "build": lambda: phase_build(args.data, args.root),
            "batch": lambda: phase_batch(args.data, args.root, args.rem),
            "compact": lambda: phase_compact(args.data, args.root),
            "equality": lambda: phase_equality(args.data, args.root),
        }[args.phase]()
        print(f"PHASE_RESULT {json.dumps({'t': dt})}", flush=True)
        return

    root = tempfile.mkdtemp(prefix="stream-steady-")

    def run_phase(phase: str, rem: int | None = None) -> tuple[float, float]:
        load = os.getloadavg()[0]
        cmd = [
            sys.executable, __file__,
            "--data", args.data, "--phase", phase, "--root", root,
        ]
        if rem is not None:
            cmd += ["--rem", str(rem)]
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
        t = round(json.loads(line[len("PHASE_RESULT "):])["t"], 2)
        label = phase if rem is None else f"{phase} rem={rem}"
        print(f"{label:14s} {t:8.2f}s  (load {load:.1f})", flush=True)
        return t, round(load, 2)

    from omniengine_spark.operators import minhash_index as MI
    from omniengine_spark.sources import versioned as V

    t_build, load_build = run_phase("build")
    epath = MI.index_paths(root)[0]
    batches = []
    t_compact = None
    for i, rem in enumerate(BATCH_REMS, start=1):
        chain = len(V.version_history(epath))
        t, load = run_phase("batch", rem)
        batches.append(
            {
                "batch": i,
                "sec": t,
                "entries_chain_len": chain,
                "corpus_pct_indexed": 50 + (i - 1) * 10,
                "loadavg": load,
            }
        )
        if i == COMPACT_AFTER:
            t_compact, _ = run_phase("compact")
    t_eq, _ = run_phase("equality")

    secs = [b["sec"] for b in batches]
    out = {
        "data": args.data,
        "fresh_jvm_per_phase": True,
        "params": {**PARAMS, "threshold": "4/5",
                   "base": "doc_id%10<5", "batches": "10% each x5",
                   "compact_after_batch": COMPACT_AFTER},
        "t_build": t_build,
        "t_compact": t_compact,
        "t_equality_check": t_eq,
        "batches": batches,
        "batch_max_over_min": round(max(secs) / min(secs), 2),
        "oneshot_equality": "engine-side vs minhash_lsh_pairs, exact",
        "note": (
            "per-batch cost grows with the INDEXED CORPUS (the band "
            "join's stored-entries scan — the operator's honest "
            "O(index) term), not with delta-chain length: batch "
            f"{COMPACT_AFTER + 1} (chain reset to 1 by the mid-run "
            "compaction, biggest corpus so far) must not be slower "
            "than the pre-compaction batches. Absolute seconds are "
            "box-dependent (BENCH_r09); compare shapes within a run."
        ),
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
