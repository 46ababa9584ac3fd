"""File sinks/sources beyond the parquet catalog (SURVEY §2.1
S13/S14/S16): CSV and JSON round trips, partitioned parquet writes.

The reference dumps CSV via csvtools.py:8-310 and JSON wallet backups
via backupWallets.py:7-25, row by row; here a sink is one distributed
write and a source is one schema'd scan.  Scratch output lives under
the repo-local ``.scratch/`` dir (gitignored, driver-safe).
"""

from __future__ import annotations

import shutil
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_SCRATCH = Path(__file__).resolve().parents[2] / ".scratch"
_PROCESS_START = time.time()


def scratch_dir(label: str) -> str:
    """Fresh unique scratch directory under the repo.

    Sink plans cannot remove their own output (the returned DataFrame
    reads it lazily, after the plan function returns), so each call
    also prunes siblings — bounds accumulation across repeated
    gate/bench runs.  Pruning is capped at this process's start time:
    a dir created after we started may still back a live DataFrame in
    this process (or a concurrent long run), so only dirs that are
    BOTH >2 h old AND older than this process are removed.
    """
    _SCRATCH.mkdir(exist_ok=True)
    cutoff = min(time.time() - 7200, _PROCESS_START)
    for old in _SCRATCH.iterdir():
        try:
            if old.stat().st_mtime < cutoff:
                shutil.rmtree(old, ignore_errors=True)
        except OSError:
            pass
    return str(_SCRATCH / f"{label}-{uuid.uuid4().hex[:12]}")


def cleanup(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)


def csv_roundtrip(df: DataFrame, label: str = "csv") -> DataFrame:
    """Write a DataFrame as headered CSV and read it back with the
    original schema (S13).  Caller should restrict to CSV-lossless
    column types (integers/strings); floats survive only to text
    precision."""
    path = scratch_dir(label)
    df.write.mode("overwrite").option("header", "true").csv(path)
    return df.sparkSession.read.schema(df.schema).option(
        "header", "true"
    ).csv(path)


def json_roundtrip(df: DataFrame, label: str = "json") -> DataFrame:
    """Write as JSON-lines and read back with the original schema
    (S16)."""
    path = scratch_dir(label)
    df.write.mode("overwrite").json(path)
    return df.sparkSession.read.schema(df.schema).json(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Partitioned parquet write — the warehouse layout (S14).  With
    ``partitionOverwriteMode=dynamic`` a rewrite of one block range
    only replaces the partitions present in the batch — the engine's
    reorg story (X2): recompute partitions ≥ fork point, never
    imperative undo (reference sql.py:85-218)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_warehouse(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 << 20,
) -> dict[str, int]:
    """Small-file compaction: rewrite the warehouse so each partition
    holds ~``target_file_bytes`` files instead of one file per
    micro-batch append.

    Streaming sinks (foreachBatch appends, X14) accrete a file per
    batch per partition; at 100 TB that is millions of tiny files and
    the scan's bottleneck becomes file-opening overhead, not bytes.
    Compaction = read → repartition by (partition, size-derived file
    count) → write to a sibling → rename swap.  Contents are
    byte-identical (same rows), only the file layout changes.  The
    swap keeps the original intact until the compacted copy is in
    place (rename aside, rename in, then delete), so a crash at any
    point leaves a complete copy on disk; run it between incremental
    batches — a reader holding a cached file listing across the swap
    window must re-list.

    Returns {"files_before": n, "files_after": m} for observability.
    """
    root = Path(path)
    before = sum(1 for p in root.rglob("*.parquet"))
    df = spark.read.parquet(path)
    total_bytes = sum(
        p.stat().st_size for p in root.rglob("*.parquet")
    )
    n_files = max(1, int(total_bytes // target_file_bytes) + 1)
    (
        df.repartition(n_files, *partition_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path + "__compact")
    )
    # crash-safe swap: move the original aside first so a complete
    # copy exists on disk at every instant, then delete the old one
    old_path = Path(path + "__old")
    shutil.rmtree(old_path, ignore_errors=True)
    Path(path).rename(old_path)
    try:
        Path(path + "__compact").rename(path)
    except OSError:
        old_path.rename(path)  # roll back — original restored
        raise
    shutil.rmtree(old_path, ignore_errors=True)
    after = sum(1 for p in Path(path).rglob("*.parquet"))
    return {"files_before": before, "files_after": after}
