"""Versioned schema migrations of the parquet warehouse.

The reference evolves its Postgres schema with numbered patch files
applied transactionally (``upgrade.py:17-36``,
``patches/omniDB.v26.patch`` … ``v32.patch`` — add-column-with-
default, rename, backfill UPDATEs).  A parquet warehouse has no ALTER
TABLE, so a migration here is a declared DataFrame transform applied
as a whole-table rewrite behind a crash-safe rename swap, with the
current version recorded in a ``_schema_version.json`` sidecar.

Properties the reference's patch runner has, kept:
- ordered: migrations apply strictly by ascending version;
- idempotent: re-running ``migrate`` at the current version is a
  no-op, and a crash mid-rewrite leaves either the old or the new
  complete table on disk (never a partial) so a re-run converges;
- recorded: the sidecar keeps the applied history for audit.

At scale the rewrite is the honest cost model: adding a backfilled
column IS a full scan+write of the table (same as Postgres rewriting
the heap for a non-default backfill), parallelized across executors;
partitioned tables keep their layout via ``partition_cols``.
"""

from __future__ import annotations

import json
import shutil
from dataclasses import dataclass
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_VERSION_FILE = "_schema_version.json"


@dataclass(frozen=True)
class Migration:
    """One versioned schema change: ``apply`` maps the table at
    version-1 to the table at ``version``."""

    version: int
    description: str
    apply: Callable[[DataFrame], DataFrame]


def schema_version(path: str) -> int:
    """Current warehouse schema version (0 = never migrated)."""
    vf = Path(path) / _VERSION_FILE
    if not vf.exists():
        return 0
    return int(json.loads(vf.read_text())["version"])


def migration_history(path: str) -> list[dict]:
    vf = Path(path) / _VERSION_FILE
    if not vf.exists():
        return []
    return json.loads(vf.read_text())["history"]


def _write_version(path: str, version: int, history: list[dict]) -> None:
    (Path(path) / _VERSION_FILE).write_text(
        json.dumps({"version": version, "history": history})
    )


def migrate(
    spark: SparkSession,
    path: str,
    migrations: list[Migration],
    to_version: int | None = None,
    partition_cols: list[str] | None = None,
) -> int:
    """Apply every pending migration ≤ ``to_version`` in version
    order; returns the resulting version.  Each step is one rewrite:
    read → transform → write sibling → crash-safe swap (original
    moved aside before the new table moves in, so a complete table
    exists on disk at every instant).
    """
    current = schema_version(path)
    history = migration_history(path)
    pending = sorted(
        (
            m
            for m in migrations
            if m.version > current
            and (to_version is None or m.version <= to_version)
        ),
        key=lambda m: m.version,
    )
    for m in pending:
        if m.version != current + 1:
            raise ValueError(
                f"non-contiguous migration: at v{current}, "
                f"next patch is v{m.version}"
            )
        df = m.apply(spark.read.parquet(path))
        staged = path + f"__v{m.version}"
        writer = df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(staged)
        old = Path(path + "__old")
        shutil.rmtree(old, ignore_errors=True)
        Path(path).rename(old)
        try:
            Path(staged).rename(path)
        except OSError:
            old.rename(path)
            raise
        # carry the sidecar forward (the rewrite dir replaced it)
        current = m.version
        history = history + [
            {"version": m.version, "description": m.description}
        ]
        _write_version(path, current, history)
        shutil.rmtree(old, ignore_errors=True)
    if current == 0:
        # record the baseline so re-runs are version-aware even when
        # nothing was pending
        _write_version(path, 0, history)
    return current


def add_column(name: str, expr) -> Callable[[DataFrame], DataFrame]:
    """Patch body: ALTER TABLE ADD COLUMN with backfill (the
    ``v26.patch`` add-default pattern) as a projection."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn(name, expr)

    return _apply


def rename_column(old: str, new: str) -> Callable[[DataFrame], DataFrame]:
    """Patch body: RENAME COLUMN (``v26.patch``'s txsubmittime →
    txrecvtime)."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumnRenamed(old, new)

    return _apply
