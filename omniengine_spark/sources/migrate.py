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


def _recover(path: str) -> None:
    """Heal the one non-atomic instant of the swap: a crash between
    'original moved aside' and 'staged moved in' leaves no table at
    ``path``.  A staged dir already CONTAINS its sidecar (written
    before the swap), so it is a complete committed table — promote
    it; otherwise restore the set-aside original.  Idempotent."""
    p = Path(path)
    if p.exists():
        return
    staged = sorted(
        p.parent.glob(p.name + "__v*"),
        key=lambda d: int(d.name.rsplit("__v", 1)[1]),
    )
    complete = [d for d in staged if (d / _VERSION_FILE).exists()]
    old = Path(path + "__old")
    if complete:
        complete[-1].rename(p)
    elif old.exists():
        old.rename(p)


def migrate(
    spark: SparkSession,
    path: str,
    migrations: list[Migration],
    to_version: int | None = None,
    partition_cols: list[str] | None = None,
) -> int:
    """Apply every pending migration ≤ ``to_version`` in version
    order; returns the resulting version.  Each step is one rewrite:
    read → transform → write sibling → stamp the sidecar INTO the
    staged dir → crash-safe swap.  The sidecar travels inside the
    table dir it describes, so the rename that publishes the data
    also publishes the version — there is no window where a migrated
    table carries a stale version.
    """
    _recover(path)
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
        # commit point: the staged dir becomes self-describing BEFORE
        # any rename (underscore-prefixed files are invisible to the
        # parquet reader, like _SUCCESS)
        current = m.version
        history = history + [
            {"version": m.version, "description": m.description}
        ]
        _write_version(staged, current, history)
        old = Path(path + "__old")
        shutil.rmtree(old, ignore_errors=True)
        Path(path).rename(old)
        try:
            Path(staged).rename(path)
        except OSError:
            old.rename(path)
            raise
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
