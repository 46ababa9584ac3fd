"""Versioned warehouse: snapshot-isolated, time-travelable parquet.

The reference keeps ONE mutable state and answers "what did the book
say at block H" only by re-deriving it (``sql.py:85-218`` reorg undo
walks state backwards row by row).  Here every commit is an immutable
version directory under the table root plus an atomically-replaced
manifest — the Delta/Iceberg snapshot pattern reduced to its parquet
essentials:

    table/
      _manifest.json      {"current": 3, "versions": [...]}
      v=1/ ... parquet ...
      v=2/ ...
      v=3/ ...

Properties:
- readers pin a snapshot: ``read_version(path)`` resolves the manifest
  once; a concurrent commit cannot change the files under an already-
  resolved version dir (immutability is by construction — commits
  only ever create NEW dirs);
- commits are crash-safe: data lands in a ``.staging`` dir, is
  renamed to its final ``v=N`` name, and only then does the manifest
  swap (write temp + ``os.replace``, atomic on POSIX).  A crash
  before the manifest swap leaves the table at the previous version
  with an orphan dir a later commit ignores/overwrites;
- migration history travels in the manifest: ``commit`` records a
  description per version, so schema patches (``sources.migrate``)
  and reorg rewrites are the same audit trail.

At 100 TB you retire old versions with ``vacuum`` (keep-last-K) —
storage cost is per-version deltas only when commits rewrite
partitions; this minimal form rewrites whole tables, which is the
honest cost of snapshotting without a file-level manifest format.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _load_manifest(path: str) -> dict:
    mf = Path(path) / _MANIFEST
    if not mf.exists():
        return {"current": 0, "versions": []}
    return json.loads(mf.read_text())


def _store_manifest(path: str, manifest: dict) -> None:
    mf = Path(path) / _MANIFEST
    tmp = mf.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(manifest))
    os.replace(tmp, mf)  # atomic publish


def current_version(path: str) -> int:
    return _load_manifest(path)["current"]


def version_history(path: str) -> list[dict]:
    return _load_manifest(path)["versions"]


def commit(
    df: DataFrame,
    path: str,
    description: str,
    partition_cols: list[str] | None = None,
) -> int:
    """Write ``df`` as the table's next immutable version; returns the
    new version number.  The manifest swap is the commit point."""
    Path(path).mkdir(parents=True, exist_ok=True)
    manifest = _load_manifest(path)
    version = manifest["current"] + 1
    final = Path(path) / f"v={version}"
    staging = Path(str(final) + ".staging")
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)  # orphan of a past crash
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(str(staging))
    staging.rename(final)
    manifest["current"] = version
    manifest["versions"].append(
        {"version": version, "description": description}
    )
    _store_manifest(path, manifest)
    return version


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: the manifest's current version, or any retained
    historical version — reorg forensics as a first-class scan."""
    manifest = _load_manifest(path)
    v = manifest["current"] if version is None else version
    known = {e["version"] for e in manifest["versions"]}
    if v not in known:
        raise ValueError(
            f"version {v} not in table history {sorted(known)}"
        )
    return spark.read.parquet(str(Path(path) / f"v={v}"))


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Retire all but the newest ``keep_last`` versions (files AND
    manifest entries — history of retired versions keeps only the
    descriptions under ``retired``).  Returns retired version nos."""
    manifest = _load_manifest(path)
    live = manifest["versions"]
    if len(live) <= keep_last:
        return []
    retired, kept = live[:-keep_last], live[-keep_last:]
    for e in retired:
        shutil.rmtree(
            Path(path) / f"v={e['version']}", ignore_errors=True
        )
    manifest["versions"] = kept
    manifest.setdefault("retired", []).extend(retired)
    _store_manifest(path, manifest)
    return [e["version"] for e in retired]
