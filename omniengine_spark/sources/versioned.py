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
- commits are crash-safe AND writer-safe: each commit first claims
  its version number with an exclusive ``os.mkdir(v=N)`` (atomic on
  POSIX — two racing writers get DIFFERENT numbers; nothing ever
  deletes a directory another writer may own), writes data into the
  claimed dir, then publishes under a lock file (``O_EXCL`` create)
  that serializes the manifest read-modify-write.  A crash after the
  claim but before the manifest swap leaves an orphan ``v=N`` dir
  readers never see (they resolve only manifest-listed versions);
  later commits skip past it and ``vacuum`` retires it;
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
import time
from contextlib import contextmanager
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


def _claim_version(path: str, start: int) -> tuple[int, Path]:
    """Atomically claim the next free version dir via exclusive mkdir.

    ``os.mkdir`` on an existing dir raises, so two racing writers are
    guaranteed DIFFERENT version numbers and neither ever touches (let
    alone deletes) a directory the other may be writing into.  Dirs
    already present — committed versions or crash orphans — are simply
    skipped past; orphans stay invisible (readers resolve only
    manifest-listed versions) until ``vacuum`` retires them."""
    version = start
    while True:
        final = Path(path) / f"v={version}"
        try:
            os.mkdir(final)
            return version, final
        except FileExistsError:
            version += 1


@contextmanager
def _manifest_lock(path: str, timeout_s: float = 30.0):
    """Serialize manifest read-modify-write across processes with an
    ``O_CREAT|O_EXCL`` lock file (atomic on POSIX, incl. NFSv3+).  A
    stale lock (holder crashed) is broken after ``timeout_s``.

    Staleness is gauged by the LOCK FILE's mtime, not by how long
    this waiter has been waiting: a waiter's own deadline expires
    even while locks are being legitimately acquired and released
    around it, after which it would unlink whatever lock exists every
    poll — including one another process just created — and two
    writers would run the read-modify-write concurrently.  Breaking a
    stale lock never grants ownership by itself: every acquisition,
    including the breaker's, goes through the O_EXCL create, so when
    several waiters race to break the same dead lock exactly one wins
    the subsequent create and the rest go back to polling a FRESH
    (young-mtime) lock they won't break."""
    lock = Path(path) / "_manifest.lock"
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            break
        except FileExistsError:
            try:
                age = time.time() - lock.stat().st_mtime
            except OSError:
                continue  # holder released between open and stat
            if age > timeout_s:
                lock.unlink(missing_ok=True)  # break; acquire above
            time.sleep(0.05)
    try:
        yield
    finally:
        lock.unlink(missing_ok=True)


def commit(
    df: DataFrame,
    path: str,
    description: str,
    partition_cols: list[str] | None = None,
) -> int:
    """Write ``df`` as the table's next immutable version; returns the
    new version number.  The manifest swap is the commit point.
    Concurrent-writer safe: the version dir is claimed exclusively
    before any data is written, and the manifest update runs under a
    lock — racing commits land as distinct consecutive versions."""
    Path(path).mkdir(parents=True, exist_ok=True)
    version, final = _claim_version(path, _load_manifest(path)["current"] + 1)
    # append into the (empty) claimed dir: overwrite would DELETE the
    # dir first, momentarily releasing the exclusive claim
    writer = df.write.mode("append")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(str(final))
    with _manifest_lock(path):
        manifest = _load_manifest(path)  # re-read: others may have landed
        manifest["current"] = max(manifest["current"], version)
        manifest["versions"].append(
            {"version": version, "description": description}
        )
        manifest["versions"].sort(key=lambda e: e["version"])
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


def vacuum(
    path: str, keep_last: int = 2, orphan_ttl_s: float = 3600.0
) -> list[int]:
    """Retire all but the newest ``keep_last`` versions (files AND
    manifest entries — history of retired versions keeps only the
    descriptions under ``retired``), plus any orphan ``v=N`` dirs
    below the current version (claimed by a commit that crashed
    before its manifest swap; readers never see them).  Returns
    retired version numbers.

    Orphan deletion is AGE-GATED on the dir's mtime: "below current
    and not in the manifest" alone does not prove abandonment — a
    slow in-flight commit's claimed dir drops below ``current`` the
    moment a faster concurrent writer publishes a higher version, and
    sweeping it would delete a directory another writer is actively
    writing into (and let it later publish a corrupt version).  A
    claimed dir younger than ``orphan_ttl_s`` is left alone; parquet
    task writes keep refreshing the dir's mtime, so only a commit
    dead for the full TTL qualifies."""
    with _manifest_lock(path):
        manifest = _load_manifest(path)
        live = manifest["versions"]
        if len(live) <= keep_last:
            retired, kept = [], live
        else:
            retired, kept = live[:-keep_last], live[-keep_last:]
        for e in retired:
            shutil.rmtree(
                Path(path) / f"v={e['version']}", ignore_errors=True
            )
        # orphans: claimed dirs never published.  Only below the
        # current version — a dir ABOVE it may be a live concurrent
        # commit that hasn't swapped its manifest yet.
        known = {e["version"] for e in manifest["versions"]}
        for d in Path(path).glob("v=*"):
            try:
                v = int(d.name.split("=", 1)[1])
            except ValueError:
                continue
            if v <= manifest["current"] and v not in known:
                try:
                    if time.time() - d.stat().st_mtime < orphan_ttl_s:
                        continue  # possibly a live in-flight commit
                except OSError:
                    continue
                shutil.rmtree(d, ignore_errors=True)
        manifest["versions"] = kept
        if retired:
            manifest.setdefault("retired", []).extend(retired)
        _store_manifest(path, manifest)
    return [e["version"] for e in retired]
