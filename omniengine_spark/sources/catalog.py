"""Parquet table catalog over a warehouse directory.

The reference reads everything through per-row psycopg2 cursors
(reference ``sqltools.py:48-64``); here a "table" is a parquet dataset
and reads are columnar, pushdown-enabled scans.  ``load_table`` is the
single choke point so partition layout / format changes stay local.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PKG_ROOT = Path(__file__).resolve().parents[1]
_SHIPPED: set[str] = set()


def _ensure_package_shipped(spark: SparkSession) -> None:
    """Ship omniengine_spark to executor Python workers.

    The harness driver loads ``__spark_entry__.py`` by path from an
    arbitrary cwd, so executor-side pickles that reference this
    package (applyInPandas folds, mapInPandas kernels) would fail to
    import it.  addPyFile with a package zip makes every worker
    self-sufficient — same mechanism a real cluster deployment uses.
    """
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED:
        return
    # key the zip by a digest of the source set (path, mtime, size) —
    # a pid-keyed name survives pid recycling and would ship a STALE
    # copy of edited code to executors while the driver runs the new
    # version, silently diverging results
    h = hashlib.md5()
    sources = sorted(_PKG_ROOT.rglob("*.py"))
    for py in sources:
        st = py.stat()
        h.update(
            f"{py.relative_to(_PKG_ROOT)}:{st.st_mtime_ns}:{st.st_size};"
            .encode()
        )
    zpath = os.path.join(
        tempfile.gettempdir(), f"omniengine_spark-{h.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for py in sources:
                zf.write(py, f"omniengine_spark/{py.relative_to(_PKG_ROOT)}")
        os.replace(tmp, zpath)  # atomic vs concurrent builders
    sc.addPyFile(zpath)
    _SHIPPED.add(app_id)

# Harness-provided TPC-H-ish star schema + events/documents/embeddings
# (TESTDATA.md).  Dimension tables marked small are broadcast-preferred
# in joins; ``ts_cols`` are event-time columns stored by the generator
# as nanosecond parquet timestamps.
TABLES: dict[str, dict] = {
    "region": {"small": True},
    "nation": {"small": True},
    "customer": {"small": False},
    "supplier": {"small": True},
    "part": {"small": False},
    "orders": {"small": False, "ts_cols": ["o_orderdate"]},
    "lineitem": {"small": False, "ts_cols": ["l_shipdate"]},
    "events": {"small": False, "ts_cols": ["ts"]},
    "documents": {"small": False},
    "embeddings": {"small": False},
}


# Construction memo: UNRESOLVED-plan reuse, NOT result caching.  One
# ``spark.read.parquet`` costs ~140 ms of driver time (a single JVM
# round trip doing file listing + footer schema inference), and a full
# bench sweep re-derives the same handful of immutable tables many
# hundred times — pure plan-construction overhead, the same line the
# pipeline's ``_DELTA_ARRAY_CACHE`` already walks.  The memoized value
# is an UNEXECUTED DataFrame: no rows are held, every action on it
# recomputes from the parquet input (the bench's clearCache semantics
# are untouched).  Keys carry the session id AND a file-identity
# signature (mtime_ns + size, shallow listing for directories), so a
# new session or a rewritten file rebuilds instead of serving a stale
# plan.
_TABLE_MEMO: dict[tuple, DataFrame] = {}
_RAW_SCHEMA_MEMO: dict[tuple, T.StructType] = {}


def _path_sig(path: str) -> tuple | None:
    """File-identity signature of a parquet file or dataset directory;
    None (→ memo bypass) when the path can't be statted or a directory
    is too wide to fingerprint cheaply."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    if not os.path.isdir(path):
        return (st.st_mtime_ns, st.st_size)
    try:
        entries = sorted(os.scandir(path), key=lambda e: e.name)
        if len(entries) > 256:
            return None
        return (st.st_mtime_ns,) + tuple(
            (e.name, e.stat().st_mtime_ns, e.stat().st_size)
            for e in entries
        )
    except OSError:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table from the warehouse dir as a DataFrame.

    The harness parquet stores timestamps as TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; we read them as raw nano longs
    (``nanosAsLong``) and truncate to microsecond TimestampType — the
    same truncation DuckDB applies, so oracles agree.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Driver sessions are not built by our factory; pin the timezone
    # here so epoch/interval plans agree with the (UTC) DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _ensure_package_shipped(spark)
    path = f"{sf_dir}/{name}.parquet"
    sig = _path_sig(path)
    key = (spark.sparkContext.applicationId, path, sig)
    if sig is not None and key in _TABLE_MEMO:
        return _TABLE_MEMO[key]
    df = spark.read.parquet(path)
    for c in TABLES.get(name, {}).get("ts_cols", []):
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
    if sig is not None:
        _TABLE_MEMO[key] = df
    return df


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table as a Structured Streaming source.

    File-stream over the same parquet the batch path reads (the
    reference's per-block poll loop, ``omniEngine.py:109-232``,
    becomes a real incremental source).  Schema comes from a batch
    probe of the same file; the nano→micro timestamp fix matches
    ``load_table`` so stream and batch plans agree.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    # schema probe memo: same construction-only reuse (and the same
    # file-identity key) as the ``load_table`` memo above
    sig = _path_sig(path)
    skey = (spark.sparkContext.applicationId, path, sig)
    if sig is not None and skey in _RAW_SCHEMA_MEMO:
        raw_schema = _RAW_SCHEMA_MEMO[skey]
    else:
        raw_schema = spark.read.parquet(path).schema
        if sig is not None:
            _RAW_SCHEMA_MEMO[skey] = raw_schema
    reader = spark.readStream.schema(raw_schema)
    # SPARK_GRAFT_STREAM_MAX_FILES caps files per micro-batch — the
    # throughput-bench knob (tools/stream_bench.py): availableNow
    # honors source rate limits, so a chunked table drains as a
    # SEQUENCE of micro-batches instead of one, making sustained
    # rows/s and per-batch latency measurable.  Unset (the default)
    # is the production shape: drain as fast as the source allows.
    max_files = os.environ.get("SPARK_GRAFT_STREAM_MAX_FILES")
    if max_files:
        reader = reader.option("maxFilesPerTrigger", int(max_files))
    if os.path.isdir(path):
        # a directory table (chunked stream source, or a laid-out
        # warehouse rewrite): stream its files directly — the glob
        # filter below would reject the part-file names
        df = reader.parquet(path)
    else:
        df = reader.option(
            "pathGlobFilter", f"{name}.parquet"
        ).parquet(sf_dir)
    for c in TABLES.get(name, {}).get("ts_cols", []):
        dt = df.schema[c].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
        elif isinstance(dt, T.TimestampNTZType):
            # Watermarks/event-time require TIMESTAMP (with local tz);
            # sessions not built by our factory read parquet naive
            # timestamps as NTZ.  Session tz is pinned UTC above, so
            # this cast preserves the wall-clock == UTC epoch.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read several tables at once; defaults to the whole catalog."""
    names = names or list(TABLES)
    return {n: load_table(spark, sf_dir, n) for n in names}


def _effective_parquet_splits(df: DataFrame) -> int | None:
    """TRUE scan parallelism of a parquet-backed frame: the total
    row-group count across its input files (footer metadata only,
    driver-side, ~ms per file).  Spark's split count is byte-range
    arithmetic — a 2.5 GB file yields ~32 splits at 78 MB each — but
    a split only produces rows if a ROW GROUP STARTS inside it, so a
    file written as one giant row group feeds exactly one task no
    matter how many splits cover it.  Returns None when the input
    isn't introspectable (non-parquet, remote scheme, many files —
    ≥64 files have plenty of groups by construction)."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file-backed plans
        return None
    if not files or len(files) >= 64:
        return None
    import urllib.parse

    import pyarrow.parquet as pq

    total = 0
    for f in files:
        if not f.startswith("file:") or not f.endswith(".parquet"):
            return None
        # inputFiles() returns percent-encoded URIs (spaces, non-ASCII
        # → %xx); decode, or the footer read fails and the guard
        # silently deactivates for exactly the files it should fix
        path = urllib.parse.unquote(urllib.parse.urlparse(f).path)
        try:
            total += pq.ParquetFile(path).metadata.num_row_groups
        except Exception:  # noqa: BLE001 — unreadable footer
            return None
    return total


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's core count when the
    input has fewer EFFECTIVE splits than cores.

    The testdata tables are few-row-group parquet files, which
    serializes CPU-heavy per-row work (shingling, minhash, trigram
    explode) onto one or two cores no matter the master.  On a real
    warehouse the scan has thousands of row-group splits and this is
    a no-op by the guard.  The guard checks BOTH Spark's split count
    AND the files' actual row-group count: split count alone is
    fooled by big single-row-group files (a 2.5 GB / 2-row-group
    documents file shows ≥32 byte-range splits, but 30 of them
    contain no row-group start and read zero rows — measured as a
    12-minute two-task straggler on the 1.25M-doc minhash soak while
    30 cores idled).  Only safe where downstream is order-free
    (signatures, aggregations) — never before ordered folds or
    serial stamping.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        eff = _effective_parquet_splits(df)
        if eff is None or eff >= target:
            return df
    return df.repartition(target)
