"""File-format round-trip plans (S13/S16): the plan writes the data
out through the sink, reads it back through the source, and the
oracle aggregates the original parquet — equal results prove the
round trip is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omniengine_spark.plans.registry import query
from omniengine_spark.sources import load_table
from omniengine_spark.sources.sinks import csv_roundtrip, json_roundtrip


@query(
    "s13_csv_roundtrip",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           MAX(event_id) AS max_event_id
    FROM events
    GROUP BY event_type
    """,
)
def s13_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    lossless = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    back = csv_roundtrip(lossless, "events")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("total_cents"),
        F.max("event_id").alias("max_event_id"),
    )


@query(
    "s16_json_roundtrip",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id
    FROM documents
    GROUP BY lang
    """,
)
def s16_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    back = json_roundtrip(docs, "documents")
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )


@query(
    "s17_schema_migration",
    oracle="""
    SELECT priority_class,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
               AS priority_class,
             o_totalprice
      FROM orders
    )
    GROUP BY priority_class
    """,
)
def s17_schema_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned schema migration (reference ``upgrade.py:17-36``,
    ``patches/omniDB.v*.patch``): seed a v0 warehouse from orders,
    apply v1 (add backfilled ``prio_class``, the add-column-default
    patch shape) and v2 (rename to ``priority_class``, the
    txsubmittime→txrecvtime patch shape), then aggregate the migrated
    table.  The oracle recomputes the same result straight from the
    original orders — equality proves the two rewrites were lossless
    and the backfill expression matched."""
    from omniengine_spark.sources.migrate import (
        Migration,
        add_column,
        migrate,
        rename_column,
    )
    from omniengine_spark.sources.sinks import scratch_dir

    path = scratch_dir("migrate-wh")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    orders.write.mode("overwrite").parquet(path)
    migrations = [
        Migration(
            1,
            "add prio_class backfilled from o_orderpriority",
            add_column(
                "prio_class",
                F.substring("o_orderpriority", 1, 1).cast("long"),
            ),
        ),
        Migration(
            2,
            "rename prio_class -> priority_class",
            rename_column("prio_class", "priority_class"),
        ),
    ]
    migrate(spark, path, migrations)
    wh = spark.read.parquet(path)
    return wh.groupBy("priority_class").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("total_cents"),
    )


@query(
    "s18_zorder_pointscan",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE user_id = 42
    """,
)
def s18_zorder_pointscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout (operators/layout.py): rewrite events clustered
    along the Morton curve of (user_id, event_id), then serve a
    point-lookup on user_id from the clustered copy.

    The content is layout-invariant (the oracle reads the raw table),
    but the plan is the lakehouse replacement for the reference's
    nine btree indexes (``omni_db_schema.psql:101-117``): after the
    rewrite, the user_id filter prunes most FILES via parquet min/max
    stats — tests/test_layout.py proves the footer bounding boxes are
    tight on both dimensions, which no single-column sort achieves."""
    from omniengine_spark.operators.layout import write_zordered
    from omniengine_spark.sources.sinks import scratch_dir

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    path = scratch_dir("zorder")
    write_zordered(ev, path, "user_id", "event_id", n_files=16)
    return spark.read.parquet(path).filter(F.col("user_id") == 42)


@query(
    "s13b_corrupt_ingest",
    # Oracle recomputes the partition of good vs corrupt rows from
    # the source table: every 100th orderkey was written malformed.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey % 100 <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_good,
           CAST(SUM(CASE WHEN o_orderkey % 100 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_corrupt,
           CAST(SUM(CASE WHEN o_orderkey % 100 <> 0
                         THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS good_cents
    FROM orders
    """,
)
def s13b_corrupt_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input quarantine: ingest a CSV feed where some rows
    are garbage, in PERMISSIVE mode with a corrupt-record column —
    bad rows are COUNTED AND KEPT for quarantine instead of killing
    the job (FAILFAST) or vanishing (DROPMALFORMED).  The reference's
    row-at-a-time loop skips unparseable payloads with a logged
    ``continue`` (``omniEngine.py:142-151``); at 100 TB the bulk
    scanner needs the same tolerance without sacrificing the audit
    trail.  The fixture derives from orders: every 100th orderkey is
    written as a non-numeric line, the rest as (orderkey, cents)."""
    from omniengine_spark.sources.sinks import scratch_dir

    o = load_table(spark, sf_dir, "orders")
    lines = o.select(
        F.when(
            F.col("o_orderkey") % 100 == 0,
            F.concat(F.lit("corrupt#"), F.col("o_orderkey"), F.lit("#row")),
        )
        .otherwise(
            F.concat_ws(
                ",",
                F.col("o_orderkey"),
                F.round(F.col("o_totalprice") * 100).cast("long"),
            )
        )
        .alias("value")
    )
    path = scratch_dir("corrupt_feed")
    lines.write.mode("overwrite").text(path)
    back = (
        spark.read.schema(
            "o_orderkey LONG, cents LONG, _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    # Spark refuses queries that touch only the internal corrupt
    # column of an in-flight parse; cache materializes the parsed
    # rows first (documented CSV-source limitation).
    back = back.cache()
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_good"),
        F.count("_corrupt_record").alias("n_corrupt"),
        F.coalesce(F.sum("cents"), F.lit(0)).alias("good_cents"),
    )


@query(
    "s20_stats_skipping_scan",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
      AND CAST(ts AS DATE) <= DATE '2024-01-14'
    GROUP BY day
    """,
)
def s20_stats_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planning-time FILE skipping over the versioned warehouse (the
    Delta/Iceberg data-skipping layer): the commit range-partitions
    events by day into 16 files and scrapes per-file min/max footer
    stats into the version's ``_stats.json``; the week-window read
    then intersects the interval against the manifested ranges and
    hands Spark ONLY the surviving files — at 100 TB the listing and
    footer phase itself shrinks, which partition pruning (dir names)
    and row-group stats (post-open) cannot do.  Replaces the
    reference's btree range indexes (``omni_db_schema.psql:101-117``,
    e.g. the TxBlockNumber scans at ``sql.py:266-276``) at the file
    level.  Skipping is advisory — the exact filter still runs, so
    the result is stats-invariant; tests/test_warehouse.py asserts
    the file count actually dropped."""
    import datetime as dt

    from omniengine_spark.sources.sinks import scratch_dir
    from omniengine_spark.sources.versioned import commit, read_version

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.to_date("ts").alias("day"),
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    path = scratch_dir("warehouse-s20")
    commit(
        ev.repartitionByRange(16, "day"),
        path,
        "events book, day-ranged layout",
        stats_cols=["day"],
    )
    lo, hi = dt.date(2024, 1, 8), dt.date(2024, 1, 14)
    pruned = read_version(spark, path, prune={"day": (lo, hi)})
    return (
        pruned.filter(
            (F.col("day") >= F.lit(lo)) & (F.col("day") <= F.lit(hi))
        )
        .groupBy(
            F.date_format("day", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("total_cents"),
        )
    )


def _events_book(spark: SparkSession, sf_dir: str) -> str:
    """The events table as a stats-committed versioned book, built
    once per (process, dataset content) — the persisted artifact the
    pruned domain plans serve from, exactly as the IVF index plans
    persist theirs (``plans/similarity.py:_ivf_index_tables``).  Day-
    ranged layout (16 range partitions on ts) so file min/max windows
    are tight; ``stats_cols=["ts"]`` writes the skipping manifest."""
    from omniengine_spark.sources.sinks import (
        dataset_fingerprint,
        stable_scratch_dir,
    )
    from omniengine_spark.sources.versioned import (
        commit,
        version_history,
    )

    fp = dataset_fingerprint(sf_dir, "events.parquet")
    path = stable_scratch_dir(f"events-book-{fp}")
    tag = f"events day-ranged fp={fp}"
    hist = version_history(path)
    if not (hist and hist[-1]["description"] == tag):
        ev = load_table(spark, sf_dir, "events")
        commit(
            ev.repartitionByRange(16, "ts"),
            path,
            tag,
            stats_cols=["ts"],
        )
    return path


@query(
    "j9b_trailing_24h_pruned",
    # identical contract to j9_trailing_24h_purchase_volume — same
    # anchor, same window, same aggregates — but served from the
    # stats-committed versioned book through planning-time file
    # skipping instead of a full scan.
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS mx FROM events)
    SELECT
      event_type,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        AS vol_24h,
      COUNT(*) AS n_24h
    FROM events, anchor
    WHERE ts > anchor.mx - INTERVAL 1 DAY
    GROUP BY event_type
    """,
    artifact=True,
)
def j9b_trailing_24h_pruned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """J9/A6 through the data-skipping layer (the gated-domain wiring
    of ``s20``'s mechanism): the trailing-24 h volume (reference
    ``sql.py:888-890``) reads ONLY the files whose footer-stat ts
    range can intersect the window.  The anchor itself comes from
    planning-time metadata: ``stats_minmax`` folds the manifest's
    per-file ranges into the global max(ts) with no file opens and
    no Spark job — at 100 TB, scanning the table to learn which
    files not to scan would defeat the skipping.  The exact filter
    still runs (skipping is file-granular, advisory by contract), so
    the result is stats-invariant; the plan-shape test asserts the
    kept-file count actually dropped.  Replaces the reference's
    TxBlockNumber btree range scans (``omni_db_schema.psql:241-251``,
    ``sql.py:266,276,890``) at the file level."""
    import datetime as dt

    from omniengine_spark.sources.versioned import (
        read_version,
        stats_minmax,
    )

    path = _events_book(spark, sf_dir)
    rng = stats_minmax(path, "ts")
    if rng is None:  # cannot prove the range: anchor from data
        anchor = (
            read_version(spark, path)
            .agg(F.max("ts"))
            .collect()[0][0]
        )
        anchor = anchor.replace(tzinfo=dt.timezone.utc)
    else:
        anchor = rng[1]  # exact max(ts): footer stats are exact
    window_lo = anchor - dt.timedelta(days=1)
    pruned = read_version(spark, path, prune={"ts": (window_lo, None)})
    return (
        pruned.filter(
            F.col("ts")
            > F.lit(anchor.replace(tzinfo=None) - dt.timedelta(days=1))
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("vol_24h"),
            F.count(F.lit(1)).alias("n_24h"),
        )
    )


@query(
    "s21_jdbc_serving_sink",
    oracle="""
    SELECT event_type,
           CAST(user_id % 100 AS BIGINT) AS user_bucket,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS balance_cents,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type, user_bucket
    """,
)
def s21_jdbc_serving_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC serving sink + source (SURVEY §2.1 S14 "optional
    ``df.write.jdbc``"; reference ``sqltools.py:58-87`` serves query
    results through a DB-API connection): per-(type, user-bucket)
    balances are written to a relational serving store through
    ``df.write.jdbc`` and read back through ``spark.read.jdbc`` — the
    round trip the oracle checks against the raw parquet, so a lossy
    type mapping or dropped partition write would hash-fail.

    The store is Apache Derby EMBEDDED (ships in Spark's own jars for
    the metastore — zero external services), which closes what
    rounds 8-9 carried as the one infra-blocked gap: the JDBC code
    path itself is exercised for real; pointing it at Postgres is a
    URL swap, not a code change.  Scale notes: executors open their
    own JDBC connections per partition (the write here keeps 4
    partitions to exercise concurrent writers); an embedded
    single-JVM store only works in local mode — a cluster serving
    sink is the same two calls against a network DB, plus
    ``partitionColumn`` bounds on the read side for parallel scans.
    ``createTableColumnTypes`` pins VARCHAR over Derby's default CLOB
    mapping for the string key (CLOBs cannot be compared or grouped)."""
    from omniengine_spark.sources.sinks import scratch_dir

    base = scratch_dir("jdbc-serve")
    # derby.log (and any relative DB path) lands in the scratch dir,
    # not the process CWD; safe to set repeatedly
    spark._jvm.System.setProperty("derby.system.home", base)
    url = f"jdbc:derby:{base}/servedb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(
            "event_type",
            (F.col("user_id") % 100).alias("user_bucket"),
        )
        .agg(
            F.sum(
                F.round(F.col("value") * 100).cast("long")
            ).alias("balance_cents"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    (
        agg.repartition(4)
        .write.option(
            "createTableColumnTypes", "event_type VARCHAR(32)"
        )
        .jdbc(url, "user_balances", mode="overwrite", properties=props)
    )
    return spark.read.jdbc(url, "user_balances", properties=props)
