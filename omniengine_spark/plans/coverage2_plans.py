"""Driver-checked plans for the SURVEY §2 ids that round 1 left
"test-only": HTTP source normalizers (S9-S12), the partitioned
warehouse sink with dynamic partition overwrite (S14), the tx-class
classifier (F9/D8), the incremental processing cap (T3), and
reorg-as-recompute (X2).

Each plan exercises the real operator; the oracle states the expected
result closed-form over the same parquet, so equality through the
driver's hash gate proves the operator's semantics, not just its
plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omniengine_spark.plans.registry import query
from omniengine_spark.sources import load_table
from omniengine_spark.sources.http import (
    fees_frame,
    normalize_fee_estimates,
    normalize_fiat_rates,
    rates_frame,
)
from omniengine_spark.sources.sinks import (
    read_warehouse,
    scratch_dir,
    write_partitioned,
)

_CENTS = "CAST(ROUND(value*100) AS BIGINT)"


# ---------------------------------------------------------------------------
# S9/S10 — HTTP rate source normalization + broadcast rate join
# (reference updateBTC, updatePrices.py:113-138; rate join
# SQLstatements.md:15-43).  The "HTTP response" is a fixture derived
# from the nation dim on the driver — exactly where the reference's
# fetch runs — with one malformed entry (no `last`) that the
# normalizer must skip.  Rates stay OUT of the float aggregate: cents
# are summed as BIGINT per nation first, the rate scales the single
# aggregated value.
# ---------------------------------------------------------------------------
@query(
    "s9_http_rate_join",
    oracle="""
    WITH bal AS (
      SELECT c_nationkey AS nationkey,
             CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
             COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    )
    SELECT n.n_name AS currency,
           b.sum_cents,
           b.n_customers,
           CAST(ROUND(b.sum_cents * ((n.n_nationkey*17 + 3) / 8.0))
                AS BIGINT) AS fiat_cents
    FROM nation n JOIN bal b ON b.nationkey = n.n_nationkey
    WHERE n.n_nationkey <> 0
    """,
)
def s9_http_rate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    ).collect()  # 25-row dim: the driver-side "HTTP fetch"
    payload = {
        r["n_name"]: (
            {}  # malformed entry the normalizer must skip
            if r["n_nationkey"] == 0
            else {"last": (r["n_nationkey"] * 17 + 3) / 8.0}
        )
        for r in nations
    }
    rates = rates_frame(
        spark, normalize_fiat_rates(payload, "fixture", 1_700_000_000)
    ).join(
        spark.createDataFrame(
            [(r["n_nationkey"], r["n_name"]) for r in nations],
            "nationkey long, n_name string",
        ),
        F.col("quote") == F.col("n_name"),
    )
    bal = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )
    return bal.join(F.broadcast(rates), "nationkey").select(
        F.col("quote").alias("currency"),
        "sum_cents",
        "n_customers",
        F.round(F.col("sum_cents") * F.col("rate"))
        .cast("long")
        .alias("fiat_cents"),
    )


# ---------------------------------------------------------------------------
# S11/S12 — fee-estimate union + averaging (updateFees.py:27-93) and
# the supply source's single-value normalization (sql.py:1460-1467).
# Two provider payloads normalize to tier rows, union, and average
# per tier — the oracle re-states the normalized rows as VALUES, so
# equality pins the normalizer's output row-for-row.
# ---------------------------------------------------------------------------
@query(
    "s11_fee_estimates",
    oracle="""
    SELECT tier,
           CAST(CAST(AVG(fee_per_kb) AS DECIMAL(19,4)) AS BIGINT)
             AS avg_fee,
           COUNT(*) AS n_providers
    FROM (VALUES
      ('bitgo',   'fastestFee',  61), ('bitgo',   'halfHourFee', 31),
      ('bitgo',   'hourFee',     11), ('bitgo',   'feePerKb', 12000),
      ('mempool', 'fastestFee',  55), ('mempool', 'halfHourFee', 27),
      ('mempool', 'hourFee',      9)
    ) AS fees(provider, tier, fee_per_kb)
    GROUP BY tier
    """,
)
def s11_fee_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    bitgo = normalize_fee_estimates(
        {
            "fastestFee": 61,
            "halfHourFee": 31,
            "hourFee": 11,
            "feePerKb": 12000,
        },
        "bitgo",
    )
    mempool = normalize_fee_estimates(
        {"fastestFee": 55, "halfHourFee": 27, "hourFee": 9}, "mempool"
    )
    return (
        fees_frame(spark, bitgo)
        .unionByName(fees_frame(spark, mempool))
        .groupBy("tier")
        .agg(
            F.avg("fee_per_kb")
            .cast("decimal(19,4)")
            .cast("long")
            .alias("avg_fee"),
            F.count(F.lit(1)).alias("n_providers"),
        )
    )


# ---------------------------------------------------------------------------
# F9/D8 — tx-class classifier over vout script arrays
# (omniutils.py:31-62).  Every synthetic tx carries a pubkeyhash
# output; docs with even ids add a nulldata payload and user_id%3==0
# adds a bare-multisig output, so the when-chain's precedence
# (C before B before A) is what the oracle checks.
# ---------------------------------------------------------------------------
@query(
    "f9_txclass",
    oracle="""
    WITH c AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'C'
                  WHEN user_id % 3 = 0 THEN 'B'
                  ELSE 'A' END AS tx_class
      FROM events
    )
    SELECT tx_class, COUNT(*) AS n_txs
    FROM c GROUP BY tx_class
    """,
)
def f9_txclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from omniengine_spark.pipeline.omni import classify_tx

    ev = load_table(spark, sf_dir, "events")
    out = lambda st: F.struct(  # noqa: E731
        F.lit(0).cast("bigint").alias("n"),
        F.lit("x").alias("address"),
        F.lit(1).cast("bigint").alias("value_sat"),
        F.lit(st).alias("script_type"),
    )
    base = F.array(out("pubkeyhash"))
    with_ms = F.when(
        F.col("user_id") % 3 == 0, F.concat(base, F.array(out("multisig")))
    ).otherwise(base)
    vout = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(with_ms, F.array(out("nulldata"))),
    ).otherwise(with_ms)
    btc = ev.select(
        F.concat(F.lit("e"), F.col("event_id").cast("string")).alias(
            "txid"
        ),
        vout.alias("vout"),
    )
    return (
        classify_tx(btc)
        .groupBy("tx_class")
        .agg(F.count(F.lit(1)).alias("n_txs"))
    )


# ---------------------------------------------------------------------------
# T3 — incremental processing cap (sql.py:242-247: resume from a
# high-watermark, process at most 25 000 blocks per run).  Pending
# work = orders past the watermark date, deterministically ordered;
# the capped batch aggregates to its resume bookkeeping row.
# ---------------------------------------------------------------------------
_T3_WATERMARK = "1995-06-01"
_T3_CAP = 1000


@query(
    "t3_processing_cap",
    oracle=f"""
    WITH batch AS (
      SELECT o_orderkey, o_orderdate
      FROM orders
      WHERE o_orderdate > DATE '{_T3_WATERMARK}'
      ORDER BY o_orderdate, o_orderkey
      LIMIT {_T3_CAP}
    )
    SELECT COUNT(*) AS n_processed,
           MIN(o_orderkey) AS first_key,
           MAX(o_orderkey) AS last_key,
           CAST(floor(epoch(MAX(o_orderdate))) AS BIGINT)
             AS new_watermark_epoch
    FROM batch
    """,
)
def t3_processing_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    batch = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") > F.lit(_T3_WATERMARK).cast("date"))
        .orderBy("o_orderdate", "o_orderkey")
        .limit(_T3_CAP)
    )
    return batch.agg(
        F.count(F.lit(1)).alias("n_processed"),
        F.min("o_orderkey").alias("first_key"),
        F.max("o_orderkey").alias("last_key"),
        F.unix_timestamp(F.max("o_orderdate")).alias(
            "new_watermark_epoch"
        ),
    )


# ---------------------------------------------------------------------------
# S14 — warehouse sink with dynamic partition overwrite.  Write all
# events partitioned by event_type, then rewrite ONLY the 'purchase'
# partition with doubled cents; reading the warehouse back must show
# doubling in exactly that partition — proving the dynamic overwrite
# replaced one partition and left the rest untouched.
# ---------------------------------------------------------------------------
@query(
    "s14_warehouse_overwrite",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN 2 * {_CENTS} ELSE {_CENTS} END)
                AS BIGINT) AS total_cents
    FROM events
    GROUP BY event_type
    """,
)
def s14_warehouse_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_type",
    )
    path = scratch_dir("warehouse-s14")
    write_partitioned(ev, path, ["event_type"])
    patched = ev.filter(F.col("event_type") == "purchase").withColumn(
        "cents", F.col("cents") * 2
    )
    write_partitioned(patched, path, ["event_type"])
    return (
        read_warehouse(spark, path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# X2 — reorg as recompute (reference undoes state imperatively,
# sql.py:85-218; the engine overwrites partitions ≥ fork and
# replays, SURVEY §7.0).  Block ranges ≥ the fork are first written
# from a corrupted "orphaned chain" (cents off by one), then the
# reorg recomputes those ranges from the true stream via dynamic
# partition overwrite.  The oracle is the truth over the full
# stream: equality proves convergence — corrupt partitions were
# replaced, pre-fork partitions were never touched.
# ---------------------------------------------------------------------------
_X2_FORK = 2  # block ranges >= this get orphaned then replayed


@query(
    "x2_reorg_recompute",
    oracle=f"""
    SELECT event_id // 1000 AS block_range,
           COUNT(*) AS n_events,
           CAST(SUM({_CENTS}) AS BIGINT) AS total_cents
    FROM events
    GROUP BY event_id // 1000
    """,
)
def x2_reorg_recompute(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_id") / F.lit(1000))
        .cast("long")
        .alias("block_range"),
    )
    fork = F.lit(_X2_FORK)
    orphaned = ev.withColumn(
        "cents",
        F.when(
            F.col("block_range") >= fork, F.col("cents") + 1
        ).otherwise(F.col("cents")),
    )
    path = scratch_dir("warehouse-x2")
    write_partitioned(orphaned, path, ["block_range"])
    # reorg: recompute every range >= fork from the true stream
    write_partitioned(
        ev.filter(F.col("block_range") >= fork), path, ["block_range"]
    )
    return (
        read_warehouse(spark, path)
        # partition-column values are re-inferred as int on read
        .withColumn("block_range", F.col("block_range").cast("long"))
        .groupBy("block_range")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# X1b — incremental high-watermark batch, driver-checked (reference
# resume loop, omniEngine.py:60-69 + A1 coalesce(max(...)) resume
# points): batch 1 lands days ≤ split into the warehouse; batch 2
# reads the warehouse's own max(day) watermark — exactly the
# reference's `max(blocknumber)+1` — and appends only newer days.
# The result proves incremental == one-shot over the same stream.
# At scale each batch touches only its new day partitions; the
# watermark read is a partition-pruned max over the partition column.
# ---------------------------------------------------------------------------
@query(
    "x1b_incremental_batch",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    GROUP BY 1
    """,
)
def x1b_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    split = ev.agg(
        F.date_add(F.min("day"), 10).alias("s")
    ).collect()[0]["s"]

    path = scratch_dir("warehouse-x1b")
    write_partitioned(ev.filter(F.col("day") <= F.lit(split)), path, ["day"])

    # resume point read back from the warehouse itself (A1)
    watermark = (
        read_warehouse(spark, path)
        .agg(F.max(F.col("day").cast("date")).alias("w"))
        .collect()[0]["w"]
    )
    write_partitioned(
        ev.filter(F.col("day") > F.lit(watermark)), path, ["day"]
    )

    return (
        read_warehouse(spark, path)
        .withColumn(
            "day", F.col("day").cast("date").cast("timestamp_ntz")
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# A19 — hierarchical continuous aggregate (hypertable-style rollup):
# hourly partials are MATERIALIZED once, then day and month grains
# derive from the next-finer materialization (sum-of-sums), never
# rescanning raw events — at 100 TB the raw scan happens once per
# ingest and every coarser window is a rollup over ~1/3600th the
# rows.  The reference recomputes its 24 h windows from raw
# transactions every block (sql.py:266, 276); the oracle here states
# all three grains directly against raw events, proving the derived
# chain is lossless.
# ---------------------------------------------------------------------------
@query(
    "a19_hierarchical_rollup",
    oracle="""
    WITH raw AS (
      SELECT ts, CAST(ROUND(value*100) AS BIGINT) AS cents FROM events
    )
    SELECT 'hour' AS grain,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
           COUNT(*) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM raw GROUP BY 2
    UNION ALL
    SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP),
           COUNT(*), CAST(SUM(cents) AS BIGINT)
    FROM raw GROUP BY 2
    UNION ALL
    SELECT 'month', CAST(date_trunc('month', ts) AS TIMESTAMP),
           COUNT(*), CAST(SUM(cents) AS BIGINT)
    FROM raw GROUP BY 2
    """,
)
def a19_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts"))
        .cast("timestamp_ntz")
        .alias("hour"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    hourly = ev.groupBy("hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    path = scratch_dir("rollup-hourly")
    hourly.write.mode("overwrite").parquet(path)
    hourly_m = spark.read.parquet(path)  # the materialized partials

    daily = hourly_m.groupBy(
        F.date_trunc("day", F.col("hour"))
        .cast("timestamp_ntz")
        .alias("day")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_cents").cast("long").alias("total_cents"),
    )
    monthly = daily.groupBy(
        F.date_trunc("month", F.col("day"))
        .cast("timestamp_ntz")
        .alias("month")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_cents").cast("long").alias("total_cents"),
    )
    return (
        hourly_m.select(
            F.lit("hour").alias("grain"),
            F.col("hour").alias("bucket_start"),
            "n_events",
            "total_cents",
        )
        .unionByName(
            daily.select(
                F.lit("day").alias("grain"),
                F.col("day").alias("bucket_start"),
                "n_events",
                "total_cents",
            )
        )
        .unionByName(
            monthly.select(
                F.lit("month").alias("grain"),
                F.col("month").alias("bucket_start"),
                "n_events",
                "total_cents",
            )
        )
    )


# ---------------------------------------------------------------------------
# X15 — incremental view maintenance: the per-user rollup is updated
# by MERGING aggregate state (old rollup rows are themselves valid
# partials for sum/count/max) with the new batch's partials — raw
# history is never rescanned.  This is the scalable form of the
# reference's read-modify-write AddressBalances upsert
# (sql.py:1320-1418): at 100 TB the merge touches |keys| rollup rows
# + the new partition only, one shuffle on the key.  The oracle
# states the rollup directly against all raw events, proving the
# merge chain is lossless.
# ---------------------------------------------------------------------------
@query(
    "x15_ivm_rollup_merge",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(MAX(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
             AS max_cents
    FROM events
    GROUP BY user_id
    """,
)
def x15_ivm_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    split = ev.agg(
        F.date_add(F.min("day"), 10).alias("s")
    ).collect()[0]["s"]

    def partials(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.max("cents").alias("max_cents"),
        )

    path = scratch_dir("warehouse-x15")
    # v1: rollup over the historical prefix, materialized
    write_partitioned(
        partials(ev.filter(F.col("day") <= F.lit(split))), path, []
    )

    # v2: merge stored state with the new batch's partials — the
    # stored rollup rows re-enter the same aggregation as partials
    merged = (
        read_warehouse(spark, path)
        .select("user_id", "n_events", "total_cents", "max_cents")
        .unionByName(partials(ev.filter(F.col("day") > F.lit(split))))
        .groupBy("user_id")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("total_cents").cast("long").alias("total_cents"),
            F.max("max_cents").cast("long").alias("max_cents"),
        )
    )
    write_partitioned(merged, path, [])
    return read_warehouse(spark, path).select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        "total_cents",
        "max_cents",
    )


# ---------------------------------------------------------------------------
# X16 — CDC snapshot diff: classify every key as insert / update /
# delete / unchanged between two versions of a state table — the
# changelog the reference never materializes (its upsert CTEs mutate
# in place and lose the before-image; a trigger keeps history for
# ONE table, omni_db_triggers.psql:15-26).  Emitting the diff as
# data is what feeds downstream incremental consumers (serving-cache
# invalidation = the reference's Redis flush, cacher.py:12-36).
# Shape: both snapshots shuffle once on the key; the full outer join
# shares that partitioning; change classification is pure codegen.
# v1 = balances over the first 10 days; v2 = all days, minus users
# ending below a threshold (so genuine deletes exist).
# ---------------------------------------------------------------------------
@query(
    "x16_cdc_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT user_id,
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events
      WHERE CAST(ts AS DATE)
            <= (SELECT MIN(CAST(ts AS DATE)) + 10 FROM events)
      GROUP BY user_id
    ), v2_all AS (
      SELECT user_id,
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY user_id
    ), v2 AS (
      SELECT * FROM v2_all WHERE cents >= 500000
    )
    SELECT COALESCE(v1.user_id, v2.user_id) AS user_id,
           CASE WHEN v1.user_id IS NULL THEN 'insert'
                WHEN v2.user_id IS NULL THEN 'delete'
                WHEN v1.cents <> v2.cents THEN 'update'
                ELSE 'unchanged' END AS change_type,
           v1.cents AS old_cents,
           v2.cents AS new_cents
    FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id
    WHERE v1.user_id IS NULL OR v2.user_id IS NULL
       OR v1.cents <> v2.cents
    """,
)
def x16_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    split = ev.agg(
        F.date_add(F.min("day"), 10).alias("s")
    ).collect()[0]["s"]
    v1 = (
        ev.filter(F.col("day") <= F.lit(split))
        .groupBy("user_id")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    v2 = (
        ev.groupBy("user_id")
        .agg(F.sum("cents").cast("long").alias("cents"))
        .filter(F.col("cents") >= 500_000)
    )
    a, b = v1.alias("a"), v2.alias("b")
    joined = a.join(b, F.col("a.user_id") == F.col("b.user_id"), "full_outer")
    change = (
        F.when(F.col("a.user_id").isNull(), F.lit("insert"))
        .when(F.col("b.user_id").isNull(), F.lit("delete"))
        .when(F.col("a.cents") != F.col("b.cents"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        change.alias("change_type"),
        F.col("a.cents").alias("old_cents"),
        F.col("b.cents").alias("new_cents"),
    ).filter(F.col("change_type") != "unchanged")


@query(
    "s9b_feed_connector",
    # Oracle replays the connector's deterministic fixture payloads
    # as literal rows — cross-provider consolidation must agree.
    oracle="""
    WITH feed(source, base, quote, rate, asof_epoch) AS (
      VALUES ('alpha','BTC','EUR',47000.0,1700000000),
             ('alpha','BTC','JPY',7400000.0,1700000000),
             ('alpha','BTC','USD',51000.0,1700000000),
             ('beta','BTC','EUR',46900.0,1700000000),
             ('beta','BTC','USD',50950.0,1700000000)
    )
    SELECT quote,
           COUNT(*) AS n_providers,
           MIN(rate) AS min_rate,
           MAX(rate) AS max_rate,
           MAX(rate) - MIN(rate) AS spread
    FROM feed GROUP BY quote
    """,
)
def s9b_feed_connector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate consolidation through the registered Python DataSource
    connector (``sources/feed_source.py``): one input partition per
    provider, fetched executor-side, consolidated into per-currency
    best/worst/spread — the reference's updatePrices cross-provider
    reconciliation (``updatePrices.py:113-236``) as a pluggable
    ``spark.read.format("omni_feed")`` scan.  ``load_table`` runs
    first so the package zip is shipped before executors unpickle
    the reader."""
    load_table(spark, sf_dir, "nation")  # ships the package zip
    from omniengine_spark.sources.feed_source import register

    register(spark)
    feed = spark.read.format("omni_feed").option("kind", "rates").load()
    return feed.groupBy("quote").agg(
        F.count(F.lit(1)).alias("n_providers"),
        F.min("rate").alias("min_rate"),
        F.max("rate").alias("max_rate"),
        (F.max("rate") - F.min("rate")).alias("spread"),
    )


# ---------------------------------------------------------------------------
# S19 — time-travel reads over the versioned warehouse: "what did the
# book say at block H" as a first-class scan.  Version 1 is the
# balance book at a block cutoff, version 2 advances the tip, version
# 3 is a schema migration (add a derived tier column) — all three
# immutable, manifest-audited commits (sources/versioned.py).  The
# plan diffs v1 against the migrated head across two snapshot reads;
# the oracle restates both snapshots from the raw stream.  The
# reference can only answer this by replaying its reorg undo
# (sql.py:85-218) — here history is retained, not re-derived.
# ---------------------------------------------------------------------------
@query(
    "s19_time_travel_diff",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(ROUND(value*100) AS BIGINT) AS cents
      FROM events
    ), v1 AS (
      SELECT user_id, CAST(SUM(cents) AS BIGINT) AS cents
      FROM ev
      WHERE day <= (SELECT MIN(day) + 14 FROM ev)
      GROUP BY user_id
    ), v3 AS (
      SELECT user_id, CAST(SUM(cents) AS BIGINT) AS cents,
             CAST(SUM(cents) // 1000000 AS BIGINT) AS tier
      FROM ev GROUP BY user_id
    )
    SELECT COALESCE(v1.user_id, v3.user_id) AS user_id,
           CASE WHEN v1.user_id IS NULL THEN 'insert'
                WHEN v1.cents <> v3.cents THEN 'update'
                ELSE 'unchanged' END AS change_type,
           v1.cents AS old_cents,
           v3.cents AS new_cents,
           v3.tier AS new_tier
    FROM v1 FULL OUTER JOIN v3 ON v1.user_id = v3.user_id
    WHERE v1.user_id IS NULL OR v1.cents <> v3.cents
    """,
)
def s19_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from omniengine_spark.sources.versioned import commit, read_version

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    split = ev.agg(
        F.date_add(F.min("day"), 14).alias("s")
    ).collect()[0]["s"]
    book = lambda f: (  # noqa: E731
        f.groupBy("user_id").agg(
            F.sum("cents").cast("long").alias("cents")
        )
    )
    path = scratch_dir("warehouse-s19")
    commit(
        book(ev.filter(F.col("day") <= F.lit(split))),
        path,
        f"balance book at block cutoff {split}",
    )
    commit(book(ev), path, "advance tip to head")
    # schema patch as a commit: same audit trail as data rewrites
    migrated = read_version(spark, path).withColumn(
        "tier", (F.col("cents") / 1_000_000).cast("long")
    )
    commit(migrated, path, "schema v1: add tier column")

    old = read_version(spark, path, version=1).alias("a")
    new = read_version(spark, path).alias("b")  # head = v3
    joined = old.join(
        new, F.col("a.user_id") == F.col("b.user_id"), "full_outer"
    )
    change = (
        F.when(F.col("a.user_id").isNull(), F.lit("insert"))
        .when(F.col("a.cents") != F.col("b.cents"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias(
            "user_id"
        ),
        change.alias("change_type"),
        F.col("a.cents").alias("old_cents"),
        F.col("b.cents").alias("new_cents"),
        F.col("b.tier").alias("new_tier"),
    ).filter(F.col("change_type") != "unchanged")
