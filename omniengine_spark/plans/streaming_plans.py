"""Driver-facing wrappers for the streaming jobs + batch
sessionization.

The streaming jobs drain a finite file stream with availableNow and
land in a memory sink, so each one returns an ordinary DataFrame the
oracle gate can hash — streaming semantics, batch-checkable results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from omniengine_spark import streaming as S
from omniengine_spark.plans.registry import query
from omniengine_spark.sources import load_table


@query(
    "x1_stream_hourly_counts",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS hour_value
    FROM events
    GROUP BY 1, 2
    """,
)
def x1_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup computed BY A STREAM (watermark + window
    state), checked against the batch truth — the reference's
    per-block txstats loop (sql.py:238-312) gone incremental."""
    return S.hourly_event_counts(spark, sf_dir)


@query(
    "x6_stream_exactly_once_dedup",
    oracle="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events
    GROUP BY event_type
    """,
)
def x6_stream_exactly_once_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Every event delivered twice (self-union), streaming
    dropDuplicates collapses redeliveries — exactly-once per block
    (reference omniEngine.py:210 transactional boundary)."""
    return S.deduped_type_counts(spark, sf_dir)


@query(
    "x10_stream_stream_join",
    oracle="""
    WITH pairs AS (
      SELECT p.user_id AS p_user, p.event_id AS purchase_id
      FROM events p
      JOIN events c
        ON c.user_id = p.user_id
       AND c.event_type = 'click' AND p.event_type = 'purchase'
       AND c.ts <= p.ts
       AND c.ts >= p.ts - INTERVAL 60 MINUTE
    )
    SELECT p_user,
           COUNT(DISTINCT purchase_id) AS n_attributed,
           COUNT(*) AS n_pairs
    FROM pairs GROUP BY p_user
    """,
)
def x10_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (purchase ← prior clicks
    within 1 h, per user): both sides' state stores are bounded by the
    watermark + time-range condition — the only join shape that scales
    on two unbounded streams.  Checked against the batch self-join."""
    return S.click_purchase_attribution(spark, sf_dir, horizon_minutes=60)


@query(
    "x11_stream_append_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    HAVING CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR
           <= (SELECT MAX(ts) - INTERVAL 1 HOUR FROM events)
    """,
)
def x11_stream_append_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode watermarked hourly counts: exactly the windows
    whose end ≤ final watermark (max ts − 1 h) are emitted, once, and
    their state evicted — the bounded-state emission rule the oracle
    restates in SQL (windows inside the last watermark horizon are
    deliberately absent)."""
    return S.hourly_counts_append(spark, sf_dir)


@query(
    "x4_stream_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id,
             CASE WHEN ts - LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions
    FROM flagged GROUP BY user_id
    """,
)
def x4_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user session counting
    via applyInPandasWithState (state across micro-batches), checked
    against the batch gap-cut truth."""
    return S.sessionize_with_state(spark, sf_dir, gap_minutes=30)


# --------------------------------------------------------------------
# W5 — sessionization: ordered per-entity computation where each row's
# session is decided by the gap to its predecessor (the reference's
# ordered state replay, tools/parseDexFromScratch.py:6, as the classic
# gap-cut).  lag → flag → cumulative sum: two stacked windows on one
# shuffle, no sequential state.
# --------------------------------------------------------------------
@query(
    "w5_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS session_seq
    FROM flagged
    """,
)
def w5_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    flagged = ev.select(
        "event_id", "user_id", "ts", new_session.alias("new_session")
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("new_session").over(wc).alias("session_seq"),
    )


@query(
    "x9_stream_balance_fold",
    oracle="""
    WITH tx AS (
      SELECT user_id,
             CASE WHEN event_type = 'signup' THEN 50 ELSE 0 END AS t,
             'u' || CAST(user_id AS VARCHAR) AS sender,
             'u' || CAST(user_id + 1 AS VARCHAR) AS ref,
             user_id % 5 AS propertyid,
             CASE WHEN user_id % 2 = 0
                  THEN CAST(CAST(value AS DECIMAL(38,8)) * 100000000
                            AS BIGINT)
                  ELSE CAST(FLOOR(CAST(value AS DECIMAL(38,8)))
                            AS BIGINT) END AS base_units
      FROM events WHERE event_type IN ('signup', 'purchase')
    ), deltas AS (
      SELECT sender AS address, propertyid, base_units AS delta
      FROM tx WHERE t = 50
      UNION ALL
      SELECT sender AS address, propertyid, -base_units AS delta
      FROM tx WHERE t = 0
      UNION ALL
      SELECT ref AS address, propertyid, base_units AS delta
      FROM tx WHERE t = 0
    )
    SELECT address, propertyid,
           CAST(SUM(delta) AS BIGINT) AS balance,
           COUNT(*) AS n_deltas
    FROM deltas
    GROUP BY address, propertyid
    """,
)
def x9_stream_balance_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's CORE loop as a real stream: the same tx projection
    and expand_deltas dispatch that omni_balance_pipeline runs in
    batch, executed over a file stream and folded by a streaming
    groupBy (complete mode) — the reference's block-by-block
    updateBalance loop (omniEngine.py:109-232) with the state store
    holding exactly the AddressBalances working set.  Serial stamping
    is a batch concern (needs a global order); balances are
    serial-independent sums, so the stream stamps a constant.
    """
    from omniengine_spark.pipeline import expand_deltas
    from omniengine_spark.plans.pipeline_plans import _tx_projection
    from omniengine_spark.sources import stream_table

    ev = stream_table(spark, sf_dir, "events")
    txs = _tx_projection(ev).withColumn(
        "serial", F.lit(0).cast("long")
    )
    deltas = expand_deltas(txs)
    agg = deltas.groupBy("address", "propertyid").agg(
        F.sum("delta_base_units").cast("long").alias("balance"),
        F.count(F.lit(1)).alias("n_deltas"),
    )
    return S.run_available_now(agg, "complete")


@query(
    "x12_stream_timer_expiry",
    oracle="""
    WITH horizon AS (
      SELECT MAX(ts) - INTERVAL 1 HOUR AS wm
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT c.user_id,
           COUNT(*) AS n_expired,
           CAST(SUM(epoch_ms(c.ts)) AS BIGINT) AS sum_click_ms
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
          AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
      AND c.ts + INTERVAL 30 MINUTE <= (SELECT wm FROM horizon)
    GROUP BY c.user_id
    """,
)
def x12_stream_timer_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-height-style expiry timers as STREAMING STATE
    (EventTimeTimeout): clicks open offers, purchases clear them,
    the watermark passing a deadline fires the timeout and emits the
    expired offer — the reference's expireAccepts sweep
    (sql.py:537-588) without ever scanning an offers table.  The
    oracle restates the deadline rule plus the final-watermark
    emission cutoff."""
    return S.offer_expiry_with_timers(spark, sf_dir, horizon_minutes=30)


@query(
    "x13_stream_static_join",
    oracle="""
    WITH totals AS (
      SELECT user_id, COUNT(*) AS user_total_events
      FROM events GROUP BY user_id
    )
    SELECT t.user_total_events,
           COUNT(*) AS n_purchases,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN totals t ON t.user_id = e.user_id
    WHERE e.event_type = 'purchase'
    GROUP BY t.user_total_events
    """,
)
def x13_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join: the purchase stream enriches
    against a batch per-user dimension (re-read each micro-batch —
    the reference's rate/property lookups, sql.py:282-295).  No state
    store at all: the cheapest streaming join shape."""
    return S.stream_static_enrichment(spark, sf_dir)


@query(
    "x14_stream_exactly_once_sink",
    oracle="""
    SELECT CAST(event_id % 8 AS BIGINT) AS shard,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    GROUP BY 1
    """,
)
def x14_stream_exactly_once_sink(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """foreachBatch + dynamic partition overwrite: the production
    stream-to-warehouse path with exactly-once BY IDEMPOTENCE — the
    first batch is deliberately written twice (simulated redelivery)
    and must land byte-identically (X6, omniEngine.py:210's
    per-block transaction).  The oracle checks the read-back
    warehouse against the batch truth."""
    return S.exactly_once_warehouse_sink(spark, sf_dir)


@query(
    "x17_socket_stream",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM (SELECT event_id, event_type FROM events
          ORDER BY event_id LIMIT 1000)
    GROUP BY event_type
    """,
)
def x17_socket_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A LIVE localhost TCP socket plays the message bus (in-process
    server thread → Spark socket source → stateful aggregate): the
    integer-exact per-type counts/id-sums must equal the batch truth
    over the served rows, so lost or duplicated deliveries hash-fail.
    Closes SURVEY §2.1's 'live bus source' gap without external
    infra."""
    return S.socket_event_counts(spark, sf_dir)
