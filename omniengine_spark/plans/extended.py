"""Extended plans: operator shapes beyond the reference's own surface
that a 100 TB analytics engine needs — multi-level rollups, large
group-having joins, fixed-width histograms, pure range joins, and an
oracle-checked MetaDEx (type 25) trade expansion.

The reference computes none of these directly (SURVEY §2.4 notes the
absence of grouping sets; §2.3 notes the absence of range joins) but
each generalizes a reference pattern, cited per plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omniengine_spark.operators.rangejoin import bucketed_range_join
from omniengine_spark.pipeline import expand_deltas, stamp_serials_distributed
from omniengine_spark.plans.registry import query
from omniengine_spark.functions.scalars import epoch_us
from omniengine_spark.sources import load_table

_D = "decimal(18,4)"


def _dec(c: str) -> F.Column:
    return F.col(c).cast(_D)


# --------------------------------------------------------------------
# A14 — ROLLUP grouping sets.  Generalizes the reference's fixed
# two-level reporting (per-property volume sql.py:270-274 next to
# chain-wide totals sql.py:266-276, computed as separate statements)
# into one pass: Spark evaluates all grouping sets in a single
# shuffle with partial aggregation, so the subtotal levels are free
# relative to running N separate GROUP BYs over 100 TB.
# --------------------------------------------------------------------
@query(
    "a14_rollup_pricing",
    oracle="""
    SELECT
      COALESCE(l_returnflag, 'ALL') AS return_flag,
      COALESCE(l_linestatus, 'ALL') AS line_status,
      CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
      CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        AS sum_qty,
      COUNT(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def a14_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return out.select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("return_flag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("line_status"),
        "g_flag",
        "g_status",
        "sum_qty",
        "n_items",
    )


# --------------------------------------------------------------------
# A15/J13 — TPC-H Q18 shape: aggregate, HAVING-filter the groups,
# join the survivors back to their parent rows.  The reference's
# closest pattern is the duplicate-name count threshold
# (sql.py:1602-1624).  Scale shape: the groupBy shuffles lineitem
# once on l_orderkey; the HAVING cuts the join input to a sliver, and
# AQE converts the orders join to broadcast at runtime.
# --------------------------------------------------------------------
@query(
    "sql_q18_large_orders",
    oracle="""
    SELECT
      c_name,
      o_orderkey,
      o_totalprice,
      o_orderdate,
      CAST(CAST(q.sum_qty_dec AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty_dec
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
    ) q
    JOIN orders   ON o_orderkey = q.l_orderkey
    JOIN customer ON c_custkey  = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def sql_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_totalprice",
            "o_orderdate",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------
# A16 — fixed-width histogram (the profiling primitive behind the
# reference's TxStats per-block rollup, sql.py:238-312, generalized
# to value distributions).  One shuffle of |buckets| rows; the bucket
# expression folds into whole-stage codegen.
# --------------------------------------------------------------------
@query(
    "stats_value_histogram",
    oracle="""
    SELECT
      LEAST(CAST(FLOOR(value / 25) AS INTEGER), 19) AS bucket,
      CAST(LEAST(CAST(FLOOR(value / 25) AS INTEGER), 19) * 25.0 AS DOUBLE)
        AS bucket_lo,
      COUNT(*) AS n,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stats_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.floor(F.col("value") / 25), F.lit(19).cast("long")
    )
    return (
        ev.groupBy(
            bucket.alias("bucket"),
            (bucket * 25.0).cast("double").alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


# --------------------------------------------------------------------
# J12 — pure range join (no equi key): every event inside any
# "incident window" (2 h after a high-value error).  Absent from the
# reference (SURVEY §2.3); naive Spark would pick a nested-loop join.
# operators/rangejoin.py turns it into an ordinary shuffled equi join
# on time buckets + residual filter — the plan that survives when
# BOTH sides are too big to broadcast.
# --------------------------------------------------------------------
@query(
    "j12_range_join",
    oracle="""
    SELECT
      w.event_id AS window_id,
      COUNT(*) AS n_events,
      CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        AS sum_value
    FROM events e
    JOIN (
      SELECT event_id, epoch_us(ts) AS lo, epoch_us(ts) + 7200000000 AS hi
      FROM events WHERE event_type = 'error' AND value > 195
    ) w ON epoch_us(e.ts) >= w.lo AND epoch_us(e.ts) < w.hi
    GROUP BY w.event_id
    """,
)
def j12_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    points = ev.select(
        epoch_us("ts").alias("p_us"), F.col("value")
    )
    windows = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 195))
        .select(
            F.col("event_id").alias("window_id"),
            epoch_us("ts").alias("lo"),
            (epoch_us("ts") + F.lit(7_200_000_000)).alias("hi"),
        )
    )
    joined = bucketed_range_join(
        points,
        windows,
        point_col="p_us",
        lo_col="lo",
        hi_col="hi",
        bucket_width=3_600_000_000,  # 1 h buckets for 2 h windows
    )
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("sum_value"),
    )


# --------------------------------------------------------------------
# D5 — MetaDEx trade expansion, oracle-checked.  Each type-25 tx
# carries its pre-computed match list (reference omni_gettrade, S7);
# expand_deltas emits 4 double-entry rows per match
# (sql.py:2032-2166 insertMatch semantics).  The tx stream is derived
# deterministically from events (purchase → one-match trade) and the
# oracle restates the expansion + net-position fold in SQL, proving
# the pipeline's type-25 branch value-for-value — the golden tests
# cover edge shapes, this covers volume.
# --------------------------------------------------------------------
@query(
    "d5_metadex_net_positions",
    oracle="""
    WITH tx AS (
      SELECT
        'u' || CAST(user_id AS VARCHAR) AS seller,
        'm' || CAST(user_id % 97 AS VARCHAR) AS buyer,
        user_id % 5 AS pid,
        user_id % 3 + 5 AS pid_d,
        CASE WHEN user_id % 2 = 0
             THEN CAST(CAST(value AS DECIMAL(38,8)) * 100000000 AS BIGINT)
             ELSE CAST(FLOOR(CAST(value AS DECIMAL(38,8))) AS BIGINT)
             END AS sold_units,
        CASE WHEN user_id % 3 = 0
             THEN CAST(CAST(value AS DECIMAL(38,8)) * 100000000 AS BIGINT)
             ELSE CAST(FLOOR(CAST(value AS DECIMAL(38,8))) AS BIGINT)
             END AS recv_units
      FROM events WHERE event_type = 'purchase'
    ), deltas AS (
      SELECT seller AS address, pid AS propertyid, -sold_units AS delta FROM tx
      UNION ALL
      SELECT seller, pid_d, recv_units FROM tx
      UNION ALL
      SELECT buyer, pid, sold_units FROM tx
      UNION ALL
      SELECT buyer, pid_d, -recv_units FROM tx
    )
    SELECT address, propertyid,
           CAST(SUM(delta) AS BIGINT) AS net_units,
           COUNT(*) AS n_deltas
    FROM deltas
    GROUP BY address, propertyid
    """,
)
def d5_metadex_net_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    user = F.col("user_id")
    amount_str = F.col("value").cast("decimal(38,8)").cast("string")
    txs = ev.select(
        F.concat(F.lit("t"), F.col("event_id").cast("string")).alias("txid"),
        (F.unix_timestamp("ts") / 86400).cast("long").alias("block"),
        F.col("event_id").alias("position_in_block"),
        F.lit(25).cast("int").alias("type_int"),
        F.lit(True).alias("valid"),
        F.concat(F.lit("u"), user.cast("string")).alias("sending_address"),
        F.lit(None).cast("string").alias("reference_address"),
        (user % 5).alias("propertyid"),
        (user % 2 == 0).alias("divisible"),
        F.lit(None).cast("string").alias("amount"),
        F.lit(None)
        .cast("array<struct<address:string,amount:string>>")
        .alias("recipients"),
        F.lit(None)
        .cast(
            "array<struct<propertyid:bigint,divisible:boolean,"
            "amount:string>>"
        )
        .alias("subsends"),
        (user % 3 + 5).cast("long").alias("propertyid_desired"),
        (user % 3 == 0).alias("divisible_desired"),
        F.array(
            F.struct(
                F.concat(F.lit("m"), (user % 97).cast("string")).alias(
                    "address"
                ),
                amount_str.alias("amount_sold"),
                amount_str.alias("amount_received"),
            )
        ).alias("matches"),
    )
    deltas = expand_deltas(stamp_serials_distributed(txs))
    # net position = available + reserved: under the reference's
    # reserve semantics (sql.py:2032-2127) the sold amount leaves the
    # maker's reserve while the taker is credited available; their sum
    # is the economic position and matches the oracle's single-column
    # restatement exactly.
    return deltas.groupBy("address", "propertyid").agg(
        F.sum(
            F.col("delta_base_units") + F.col("delta_reserved")
        ).cast("long").alias("net_units"),
        F.count(F.lit(1)).alias("n_deltas"),
    )


# --------------------------------------------------------------------
# J14 — interval×interval overlap join (self-join: which incident
# windows overlap each other).  Same bucket decomposition as J12 but
# with both sides replicated and canonical-bucket emission instead of
# a dedup shuffle — see operators/rangejoin.py:interval_overlap_join.
# --------------------------------------------------------------------
@query(
    "j14_interval_overlap",
    oracle="""
    WITH w AS (
      SELECT event_id, epoch_us(ts) AS lo, epoch_us(ts) + 14400000000 AS hi
      FROM events WHERE event_type = 'error' AND value > 190
    )
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo) AS overlap_us
    FROM w a JOIN w b
      ON a.lo < b.hi AND b.lo < a.hi AND a.event_id < b.event_id
    """,
)
def j14_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from omniengine_spark.operators.rangejoin import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    windows = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") > 190)
    ).select(
        F.col("event_id"),
        epoch_us("ts").alias("lo"),
        (epoch_us("ts") + F.lit(14_400_000_000)).alias("hi"),
    )
    a = windows.select(
        F.col("event_id").alias("a_id"),
        F.col("lo").alias("a_lo"),
        F.col("hi").alias("a_hi"),
    )
    b = windows.select(
        F.col("event_id").alias("b_id"),
        F.col("lo").alias("b_lo"),
        F.col("hi").alias("b_hi"),
    )
    joined = interval_overlap_join(
        a,
        b,
        left_lo="a_lo",
        left_hi="a_hi",
        right_lo="b_lo",
        right_hi="b_hi",
        bucket_width=3_600_000_000,
    ).filter(F.col("a_id") < F.col("b_id"))
    return joined.select(
        "a_id",
        "b_id",
        (
            F.least("a_hi", "b_hi") - F.greatest("a_lo", "b_lo")
        ).alias("overlap_us"),
    )


# --------------------------------------------------------------------
# X8/J7b — SCD2 history: the reference keeps ExchangeRatesHistory via
# a database trigger copying the superseded row on every upsert
# (omni_db_triggers.psql:15-26); PropertyHistory likewise.  Event-
# sourced equivalent: each update row becomes a version with
# [valid_from, valid_to) stamped by lead() per key — one partitioned
# window, no trigger, replayable from the event stream.
# --------------------------------------------------------------------
@query(
    "scd2_rate_history",
    oracle="""
    SELECT
      user_id,
      event_id AS version_id,
      value AS rate,
      ts AS valid_from,
      COALESCE(
        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
      LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        AS is_current
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def scd2_rate_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    # Open-ended versions get a far-future sentinel instead of NULL so
    # interval predicates (valid_from <= t < valid_to) need no
    # null-branch, and the frame stays hash-comparable.
    sentinel = F.lit("2200-01-01 00:00:00").cast("timestamp")
    return ev.select(
        "user_id",
        F.col("event_id").alias("version_id"),
        F.col("value").alias("rate"),
        F.col("ts").alias("valid_from"),
        F.coalesce(valid_to, sentinel).alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


# --------------------------------------------------------------------
# SQL subquery surface: correlated scalar subqueries.  The reference
# inlines every such lookup as a separate Python-side query per row
# (e.g. per-property rate fetch sql.py:295 inside the txstats loop);
# here Catalyst decorrelates both subqueries into aggregate+join.
# The predicate is the avg-comparison rewritten decimal-exact:
# bal > avg  ⟺  bal·n > sum, so no float avg crosses engines.
# --------------------------------------------------------------------
@query(
    "sql_correlated_above_avg",
    oracle="""
    SELECT c_custkey, c_acctbal, c_nationkey
    FROM customer c
    WHERE CAST(c_acctbal AS DECIMAL(18,4))
          * (SELECT COUNT(*) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
          > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(18,4)))
             FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def sql_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_customer"
    )
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal, c_nationkey
        FROM v_customer c
        WHERE CAST(c_acctbal AS DECIMAL(18,4))
              * (SELECT COUNT(*) FROM v_customer c2
                 WHERE c2.c_nationkey = c.c_nationkey)
              > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(18,4)))
                 FROM v_customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


# --------------------------------------------------------------------
# SQL subquery surface: EXISTS + NOT EXISTS in one predicate
# (churn shape: active in 1997, gone in 1998).  Catalyst plans the
# pair as one semi and one anti join on o_custkey — two shuffles of
# the pre-filtered orders slices, never a per-row probe like the
# reference's existence checks (sql.py:382-384).
# --------------------------------------------------------------------
@query(
    "sql_churned_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00')
    """,
)
def sql_churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM v_customer c
        WHERE EXISTS (
            SELECT 1 FROM v_orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
          AND NOT EXISTS (
            SELECT 1 FROM v_orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00')
        """
    )


# --------------------------------------------------------------------
# U5 — INTERSECT / EXCEPT (explicitly absent from the reference,
# SURVEY §2.7 U4 note — it fakes both with Python membership checks).
# Both compile to distinct + shuffled semi/anti joins; tagged union
# of the two results so one plan covers both operators.
# --------------------------------------------------------------------
@query(
    "u5_set_ops",
    oracle="""
    SELECT user_id, 'both' AS tag FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'error')
    UNION ALL
    SELECT user_id, 'purchase_only' AS tag FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'error')
    """,
)
def u5_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    errers = ev.filter(F.col("event_type") == "error").select("user_id")
    both = buyers.intersect(errers).withColumn("tag", F.lit("both"))
    only = buyers.subtract(errers).withColumn("tag", F.lit("purchase_only"))
    return both.unionByName(only)


# --------------------------------------------------------------------
# A17 — grouped exact quantiles (per-group stats_value_profile; both
# engines compute the same linear-interpolated order statistic).  At
# scale the exact form needs the full group sorted — the
# approx_percentile sibling (stats_value_profile_approx) is the
# mergeable-sketch path; this is the correctness gate for it.
# --------------------------------------------------------------------
@query(
    "stats_grouped_quantiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.95) AS p95,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def stats_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------
# A18 — PIVOT: long→wide reporting (the reference emits TxStats as
# jsonb per block, sql.py:308-309 — a hand-rolled wide row).  Spark's
# pivot with an explicit value list stays a single groupBy (no second
# pass to discover columns, which at 100 TB would be its own job).
# --------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "a18_pivot_daily_by_type",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           COUNT(*) FILTER (event_type = 'click')    AS n_click,
           COUNT(*) FILTER (event_type = 'error')    AS n_error,
           COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
           COUNT(*) FILTER (event_type = 'view')     AS n_view
    FROM events
    GROUP BY 1
    """,
)
def a18_pivot_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return wide.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    )


# --------------------------------------------------------------------
# U6 — UNPIVOT/melt: wide→long normalization (inverse of A18; the
# shape behind the reference's jsonb Value unpacking, sql.py:276).
# unpivot is a zero-shuffle generator — the only shuffle below is the
# 3-group aggregate.
# --------------------------------------------------------------------
@query(
    "u6_unpivot_metrics",
    oracle="""
    SELECT metric,
           CAST(CAST(SUM(CAST(v AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             AS total,
           COUNT(*) AS n
    FROM (
      SELECT 'qty' AS metric, l_quantity AS v FROM lineitem
      UNION ALL
      SELECT 'price', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'discount', l_discount FROM lineitem
    )
    GROUP BY metric
    """,
)
def u6_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.select(
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
    ).unpivot([], ["qty", "price", "discount"], "metric", "v")
    return long.groupBy("metric").agg(
        F.sum(F.col("v").cast(_D)).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------
# W8 — RANGE-frame window: per-event trailing 7-day spend per user
# (value-based frame; the reference only ever uses cumulative ROWS
# frames, SURVEY §2.5 note).  The frame is expressed over epoch
# micros so Spark's numeric rangeBetween matches the SQL INTERVAL
# frame exactly; one shuffle on user_id.
# --------------------------------------------------------------------
@query(
    "w8_trailing_7d_user_value",
    oracle="""
    SELECT event_id, user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
           AS VARCHAR) AS DOUBLE) AS spend_7d
    FROM events
    """,
)
def w8_trailing_7d_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us("ts"))
        .rangeBetween(-7 * 86_400_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(_D)).over(w).cast("double").alias(
            "spend_7d"
        ),
    )


# --------------------------------------------------------------------
# A10b — the balance fold again, through the two-phase *salted*
# aggregation (operators/skew.py:salted_agg) and checked against the
# SAME oracle as a10_user_balance_fold: proof that the skew path is
# bit-identical, not merely approximately right.  At 100 TB a single
# celebrity address would funnel one reducer in the plain fold; here
# it spreads over n_salts partials first (decimal sums commute).
# --------------------------------------------------------------------
@query(
    "a10_salted_balance_fold",
    oracle="""
    SELECT
      user_id,
      CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,4))
                    WHEN event_type = 'error'
                    THEN -CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE)
        AS balance,
      COUNT(*) AS n_events,
      COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_credits,
      COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_debits
    FROM events
    GROUP BY user_id
    """,
)
def a10_salted_balance_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from omniengine_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    delta = (
        F.when(F.col("event_type") == "purchase", _dec("value"))
        .when(F.col("event_type") == "error", -_dec("value"))
        .otherwise(F.lit(0).cast(_D))
    )
    prepared = ev.select(
        "user_id",
        delta.alias("delta"),
        F.lit(1).alias("one"),
        F.when(F.col("event_type") == "purchase", 1).alias("credit_flag"),
        F.when(F.col("event_type") == "error", 1).alias("debit_flag"),
    )
    out = salted_agg(
        prepared,
        ["user_id"],
        {
            "balance": ("sum", "delta"),
            "n_events": ("count", "one"),
            "n_credits": ("count", "credit_flag"),
            "n_debits": ("count", "debit_flag"),
        },
        n_salts=8,
    )
    return out.select(
        "user_id",
        F.col("balance").cast("double").alias("balance"),
        "n_events",
        "n_credits",
        "n_debits",
    )


# --------------------------------------------------------------------
# TPC-H Q14 shape: conditional-share aggregate over a fact⋈dim join
# (promo revenue ratio for one ship month).  part is broadcast, so
# the plan is scan→BHJ→one partial agg — a single wide shuffle of 2
# numbers.  The ratio divides the two already-exact doubles, so it is
# bit-identical across engines.
# --------------------------------------------------------------------
@query(
    "sql_q14_promo_effect",
    oracle="""
    SELECT
      CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))
            ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE)
        AS promo_revenue,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))
           AS VARCHAR) AS DOUBLE) AS total_revenue,
      100.0 * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))
            ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE)
        / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))
             AS VARCHAR) AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def sql_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    one = F.lit(1).cast("decimal(5,4)")
    rev = _dec("l_extendedprice") * (
        one - F.col("l_discount").cast("decimal(5,4)")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast(_D)
    )
    agg = li.join(part, li.l_partkey == part.p_partkey).agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )
    return agg.withColumn(
        "promo_pct",
        100.0 * F.col("promo_revenue") / F.col("total_revenue"),
    )


# --------------------------------------------------------------------
# Count-min sketch heavy hitters: the fixed-memory frequency sketch
# (D=4 rows × W=256 buckets of BIGINT, mergeable by addition) probed
# for the top spenders.  At 100 TB the sketch is a map-side-combined
# groupBy over D·W cells — constant state per executor regardless of
# key cardinality — where the exact per-key count it replaces would
# shuffle every distinct key.  Hashes are md5-derived (engine-
# independent), so the oracle rebuilds the IDENTICAL sketch: both the
# estimates and the guaranteed-overcount property are hash-checked,
# the accuracy-gate pattern with zero tolerance.
# --------------------------------------------------------------------
_CM_D, _CM_W = 4, 256


def _cm_hash_sql(j: int) -> str:
    return (
        f"CAST(CAST(('0x' || substr(md5({j} || ':' || "
        f"CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) % {_CM_W} "
        f"AS BIGINT)"
    )


@query(
    "stats_countmin_heavy_hitters",
    oracle=f"""
    WITH p AS (
      SELECT user_id FROM events WHERE event_type = 'purchase'
    ), cells AS (
      SELECT j, h, COUNT(*) AS c
      FROM p CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(j),
      LATERAL (SELECT CASE j
        WHEN 0 THEN {_cm_hash_sql(0)}
        WHEN 1 THEN {_cm_hash_sql(1)}
        WHEN 2 THEN {_cm_hash_sql(2)}
        ELSE {_cm_hash_sql(3)} END AS h)
      GROUP BY j, h
    ), probes AS (
      SELECT DISTINCT user_id,
             {_cm_hash_sql(0)} AS h0, {_cm_hash_sql(1)} AS h1,
             {_cm_hash_sql(2)} AS h2, {_cm_hash_sql(3)} AS h3
      FROM p
    ), est AS (
      SELECT pr.user_id,
             LEAST(c0.c, c1.c, c2.c, c3.c) AS cm_estimate
      FROM probes pr
      JOIN cells c0 ON c0.j = 0 AND c0.h = pr.h0
      JOIN cells c1 ON c1.j = 1 AND c1.h = pr.h1
      JOIN cells c2 ON c2.j = 2 AND c2.h = pr.h2
      JOIN cells c3 ON c3.j = 3 AND c3.h = pr.h3
    ), exact AS (
      SELECT user_id, COUNT(*) AS n_exact FROM p GROUP BY user_id
    )
    SELECT e.user_id, e.cm_estimate, x.n_exact,
           e.cm_estimate >= x.n_exact AS never_undercounts
    FROM est e JOIN exact x ON e.user_id = x.user_id
    ORDER BY e.cm_estimate DESC, e.user_id
    LIMIT 20
    """,
)
def stats_countmin_heavy_hitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
    )

    def h(j: int) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{j}:"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CM_W
        )

    # the sketch: one explode into (j, h) cells, map-side combined to
    # at most D·W rows before the shuffle
    cells = (
        ev.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"), h(j).alias("h")
                        )
                        for j in range(_CM_D)
                    ]
                )
            ).alias("cell")
        )
        .groupBy(F.col("cell.j").alias("j"), F.col("cell.h").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
    )

    probes = ev.distinct().select(
        "user_id", *[h(j).alias(f"h{j}") for j in range(_CM_D)]
    )
    est = probes
    for j in range(_CM_D):
        cj = cells.filter(F.col("j") == j).select(
            F.col("h").alias(f"h{j}"), F.col("c").alias(f"c{j}")
        )
        est = est.join(F.broadcast(cj), f"h{j}")
    est = est.select(
        "user_id",
        F.least(*[F.col(f"c{j}") for j in range(_CM_D)]).alias(
            "cm_estimate"
        ),
    )
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "cm_estimate",
            "n_exact",
            (F.col("cm_estimate") >= F.col("n_exact")).alias(
                "never_undercounts"
            ),
        )
        .orderBy(F.col("cm_estimate").desc(), "user_id")
        .limit(20)
    )


# --------------------------------------------------------------------
# Mergeable sketches: per-shard HLL partials unioned into one global
# estimate — THE property that makes sketches matter at 100 TB: each
# partition/day/executor builds its own fixed-size sketch once, and
# any rollup (day → month, shard → global) is a cheap union of
# partials with NO rescan of raw data, unlike exact COUNT DISTINCT
# whose partials are unbounded key sets.  Accuracy-gate oracle: the
# merged estimate must land within the configured error of the exact
# answer, per event type.
# --------------------------------------------------------------------
@query(
    "stats_hll_merge",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           COUNT(DISTINCT event_id % 8) AS n_shards,
           TRUE AS merged_ok
    FROM events
    GROUP BY event_type
    """,
)
def stats_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        (F.col("event_id") % 8).alias("shard"),
    )
    partials = ev.groupBy("event_type", "shard").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sketch")
    )
    merged = partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("sketch")
        ).alias("n_est"),
        F.count(F.lit(1)).alias("n_shards"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        "n_shards",
        (
            F.abs(F.col("n_est") - F.col("n_exact"))
            <= 0.02 * F.col("n_exact")
        ).alias("merged_ok"),
    )


# --------------------------------------------------------------------
# A14b — CUBE grouping sets: the full 2^k subtotal lattice in one
# pass (ROLLUP's big sibling — a14 gives the hierarchy, CUBE gives
# every marginal).  Same scale argument: one shuffle with partial
# aggregation replaces four separate GROUP BYs over the fact table.
# --------------------------------------------------------------------
@query(
    "a14b_cube_order_stats",
    oracle="""
    SELECT
      COALESCE(o_orderstatus, 'ALL') AS order_status,
      COALESCE(o_orderpriority, 'ALL') AS order_priority,
      CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR)
           AS DOUBLE) AS sum_price,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def a14b_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): every marginal and the grand
    total in one aggregation pass — GROUPING ids disambiguate a real
    NULL group from a subtotal row, exactly as in a14's ROLLUP."""
    o = load_table(spark, sf_dir, "orders")
    out = o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return out.select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("order_status"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias(
            "order_priority"
        ),
        "g_status",
        "g_priority",
        "sum_price",
        "n_orders",
    )
