"""Relational plans: scans, filters, joins, aggregations, set ops.

Each plan re-expresses a SURVEY §2 operator shape from the reference
engine over the harness star schema.  Exact-money discipline: every
currency aggregate runs through DecimalType (order-independent) and is
surfaced as double, so results are bit-stable under any partitioning —
a requirement the reference never faced single-threaded
(reference ``sqltools.py:48-64``) but a distributed engine must meet.

Scale notes per plan are inline — broadcast choices, shuffle keys, and
why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omniengine_spark.plans.registry import query
from omniengine_spark.sources import load_table

# Exact decimal intermediates (see functions.scalars for rationale).
_D = "decimal(18,4)"  # currency / quantity
_R = "decimal(5,4)"  # rate-like in [0,1]


def _dec(c: str) -> F.Column:
    return F.col(c).cast(_D)


def _rate(c: str) -> F.Column:
    return F.col(c).cast(_R)


# --------------------------------------------------------------------
# A4 — grouped conditional aggregation (reference sql.py:270-274:
# per-property volume with FILTER aggs).  TPC-H Q1 shape: the classic
# partial-agg-friendly rollup — map-side combine means the shuffle
# carries only |groups| × |cols| rows regardless of fact size.
# --------------------------------------------------------------------
@query(
    "a4_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))
           AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))
               * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(5,4))))
           AS VARCHAR) AS DOUBLE) AS sum_charge,
      COUNT(*) AS count_order,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a4_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    one = F.lit(1).cast(_R)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = _dec("l_extendedprice") * (one - _rate("l_discount"))
    charge = disc_price * (one + _rate("l_tax"))
    out = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return out.withColumn(
        "avg_qty", F.col("sum_qty") / F.col("count_order")
    )


# --------------------------------------------------------------------
# J1 — multi-way fact⋈dims join with small-dim broadcast (reference
# sql.py:270-274 joins deltas⋈transactions⋈smartproperties).  Here:
# revenue per region.  customer shuffles on custkey once; nation and
# region are broadcast so the only wide shuffle is fact⋈customer —
# at 100 TB the dims stay KB-sized, so the plan is one shuffle, not four.
# --------------------------------------------------------------------
@query(
    "j1_revenue_by_region",
    oracle="""
    SELECT
      r_name,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))
           AS VARCHAR) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def j1_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    one = F.lit(1).cast(_R)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    revenue = _dec("l_extendedprice") * (one - _rate("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------
# P2/P3 — range + multi-state predicate projection (reference
# sql.py:92 range scan; sql.py:605-609 multi-state filter).  Both
# predicates and the 3-column projection push down into the parquet
# scan: ReadSchema lists 5 of 6 columns, PushedFilters carries the
# range — verified in tests via explain().
# --------------------------------------------------------------------
@query(
    "p2_order_range_filter",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND o_orderstatus <> 'F'
      AND o_totalprice > 50000
    """,
)
def p2_order_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderstatus") != "F")
        & (F.col("o_totalprice") > 50000)
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


# --------------------------------------------------------------------
# J8 — existence anti-join (reference sql.py:382-384: skip txs already
# stored).  left_anti is shuffle-on-key both sides; at scale the orders
# side is pre-aggregated to distinct keys first, shrinking the shuffle.
# --------------------------------------------------------------------
@query(
    "j8_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j8_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    order_keys = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    )
    return cust.join(
        order_keys, cust.c_custkey == order_keys.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------
# A10 — ledger balance fold (reference updateBalance sql.py:1320-1418
# read-modify-write per row → one groupBy-sum here).  events is the
# delta stream: purchases credit, errors debit (arbitrary but fixed
# semantic), everything else neutral — the signed-fold shape of the
# reference's 4-column balance accumulate.
# --------------------------------------------------------------------
@query(
    "a10_user_balance_fold",
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
def a10_user_balance_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    delta = (
        F.when(F.col("event_type") == "purchase", _dec("value"))
        .when(F.col("event_type") == "error", -_dec("value"))
        .otherwise(F.lit(0).cast(_D))
    )
    return ev.groupBy("user_id").agg(
        F.sum(delta).cast("double").alias("balance"),
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
            "n_credits"
        ),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_debits"),
    )


# --------------------------------------------------------------------
# T1/T2 — deterministic top-k (reference order-by-limit sql.py:239 et
# al).  TakeOrderedAndProject: no global sort, each partition keeps k,
# driver merges — O(k) memory at any scale.
# --------------------------------------------------------------------
@query(
    "t1_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def t1_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


# --------------------------------------------------------------------
# U1/U3 — union of heterogeneous sources with provenance flag
# (reference updateFees.py:29-87 multi-provider merge; sql.py:1106-1111
# pending ∪ completed).  unionByName keeps this schema-safe.
# --------------------------------------------------------------------
@query(
    "u1_account_union",
    oracle="""
    SELECT kind, CAST(CAST(SUM(CAST(acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_bal,
           COUNT(*) AS n
    FROM (
      SELECT 'customer' AS kind, c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_acctbal AS acctbal FROM supplier
    )
    GROUP BY kind
    """,
)
def u1_account_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.lit("customer").alias("kind"), F.col("c_acctbal").alias("acctbal"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(F.lit("supplier").alias("kind"), F.col("s_acctbal").alias("acctbal"))
    )
    return (
        cust.unionByName(supp)
        .groupBy("kind")
        .agg(
            F.sum(_dec("acctbal")).cast("double").alias("total_bal"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------
# J9/A6 — join + trailing time-window aggregate (reference
# sql.py:888-890: 24h valid-buyer volume).  The window anchor is the
# max event time, so the plan is a scalar agg broadcast into a filter —
# no per-row now() nondeterminism.
# --------------------------------------------------------------------
@query(
    "j9_trailing_24h_purchase_volume",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS mx FROM events)
    SELECT
      event_type,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS vol_24h,
      COUNT(*) AS n_24h
    FROM events, anchor
    WHERE ts > anchor.mx - INTERVAL 1 DAY
    GROUP BY event_type
    """,
)
def j9_trailing_24h_purchase_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("mx"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .filter(F.col("ts") > F.col("mx") - F.expr("INTERVAL 1 DAY"))
        .groupBy("event_type")
        .agg(
            F.sum(_dec("value")).cast("double").alias("vol_24h"),
            F.count(F.lit(1)).alias("n_24h"),
        )
    )
