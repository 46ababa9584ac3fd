"""Data-quality plans: column profiling and constraint validation —
the Deequ/dbt-test shape, run as ordinary DataFrame aggregates.

The reference validates itself by full-state diff against omnicore
(``sql.py:1205-1316`` checkbalances); a warehouse this engine owns
needs the generic version: profile what landed, assert the
invariants, emit violations as DATA so the orchestrator can gate on
them.  One pass per table; every metric is a conditional aggregate
fused into a single scan (no per-check scans, unlike the reference's
one-statement-per-check style).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omniengine_spark.plans.registry import query
from omniengine_spark.sources import load_table

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


@query(
    "quality_column_profile",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderkey) AS n_null,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR),
           CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR),
           CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(MIN(o_totalprice) AS VARCHAR),
           CAST(MAX(o_totalprice) AS VARCHAR)
    FROM orders
    """,
)
def quality_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness/cardinality/range profile, computed in
    ONE scan: every metric for every column is a conditional aggregate
    in the same groupBy-less agg, then unpivoted to (column, metric)
    rows.  String-typed min/max keep one output schema for mixed
    column types (Deequ's profile result shape)."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.count_distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)
    profiles = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in _PROFILE_COLS
    ]
    return one.select(
        F.explode(F.array(*profiles)).alias("p")
    ).select("p.*")


@query(
    "quality_constraint_checks",
    oracle="""
    SELECT 'totalprice_positive' AS check_name,
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
             AS n_violations,
           COUNT(*) FILTER (WHERE o_totalprice <= 0) = 0 AS ok
    FROM orders
    UNION ALL
    SELECT 'orderkey_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
           COUNT(*) = COUNT(DISTINCT o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'status_in_domain',
           CAST(COUNT(*) FILTER (
             WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT),
           COUNT(*) FILTER (
             WHERE o_orderstatus NOT IN ('O', 'F', 'P')) = 0
    FROM orders
    UNION ALL
    SELECT 'custkey_fk_valid',
           CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)
def quality_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative invariants evaluated as data: non-negativity and
    domain checks fuse into one scan of orders; PK uniqueness is one
    distinct-agg; the FK check is a broadcast anti-join against
    customer (the engine's upsert/existence machinery, J7/J8,
    pointed at validation).  The reference's analog is its consensus
    checker (sql.py:1205-1316) — external oracle diff; these are the
    self-contained invariants a warehouse gates on."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    scan = orders.agg(
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("neg_price"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias(
            "dup_keys"
        ),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("bad_status"),
    )
    fk_violations = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("fk_bad"))
    )
    one = scan.crossJoin(fk_violations)
    checks = [
        ("totalprice_positive", F.col("neg_price")),
        ("orderkey_unique", F.col("dup_keys")),
        ("status_in_domain", F.col("bad_status")),
        ("custkey_fk_valid", F.col("fk_bad")),
    ]
    rows = [
        F.struct(
            F.lit(name).alias("check_name"),
            v.cast("long").alias("n_violations"),
            (v == 0).alias("ok"),
        )
        for name, v in checks
    ]
    return one.select(F.explode(F.array(*rows)).alias("c")).select("c.*")


# --------------------------------------------------------------------
# In-flight pipeline telemetry via df.observe: quality metrics
# accumulated DURING another query's only scan — zero additional
# passes.  The reference re-queries its tables after every block to
# report progress (``omniEngine.py:222-232`` prints counts from
# fresh SELECTs); at 100 TB a second scan per metric is the
# difference between one pass and two.  Observation metrics ride the
# task results of the main action, so the audit is free.
# --------------------------------------------------------------------
@query(
    "quality_observed_metrics",
    oracle="""
    WITH shipped AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                  AS DECIMAL(38,4)) AS order_value
      FROM lineitem
      WHERE l_returnflag <> 'R'
      GROUP BY l_orderkey
    )
    SELECT CAST((SELECT COUNT(*) FROM lineitem WHERE l_returnflag <> 'R')
                AS BIGINT) AS rows_scanned,
           CAST((SELECT COUNT(*) - COUNT(l_shipdate) FROM lineitem
                 WHERE l_returnflag <> 'R') AS BIGINT) AS null_shipdates,
           CAST((SELECT COUNT(*) FROM shipped) AS BIGINT) AS orders_out,
           CAST(CAST((SELECT SUM(order_value) FROM shipped) AS VARCHAR)
                AS DOUBLE) AS total_value
    """,
)
def quality_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run a real aggregation (per-order shipped value) while
    ``df.observe`` accumulates audit metrics on the SAME scan —
    input rows, null ship dates, exact DECIMAL value mass — then
    return the metrics AS a one-row DataFrame checked against an
    oracle that recomputes them independently.  The output row count
    of the main query rides along as ``orders_out``, proving the
    observation covered the whole action."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") != "R"
    )
    obs = Observation("audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        (F.count(F.lit(1)) - F.count("l_shipdate")).alias("null_shipdates"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias(
            "value_mass"
        ),
    )
    shipped = observed.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias(
            "order_value"
        )
    )
    orders_out = shipped.count()  # the one action; fills `obs`
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["rows_scanned"],
                m["null_shipdates"],
                orders_out,
                float(m["value_mass"]),
            )
        ],
        "rows_scanned long, null_shipdates long, orders_out long, "
        "total_value double",
    )
