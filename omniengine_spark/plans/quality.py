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
from omniengine_spark.sources import fan_out, load_table

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
    column types (Deequ's profile result shape).

    fan_out: the multi-distinct rewrite Expands every input row ~9×
    before the widest aggregation; on the single-row-group testdata
    file that all ran on one core (measured 2.3 s → 1.6 s warm with
    the spread; a no-op on a real multi-split warehouse scan).  Every
    metric is an order-free aggregate, so the spread is safe."""
    orders = fan_out(load_table(spark, sf_dir, "orders"))
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


_KMV_K = 1024  # rsd ~ 1/sqrt(K-2) ~ 3.1%
_H_MAX = float(16**15)  # hashes live in [0, 2^60)


@query(
    "quality_column_profile_approx",
    oracle=f"""
    WITH pairs AS (
      SELECT 'o_orderkey' AS column_name,
             CAST(o_orderkey AS VARCHAR) AS v FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', CAST(o_orderstatus AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders
    ), hashed AS (
      SELECT DISTINCT column_name,
             CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS h
      FROM pairs WHERE v IS NOT NULL
    ), ranked AS (
      SELECT column_name, h,
             ROW_NUMBER() OVER (PARTITION BY column_name
                                ORDER BY h) AS rn
      FROM hashed
    ), sketch AS (
      SELECT column_name, MAX(h) AS kth, COUNT(*) AS n_seen
      FROM ranked WHERE rn <= {_KMV_K}
      GROUP BY column_name
    )
    SELECT column_name,
           CASE WHEN n_seen < {_KMV_K} THEN n_seen
                ELSE CAST(FLOOR({_KMV_K - 1}.0 * {_H_MAX!r}
                                / CAST(kth AS DOUBLE)) AS BIGINT)
           END AS n_distinct_est
    FROM sketch
    """,
)
def quality_column_profile_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fixed-memory distinct profile: the 100× answer to
    ``quality_column_profile``'s four exact ``count_distinct`` columns
    (each adds an Expand branch; at scale the multi-distinct Expand is
    a 5× row blowup through the widest shuffle).

    A K-minimum-values sketch per column instead: keep the K smallest
    60-bit md5 hashes of the column's distinct values; if fewer than K
    distinct values exist the sketch IS exact, otherwise
    ``est = (K-1) * H_MAX / kth_smallest``.  State per column is K
    longs — mergeable (union of K-min sets, re-prune to K), shuffle is
    (column, hash) pairs only, never value payloads.

    Unlike ``approx_count_distinct`` (whose HLL++ register layout is
    engine-private, so DuckDB could never reproduce the number), every
    step here is portable-exact: the 15-hex-digit md5 prefix matches
    ``operators.reconcile.portable_fingerprint``; the estimator is one
    IEEE-754 double multiply+divide+floor, bit-identical on JVM and
    C++.  The approx plan therefore stays HASH-checked, not bound-
    checked — the repo's standard trick of making the approximation
    deterministic rather than weakening the oracle.

    Two-level top-K (per-salt then global) keeps the global window's
    per-column partition bounded at 64·K rows regardless of N.
    """
    from pyspark.sql import Window

    # fan_out: per-row work here is ~9 md5 hashes per input row (one
    # per profiled column) before the first exchange — serial on the
    # single-row-group testdata scan, a no-op on a real warehouse
    orders = fan_out(load_table(spark, sf_dir, "orders"))
    pairs = orders.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("p")
    ).select("p.*").filter(F.col("v").isNotNull())

    hashed = pairs.select(
        "column_name",
        F.conv(F.substring(F.md5("v"), 1, 15), 16, 10)
        .cast("decimal(38,0)")
        .cast("long")
        .alias("h"),
    ).distinct()

    # local prune: each salt bucket yields its own K smallest, so the
    # global top-K (a subset of the union) survives; the global window
    # then ranks <= 64*K rows per column, not N
    salted = hashed.withColumn("salt", F.pmod(F.col("h"), F.lit(64)))
    w_local = Window.partitionBy("column_name", "salt").orderBy("h")
    w_global = Window.partitionBy("column_name").orderBy("h")
    pruned = (
        salted.withColumn("rn", F.row_number().over(w_local))
        .filter(F.col("rn") <= _KMV_K)
        .withColumn("rng", F.row_number().over(w_global))
        .filter(F.col("rng") <= _KMV_K)
    )
    sketch = pruned.groupBy("column_name").agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_seen")
    )
    est = F.when(F.col("n_seen") < _KMV_K, F.col("n_seen")).otherwise(
        F.floor(
            F.lit(float(_KMV_K - 1))
            * F.lit(_H_MAX)
            / F.col("kth").cast("double")
        ).cast("long")
    )
    return sketch.select(
        "column_name", est.cast("long").alias("n_distinct_est")
    )


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
