"""SQL front-end plans: the engine's tables registered as views and
queried through ``spark.sql`` — proving the full SQL surface (the
reference's hand-written SQL strings, ``sql.py`` passim) works
against the same warehouse with the same oracle discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from omniengine_spark.plans.registry import query
from omniengine_spark.sources import load_table

# {rev} differs per engine: DuckDB's DECIMAL→DOUBLE cast double-rounds
# (hugeint then /10^s), so the oracle routes through VARCHAR (strtod is
# correctly rounded, matching Spark's BigDecimal.doubleValue).
_Q3 = """
SELECT
  l_orderkey,
  {rev} AS revenue,
  o_orderdate,
  o_orderpriority
FROM {cust} c
JOIN {orders} o ON c.c_custkey = o.o_custkey
JOIN {li} l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '2001-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '2001-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


_REV_SUM = (
    "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) "
    "* (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4))))"
)


_Q5 = """
SELECT
  n_name,
  {rev} AS revenue,
  COUNT(*) AS n_items
FROM {cust} c
JOIN {orders} o ON c.c_custkey = o.o_custkey
JOIN {li} l ON l.l_orderkey = o.o_orderkey
JOIN {supp} s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN {nat} n ON s.s_nationkey = n.n_nationkey
JOIN {reg} r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@query(
    "sql_q3_shipping_priority",
    oracle=_Q3.format(
        cust="customer",
        orders="orders",
        li="lineitem",
        rev=f"CAST(CAST({_REV_SUM} AS VARCHAR) AS DOUBLE)",
    ),
)
def sql_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape submitted as a SQL string over registered views —
    Catalyst plans it identically to the DataFrame formulation
    (broadcast dims, partial agg, top-k)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_lineitem"
    )
    return spark.sql(
        _Q3.format(
            cust="v_customer",
            orders="v_orders",
            li="v_lineitem",
            rev=f"CAST({_REV_SUM} AS DOUBLE)",
        )
    )


@query(
    "sql_q5_local_supplier_volume",
    oracle=_Q5.format(
        cust="customer",
        orders="orders",
        li="lineitem",
        supp="supplier",
        nat="nation",
        reg="region",
        rev=f"CAST(CAST({_REV_SUM} AS VARCHAR) AS DOUBLE)",
    ),
)
def sql_q5_local_supplier_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q5 shape: six-way join with a *two-column* residual on
    the supplier join (local supplier = same nation as the customer).
    This is the join-reordering stress test — Catalyst broadcasts the
    three dims (supplier/nation/region) so the only wide shuffle is
    lineitem joining orders joining customer; the reference never
    exceeds a 3-way comma join (``sql.py:270-274``)."""
    for name in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        _Q5.format(
            cust="v_customer",
            orders="v_orders",
            li="v_lineitem",
            supp="v_supplier",
            nat="v_nation",
            reg="v_region",
            rev=f"CAST({_REV_SUM} AS DOUBLE)",
        )
    )


_Q10 = """
SELECT
  c.c_custkey,
  c.c_name,
  {rev} AS revenue,
  c.c_acctbal,
  n.n_name,
  COUNT(*) AS n_items
FROM {cust} c
JOIN {orders} o ON c.c_custkey = o.o_custkey
JOIN {li} l ON l.l_orderkey = o.o_orderkey
JOIN {nat} n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query(
    "sql_q10_returned_items",
    oracle=_Q10.format(
        cust="customer",
        orders="orders",
        li="lineitem",
        nat="nation",
        rev=f"CAST(CAST({_REV_SUM} AS VARCHAR) AS DOUBLE)",
    ),
)
def sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue report over returned items —
    fact⋈fact (lineitem⋈orders) with a broadcast customer/nation
    enrichment and a top-20 TakeOrderedAndProject, the serving-layer
    "worst customers" query the reference answers with AddressStats
    (``sql.py:1644-1656``)."""
    for name in ("customer", "orders", "lineitem", "nation"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        _Q10.format(
            cust="v_customer",
            orders="v_orders",
            li="v_lineitem",
            nat="v_nation",
            rev=f"CAST({_REV_SUM} AS DOUBLE)",
        )
    )


_Q7 = """
WITH flows AS (
  SELECT
    sn.n_name AS supp_nation,
    cn.n_name AS cust_nation,
    CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
    CAST(l.l_extendedprice AS DECIMAL(18,4))
      * (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(5,4)))
      AS volume
  FROM {supp} s
  JOIN {li} l ON s.s_suppkey = l.l_suppkey
  JOIN {orders} o ON o.o_orderkey = l.l_orderkey
  JOIN {cust} c ON c.c_custkey = o.o_custkey
  JOIN {nat} sn ON s.s_nationkey = sn.n_nationkey
  JOIN {nat} cn ON c.c_nationkey = cn.n_nationkey
  WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
      OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1997-12-31 00:00:00'
)
SELECT supp_nation, cust_nation, l_year,
       {rev} AS revenue,
       COUNT(*) AS n_items
FROM flows
GROUP BY supp_nation, cust_nation, l_year
"""


@query(
    "sql_q7_volume_shipping",
    oracle=_Q7.format(
        cust="customer",
        orders="orders",
        li="lineitem",
        supp="supplier",
        nat="nation",
        rev="CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE)",
    ),
)
def sql_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: six-way join where the interesting predicate is
    a symmetric OR over a broadcast dim joined TWICE under different
    aliases (supplier's nation vs customer's nation) — proves alias
    resolution and that the disjunction is pushed into the two
    broadcast hash joins rather than materializing the cross flow."""
    for name in ("customer", "orders", "lineitem", "supplier", "nation"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        _Q7.format(
            cust="v_customer",
            orders="v_orders",
            li="v_lineitem",
            supp="v_supplier",
            nat="v_nation",
            rev="CAST(SUM(volume) AS DOUBLE)",
        )
    )


# Q4 shape, adapted to the available lineitem columns (the generator
# has no commitdate/receiptdate): an order is "late-shipped" when some
# line shipped after the order date + 60 days.  Same plan skeleton as
# TPC-H Q4: date-window scan of orders, EXISTS semi-join to lineitem,
# tiny grouped count.
_Q4 = """
SELECT
  o_orderpriority,
  COUNT(*) AS order_count
FROM {orders} o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM {li} l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@query(
    "sql_q4_late_orders",
    oracle=_Q4.format(orders="orders", li="lineitem"),
)
def sql_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi hash join on
    l_orderkey with the date residual evaluated at the join — no
    distinct/aggregate subquery materialization."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_lineitem"
    )
    return spark.sql(_Q4.format(orders="v_orders", li="v_lineitem"))


# Q12 shape, adapted (no l_shipmode column): group by l_linestatus,
# CASE-sum the high- vs low-priority orders of the joined fact — the
# conditional-bucket aggregation Q12 exercises.
_Q12 = """
SELECT
  l.l_linestatus,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM {orders} o
JOIN {li} l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
"""


@query(
    "sql_q12_priority_buckets",
    oracle=_Q12.format(orders="orders", li="lineitem"),
)
def sql_q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact⋈fact equi-join with the filter pushed to
    the lineitem scan and both CASE-sums computed in one partial
    aggregate."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_lineitem"
    )
    return spark.sql(_Q12.format(orders="v_orders", li="v_lineitem"))
