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
