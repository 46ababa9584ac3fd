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


# ---------------------------------------------------------------------------
# Round-4 widening: the remaining canonical TPC-H shapes expressible on
# the generator's schema (no partsupp table, no commit/receipt dates,
# no phone/container columns — adapted shapes note the substitution).
# ---------------------------------------------------------------------------


_Q6 = """
SELECT
  {rev} AS revenue,
  COUNT(*) AS n_items
FROM {li} l
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_discount BETWEEN 0.03 AND 0.07
  AND l.l_quantity < 24
"""

_DISC_REV_SUM = (
    "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) "
    "* CAST(l_discount AS DECIMAL(5,4)))"
)


@query(
    "sql_q6_forecast_revenue",
    oracle=_Q6.format(
        li="lineitem",
        rev=f"CAST(CAST({_DISC_REV_SUM} AS VARCHAR) AS DOUBLE)",
    ),
)
def sql_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pure-scan aggregate — every predicate is
    pushed into the parquet scan (shipdate min/max stats prune row
    groups) and the whole query is one partial+final agg with no
    shuffle key at all.  The simplest possible plan; anything more
    (a sort, an exchange beyond the single-row gather) is a bug."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_lineitem"
    )
    return spark.sql(
        _Q6.format(li="v_lineitem", rev=f"CAST({_DISC_REV_SUM} AS DOUBLE)")
    )


_Q8 = """
WITH volumes AS (
  SELECT
    CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
    CAST(l.l_extendedprice AS DECIMAL(18,4))
      * (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(5,4)))
      AS volume,
    sn.n_name AS supp_nation
  FROM {part} p
  JOIN {li} l ON p.p_partkey = l.l_partkey
  JOIN {supp} s ON s.s_suppkey = l.l_suppkey
  JOIN {orders} o ON o.o_orderkey = l.l_orderkey
  JOIN {cust} c ON c.c_custkey = o.o_custkey
  JOIN {nat} cn ON c.c_nationkey = cn.n_nationkey
  JOIN {nat} sn ON s.s_nationkey = sn.n_nationkey
  JOIN {reg} r ON cn.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
    AND p.p_type = 'PROMO'
    AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                          AND TIMESTAMP '1997-12-31 00:00:00'
)
SELECT
  o_year,
  {share} AS mkt_share,
  COUNT(*) AS n_items
FROM volumes
GROUP BY o_year
"""

_Q8_NUM = "SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END)"
_Q8_DEN = "SUM(volume)"


@query(
    "sql_q8_market_share",
    oracle=_Q8.format(
        part="part",
        li="lineitem",
        supp="supplier",
        orders="orders",
        cust="customer",
        nat="nation",
        reg="region",
        share=(
            f"CAST(CAST({_Q8_NUM} AS VARCHAR) AS DOUBLE)"
            f" / CAST(CAST({_Q8_DEN} AS VARCHAR) AS DOUBLE)"
        ),
    ),
)
def sql_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share): eight-way join where nation is
    joined twice under different roles and the measure is a ratio of
    two conditional sums computed in ONE aggregation pass — the
    two-scan formulation the reference would write (separate numerator
    and denominator statements, ``sql.py:266-276`` style) collapses to
    a single grouped CASE-sum.  All five dims broadcast; the only
    shuffles are the three fact-side joins.  Both sums stay DECIMAL
    (exact) until the final ratio, so the double division is the same
    correctly-rounded IEEE op in both engines."""
    for name in (
        "part", "lineitem", "supplier", "orders", "customer", "nation",
        "region",
    ):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        _Q8.format(
            part="v_part",
            li="v_lineitem",
            supp="v_supplier",
            orders="v_orders",
            cust="v_customer",
            nat="v_nation",
            reg="v_region",
            share=(
                f"CAST({_Q8_NUM} AS DOUBLE) / CAST({_Q8_DEN} AS DOUBLE)"
            ),
        )
    )


# Q9 shape, adapted: the generator has no partsupp/ps_supplycost, so
# profit = line revenue − retail cost of the quantity shipped
# (p_retailprice standing in for ps_supplycost).  The plan skeleton is
# Q9's: LIKE-filtered part, five-way join, extract-year, group by
# (nation, year).
_Q9 = """
SELECT
  nation,
  o_year,
  {profit} AS sum_profit,
  COUNT(*) AS n_items
FROM (
  SELECT
    sn.n_name AS nation,
    CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
    CAST(l.l_extendedprice AS DECIMAL(18,4))
      * (CAST(1 AS DECIMAL(5,4)) - CAST(l.l_discount AS DECIMAL(5,4)))
    - CAST(p.p_retailprice AS DECIMAL(18,4))
      * CAST(l.l_quantity AS DECIMAL(18,4)) AS amount
  FROM {part} p
  JOIN {li} l ON p.p_partkey = l.l_partkey
  JOIN {supp} s ON s.s_suppkey = l.l_suppkey
  JOIN {orders} o ON o.o_orderkey = l.l_orderkey
  JOIN {nat} sn ON s.s_nationkey = sn.n_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@query(
    "sql_q9_product_profit",
    oracle=_Q9.format(
        part="part",
        li="lineitem",
        supp="supplier",
        orders="orders",
        nat="nation",
        profit="CAST(CAST(SUM(amount) AS VARCHAR) AS DOUBLE)",
    ),
)
def sql_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): LIKE-filtered part dim
    (broadcast, filter applied before the join so only matching
    partkeys enter the build side), two more broadcast dims, and a
    signed DECIMAL measure — revenue minus cost — summed exactly.
    Mixed-sign sums are where floating-point drifts; DECIMAL keeps the
    fold associative and engine-independent."""
    for name in ("part", "lineitem", "supplier", "orders", "nation"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        _Q9.format(
            part="v_part",
            li="v_lineitem",
            supp="v_supplier",
            orders="v_orders",
            nat="v_nation",
            profit="CAST(SUM(amount) AS DOUBLE)",
        )
    )


# Q13 shape, adapted: the comment-pattern exclusion becomes a priority
# exclusion (orders has no o_comment).
_Q13 = """
SELECT
  c_count,
  COUNT(*) AS custdist
FROM (
  SELECT
    c.c_custkey AS c_custkey,
    COUNT(o.o_orderkey) AS c_count
  FROM {cust} c
  LEFT JOIN {orders} o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@query(
    "sql_q13_order_count_distribution",
    oracle=_Q13.format(cust="customer", orders="orders"),
)
def sql_q13_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with a predicate on the
    *preserved-null* side pushed into the join (not a post-filter,
    which would change the semantics), double aggregation — per-key
    count then count-of-counts.  The second groupBy keys on ~dozens of
    values, so AQE coalesces its shuffle to almost nothing."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(_Q13.format(cust="v_customer", orders="v_orders"))


_Q15 = """
WITH revenue AS (
  SELECT
    l_suppkey AS supplier_no,
    {rev_sum} AS total_revenue
  FROM {li}
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT
  s.s_suppkey,
  s.s_name,
  {rev_out} AS total_revenue
FROM {supp} s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query(
    "sql_q15_top_supplier",
    oracle=_Q15.format(
        li="lineitem",
        supp="supplier",
        rev_sum=_REV_SUM,
        rev_out="CAST(CAST(r.total_revenue AS VARCHAR) AS DOUBLE)",
    ),
)
def sql_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): a named subresult referenced twice —
    once as the join input, once under MAX in an uncorrelated scalar
    subquery.  total_revenue stays DECIMAL through the MAX comparison
    (exact equality is only sane in fixed-point; a double `=` here
    would be engine-dependent) and becomes DOUBLE at output only."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_lineitem"
    )
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "v_supplier"
    )
    return spark.sql(
        _Q15.format(
            li="v_lineitem",
            supp="v_supplier",
            rev_sum=_REV_SUM,
            rev_out="CAST(r.total_revenue AS DOUBLE)",
        )
    )


# Q17 shape, adapted (no p_container): brand+type select the part
# slice.  l_quantity is integral, so 0.2*AVG is the same double in
# both engines (exact integer sum / exact count, one IEEE divide).
_Q17 = """
SELECT
  {rev} AS avg_yearly,
  COUNT(*) AS n_items
FROM {li} l
JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND p.p_type = 'PROMO'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM {li} l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@query(
    "sql_q17_small_quantity_revenue",
    oracle=_Q17.format(
        li="lineitem",
        part="part",
        rev=(
            "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) "
            "AS VARCHAR) AS DOUBLE) / 7.0"
        ),
    ),
)
def sql_q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery (per-part 20%-
    of-average quantity threshold) — Catalyst decorrelates it to an
    aggregate-then-join on l_partkey, so lineitem is scanned twice but
    never nested-loop'd.  The filtered part dim broadcasts into both
    sides."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_lineitem"
    )
    load_table(spark, sf_dir, "part").createOrReplaceTempView("v_part")
    return spark.sql(
        _Q17.format(
            li="v_lineitem",
            part="v_part",
            rev=(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) "
                "AS DOUBLE) / 7.0"
            ),
        )
    )


# Q19 shape, adapted (no p_container / l_shipmode / l_shipinstruct):
# three brand×size×quantity conjunctions OR'd together.
_Q19 = """
SELECT
  {rev} AS revenue,
  COUNT(*) AS n_items
FROM {li} l
JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@query(
    "sql_q19_disjunctive_revenue",
    oracle=_Q19.format(
        li="lineitem",
        part="part",
        rev=f"CAST(CAST({_REV_SUM} AS VARCHAR) AS DOUBLE)",
    ),
)
def sql_q19_disjunctive_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19 shape: a disjunction of conjunctions spanning BOTH
    join sides.  The optimizer must (a) keep the OR as a join residual
    rather than a cartesian filter and (b) derive the per-side
    implied filters (p_brand IN (...), p_size <= 15, l_quantity <= 30)
    pushed below the join — constraint propagation the reference's
    hand-written SQL never needed because Postgres did it for free."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_lineitem"
    )
    load_table(spark, sf_dir, "part").createOrReplaceTempView("v_part")
    return spark.sql(
        _Q19.format(
            li="v_lineitem",
            part="v_part",
            rev=f"CAST({_REV_SUM} AS DOUBLE)",
        )
    )


# Q21 shape, adapted (no commit/receipt dates): within finished
# multi-supplier orders, find the supplier who is the ONLY one whose
# line was returned — same EXISTS + NOT-EXISTS double-correlated
# skeleton as the original "suppliers who kept orders waiting".
_Q21 = """
SELECT
  s.s_name,
  COUNT(*) AS numwait
FROM {supp} s
JOIN {li} l1 ON s.s_suppkey = l1.l_suppkey
JOIN {orders} o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM {li} l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM {li} l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@query(
    "sql_q21_sole_blame_supplier",
    oracle=_Q21.format(supp="supplier", li="lineitem", orders="orders"),
)
def sql_q21_sole_blame_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21 shape: the hardest subquery pattern in the suite —
    one EXISTS and one NOT EXISTS, both correlated on l_orderkey with
    an inequality on l_suppkey.  Catalyst turns them into a left-semi
    and a left-anti join against the same lineitem scan; the supplier
    dim broadcasts; top-20 is TakeOrderedAndProject."""
    for name in ("supplier", "lineitem", "orders"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        _Q21.format(supp="v_supplier", li="v_lineitem", orders="v_orders")
    )


# Q22 shape, adapted (no c_phone): country code = c_nationkey % 5.
# The above-average threshold is evaluated in exact arithmetic:
# bal*N > total  instead of  bal > total/N  (same predicate, no
# engine-dependent division).
_Q22 = """
WITH positive AS (
  SELECT
    CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
    c_custkey,
    CAST(c_acctbal AS DECIMAL(18,4)) AS bal
  FROM {cust}
  WHERE c_acctbal > 0
)
SELECT
  cntrycode,
  COUNT(*) AS numcust,
  {bal} AS totacctbal
FROM positive p
WHERE p.bal * (SELECT COUNT(*) FROM positive)
      > (SELECT SUM(bal) FROM positive)
  AND NOT EXISTS (
    SELECT 1 FROM {orders} o
    WHERE o.o_custkey = p.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY cntrycode
"""


@query(
    "sql_q22_dormant_accounts",
    oracle=_Q22.format(
        cust="customer",
        orders="orders",
        bal="CAST(CAST(SUM(bal) AS VARCHAR) AS DOUBLE)",
    ),
)
def sql_q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): two uncorrelated
    scalar subqueries over the same CTE (count and sum — computed in
    one reused aggregate), a NOT EXISTS anti-join to orders, and a
    grouped rollup.  The above-average comparison is cross-multiplied
    into DECIMAL so no division result is ever compared — the exact
    trick the double-entry ledger uses for pro-rata cutoffs
    (``sql.py:1806-1821``)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        _Q22.format(
            cust="v_customer",
            orders="v_orders",
            bal="CAST(SUM(bal) AS DOUBLE)",
        )
    )


# ---------------------------------------------------------------------------
# Q2/Q11/Q16/Q20 shapes.  The testdata star schema has no partsupp
# table, so each derives the part-supplier relation from lineitem
# (GROUP BY l_partkey, l_suppkey) — the subquery SKELETONS are the
# point: Q2's correlated min-cost, Q11's global-fraction HAVING,
# Q16's NOT IN + COUNT DISTINCT, Q20's correlated aggregate nested
# inside an IN.  With these the engine covers all 22 TPC-H shapes.
# ---------------------------------------------------------------------------

# Q2 shape: minimum-cost supplier per part within a region.  Unit cost
# is MIN(l_extendedprice / l_quantity) — a single IEEE division and a
# MIN, never a float sum, so Spark and DuckDB agree bit-for-bit.
_Q2 = """
WITH ps AS (
  SELECT
    l_partkey AS ps_partkey,
    l_suppkey AS ps_suppkey,
    MIN(l_extendedprice / l_quantity) AS ps_supplycost
  FROM {li}
  GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT ps.ps_partkey, ps.ps_supplycost,
         s.s_name, s.s_acctbal, n.n_name
  FROM ps
  JOIN {supp} s ON ps.ps_suppkey = s.s_suppkey
  JOIN {nat} n ON s.s_nationkey = n.n_nationkey
  JOIN {reg} r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
       e.ps_supplycost
FROM {part} p
JOIN eu e ON e.ps_partkey = p.p_partkey
WHERE p.p_size = 15
  AND p.p_type = 'STANDARD'
  AND e.ps_supplycost = (
    SELECT MIN(e2.ps_supplycost) FROM eu e2
    WHERE e2.ps_partkey = p.p_partkey
  )
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
LIMIT 100
"""


@query(
    "sql_q2_min_cost_supplier",
    oracle=_Q2.format(
        li="lineitem", supp="supplier", nat="nation", reg="region",
        part="part",
    ),
)
def sql_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN over the region-filtered
    part-supplier relation, equality-joined back to pick the cheapest
    supplier(s) per part.  Catalyst decorrelates the subquery into a
    per-part aggregate joined on p_partkey, so the derived ps relation
    is built once per side and never nested-loop'd; supplier/nation/
    region broadcast.  The reference serves the analogous cheapest-
    offer lookup from its DEx views (``sql.py:270-274``)."""
    for name in ("lineitem", "supplier", "nation", "region", "part"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        _Q2.format(
            li="v_lineitem", supp="v_supplier", nat="v_nation",
            reg="v_region", part="v_part",
        )
    )


# Q11 shape: parts representing a significant fraction of one nation's
# total stock value.  Value is an exact DECIMAL sum and the fraction
# threshold is cross-multiplied (val * 5000 > total), so no division
# or float sum is ever compared.  1/5000 keeps the HAVING populated
# at bench scale too (part count grows with sf while each part's
# share shrinks — TPC-H scales this fraction by 1/SF for the same
# reason).
_Q11 = """
WITH value AS (
  SELECT
    l.l_partkey AS ps_partkey,
    SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS val
  FROM {li} l
  JOIN {supp} s ON l.l_suppkey = s.s_suppkey
  JOIN {nat} n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY l.l_partkey
)
SELECT ps_partkey, {val} AS part_value
FROM value v
WHERE v.val * 5000 > (SELECT SUM(val) FROM value)
ORDER BY part_value DESC, ps_partkey
LIMIT 50
"""


@query(
    "sql_q11_important_stock",
    oracle=_Q11.format(
        li="lineitem", supp="supplier", nat="nation",
        val="CAST(CAST(val AS VARCHAR) AS DOUBLE)",
    ),
)
def sql_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped aggregate HAVING'd against an
    uncorrelated scalar subquery over the SAME derived table — the
    one-big-total-vs-each-group pattern.  Catalyst computes the CTE
    once per consumer (agg reuse under AQE), the scalar total arrives
    as a literal via a subquery broadcast, and the fraction test is
    cross-multiplied into DECIMAL exactly like the pro-rata cutoff in
    the STO fold (``sql.py:1806-1821``)."""
    for name in ("lineitem", "supplier", "nation"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        _Q11.format(
            li="v_lineitem", supp="v_supplier", nat="v_nation",
            val="CAST(val AS DOUBLE)",
        )
    )


# Q16 shape: supplier diversity per part attribute, excluding a
# denylisted supplier set.  Purely integer/string arithmetic.
_Q16 = """
WITH ps AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
  FROM {li}
)
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM ps
JOIN {part} p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND ps.ps_suppkey NOT IN (
    SELECT s_suppkey FROM {supp} WHERE s_name LIKE '%7%'
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 40
"""


@query(
    "sql_q16_supplier_diversity",
    oracle=_Q16.format(li="lineitem", part="part", supp="supplier"),
)
def sql_q16_supplier_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape: DISTINCT pair derivation, a NOT IN denylist
    subquery (null-safe anti-join — s_suppkey is non-null so Catalyst
    plans a plain left-anti), and COUNT(DISTINCT) per three grouping
    columns.  The denylist broadcasts; the distinct-pair shuffle is
    the only wide exchange."""
    for name in ("lineitem", "part", "supplier"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        _Q16.format(li="v_lineitem", part="v_part", supp="v_supplier")
    )


# Q20 shape: suppliers in one nation who shipped more than half of a
# qualifying part's lifetime volume during 1999.  Both sides of the
# threshold are exact DECIMAL sums and the halving is cross-multiplied
# (recent * 2 > lifetime).
_Q20 = """
WITH ps AS (
  SELECT
    l_partkey AS ps_partkey,
    l_suppkey AS ps_suppkey,
    SUM(CAST(l_quantity AS DECIMAL(18,4))) AS ps_availqty
  FROM {li}
  GROUP BY l_partkey, l_suppkey
)
SELECT s.s_name, s.s_acctbal
FROM {supp} s
JOIN {nat} n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (
    SELECT ps.ps_suppkey FROM ps
    WHERE ps.ps_partkey IN (
      SELECT p_partkey FROM {part} WHERE p_name LIKE 'red%'
    )
    AND (
      SELECT COALESCE(SUM(CAST(l.l_quantity AS DECIMAL(18,4))), 0)
      FROM {li} l
      WHERE l.l_partkey = ps.ps_partkey
        AND l.l_suppkey = ps.ps_suppkey
        AND l.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
    ) * 2 > ps.ps_availqty
  )
ORDER BY s.s_name
"""


@query(
    "sql_q20_recent_volume_suppliers",
    oracle=_Q20.format(
        li="lineitem", supp="supplier", nat="nation", part="part",
    ),
)
def sql_q20_recent_volume_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape: the deepest nesting in the suite — an IN whose
    subquery contains another IN (part-name filter) AND a correlated
    scalar aggregate (the 1999 volume for that exact part-supplier
    pair).  Catalyst decorrelates the scalar into a grouped aggregate
    joined on (partkey, suppkey) and turns both INs into left-semi
    joins; the nation-filtered supplier dim broadcasts."""
    for name in ("lineitem", "supplier", "nation", "part"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        _Q20.format(
            li="v_lineitem", supp="v_supplier", nat="v_nation",
            part="v_part",
        )
    )
