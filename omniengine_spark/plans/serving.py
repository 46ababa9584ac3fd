"""Serving-layer plans: the reference's most-executed user queries
(``database/SQLstatements.md:44-65``) as named, oracle-checked plans.

The flagship is "all balances and USD values for an address":
AddressBalances ⋈ ExchangeRates with value arithmetic.  Here the
balance state is the genesis-seeded delta fold, the rate table is a
latest-observation-per-property lookup (W1 shape) derived from
orders, and the join is a broadcast of the tiny rate dim — the plan a
point-lookup service would run, expressed so the address predicate
pushes through the fold's aggregation to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from omniengine_spark.pipeline import (
    build_balances,
    expand_deltas,
    genesis_deltas,
    stamp_serials_distributed,
)
from omniengine_spark.plans.pipeline_plans import _tx_stream
from omniengine_spark.plans.registry import query
from omniengine_spark.sources import load_table
from omniengine_spark.sources.genesis import synthetic_genesis

SERVE_ADDRESS = "u42"  # the fixed lookup key for the named plan


def latest_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExchangeRates as latest-observation-per-property (reference
    keeps one current row per (propertyid1, propertyid2); here the
    newest orders row per propertyid bucket plays that role —
    deterministic via the (date, key) tie-break)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("propertyid").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.select(
            (F.col("o_orderkey") % 5).alias("propertyid"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("rate_cents"),
            "o_orderdate",
            "o_orderkey",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("propertyid", "rate_cents")
    )


@query(
    "serve_address_portfolio",
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
      SELECT sender, propertyid, -base_units FROM tx WHERE t = 0
      UNION ALL
      SELECT ref, propertyid, base_units FROM tx WHERE t = 0
      UNION ALL
      SELECT 'u' || CAST(c_custkey AS VARCHAR),
             c_custkey % 5,
             CAST(CAST(c_acctbal AS DECIMAL(15,2)) * 100 AS BIGINT)
      FROM customer
    ), bal AS (
      SELECT address, propertyid,
             CAST(SUM(delta) AS BIGINT) AS available
      FROM deltas WHERE address = 'u42'
      GROUP BY address, propertyid
    ), rates AS (
      SELECT propertyid, rate_cents FROM (
        SELECT o_orderkey % 5 AS propertyid,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS rate_cents,
               ROW_NUMBER() OVER (
                 PARTITION BY o_orderkey % 5
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders)
      WHERE rn = 1
    )
    SELECT b.address, b.propertyid, b.available,
           r.rate_cents,
           b.available * r.rate_cents AS value_available_cents
    FROM bal b JOIN rates r ON r.propertyid = b.propertyid
    """,
)
def serve_address_portfolio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"All balances & values for an address"
    (``database/SQLstatements.md:44-65``): genesis-seeded balance
    fold, filtered to one address, joined to the broadcast latest-rate
    dim, value = balance × rate.

    Scale shape: the address equality predicate is on the fold's
    group key, so Catalyst pushes it below the aggregation to the
    delta scan — the cluster never folds state for addresses the
    query didn't ask about; the rate dim is 5 rows, broadcast."""
    txs = _tx_stream(spark, sf_dir)
    deltas = expand_deltas(stamp_serials_distributed(txs))
    gen = genesis_deltas(synthetic_genesis(spark, sf_dir))
    folded = build_balances(
        gen.select(*deltas.columns).unionByName(deltas)
    ).filter(F.col("address") == SERVE_ADDRESS)
    rates = latest_rates(spark, sf_dir)
    return folded.join(F.broadcast(rates), "propertyid").select(
        "address",
        "propertyid",
        F.col("balance").cast("long").alias("available"),
        "rate_cents",
        (F.col("balance").cast("long") * F.col("rate_cents")).alias(
            "value_available_cents"
        ),
    )
