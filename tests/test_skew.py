"""Salted aggregation/join must be result-identical to the unsalted
plans — on real tables and on an adversarially skewed frame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omniengine_spark.operators.skew import salted_agg, salted_join
from omniengine_spark.sources import load_table

from .conftest import SF_SMOKE


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_agg_equals_plain_agg(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    # integer cents so equality is exact under any grouping order
    d = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    plain = d.groupBy("event_type").agg(
        F.sum("cents").alias("total"),
        F.count("cents").alias("n"),
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
    )
    salted = salted_agg(
        d,
        ["event_type"],
        {
            "total": ("sum", "cents"),
            "n": ("count", "cents"),
            "lo": ("min", "cents"),
            "hi": ("max", "cents"),
        },
        n_salts=13,
    )
    assert _sorted_rows(plain) == _sorted_rows(salted)


def test_salted_agg_on_hot_key(spark):
    # 90% of rows share one key — the case salting exists for
    rows = [("hot", i) for i in range(9000)] + [
        (f"k{i % 50}", i) for i in range(1000)
    ]
    d = spark.createDataFrame(rows, ["k", "v"])
    plain = d.groupBy("k").agg(F.sum("v").alias("s"), F.count("v").alias("n"))
    salted = salted_agg(
        d, ["k"], {"s": ("sum", "v"), "n": ("count", "v")}, n_salts=32
    )
    assert _sorted_rows(plain) == _sorted_rows(salted)


def test_salted_agg_rejects_non_mergeable(spark):
    d = spark.createDataFrame([("a", 1.0)], ["k", "v"])
    with pytest.raises(ValueError):
        salted_agg(d, ["k"], {"m": ("avg", "v")})


def test_salted_join_equals_plain_join(spark):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type"
    )
    dims = (
        ev.select("user_id").distinct().withColumn(
            "segment", F.pmod(F.col("user_id"), F.lit(3))
        )
    )
    plain = ev.join(dims, "user_id")
    salted = salted_join(ev, dims, "user_id", n_salts=5)
    assert sorted(
        map(tuple, plain.select("event_id", "segment").collect())
    ) == sorted(map(tuple, salted.select("event_id", "segment").collect()))
