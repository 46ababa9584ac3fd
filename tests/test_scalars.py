"""Unit tests for the scalar expression library (SURVEY §2.8),
pinned against hand-computed reference behaviors.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from omniengine_spark.functions import (
    decimal_sum,
    epoch_to_ts,
    hex_to_long,
    money,
    null_to_zero,
    scale_base_units,
    trailing_window,
)


def test_scale_base_units_divisible_rule(spark):
    # reference sql.py:396-405: divisible ×1e8, indivisible plain int
    df = spark.createDataFrame(
        [(1, "1.5", True), (2, "1.5", False), (3, "0.00000001", True)],
        ["id", "amount", "divisible"],
    )
    out = {
        r["id"]: r["base"]
        for r in df.select(
            "id",
            scale_base_units(
                F.col("amount").cast("decimal(38,8)"), F.col("divisible")
            ).alias("base"),
        ).collect()
    }
    assert out == {
        1: Decimal("150000000"),
        2: Decimal("1"),  # truncation of 1.5 → 1 (plain-int parse)
        3: Decimal("1"),  # one base unit
    }


def test_hex_to_long_field_extract(spark):
    # propertyid = int(payload[8:16], 16) — reference sql.py:1626-1641
    df = spark.createDataFrame(
        [("00000000deadbeef",)], ["payload"]
    )
    row = df.select(hex_to_long(F.col("payload"), 9, 8).alias("v")).head()
    assert row["v"] == 0xDEADBEEF


def test_epoch_and_trailing_window(spark):
    df = spark.createDataFrame(
        [(0, 86400 * 10), (1, 86400 * 10 - 3600), (2, 86400 * 8)],
        ["id", "epoch"],
    ).select("id", epoch_to_ts("epoch").alias("ts"))
    anchor = df.agg(F.max("ts").alias("mx"))
    kept = (
        df.crossJoin(F.broadcast(anchor))
        .filter(trailing_window(F.col("ts"), F.col("mx"), days=1))
        .select("id")
        .collect()
    )
    assert sorted(r["id"] for r in kept) == [0, 1]


def test_money_sum_is_exact_and_order_independent(spark):
    # 0.1 + 0.2 in double world would drift; decimal path is exact
    df = spark.createDataFrame(
        [(0.1,), (0.2,), (0.3,)] * 1000, ["v"]
    ).repartition(7)
    row = df.agg(decimal_sum("v", "s")).head()
    assert row["s"] == 600.0
    assert money("v") is not None


def test_null_to_zero(spark):
    df = spark.createDataFrame([(1, None), (2, 5)], ["id", "v"])
    out = {
        r["id"]: r["v2"]
        for r in df.select(
            "id", null_to_zero("v").alias("v2")
        ).collect()
    }
    assert out == {1: 0, 2: 5}


def test_hex_to_amount_holds_full_uint64(spark):
    from omniengine_spark.functions import hex_to_amount, hex_to_long

    df = spark.createDataFrame(
        [("8000000000000000",), ("ffffffffffffffff",), ("00000000000000ff",)],
        ["payload"],
    )
    got = [
        int(r["v"])
        for r in df.select(
            hex_to_amount(F.col("payload"), 1, 16).alias("v")
        ).collect()
    ]
    assert got == [2**63, 2**64 - 1, 255]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hex_to_long(F.col("payload"), 1, 16)


def test_scale_base_units_truncates_toward_zero(spark):
    """Negative indivisible amounts must match python int(): -3.7 →
    -3, not floor's -4."""
    from omniengine_spark.functions import scale_base_units

    df = spark.createDataFrame(
        [("-3.7", False), ("3.7", False), ("-3.7", True)],
        ["amount", "divisible"],
    )
    got = [
        int(r["v"])
        for r in df.select(
            scale_base_units(
                F.col("amount"), F.col("divisible")
            ).alias("v")
        ).collect()
    ]
    assert got == [-3, 3, -370000000]


def test_portable_fingerprint_null_propagates(spark):
    """A null in ANY fingerprint column must null the whole term
    (matching DuckDB's || semantics) — concat_ws would silently skip
    it and collapse distinct null patterns onto the same hash."""
    from omniengine_spark.operators.reconcile import portable_fingerprint

    df = spark.createDataFrame(
        [(None, 1, 5), ("1", None, 5), ("1", 1, 5)],
        ["a", "b", "c"],
    )
    rows = df.select(
        portable_fingerprint("a", "b", "c").alias("fp")
    ).collect()
    assert rows[0]["fp"] is None
    assert rows[1]["fp"] is None
    assert rows[2]["fp"] is not None
