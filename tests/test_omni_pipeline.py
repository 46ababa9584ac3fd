"""Golden end-to-end test of the omni pipeline slice (SURVEY §5
strategy item 2): a hand-built block stream covering every
implemented txtype, with hand-computed expected balances, plus the
conservation invariants.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from omniengine_spark.pipeline import (
    RAW_TX_SCHEMA,
    build_balances,
    expand_deltas,
    stamp_serials,
    with_after_balances,
)


def _tx(
    txid,
    block,
    pos,
    type_int,
    valid=True,
    sender=None,
    ref=None,
    pid=None,
    divisible=True,
    amount=None,
    recipients=None,
    subsends=None,
):
    return (
        txid, block, pos, type_int, valid, sender, ref, pid,
        divisible, amount, recipients, subsends,
    )


FIXTURE = [
    # block 100: issue 100.0 divisible units of property 31 to alice
    _tx("t1", 100, 1, 50, sender="alice", pid=31, amount="100.0"),
    # block 100: alice sends 25.5 to bob
    _tx("t2", 100, 2, 0, sender="alice", ref="bob", pid=31, amount="25.5"),
    # block 101: INVALID send must produce no deltas
    _tx("t3", 101, 1, 0, valid=False, sender="alice", ref="carol",
        pid=31, amount="999"),
    # block 101: STO — alice distributes 10.0 to bob (6.0) + carol (4.0)
    _tx("t4", 101, 2, 3, sender="alice", pid=31, amount="10.0",
        recipients=[("bob", "6.0"), ("carol", "4.0")]),
    # block 102: indivisible property 32 granted to bob (7 units)
    _tx("t5", 102, 1, 55, sender="issuer", ref="bob", pid=32,
        divisible=False, amount="7"),
    # block 102: bob send-all: prop 31 3.5 + prop 32 2 → carol
    _tx("t6", 102, 2, 4, sender="bob", ref="carol",
        subsends=[(31, True, "3.5"), (32, False, "2")]),
    # block 103: revoke 1 unit of 32 from carol's issuer (burn)
    _tx("t7", 103, 1, 56, sender="carol", pid=32, divisible=False,
        amount="1"),
]

# hand-computed base-unit balances (divisible ×1e8)
EXPECTED = {
    ("alice", 31): Decimal(100_0000_0000 - 25_5000_0000 - 10_0000_0000),
    ("bob", 31): Decimal(25_5000_0000 + 6_0000_0000 - 3_5000_0000),
    ("carol", 31): Decimal(4_0000_0000 + 3_5000_0000),
    ("bob", 32): Decimal(7 - 2),
    ("carol", 32): Decimal(2 - 1),
}


def _pipeline(spark):
    raw = spark.createDataFrame(FIXTURE, RAW_TX_SCHEMA)
    return expand_deltas(stamp_serials(raw))


def test_golden_balances(spark):
    deltas = _pipeline(spark)
    got = {
        (r["address"], r["propertyid"]): r["balance"]
        for r in build_balances(deltas).collect()
    }
    assert got == EXPECTED


def test_invalid_tx_produces_no_deltas(spark):
    deltas = _pipeline(spark)
    assert deltas.filter(F.col("txid") == "t3").count() == 0


def test_transfer_conservation_per_property(spark):
    """Σ deltas = 0 for pure transfers (types 0/3/4); issuance (50/55)
    adds supply, revoke (56) removes it — SURVEY §5 invariant 3."""
    deltas = _pipeline(spark)
    transfers = deltas.filter(
        F.col("txid").isin("t2", "t4", "t6")
    )
    sums = transfers.groupBy("propertyid").agg(
        F.sum("delta_base_units").alias("s")
    )
    assert all(r["s"] == 0 for r in sums.collect())
    # net supply of 31: only issuance t1
    total31 = (
        deltas.filter(F.col("propertyid") == 31)
        .agg(F.sum("delta_base_units").alias("s"))
        .collect()[0]["s"]
    )
    assert total31 == Decimal(100_0000_0000)
    # net supply of 32: grant 7 − revoke 1
    total32 = (
        deltas.filter(F.col("propertyid") == 32)
        .agg(F.sum("delta_base_units").alias("s"))
        .collect()[0]["s"]
    )
    assert total32 == Decimal(6)


def test_after_balances_telescope(spark):
    """W2 continuity: the last after-balance per key equals the folded
    balance, and each after_balance is prev + delta."""
    deltas = with_after_balances(_pipeline(spark))
    final = {
        (r["address"], r["propertyid"]): r["balance"]
        for r in build_balances(deltas).collect()
    }
    rows = sorted(
        deltas.collect(),
        key=lambda r: (r["address"], r["propertyid"], r["serial"]),
    )
    running: dict[tuple, Decimal] = {}
    for r in rows:
        key = (r["address"], r["propertyid"])
        running[key] = running.get(key, Decimal(0)) + r["delta_base_units"]
        assert r["after_balance"] == running[key]
    assert running == final


def test_serials_are_dense_and_ordered(spark):
    raw = spark.createDataFrame(FIXTURE, RAW_TX_SCHEMA)
    rows = sorted(
        stamp_serials(raw).select(
            "serial", "block", "position_in_block"
        ).collect(),
        key=lambda r: r["serial"],
    )
    assert [r["serial"] for r in rows] == list(range(1, len(FIXTURE) + 1))
    ordered = [(r["block"], r["position_in_block"]) for r in rows]
    assert ordered == sorted(ordered)
