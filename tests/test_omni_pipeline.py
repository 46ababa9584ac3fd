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
    pid_desired=None,
    divisible_desired=None,
    matches=None,
):
    return (
        txid, block, pos, type_int, valid, sender, ref, pid,
        divisible, amount, recipients, subsends,
        pid_desired, divisible_desired, matches,
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
    # block 103: MetaDEx trade — alice sells 2.0 of 31 for 3 of 32,
    # matched against carol (pre-computed match list)
    _tx("t8", 103, 2, 25, sender="alice", pid=31, divisible=True,
        pid_desired=32, divisible_desired=False,
        matches=[("carol", "2.0", "3")]),
]

# hand-computed base-unit balances (divisible ×1e8)
EXPECTED = {
    ("alice", 31): Decimal(
        100_0000_0000 - 25_5000_0000 - 10_0000_0000 - 2_0000_0000
    ),
    ("bob", 31): Decimal(25_5000_0000 + 6_0000_0000 - 3_5000_0000),
    ("carol", 31): Decimal(4_0000_0000 + 3_5000_0000 + 2_0000_0000),
    ("alice", 32): Decimal(3),
    ("bob", 32): Decimal(7 - 2),
    ("carol", 32): Decimal(2 - 1 - 3),
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
        F.col("txid").isin("t2", "t4", "t6", "t8")
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


def test_frozen_balance_rule(spark):
    """Reference sql.py:1408-1414: freezing moves available→frozen;
    credits while frozen accrue frozen; unfreeze restores."""
    from omniengine_spark.operators.replay import frozen_balance_replay

    rows = [
        # (address, propertyid, serial, kind, delta)
        ("alice", 31, 1, "delta", 100),
        ("alice", 31, 2, "freeze", None),
        ("alice", 31, 3, "delta", 40),    # lands frozen
        ("alice", 31, 4, "delta", -10),   # applies to frozen
        ("alice", 31, 5, "unfreeze", None),
        ("alice", 31, 6, "delta", 5),     # back to available
        ("bob", 31, 7, "delta", 50),      # never frozen
        ("carol", 31, 8, "freeze", None),  # frozen with zero balance
        ("carol", 31, 9, "delta", 7),
    ]
    df = spark.createDataFrame(
        rows, ["address", "propertyid", "serial", "kind",
               "delta_base_units"]
    )
    got = {
        (r["address"], r["propertyid"]): (r["available"], r["frozen"])
        for r in frozen_balance_replay(df).collect()
    }
    assert got == {
        ("alice", 31): (100 + 40 - 10 + 5, 0),
        ("bob", 31): (50, 0),
        ("carol", 31): (0, 7),
    }


def test_utxo_input_resolution(spark):
    """S3/J5: vin⋈vout linkage resolves source addresses; coinbase and
    out-of-batch inputs come back null."""
    from omniengine_spark.pipeline.omni import (
        BTC_TX_SCHEMA,
        resolve_utxo_inputs,
    )

    txs = [
        ("a1", [], [(0, "alice", 5000, "pubkeyhash"),
                    (1, "bob", 3000, "pubkeyhash")]),
        ("b2", [("a1", 0)], [(0, "carol", 4900, "nulldata")]),
        ("c3", [("a1", 1), ("b2", 0)], [(0, "dave", 7800, "multisig")]),
        ("d4", [("zz", 9)], [(0, "erin", 100, "pubkeyhash")]),
    ]
    df = spark.createDataFrame(txs, BTC_TX_SCHEMA)
    got = {
        (r["txid"], r["prev_txid"], r["vout_n"]):
            (r["src_address"], r["value_sat"])
        for r in resolve_utxo_inputs(df).collect()
        if r["prev_txid"] is not None
    }
    assert got == {
        ("b2", "a1", 0): ("alice", 5000),
        ("c3", "a1", 1): ("bob", 3000),
        ("c3", "b2", 0): ("carol", 4900),
        ("d4", "zz", 9): (None, None),
    }


def test_tx_class_from_scripts(spark):
    """F9/D8: class C for OP_RETURN, B for multisig, A otherwise
    (reference omniutils.py:31-62)."""
    from omniengine_spark.pipeline.omni import (
        BTC_TX_SCHEMA,
        classify_tx,
    )

    txs = [
        ("a1", [], [(0, "x", 1, "pubkeyhash")]),
        ("b2", [], [(0, "x", 1, "pubkeyhash"), (1, None, 0, "nulldata")]),
        ("c3", [], [(0, "x", 1, "multisig")]),
        ("d4", [], [(0, "x", 1, "nulldata"), (1, "y", 2, "multisig")]),
    ]
    df = spark.createDataFrame(txs, BTC_TX_SCHEMA)
    got = {r["txid"]: r["tx_class"] for r in classify_tx(df).collect()}
    assert got == {"a1": "A", "b2": "C", "c3": "B", "d4": "C"}


def test_distributed_serials_match_global(spark):
    """stamp_serials_distributed must assign the identical dense
    serial as the single-partition global window, on a frame with
    many blocks, uneven block sizes, and shuffled input order."""
    from omniengine_spark.pipeline import stamp_serials_distributed

    rows = []
    eid = 0
    for block in [7, 3, 11, 3, 5, 100, 2]:
        for pos in range(block % 4 + 1):
            rows.append((f"t{eid}", block, pos))
            eid += 1
    raw = spark.createDataFrame(
        rows, ["txid", "block", "position_in_block"]
    ).repartition(5)

    base = {
        r["txid"]: r["serial"]
        for r in stamp_serials(raw.select("txid", "block",
                                          "position_in_block")).collect()
    }
    dist = {
        r["txid"]: r["serial"]
        for r in stamp_serials_distributed(raw).collect()
    }
    assert dist == base
    assert sorted(dist.values()) == list(range(1, len(rows) + 1))


def test_distributed_serials_avoid_single_partition_sort(spark):
    """The wide side must not pass through a global (non-partitioned)
    window: every Window node in the plan carries a partition spec,
    except over the one-row-per-block offsets frame."""
    from omniengine_spark.pipeline import stamp_serials_distributed

    raw = spark.createDataFrame(
        [(f"t{i}", i % 10, i) for i in range(100)],
        ["txid", "block", "position_in_block"],
    )
    plan = (
        stamp_serials_distributed(raw)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the block-partitioned rank over the wide data
    assert "windowspecdefinition(block" in plan
