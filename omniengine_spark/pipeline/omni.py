"""Omni transaction pipeline: decoded tx JSON → ledger deltas →
balances — the reference's core loop (``omniEngine.py:109-232`` +
``sql.py:1664-2409`` insertTxAddr dispatch) as four declarative
stages.

Stage map (reference site → here):

1. ``stamp_serials``   — TxDBSerialNum sequence (``omniEngine.py:
   104-106``, ``sql.py:2411-2504``) → deterministic ``row_number``
   over (block, position): replayable, no mutable sequence (W3).
2. ``expand_deltas``   — the 25-way ``insertTxAddr`` dispatch
   (``sql.py:1664-2409``) → per-type column expressions producing
   1..N double-entry delta rows per tx via ``inline``/``explode``
   (D1).  Implemented types: simple send (0, ``sql.py:1776-1797``),
   send-all subsends (4, ``sql.py:1862-1899``), STO with
   pre-computed recipients (3, ``sql.py:1802-1846``), MetaDEx trade
   with pre-computed matches (25, ``sql.py:2032-2166``), fixed-supply
   issuance (50, ``sql.py:2168-2244``), grant/revoke (55/56,
   ``sql.py:2246-2327``).  Invalid txs expand to zero delta rows,
   matching the reference's ``valid`` gating.
3. ``build_balances``  — ``updateBalance`` read-modify-write
   (``sql.py:1320-1418``) → one groupBy-sum fold (A10) in exact
   base units (F1 scaling via ``scale_base_units``).
4. ``with_after_balances`` — ``finalizeAfterBalances``
   (``sql.py:1658-1662``) → cumulative window per (address,
   property) in serial order (W2).

Every stage is a pure function DataFrame→DataFrame; replaying any
block range is re-running the stages over its partitions (X2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omniengine_spark.functions import scale_base_units

# Decoded Omni tx (the reference's gettransaction_MP JSON, S2) —
# one struct per tx, recipients/subsends arrays for the 1→N types.
RAW_TX_SCHEMA = T.StructType(
    [
        T.StructField("txid", T.StringType(), False),
        T.StructField("block", T.LongType(), False),
        T.StructField("position_in_block", T.LongType(), False),
        T.StructField("type_int", T.IntegerType(), False),
        T.StructField("valid", T.BooleanType(), False),
        T.StructField("sending_address", T.StringType(), True),
        T.StructField("reference_address", T.StringType(), True),
        T.StructField("propertyid", T.LongType(), True),
        T.StructField("divisible", T.BooleanType(), True),
        T.StructField("amount", T.StringType(), True),
        T.StructField(
            "recipients",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("address", T.StringType()),
                        T.StructField("amount", T.StringType()),
                    ]
                )
            ),
            True,
        ),
        T.StructField(
            "subsends",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("propertyid", T.LongType()),
                        T.StructField("divisible", T.BooleanType()),
                        T.StructField("amount", T.StringType()),
                    ]
                )
            ),
            True,
        ),
        # MetaDEx (type 25-28): desired-side property + the match list
        # omnicore pre-computes on the trade tx (reference S7,
        # omni_gettrade → sql.py:2032-2166).
        T.StructField("propertyid_desired", T.LongType(), True),
        T.StructField("divisible_desired", T.BooleanType(), True),
        T.StructField(
            "matches",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("address", T.StringType()),
                        T.StructField("amount_sold", T.StringType()),
                        T.StructField("amount_received", T.StringType()),
                    ]
                )
            ),
            True,
        ),
    ]
)


def stamp_serials(txs: DataFrame) -> DataFrame:
    """Deterministic global serial per tx: dense row_number over
    (block, position_in_block).  Applied per incremental batch (the
    reference's per-block unit of work), offset by the batch's base
    serial at scale.

    The global window funnels the batch through ONE partition — fine
    for a per-block micro-batch, fatal for a 100 TB backfill; use
    ``stamp_serials_distributed`` there.
    """
    w = Window.orderBy("block", "position_in_block")
    return txs.withColumn("serial", F.row_number().over(w).cast("long"))


def stamp_serials_distributed(txs: DataFrame) -> DataFrame:
    """W3 at scale: the same dense (block, position_in_block) serial
    without the single-partition global sort.

    Two-level decomposition: (1) per-block row counts — one row per
    block — prefix-summed into block start offsets with a window over
    that *tiny* frame; (2) the wide data ranks within its own block
    (shuffle partitioned BY block, its natural key) and adds the
    broadcast offset.  The only global sort left touches |blocks|
    rows, not |txs| — the same trick the reference plays by
    pre-assigning sequence ranges per block (``omniEngine.py:
    104-106``) instead of a nextval per row.
    """
    counts = txs.groupBy("block").agg(F.count(F.lit(1)).alias("__n"))
    w_off = (
        Window.orderBy("block")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "block",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_blk = Window.partitionBy("block").orderBy("position_in_block")
    return (
        txs.join(F.broadcast(offsets), "block")
        .withColumn(
            "serial",
            (F.col("__off") + F.row_number().over(w_blk)).cast("long"),
        )
        .drop("__off")
    )


def _base_units(amount: F.Column, divisible: F.Column) -> F.Column:
    return scale_base_units(amount.cast("decimal(38,8)"), divisible)


def expand_deltas(txs: DataFrame) -> DataFrame:
    """Per-txtype expansion into double-entry ledger rows
    (address, propertyid, delta_base_units, role, serial)."""
    amt = _base_units(F.col("amount"), F.col("divisible"))
    neg = (-amt).cast("decimal(19,0)")

    def rows(*structs: F.Column) -> F.Column:
        return F.array(*structs)

    def row(addr: F.Column, pid: F.Column, delta: F.Column, role: str):
        return F.struct(
            addr.alias("address"),
            pid.alias("propertyid"),
            delta.cast("decimal(19,0)").alias("delta_base_units"),
            F.lit(role).alias("role"),
        )

    pid = F.col("propertyid")

    # type 0 — simple send: sender debit, recipient credit
    simple = rows(
        row(F.col("sending_address"), pid, neg, "sender"),
        row(F.col("reference_address"), pid, amt, "recipient"),
    )

    # type 50 — fixed issuance: issuer credited with created supply
    issue = rows(row(F.col("sending_address"), pid, amt, "issuer"))

    # type 55 — grant: issuer mints to reference address
    grant = rows(
        row(F.col("reference_address"), pid, amt, "grantee"),
    )
    # type 56 — revoke: burn from sender
    revoke = rows(row(F.col("sending_address"), pid, neg, "revoked"))

    # type 3 — STO: sender debited total, each recipient credited
    # (recipient list pre-computed upstream, reference S8)
    sto_recipients = F.transform(
        F.col("recipients"),
        lambda r: F.struct(
            r["address"].alias("address"),
            pid.alias("propertyid"),
            _base_units(r["amount"], F.col("divisible"))
            .cast("decimal(19,0)")
            .alias("delta_base_units"),
            F.lit("sto_recipient").alias("role"),
        ),
    )
    sto_total = F.aggregate(
        F.col("recipients"),
        F.lit(0).cast("decimal(19,0)"),
        lambda acc, r: (
            acc
            + _base_units(r["amount"], F.col("divisible")).cast(
                "decimal(19,0)"
            )
        ).cast("decimal(19,0)"),
    )
    sto = F.concat(
        rows(
            F.struct(
                F.col("sending_address").alias("address"),
                pid.alias("propertyid"),
                (-sto_total).cast("decimal(19,0)").alias("delta_base_units"),
                F.lit("sto_sender").alias("role"),
            )
        ),
        sto_recipients,
    )

    # type 25 — MetaDEx trade: per pre-computed match, the seller
    # gives amount_sold of pid and receives amount_received of
    # pid_desired; the counterparty takes the mirror position
    # (reference insertMatch/updatedex2, sql.py:2032-2166).  4 delta
    # rows per match — conservation per property is automatic.
    trade = F.flatten(
        F.transform(
            F.col("matches"),
            lambda m: F.array(
                F.struct(
                    F.col("sending_address").alias("address"),
                    pid.alias("propertyid"),
                    (-_base_units(m["amount_sold"], F.col("divisible"))).cast(
                        "decimal(19,0)"
                    ).alias("delta_base_units"),
                    F.lit("trade_sold").alias("role"),
                ),
                F.struct(
                    F.col("sending_address").alias("address"),
                    F.col("propertyid_desired").alias("propertyid"),
                    _base_units(
                        m["amount_received"], F.col("divisible_desired")
                    ).cast("decimal(19,0)").alias("delta_base_units"),
                    F.lit("trade_received").alias("role"),
                ),
                F.struct(
                    m["address"].alias("address"),
                    pid.alias("propertyid"),
                    _base_units(m["amount_sold"], F.col("divisible")).cast(
                        "decimal(19,0)"
                    ).alias("delta_base_units"),
                    F.lit("match_received").alias("role"),
                ),
                F.struct(
                    m["address"].alias("address"),
                    F.col("propertyid_desired").alias("propertyid"),
                    (
                        -_base_units(
                            m["amount_received"], F.col("divisible_desired")
                        )
                    ).cast("decimal(19,0)").alias("delta_base_units"),
                    F.lit("match_sold").alias("role"),
                ),
            ),
        )
    )

    # type 4 — send-all: one debit/credit pair per subsend
    sendall = F.flatten(
        F.transform(
            F.col("subsends"),
            lambda s: F.array(
                F.struct(
                    F.col("sending_address").alias("address"),
                    s["propertyid"].alias("propertyid"),
                    (-_base_units(s["amount"], s["divisible"])).cast(
                        "decimal(19,0)"
                    ).alias("delta_base_units"),
                    F.lit("sender").alias("role"),
                ),
                F.struct(
                    F.col("reference_address").alias("address"),
                    s["propertyid"].alias("propertyid"),
                    _base_units(s["amount"], s["divisible"]).cast(
                        "decimal(19,0)"
                    ).alias("delta_base_units"),
                    F.lit("recipient").alias("role"),
                ),
            ),
        )
    )

    expanded = (
        F.when(~F.col("valid"), F.array().cast(
            "array<struct<address:string,propertyid:bigint,"
            "delta_base_units:decimal(19,0),role:string>>"
        ))
        .when(F.col("type_int") == 0, simple)
        .when(F.col("type_int") == 3, sto)
        .when(F.col("type_int") == 4, sendall)
        .when(F.col("type_int") == 25, trade)
        .when(F.col("type_int") == 50, issue)
        .when(F.col("type_int") == 55, grant)
        .when(F.col("type_int") == 56, revoke)
        .otherwise(
            F.array().cast(
                "array<struct<address:string,propertyid:bigint,"
                "delta_base_units:decimal(19,0),role:string>>"
            )
        )
    )
    return txs.select(
        "txid", "block", "serial", F.explode_outer(expanded).alias("d")
    ).filter(F.col("d").isNotNull()).select(
        "txid",
        "block",
        "serial",
        F.col("d.address").alias("address"),
        F.col("d.propertyid").alias("propertyid"),
        F.col("d.delta_base_units").alias("delta_base_units"),
        F.col("d.role").alias("role"),
    )


BTC_TX_SCHEMA = T.StructType(
    [
        T.StructField("txid", T.StringType(), False),
        T.StructField(
            "vin",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("prev_txid", T.StringType()),
                        T.StructField("vout_n", T.LongType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "vout",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("n", T.LongType()),
                        T.StructField("address", T.StringType()),
                        T.StructField("value_sat", T.LongType()),
                        T.StructField("script_type", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def classify_tx(btc_txs: DataFrame) -> DataFrame:
    """F9/D8: Omni tx class from output script types (reference
    ``omniutils.py:31-62``): Class C = OP_RETURN (nulldata) payload,
    Class B = bare multisig payload, Class A = plain pubkeyhash
    encoding.  ``exists()`` over the vout struct array — no UDF.
    """
    has = lambda t: F.exists(  # noqa: E731
        F.col("vout"), lambda o: o["script_type"] == t
    )
    tx_class = (
        F.when(has("nulldata"), "C")
        .when(has("multisig"), "B")
        .otherwise("A")
    )
    return btc_txs.select("txid", tx_class.alias("tx_class"))


def resolve_utxo_inputs(btc_txs: DataFrame) -> DataFrame:
    """S3/J5: resolve each input's source address/value by joining the
    exploded vin list against prior txs' exploded vout lists on
    (prev_txid, vout_n) — the reference does one ``getrawtransaction``
    RPC per input (``sql.py:1693-1718``) and back-patches the spent
    row; here the linkage is one equi-join and ``spent_by`` is a
    computed column, never a mutation.

    Output: one row per input with (txid, prev_txid, vout_n,
    src_address, value_sat).  Unmatched inputs (coinbase / outside the
    batch) resolve to nulls via the left join.
    """
    vins = btc_txs.select(
        "txid", F.explode_outer("vin").alias("i")
    ).select(
        "txid",
        F.col("i.prev_txid").alias("prev_txid"),
        F.col("i.vout_n").alias("vout_n"),
    )
    vouts = btc_txs.select(
        F.col("txid").alias("prev_txid"),
        F.explode_outer("vout").alias("o"),
    ).select(
        "prev_txid",
        F.col("o.n").alias("vout_n"),
        F.col("o.address").alias("src_address"),
        F.col("o.value_sat").alias("value_sat"),
    )
    return vins.join(vouts, ["prev_txid", "vout_n"], "left")


def build_balances(deltas: DataFrame) -> DataFrame:
    """Materialized running state: fold of all deltas per
    (address, propertyid) — the whole of ``updateBalance`` as one
    partial-aggregated groupBy."""
    return deltas.groupBy("address", "propertyid").agg(
        F.sum("delta_base_units").cast("decimal(19,0)").alias("balance"),
        F.count(F.lit(1)).alias("n_deltas"),
        F.max("serial").alias("last_serial"),
    )


def with_after_balances(deltas: DataFrame) -> DataFrame:
    """Stamp the post-tx running balance onto every delta row in
    serial order (finalizeAfterBalances)."""
    w = (
        Window.partitionBy("address", "propertyid")
        .orderBy("serial")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return deltas.withColumn(
        "after_balance",
        F.sum("delta_base_units").over(w).cast("decimal(19,0)"),
    )
