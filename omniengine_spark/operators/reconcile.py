"""State reconciliation — the reference's consensus checking
(``sql.py:1205-1316`` checkbalances_MP; cron wrapper
``consensusjob.py``) as a distributed diff.

Given the engine's computed state and an oracle snapshot (reference:
omnicore's full balance dump, S5), produce one row per key with a
status: ``ok`` / ``mismatch`` / ``missing_in_engine`` /
``missing_in_oracle``.  A full outer join on the state key — one
shuffle, linear in state size, no row-at-a-time cursor walk.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reconcile(
    engine: DataFrame,
    oracle: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """Full-outer diff of two keyed states.

    Output: keys + engine_/oracle_ value columns + ``status``.
    """
    e = engine.select(
        *keys, *[F.col(c).alias(f"engine_{c}") for c in value_cols]
    ).withColumn("_in_engine", F.lit(True))
    o = oracle.select(
        *keys, *[F.col(c).alias(f"oracle_{c}") for c in value_cols]
    ).withColumn("_in_oracle", F.lit(True))

    joined = e.join(o, list(keys), "full_outer")
    mismatch = F.lit(False)
    for c in value_cols:
        mismatch = mismatch | ~F.col(f"engine_{c}").eqNullSafe(
            F.col(f"oracle_{c}")
        )
    status = (
        F.when(F.col("_in_engine").isNull(), "missing_in_engine")
        .when(F.col("_in_oracle").isNull(), "missing_in_oracle")
        .when(mismatch, "mismatch")
        .otherwise("ok")
    )
    return joined.select(
        *keys,
        *[F.col(f"engine_{c}") for c in value_cols],
        *[F.col(f"oracle_{c}") for c in value_cols],
        status.alias("status"),
    )


_FP_MOD = 10**18  # fingerprints live in [0, 1e18) — exact in BIGINT


def portable_fingerprint(*cols: F.Column | str) -> F.Column:
    """60-bit order-portable row hash: md5 of the ':'-joined canonical
    string, first 15 hex digits as an integer.  Chosen because Spark
    (``conv(substring(md5(s),1,15),16,10)``) and DuckDB
    (``('0x'||substr(md5(s),1,15))::BIGINT``) produce bit-identical
    values, so fingerprint plans stay exactly oracle-checkable.

    ``concat`` (null-PROPAGATING), not ``concat_ws``: concat_ws
    silently skips null columns, so (NULL, 1, 5) and ('1', NULL, 5)
    would both fingerprint as '1:5' — and the DuckDB twin's ``||``
    null-propagates, so the engines would diverge the moment a
    null-keyed row appears.  With concat, a null in any column makes
    the whole term null and the consensus SUM skips it on BOTH
    engines identically."""
    parts: list[F.Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(":"))
        parts.append(
            (F.col(c) if isinstance(c, str) else c).cast("string")
        )
    s = F.concat(*parts)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )


def per_block_consensus(
    deltas: DataFrame,
    keys: Sequence[str] = ("address", "propertyid"),
    block_col: str = "block",
    delta_col: str = "delta",
) -> DataFrame:
    """Per-block consensus fingerprint of the balance state — the
    reference's ``omni_getcurrentconsensushash`` stamped onto every
    block row (``sql.py:221-229``, column
    ``omni_db_schema.psql`` blocks.consensushash), recomputed here for
    ALL blocks in one pass.

    Semantics: fingerprint(B) = Σ over keys of hash(key, balance
    after B), an order-insensitive sum over the full state, mod 1e18.
    Every key that has ever appeared contributes (zero balances
    included) — deterministic and recompute-stable, which is what the
    reorg check needs.

    Naively this is O(blocks × state).  The scalable form is the
    difference trick: when a key's balance changes at block b, the
    state sum changes by hash(new) − hash(old); so fingerprint(B) is
    the prefix sum over blocks of per-block hash-delta totals.  Cost:
    one shuffle on the key (running balances), one on block (tiny
    per-block frame), then a window over |blocks| rows — never
    |blocks| × |keys|.  The single-partition window is over the
    per-block frame only (one row per block), same shape as the
    serial stamper's offset frame.
    """
    keys = list(keys)
    w_key = Window.partitionBy(*keys).orderBy(block_col)
    per = deltas.groupBy(*keys, block_col).agg(
        F.sum(delta_col).alias("__d")
    )
    bal = per.select(
        *keys,
        block_col,
        F.sum("__d").over(w_key).cast("long").alias("__bal"),
    )
    states = bal.select(
        *keys,
        block_col,
        "__bal",
        F.lag("__bal").over(w_key).alias("__prev"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    dh = portable_fingerprint(*keys, F.col("__bal")) - F.when(
        F.col("__prev").isNull(), zero
    ).otherwise(portable_fingerprint(*keys, F.col("__prev")))
    per_block = states.groupBy(block_col).agg(
        F.sum(dh).alias("__dh")
    )
    w_blocks = Window.orderBy(block_col)
    return per_block.select(
        F.col(block_col),
        F.pmod(F.sum("__dh").over(w_blocks), F.lit(_FP_MOD))
        .cast("long")
        .alias("consensus_hash"),
    )
