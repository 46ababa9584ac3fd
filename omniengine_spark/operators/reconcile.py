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

from pyspark.sql import DataFrame
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
        mismatch = mismatch | (
            F.col(f"engine_{c}").eqNullSafe(F.col(f"oracle_{c}")) == False  # noqa: E712
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
