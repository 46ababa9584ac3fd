"""As-of join — an operator the reference approximates with
"order by asof desc limit 1" point lookups per row (reference
``sql.py:282``, ``295``: latest exchange rate at-or-before now) and
Spark lacks natively.

Union-and-carry formulation: tag both sides, union on the key, sort
each key group by (ts, side) with the right side first at ties, and
carry the last right-side payload forward with ``last(..., ignore-
nulls)``.  One shuffle on the key, one in-partition sort — O(n log n)
per key group, no per-row lookups, no range explosion.  This is the
standard scalable as-of (the point-in-time join of feature stores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = (),
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` on the same key (inclusive as-of).

    Output: all left columns + ``asof_<payload>`` columns (null when
    no right row precedes).
    """
    payload = list(right_payload)
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_ats", F.col(left_ts)
    )
    r_tagged = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("_ats"),
            *[F.col(c).alias(f"_r_{c}") for c in payload],
        )
        .withColumn("_side", F.lit(0))
    )
    # align schemas for the union
    for c in left.columns:
        if c not in (key,):
            if c not in r_tagged.columns:
                r_tagged = r_tagged.withColumn(
                    c, F.lit(None).cast(dict(left.dtypes)[c])
                )
    for c in payload:
        l_tagged = l_tagged.withColumn(
            f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c])
        )
    unioned = l_tagged.unionByName(
        r_tagged.select(*l_tagged.columns)
    )
    # right rows sort before left rows at equal ts → inclusive as-of.
    # _tie breaks ties among multiple right rows at the same (key, ts)
    # deterministically (payload hash): without it their relative order
    # — and therefore the carried asof_ payload — would follow
    # partition sort order, varying across runs (engine determinism
    # rule).  Left rows get a constant; their order among themselves is
    # irrelevant (each carries the same last-right state).
    tie = (
        F.when(
            F.col("_side") == 0,
            F.xxhash64(*[F.col(f"_r_{c}") for c in payload]),
        ).otherwise(F.lit(0))
        if payload
        else F.lit(0)
    )
    unioned = unioned.withColumn("_tie", tie)
    w = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left.columns,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in payload
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
