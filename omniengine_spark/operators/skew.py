"""Skew mitigation (SURVEY §4: "salting for skew").

AQE splits skewed JOIN partitions at runtime, but a skewed groupBy
key still funnels one reducer: the classic fix is two-phase salted
aggregation — phase 1 aggregates (key, salt) so the hot key spreads
over ``n_salts`` reducers, phase 2 merges the partials.  Algebraic
(sum/count/min/max-style) aggregates commute with this split, so the
result is exactly the unsalted plan's.

``salted_join`` is the pre-AQE pattern for a hot join key: salt the
big side, replicate the small side across all salts.  Kept for
engines/configs without AQE and as the building block for bounded
replication joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGEABLE = {"sum", "count", "min", "max"}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output column →
    (function, input column) with function in {sum, count, min, max}.

    The salt is deterministic (hash of ``salt_from`` or of all key +
    input columns), so replays are stable.
    """
    bad = {f for f, _ in aggs.values()} - MERGEABLE
    if bad:
        raise ValueError(f"non-mergeable aggregate(s): {sorted(bad)}")

    # Default salt mixes a per-row id into the content hash: fully
    # identical duplicate rows of a hot key would otherwise all hash to
    # one salt, defeating the mitigation in exactly the duplicate-heavy
    # case it targets.  The salt only routes rows across reducers —
    # algebraic aggregates merge identically whatever the routing — so
    # the row-id's run-to-run instability never reaches the result.
    salt_cols = (
        [F.col(salt_from)]
        if salt_from
        else [F.col(c) for c in df.columns]
        + [F.monotonically_increasing_id()]
    )
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts))
    )

    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    # merge: count partials merge by SUM, the rest by themselves
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (fn, _) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side
    replicated ``n_salts`` times, so a hot key spreads over
    ``n_salts`` reducers instead of one."""
    # per-row id in the salt hash: see salted_agg — duplicate rows must
    # spread, and the join result is independent of which salt a big-
    # side row takes (the small side is replicated across all salts)
    big_s = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(
                *[F.col(c) for c in big.columns],
                F.monotonically_increasing_id(),
            ),
            F.lit(n_salts),
        ),
    )
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = big_s.join(small_r, [key, "_salt"], how)
    return out.drop("_salt")
