"""Bucketed range join: point-in-interval joins without an equi key.

The reference has no range/interval join at all (SURVEY §2.3 notes
their absence — the closest shape is the per-row "latest rate at or
before now" lookup, reference ``sql.py:282``).  A naive Spark
formulation of ``points JOIN intervals ON p >= lo AND p < hi`` has no
equi condition, so Catalyst can only pick BroadcastNestedLoopJoin
(fine while one side is small) or a cartesian product (fatal at
scale).

The scale path here is bucket decomposition, the same technique
behind Databricks' range-join hint and KDB's window joins:

1. choose a bucket width ``w`` in the units of the join dimension;
2. each point lands in exactly one bucket ``floor(p / w)``;
3. each interval is replicated to every bucket it overlaps
   (``sequence(floor(lo/w), floor(hi/w))`` + ``explode``);
4. an ordinary shuffled **equi** join on the bucket id pairs each
   point with every interval overlapping its bucket;
5. the residual predicate ``p >= lo AND p < hi`` removes the
   false positives within the bucket.

Each (point, interval) match is produced exactly once — the point
owns a single bucket — so no dedup pass is needed.  Cost scales with
``|points| + |intervals| × avg_span/w + |bucket collisions|``: the
width trades interval replication against residual-filter
selectivity, and should be set near the typical interval span.

Both sides shuffle-partition on the bucket id, so the join
parallelizes across the full cluster and AQE can handle bucket skew
(a hot time window) with the standard skew-join split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__bucket"


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` via an equi join on bucket ids.

    ``point_col``, ``lo_col`` and ``hi_col`` must be integral columns
    in the same unit (cast timestamps to ``unix_micros`` first);
    ``bucket_width`` is in that unit.  Column names must not collide
    across the two inputs.  ``how`` may be ``inner`` or ``left``
    (left keeps points with no matching interval).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type: {how}")

    p = points.withColumn(_BUCKET, F.floor(F.col(point_col) / bucket_width))
    iv = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                # hi is exclusive, but a point in hi's bucket can
                # still fall below hi — keep the last bucket and let
                # the residual filter decide.
                F.floor(F.col(hi_col) / bucket_width),
            )
        ),
    )
    residual = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) < F.col(hi_col)
    )
    if how == "inner":
        return p.join(iv, _BUCKET).filter(residual).drop(_BUCKET)
    # left: residual must live in the join condition, not a post-filter
    cond = (p[_BUCKET] == iv[_BUCKET]) & residual
    return p.join(iv, cond, "left").drop(_BUCKET)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
) -> DataFrame:
    """Interval×interval overlap join: pair every left interval with
    every right interval satisfying ``l_lo < r_hi AND r_lo < l_hi``
    (half-open overlap), again as a shuffled equi join on buckets.

    Both sides replicate to the buckets they span, so one overlapping
    pair can meet in several buckets.  Rather than a dedup shuffle,
    each pair is emitted only from its *canonical* bucket — the first
    bucket the two intervals share, ``floor(max(l_lo, r_lo) / w)`` —
    which costs one extra codegen'd comparison instead of a
    ``dropDuplicates`` over the (potentially huge) match set.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def span(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            _BUCKET,
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / bucket_width),
                    F.floor(F.col(hi) / bucket_width),
                )
            ),
        )

    l_ = span(left, left_lo, left_hi)
    r_ = span(right, right_lo, right_hi)
    overlap = (F.col(left_lo) < F.col(right_hi)) & (
        F.col(right_lo) < F.col(left_hi)
    )
    canonical = F.col(_BUCKET) == F.floor(
        F.greatest(F.col(left_lo), F.col(right_lo)) / bucket_width
    )
    return l_.join(r_, _BUCKET).filter(overlap & canonical).drop(_BUCKET)
