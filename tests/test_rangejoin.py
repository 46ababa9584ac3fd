"""Bucketed range join: equivalence with the naive formulation,
edge alignment, left-join semantics, and the no-cartesian plan shape.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from omniengine_spark.operators.rangejoin import bucketed_range_join


@pytest.fixture(scope="module")
def frames(spark):
    # Points at 0..99; intervals of assorted spans, including
    # bucket-straddling, sub-bucket, empty, and exact-edge cases.
    points = spark.range(100).select(F.col("id").alias("p"))
    intervals = spark.createDataFrame(
        [
            (1, 5, 15),    # straddles bucket edge at 10
            (2, 20, 21),   # single point: p=20 only
            (3, 30, 30),   # empty (hi exclusive)
            (4, 38, 62),   # spans 3 buckets
            (5, 90, 200),  # runs past the points domain
            (6, 40, 50),   # exact bucket alignment
        ],
        ["iv_id", "lo", "hi"],
    )
    return points, intervals


def _expected(points, intervals):
    out = (
        points.crossJoin(intervals)
        .filter((F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
        .select("p", "iv_id", "lo", "hi")
    )
    return sorted((r["p"], r["iv_id"]) for r in out.collect())


@pytest.mark.parametrize("width", [1, 7, 10, 1000])
def test_matches_naive_join_at_any_width(spark, frames, width):
    points, intervals = frames
    got = bucketed_range_join(
        points,
        intervals,
        point_col="p",
        lo_col="lo",
        hi_col="hi",
        bucket_width=width,
    )
    assert sorted(
        (r["p"], r["iv_id"]) for r in got.collect()
    ) == _expected(points, intervals)


def test_each_match_produced_exactly_once(spark, frames):
    points, intervals = frames
    got = bucketed_range_join(
        points,
        intervals,
        point_col="p",
        lo_col="lo",
        hi_col="hi",
        bucket_width=10,
    )
    pairs = [(r["p"], r["iv_id"]) for r in got.collect()]
    assert len(pairs) == len(set(pairs))


def test_left_join_keeps_unmatched_points(spark, frames):
    points, intervals = frames
    got = bucketed_range_join(
        points,
        intervals,
        point_col="p",
        lo_col="lo",
        hi_col="hi",
        bucket_width=10,
        how="left",
    )
    rows = got.collect()
    matched = {(r["p"], r["iv_id"]) for r in rows if r["iv_id"] is not None}
    unmatched = {r["p"] for r in rows if r["iv_id"] is None}
    assert matched == set(_expected(points, intervals))
    # e.g. p=0..4 precede every interval; p=16 falls in a gap
    assert {0, 1, 2, 3, 4, 16} <= unmatched
    assert unmatched.isdisjoint({p for p, _ in matched})


def test_plan_is_equi_join_not_cartesian(spark, frames):
    points, intervals = frames
    got = bucketed_range_join(
        points,
        intervals,
        point_col="p",
        lo_col="lo",
        hi_col="hi",
        bucket_width=10,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rejects_bad_arguments(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError):
        bucketed_range_join(
            points, intervals,
            point_col="p", lo_col="lo", hi_col="hi", bucket_width=0,
        )
    with pytest.raises(ValueError):
        bucketed_range_join(
            points, intervals,
            point_col="p", lo_col="lo", hi_col="hi",
            bucket_width=10, how="full",
        )


@pytest.fixture(scope="module")
def interval_frames(spark):
    a = spark.createDataFrame(
        [(1, 0, 10), (2, 8, 12), (3, 25, 40), (4, 39, 41), (5, 50, 50)],
        ["a_id", "a_lo", "a_hi"],
    )
    b = spark.createDataFrame(
        [(1, 9, 30), (2, 0, 5), (3, 45, 60), (4, 10, 11)],
        ["b_id", "b_lo", "b_hi"],
    )
    return a, b


def _expected_overlaps(a, b):
    out = a.crossJoin(b).filter(
        (F.col("a_lo") < F.col("b_hi")) & (F.col("b_lo") < F.col("a_hi"))
    )
    return sorted((r["a_id"], r["b_id"]) for r in out.collect())


@pytest.mark.parametrize("width", [1, 3, 10, 100])
def test_interval_overlap_matches_naive(spark, interval_frames, width):
    from omniengine_spark.operators.rangejoin import interval_overlap_join

    a, b = interval_frames
    got = interval_overlap_join(
        a, b,
        left_lo="a_lo", left_hi="a_hi",
        right_lo="b_lo", right_hi="b_hi",
        bucket_width=width,
    )
    pairs = [(r["a_id"], r["b_id"]) for r in got.collect()]
    # canonical-bucket emission: exactly once per overlapping pair
    assert len(pairs) == len(set(pairs))
    assert sorted(pairs) == _expected_overlaps(a, b)
