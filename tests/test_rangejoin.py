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
