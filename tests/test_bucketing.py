"""Bucketed co-located joins (SURVEY §4 / project brief: "bucketing
for co-located joins"): two tables bucketed on the join key join with
ZERO exchanges — the layout that makes repeated fact⋈fact joins at
100 TB shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from omniengine_spark.sources import load_table

from .conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    left = ev.select("event_id", "user_id", "event_type")
    right = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))

    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS usr_bucketed")
    try:
        (
            left.write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .mode("overwrite")
            .saveAsTable("ev_bucketed")
        )
        (
            right.write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .mode("overwrite")
            .saveAsTable("usr_bucketed")
        )
        l = spark.table("ev_bucketed")
        r = spark.table("usr_bucketed")
        joined = l.join(r, "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:800]
        # and it is still correct
        assert joined.count() == left.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")
        spark.sql("DROP TABLE IF EXISTS usr_bucketed")


def test_bucket_pruning_on_key_filter(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    spark.sql("DROP TABLE IF EXISTS ev_pruned")
    try:
        (
            ev.select("event_id", "user_id", "value")
            .write.bucketBy(8, "user_id")
            .mode("overwrite")
            .saveAsTable("ev_pruned")
        )
        t = spark.table("ev_pruned")
        some_user = t.select("user_id").head()["user_id"]
        # filter-only scans get bucketing auto-disabled ("not useful"),
        # which also drops pruning — force the bucketed scan to show
        # the pruning behavior
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        try:
            plan = (
                t.filter(F.col("user_id") == some_user)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                "true",
            )
        # bucket pruning: the scan reports selected buckets
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:800]
    finally:
        spark.sql("DROP TABLE IF EXISTS ev_pruned")
