"""Structured Streaming jobs — the reference's per-block incremental
loop (``omniEngine.py:109-232``) re-expressed as real streams.

Each job is written so the *same* transformation runs over a file
stream with ``availableNow`` (drain-everything) semantics and lands in
a memory sink; the driver-facing plan wrappers in
``plans/streaming_plans.py`` then return the sink as a batch
DataFrame, which makes every streaming job oracle-checkable against
the equivalent batch SQL.

Scale notes: on a cluster the same code points at an arriving-file or
Kafka source with a real checkpoint location; state stores hold only
per-window/per-key aggregates, bounded by the watermark horizon
(reference analog: the 5 h mempool expiry, ``sql.py:327``).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omniengine_spark.sources import stream_table

_SINK_COUNTER = itertools.count()


def run_available_now(
    stream_df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Drain a finite stream into a memory sink; return it as a batch
    DataFrame.  availableNow processes all existing input in
    micro-batches then stops — the reference's catch-up-to-tip loop."""
    name = f"omni_stream_sink_{next(_SINK_COUNTER)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1 h windowed counts per event type with a 1 h
    watermark (X1/A5: the per-block txstats rollup as a stream).

    complete mode so every window emits even at end-of-stream; the
    watermark still bounds state on an unbounded source.
    """
    ev = stream_table(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "1 hour").alias("win"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("hour_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type",
            "n_events",
            "hour_value",
        )
    )
    return run_available_now(agg, "complete")


def deduped_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once counts from an at-least-once source: the stream is
    unioned with itself (every event delivered twice), then
    dropDuplicates on the event key collapses redeliveries —
    the reference's already-in-db existence check (J8/X3,
    ``sql.py:382-384``) as streaming state.
    """
    ev = stream_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    doubled = ev.unionByName(ev)  # simulated redelivery
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicates(
        ["event_id"]
    )
    counts = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique")
    )
    return run_available_now(counts, "complete")
