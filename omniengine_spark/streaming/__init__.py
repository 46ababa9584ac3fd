"""Streaming-shaped layer (SURVEY §2.9): incremental catch-up,
watermarked windows, exactly-once dedup over at-least-once delivery."""

from omniengine_spark.streaming.jobs import (
    sessionize_with_state,
    deduped_type_counts,
    hourly_event_counts,
    run_available_now,
)

__all__ = [
    "sessionize_with_state",
    "deduped_type_counts",
    "hourly_event_counts",
    "run_available_now",
]
