"""Streaming-shaped layer (SURVEY §2.9): incremental catch-up,
watermarked windows, stream-stream joins, exactly-once dedup over
at-least-once delivery."""

from omniengine_spark.streaming.jobs import (
    click_purchase_attribution,
    deduped_type_counts,
    hourly_counts_append,
    hourly_event_counts,
    exactly_once_warehouse_sink,
    offer_expiry_with_timers,
    stream_static_enrichment,
    run_available_now,
    sessionize_with_state,
    socket_event_counts,
)

__all__ = [
    "click_purchase_attribution",
    "deduped_type_counts",
    "hourly_counts_append",
    "hourly_event_counts",
    "exactly_once_warehouse_sink",
    "offer_expiry_with_timers",
    "stream_static_enrichment",
    "run_available_now",
    "sessionize_with_state",
    "socket_event_counts",
]
