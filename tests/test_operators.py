"""Unit tests for operator edge cases the oracle-parity suite can't
see: stub dispatch, empty/degenerate inputs, exact-arithmetic rules.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from omniengine_spark.operators import multimodal as M
from omniengine_spark.operators.dedup import shingle_docs
from omniengine_spark.operators.replay import floor_balance_replay


def test_real_media_header_raises():
    # PNG header must hit the real-codec path, which is stubbed
    with pytest.raises(NotImplementedError):
        M._decode_backend(b"\x89PNG\r\n" + b"\x00" * 64, "image")


def test_fake_decode_deterministic():
    meta = M._decode_backend(b"hello world", "image")
    assert meta == {"n_bytes": 11, "width": 12, "height": 78}


def test_shingle_docs_drops_short_texts(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "too short"), (3, "")],
        ["doc_id", "text"],
    )
    out = shingle_docs(df, "doc_id", "text", n=3)
    rows = {r["doc_id"]: r["sh"] for r in out.collect()}
    assert set(rows) == {1}
    assert rows[1] == ["a b c", "b c d"]


def test_floor_balance_replay_clips_first_row(spark):
    df = spark.createDataFrame(
        [(1, 10, "2020-01-01 00:00:00", -5),
         (2, 10, "2020-01-01 00:01:00", 3),
         (3, 10, "2020-01-01 00:02:00", -1)],
        ["event_id", "user_id", "ts", "delta_cents"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["event_id"]: r["balance_cents"]
        for r in floor_balance_replay(df).collect()
    }
    # b1 = max(0,-5) = 0; b2 = 3; b3 = 2
    assert out == {1: 0, 2: 3, 3: 2}


def test_frame_sampler_covers_all_bytes(spark):
    df = spark.createDataFrame(
        [(2, "x" * 2500)], ["doc_id", "text"]
    )  # doc_id % 3 == 2 → video
    media = M.attach_binary_payload(df)
    frames = M.sample_frames(media).collect()
    assert [f["frame_idx"] for f in frames] == [0, 1, 2]
    assert [f["frame_offset"] for f in frames] == [0, 1024, 2048]


def test_floor_balance_replay_keeps_null_key_group(spark):
    # null entity keys are reachable (expand_deltas emits null address
    # when reference_address is null) — pandas groupby would silently
    # drop them without dropna=False, and the batch-boundary carry mask
    # must treat NaN == NaN as same-group.
    rows = [(1, None, "2020-01-01 00:00:00", 7),
            (2, None, "2020-01-01 00:01:00", -3),
            (3, 10, "2020-01-01 00:02:00", 5)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, delta_cents long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["event_id"]: r["balance_cents"]
        for r in floor_balance_replay(df).collect()
    }
    assert out == {1: 7, 2: 4, 3: 5}
