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


def test_png_wav_roundtrip_real_bytes():
    """Spec-valid containers: PNG magic + CRC'd IHDR, RIFF/WAVE via
    the stdlib reader; corruption is detected, not ignored."""
    png = M.make_png(17, 9)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert M.parse_png(png) == (17, 9)
    corrupted = png[:20] + bytes([png[20] ^ 0xFF]) + png[21:]
    try:
        M.parse_png(corrupted)
        raised = False
    except ValueError:
        raised = True
    assert raised

    wav = M.make_wav(16000, 2, 120)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    assert M.parse_wav(wav) == (16000, 2, 120)


def test_probe_media_decodes_real_containers(spark):
    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    out = {
        r["doc_id"]: r
        for r in M.probe_media(M.attach_real_payload(docs)).collect()
    }
    assert out[0]["container"] == "png"
    assert (out[0]["width"], out[0]["height"]) == (1, 1)
    assert out[1]["container"] == "wav"
    assert out[1]["sample_rate"] == 12000
    assert out[1]["n_frames"] == 53
    # variant arithmetic matches _variant_params for every row
    for d, r in out.items():
        p = M._variant_params(d % 40)
        if p["container"] == "png":
            assert (r["width"], r["height"]) == (p["width"], p["height"])
        else:
            assert r["n_frames"] == p["n_frames"]


def test_content_addressed_duplicates(spark):
    """doc_id and doc_id+40 produce byte-identical payloads; distinct
    variants produce distinct digests."""
    import pyspark.sql.functions as F

    docs = spark.range(80).withColumnRenamed("id", "doc_id")
    digests = (
        M.attach_real_payload(docs)
        .select("doc_id", F.md5("payload").alias("d"))
        .collect()
    )
    by_doc = {r["doc_id"]: r["d"] for r in digests}
    assert all(by_doc[i] == by_doc[i + 40] for i in range(40))
    assert len({by_doc[i] for i in range(40)}) == 40


def test_merge_columns_partial_update(spark):
    from omniengine_spark.operators.merge import merge_columns, merge_upsert
    from pyspark.sql import functions as F

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k int, name string, bal int",
    )
    source = spark.createDataFrame(
        [(2, "ZZ", 200), (4, "d", 40)],
        "k int, name string, bal int",
    )
    out = {
        r["k"]: (r["name"], r["bal"])
        for r in merge_columns(target, source, ["k"], ["bal"]).collect()
    }
    # matched row 2: bal updated, name KEPT; row 4 inserted as-is
    assert out == {
        1: ("a", 10),
        2: ("b", 200),
        3: ("c", 30),
        4: ("d", 40),
    }
    # full-row merge with delete: row 2 deleted (bal >= 100), 4 inserted
    out2 = {
        r["k"]: r["bal"]
        for r in merge_upsert(
            target, source, ["k"], delete_condition=F.col("bal") >= 100
        ).collect()
    }
    assert out2 == {1: 10, 3: 30, 4: 40}


def test_connected_components_empty_pairs_short_circuits(spark):
    """A clean corpus (zero near-dup pairs) must label every node as
    its own cluster WITHOUT running max_iters rounds of empty-frame
    propagation jobs."""
    import time

    from omniengine_spark.operators.dedup import connected_components

    nodes = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    t = time.time()
    out = connected_components(nodes, pairs, "doc_id", max_iters=50)
    rows = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    elapsed = time.time() - t
    assert rows == {i: i for i in range(50)}
    # 50 propagation rounds of checkpoint+collect would take far
    # longer than the single isEmpty probe
    assert elapsed < 10, elapsed
