"""Multimodal plans: binary payload decode / frame sampling / feature
extraction over ``documents`` (operators in operators/multimodal.py).

The decode kernel is a deterministic stub (no codecs in this
environment), which makes the metadata plans fully oracle-checkable:
the oracle reproduces the same arithmetic on octet lengths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from omniengine_spark.operators import multimodal as M
from omniengine_spark.plans.registry import query
from omniengine_spark.sources import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.attach_binary_payload(
        load_table(spark, sf_dir, "documents")
    )


@query(
    "mm_decode_meta",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_kind,
           octet_length(encode(text)) AS n_bytes,
           octet_length(encode(text)) % 640 + 1 AS width,
           (octet_length(encode(text)) * 7) % 480 + 1 AS height
    FROM documents
    """,
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.decode_media_meta(_media(spark, sf_dir))


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id,
           unnest(range(CAST(ceil(octet_length(encode(text)) / 1024.0)
                             AS BIGINT))) AS frame_idx,
           unnest(range(CAST(ceil(octet_length(encode(text)) / 1024.0)
                             AS BIGINT))) * 1024 AS frame_offset
    FROM documents
    WHERE doc_id % 3 = 2
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.sample_frames(_media(spark, sf_dir))


# Per-nibble byte-count histogram as 16 scalar columns.  The corpus is
# pure ASCII (verified: octet_length == length for every doc), so the
# oracle reproduces the byte counts from code points exactly.
_BIN_EXPRS = ",\n           ".join(
    f"CAST(len(list_filter(codes, c -> c // 16 = {i})) AS BIGINT)"
    f" AS bin_{i:02d}"
    for i in range(16)
)


@query(
    "mm_byte_histogram",
    oracle=f"""
    SELECT doc_id,
           {_BIN_EXPRS}
    FROM (
      SELECT doc_id,
             list_transform(regexp_split_to_array(text, ''),
                            x -> ascii(x)) AS codes
      FROM documents
    )
    """,
)
def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.byte_histogram_scalars(_media(spark, sf_dir))


@query(
    "mm_resize",
    # nearest-neighbor byte sampling onto a fixed 64×48 grid; corpus
    # is pure ASCII (see mm_byte_histogram), so the oracle replays the
    # sampling arithmetic over code points exactly
    oracle="""
    SELECT doc_id,
           CAST(64 AS INT) AS out_w,
           CAST(48 AS INT) AS out_h,
           CAST(CASE WHEN n > 0 THEN 3072 ELSE 0 END AS BIGINT)
             AS n_out_bytes,
           CAST(CASE WHEN n > 0 THEN list_sum(
                  list_transform(range(3072),
                                 i -> codes[(i * n) // 3072 + 1]))
                ELSE 0 END AS BIGINT) AS checksum
    FROM (
      SELECT doc_id,
             list_transform(regexp_split_to_array(text, ''),
                            x -> ascii(x)) AS codes,
             octet_length(encode(text)) AS n
      FROM documents
    )
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.resize_media(_media(spark, sf_dir))
