"""Similarity-search plans over ``embeddings``
(operators in operators/similarity.py).

The brute-force plan is the oracle-checked exact baseline (bit-exact
cosine: both engines fold doubles left-to-right); the LSH plan is the
approximate scale path and gets a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omniengine_spark.operators import similarity as S
from omniengine_spark.plans.registry import query
from omniengine_spark.sources import load_table

_N_QUERIES = 20  # first N vec_ids serve as the query set
_K = 5


@query(
    "sim_bruteforce_cosine_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
      SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_N_QUERIES}
    ), scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS nbr_id,
             list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(e.v, e.v))) AS score
      FROM q JOIN e ON q.vec_id <> e.vec_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, nbr_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, nbr_id, CAST(rank AS INT) AS rank, score
    FROM ranked WHERE rank <= {_K}
    """,
)
def sim_bruteforce_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(_N_QUERIES)
    out = S.brute_force_topk(emb, queries, "vec_id", "embedding", k=_K)
    return out.withColumn("rank", F.col("rank").cast("int"))


# LSH planes are md5-derived constants (operators/similarity.py:
# deterministic_planes) — identical literals inlined into the Spark
# plan and the oracle, so the approximate result is still exactly
# checkable: same buckets, same candidates, same exact rescoring.
_N_PLANES = 8
_DIM = 64
_PLANES = S.deterministic_planes(seed=42, n_planes=_N_PLANES, dim=_DIM)


def _plane_lit(p: list[float]) -> str:
    return "[" + ", ".join(repr(c) for c in p) + "]"


_BUCKET_SQL = " | ".join(
    f"(CASE WHEN list_dot_product(v, {_plane_lit(_PLANES[p])}) >= 0 "
    f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << {p})"
    for p in range(_N_PLANES)
)


@query(
    "sim_lsh_ann_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), b AS (
      SELECT vec_id, v, {_BUCKET_SQL} AS bucket FROM e
    ), scored AS (
      SELECT a.vec_id AS query_id, c.vec_id AS nbr_id,
             list_dot_product(a.v, c.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS score
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, nbr_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, nbr_id, CAST(rank AS INT) AS rank, score
    FROM ranked WHERE rank <= {_K}
    """,
)
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.lsh_ann_topk(
        emb, "vec_id", "embedding", k=_K, n_planes=_N_PLANES, dim=_DIM
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


def _cos_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b})))"
    )


_MD5_ID_HASH = """
      CAST(list_sum(
        [CAST(strpos('0123456789abcdef',
                     substr(md5(CAST(vec_id AS VARCHAR)), i, 1)) - 1
              AS BIGINT) << (4 * (15 - i)) for i in range(1, 16)])
        AS BIGINT)
"""


@query(
    "sim_ivf_ann_topk",
    # Portable IVF (operators/similarity.py:ivf_ann_topk_portable):
    # md5-seeded centroids, no Lloyd averaging, so the oracle rebuilds
    # the identical index and the approximate result is exactly
    # checkable.  The kmeans gemm variant keeps its recall pin in
    # tests/test_similarity.py.
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), hh AS (
      SELECT vec_id, v, {_MD5_ID_HASH} AS h FROM e
    ), seeds AS (
      SELECT vec_id AS cluster, v AS cvec FROM hh ORDER BY h, cluster
      LIMIT 16
    ), asg AS (
      SELECT e.vec_id AS nbr_id, e.v AS nbr_vec, s.cluster,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.v', 's.cvec')} DESC, s.cluster ASC)
               AS arank
      FROM e CROSS JOIN seeds s
    ), lists AS (
      SELECT nbr_id, nbr_vec, cluster FROM asg WHERE arank = 1
    ), q AS (
      SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_N_QUERIES}
    ), qasg AS (
      SELECT q.vec_id AS query_id, q.v AS query_vec, s.cluster,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_cos_sql('q.v', 's.cvec')} DESC, s.cluster ASC)
               AS arank
      FROM q CROSS JOIN seeds s
    ), probes AS (
      SELECT query_id, query_vec, cluster FROM qasg WHERE arank <= 4
    ), scored AS (
      SELECT p.query_id, l.nbr_id,
             {_cos_sql('p.query_vec', 'l.nbr_vec')} AS score
      FROM probes p JOIN lists l ON p.cluster = l.cluster
      WHERE p.query_id <> l.nbr_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, nbr_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, nbr_id, CAST(rank AS INT) AS rank, score
    FROM ranked WHERE rank <= {_K}
    """,
)
def sim_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(_N_QUERIES)
    out = S.ivf_ann_topk_portable(
        emb, queries, "vec_id", "embedding",
        k=_K, n_clusters=16, nprobe=4,
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


# PQ-ADC: the memory-bounded ANN scale path (codes scanned instead of
# vectors; operators/similarity.py pq_* for the design note).  The
# md5-derived codebook is inlined into the oracle as a VALUES table;
# DuckDB re-derives the same codes (argmin over exact doubles) and
# the same single-fold ADC dot, so the approximate result is exactly
# checkable like the LSH/IVF plans.
_PQ_M, _PQ_K, _PQ_SUBDIM = 8, 16, 8
_PQ_BOOKS = S.pq_codebooks(seed=42, m=_PQ_M, k=_PQ_K, subdim=_PQ_SUBDIM)

_PQ_CB_VALUES = ",\n      ".join(
    f"({mm}, {cc}, {_plane_lit(_PQ_BOOKS[mm][cc])})"
    for mm in range(_PQ_M)
    for cc in range(_PQ_K)
)


@query(
    "sim_pq_ann_topk",
    oracle=f"""
    WITH cb(m, c, cent) AS (VALUES
      {_PQ_CB_VALUES}
    ), e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), dist AS (
      SELECT e.vec_id, cb.m, cb.c, cb.cent,
             list_dot_product(cb.cent, cb.cent)
               - 2 * list_dot_product(
                   list_slice(e.v, cb.m*{_PQ_SUBDIM}+1,
                              cb.m*{_PQ_SUBDIM}+{_PQ_SUBDIM}),
                   cb.cent) AS d
      FROM e CROSS JOIN cb
    ), codes AS (
      SELECT vec_id, m, cent FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id, m ORDER BY d, c) AS rn
        FROM dist
      ) WHERE rn = 1
    ), recon AS (
      SELECT vec_id, flatten(list(cent ORDER BY m)) AS rv
      FROM codes GROUP BY vec_id
    ), q AS (
      SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_N_QUERIES}
    ), scored AS (
      SELECT q.vec_id AS query_id, r.vec_id AS nbr_id,
             list_dot_product(q.v, r.rv) AS adc_score
      FROM q JOIN recon r ON q.vec_id <> r.vec_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY adc_score DESC, nbr_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, nbr_id, CAST(rank AS INT) AS rank, adc_score
    FROM ranked WHERE rank <= {_K}
    """,
)
def sim_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(_N_QUERIES)
    return S.pq_adc_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        knn=_K,
        seed=42,
        m=_PQ_M,
        k=_PQ_K,
        dim=64,
    )


_MD5_ID_LONG = (
    "CAST(CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) "
    "AS UBIGINT) AS BIGINT)"
)


@query(
    "sim_ivfpq_ann_topk",
    # IVF coarse lists (portable md5-seed quantizer, as
    # sim_ivf_ann_topk) scanned via PQ reconstructions (as
    # sim_pq_ann_topk) — the composite billion-scale index, still
    # exactly checkable because both quantizers are deterministic.
    oracle=f"""
    WITH cb(m, c, cent) AS (VALUES
      {_PQ_CB_VALUES}
    ), e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), hh AS (
      SELECT vec_id, v, {_MD5_ID_LONG} AS h FROM e
    ), seeds AS (
      SELECT vec_id AS cluster, v AS cvec FROM hh ORDER BY h, cluster
      LIMIT 16
    ), asg AS (
      SELECT e.vec_id AS nbr_id, s.cluster,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_cos_sql('e.v', 's.cvec')} DESC, s.cluster ASC)
               AS arank
      FROM e CROSS JOIN seeds s
    ), lists AS (
      SELECT nbr_id, cluster FROM asg WHERE arank = 1
    ), dist AS (
      SELECT e.vec_id, cb.m, cb.c, cb.cent,
             list_dot_product(cb.cent, cb.cent)
               - 2 * list_dot_product(
                   list_slice(e.v, cb.m*{_PQ_SUBDIM}+1,
                              cb.m*{_PQ_SUBDIM}+{_PQ_SUBDIM}),
                   cb.cent) AS d
      FROM e CROSS JOIN cb
    ), codes AS (
      SELECT vec_id, m, cent FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id, m ORDER BY d, c) AS rn
        FROM dist
      ) WHERE rn = 1
    ), recon AS (
      SELECT vec_id AS nbr_id, flatten(list(cent ORDER BY m)) AS rv
      FROM codes GROUP BY vec_id
    ), q AS (
      SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_N_QUERIES}
    ), qasg AS (
      SELECT q.vec_id AS query_id, q.v AS query_vec, s.cluster,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_cos_sql('q.v', 's.cvec')} DESC, s.cluster ASC)
               AS arank
      FROM q CROSS JOIN seeds s
    ), probes AS (
      SELECT query_id, query_vec, cluster FROM qasg WHERE arank <= 4
    ), scored AS (
      SELECT p.query_id, l.nbr_id,
             list_dot_product(p.query_vec, r.rv) AS adc_score
      FROM probes p
      JOIN lists l ON p.cluster = l.cluster
      JOIN recon r ON r.nbr_id = l.nbr_id
      WHERE p.query_id <> l.nbr_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY adc_score DESC, nbr_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, nbr_id, CAST(rank AS INT) AS rank, adc_score
    FROM ranked WHERE rank <= {_K}
    """,
)
def sim_ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(_N_QUERIES)
    return S.ivfpq_ann_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        knn=_K,
        n_clusters=16,
        nprobe=4,
        seed=42,
        m=_PQ_M,
        k=_PQ_K,
        dim=64,
    )
