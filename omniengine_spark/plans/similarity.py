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


@query("sim_lsh_ann_topk")  # rows-only: approximate by construction
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.lsh_ann_topk(emb, "vec_id", "embedding", k=_K, n_planes=8)


@query("sim_ivf_ann_topk")  # rows-only: approximate by construction
def sim_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF: deterministic coarse quantizer + probe-limited search —
    the O(N·nprobe/k) scale path; recall vs brute force is pinned in
    tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(_N_QUERIES)
    return S.ivf_ann_topk(
        emb, queries, "vec_id", "embedding",
        k=_K, n_clusters=16, nprobe=4,
    )
