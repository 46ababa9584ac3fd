"""Persistent, reusable IVF index: build / query / incremental append.

Every ``sim_*`` plan through round 7 rebuilt its index inside the
query — fine for a correctness gate, wrong for a serving pipeline
where ONE index amortizes over thousands of queries.  This module
splits the portable seeded-IVF design
(``similarity.ivf_ann_topk_portable``) into its lifecycle stages and
persists the index as versioned warehouse tables
(``sources.versioned``):

    <root>/centroids   (cluster, cvec, cnrm)            — k rows
    <root>/lists       (cluster, nbr_id, nbr_vec, nbr_nrm)
                       partitioned by cluster           — N rows

Query-time the probe side is a broadcast of k centroid rows and the
list scan touches only ``nprobe`` of ``k`` cluster partitions —
partition pruning straight off the parquet layout, the actual 100 TB
serving shape (a full rebuild per query scans N·k; a persisted-index
query scans N·nprobe/k plus k·d floats).

Incremental append is assign-only: new vectors are assigned to the
FROZEN persisted centroids (never re-seeded — re-seeding would
reshuffle every existing list), and the appended snapshot commits as
the next table version.  ``append == full-assignment-with-same-
centroids`` holds exactly because per-vector assignment is
independent; tests/test_similarity.py pins it.

Everything stays oracle-reproducible: the quantizer is the same
md5-seeded selection, assignment/probing/rescoring are the same
codegen cosine folds, and parquet round-trips doubles exactly — so a
DuckDB oracle that rebuilds the index from the same seeds reproduces
the identical persisted-index query result.

Reference: the reference has no index lifecycle at all (it re-derives
state per query, ``sql.py:85-218``); this is the capability a 100 TB
similarity deployment adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from omniengine_spark.operators.dedup import md5_token_hash
from omniengine_spark.operators.similarity import _dot, _norm


def seeded_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
) -> DataFrame:
    """The portable deterministic quantizer: centroids are the
    ``n_clusters`` vectors with the md5-smallest ids — no Lloyd
    averaging, so no float-accumulation ordering to diverge between
    engines.  (cluster, cvec, cnrm)."""
    h = md5_token_hash(F.col(id_col).cast("string"))
    return (
        vectors.select(
            F.col(id_col).alias("cluster"),
            F.col(vec_col).alias("cvec"),
            h.alias("h"),
        )
        .orderBy("h", "cluster")
        .limit(n_clusters)
        .select("cluster", "cvec", _norm(F.col("cvec")).alias("cnrm"))
    )


def assign_lists(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverted lists: each vector joins its single nearest centroid
    (cosine desc, cluster asc).  Assign-only by design: works
    identically for the initial build and for appending a new shard
    against FROZEN centroids.  (cluster, nbr_id, nbr_vec, nbr_nrm).

    The argmax is a ``max_by`` aggregation, NOT a row_number window.
    The window shuffles ALL N·k candidate rows (vector payloads
    included) and sorts them per partition — at 500k vectors × 475
    centroids a 214M-row exchange.  ``max_by`` plans as a
    SortAggregate (struct-keyed aggregates have no mutable buffer),
    but with PARTIAL aggregation: each task collapses its k candidate
    rows per vector to one BEFORE the exchange, so only N rows
    shuffle.  Measured at the 100k-vector rung: 5.8 s → 1.1 s
    (min-of-2, same box) — 5× from shuffle-volume alone.  Tie
    semantics are identical to ``ORDER BY csim DESC, cluster ASC``:
    the ordering key is ``struct(csim, -cluster)``, unique per
    (vector, centroid) because the negated cluster id breaks csim
    ties — bit-for-bit the oracle's ROW_NUMBER pick, NaN ordering
    included (Spark ranks NaN greatest in both code paths)."""
    v = vectors.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        _norm(F.col(vec_col)).alias("nbr_nrm"),
    )
    csim = _dot(F.col("nbr_vec"), F.col("cvec")) / (
        F.col("nbr_nrm") * F.col("cnrm")
    )
    key = F.struct(
        csim.alias("csim"), (-F.col("cluster")).alias("negc")
    )
    val = F.struct(
        F.col("cluster").alias("cluster"),
        F.col("nbr_vec").alias("nbr_vec"),
        F.col("nbr_nrm").alias("nbr_nrm"),
    )
    return (
        v.crossJoin(F.broadcast(centroids))
        .select("nbr_id", key.alias("k"), val.alias("v"))
        .groupBy("nbr_id")
        .agg(F.max_by("v", "k").alias("best"))
        .select(
            F.col("best.cluster").alias("cluster"),
            "nbr_id",
            F.col("best.nbr_vec").alias("nbr_vec"),
            F.col("best.nbr_nrm").alias("nbr_nrm"),
        )
    )


def query_index(
    queries: DataFrame,
    centroids: DataFrame,
    lists: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k over a (persisted) IVF index: queries pick their
    ``nprobe`` nearest cells from the broadcast centroid table, join
    only those inverted lists (partition-prunable on ``cluster``),
    exact-rescore, rank.  Bit-identical to
    ``ivf_ann_topk_portable``'s probe half — same folds, same tie
    rules — so the same SQL oracle checks both."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        _norm(F.col(vec_col)).alias("query_nrm"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cluster").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "query_vec",
            "query_nrm",
            "cluster",
            (
                _dot(F.col("query_vec"), F.col("cvec"))
                / (F.col("query_nrm") * F.col("cnrm"))
            ).alias("csim"),
        )
        .withColumn("arank", F.row_number().over(wq))
        .filter(F.col("arank") <= nprobe)
        .select("query_id", "query_vec", "query_nrm", "cluster")
    )
    # each vector sits in exactly one list, so a query meets each
    # neighbor at most once — no dedup shuffle needed
    scored = (
        probes.join(lists, "cluster")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select(
            "query_id",
            "nbr_id",
            (
                _dot(F.col("query_vec"), F.col("nbr_vec"))
                / (F.col("query_nrm") * F.col("nbr_nrm"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "score")
    )


def in_cluster_drops(
    a: DataFrame, b: DataFrame, threshold: float
) -> DataFrame:
    """SemDeDup drop set over (cluster, nbr_id, nbr_vec, nbr_nrm)
    list frames: for every same-cluster pair with cosine ≥ threshold,
    the GREATER id drops.  ``a`` = ``b`` gives the classic in-cluster
    pass; ``a`` = a shard's lists and ``b`` = the full lists gives the
    incremental pass (every new pair has a shard member, and ids-
    differ + greatest-id normalization covers both orientations in
    ONE scan of the big frame).  Drops are MONOTONE — a vector once
    dropped can never be un-dropped by later ingests (new vectors add
    pairs, never remove them) — which is what lets an incremental
    pipeline persist drops as append-only deltas."""
    pair_sim = _dot(F.col("a.nbr_vec"), F.col("b.nbr_vec")) / (
        F.col("a.nbr_nrm") * F.col("b.nbr_nrm")
    )
    return (
        a.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.nbr_id") != F.col("b.nbr_id")),
        )
        .filter(pair_sim >= threshold)
        .select(
            F.greatest("a.nbr_id", "b.nbr_id").alias("vec_id")
        )
        .distinct()
    )
