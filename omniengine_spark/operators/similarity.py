"""Similarity search over embedding columns.

The ladder, cheapest-scan first: brute-force cosine top-k (exact
baseline, O(Q·N) pairs), multi-table hyperplane LSH (candidates only
within colliding buckets, union over tables), seeded IVF (nprobe of
n_clusters inverted lists), PQ with ADC shortlist + exact re-rank
(scans M-byte codes instead of vectors), and IVF-PQ (coarse pruning ×
codes — the billion-scale layout).  The exact all-pairs form is
``cosine_pair_join`` (blocked gemm, both tile inputs AND the sims
output bounded per task).

Dot products are ``zip_with``+``aggregate`` folds — strict
left-to-right double accumulation, bit-identical to the oracle's
sequential loop; per-vector norms are hoisted out of per-pair scoring
(same folds, same division order, so still bit-exact).  Every
quantizer is deterministic (md5-derived planes / md5-smallest seed
vectors), which is what makes the APPROXIMATE paths exactly
oracle-checkable.

Scale: candidate generation shuffles on (table, bucket) / cluster /
code partitions; AQE splits hot buckets; recall floors are pinned in
tests/test_similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark.sql import types as T

from omniengine_spark.operators.dedup import md5_token_hash


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, in double."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    queries is broadcast (Q small); ranking is a per-query window with
    a deterministic (score desc, id asc) tie order.
    """
    # norms computed once per row before the join (bit-identical to
    # the per-pair cosine: same folds, same division order)
    v = vectors.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        _norm(F.col(vec_col)).alias("nbr_nrm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        _norm(F.col(vec_col)).alias("query_nrm"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
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


def cosine_pair_join(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    margin: float = 1e-9,
    n_blocks: int | None = None,
    target_block_bytes: int = 128 << 20,
) -> DataFrame:
    """All pairs with cosine ≥ threshold, exact — fully distributed.

    Two phases: (1) candidate generation as a BLOCK-partitioned
    matrix multiply: vectors hash into ``n_blocks`` tiles, every tile
    pair (bi ≤ bj) cogroups once, and each cogroup runs one BLAS gemm
    over its two tiles inside ``applyInPandas``.  Nothing is
    collected to the driver, and no single executor ever holds more
    than two tiles (~``target_block_bytes`` each).  (2) exact
    verification of candidates with the strict left-to-right fold
    (``cosine``), which is bit-identical to the oracle's sequential
    loop.  The gemm uses pairwise summation so its value can differ
    from the sequential fold by ~d·ε; the ``margin`` widens the
    candidate cut so no true pair is lost, and verification restores
    exactness.

    Scale: shuffle volume is 2·n_blocks·|V| (each vector lands in
    n_blocks tile pairs per side) — the standard √-replication cost
    of dense blocked matmul.  With 128 MB tiles a 1 M × 768 corpus is
    ~48 blocks and ~96× replication of 6 GB ≈ 0.6 TB shuffled across
    the cluster, versus a hard driver OOM before; corpora that are
    mostly-sparse in similarity should prefer ``lsh_ann_topk``.
    ``n_blocks=None`` sizes tiles from a count+head probe.
    """
    spark = vectors.sparkSession
    if n_blocks is None:
        first = vectors.select(vec_col).head(1)
        if not first:
            n_blocks = 1
        else:
            dim = len(first[0][0])
            n_rows = vectors.count()
            by_input = -(-n_rows * dim * 8 // target_block_bytes)
            # the sims matrix of a tile pair is tile_rows² doubles —
            # an input-only bound let a 20k-row corpus fit one tile
            # and allocate a 3.2 GB sims block in a single task; cap
            # tile_rows so sims stays ≤ target_block_bytes as well
            max_tile_rows = max(
                1, int((target_block_bytes / 8) ** 0.5)
            )
            by_output = -(-n_rows // max_tile_rows)
            n_blocks = max(1, by_input, by_output)
    nb = int(n_blocks)

    # both cogroup sides derive from `vectors`; disjoint column names
    # and per-side tile frames keep the self-join lineage unambiguous
    def side(idn: str, vecn: str, blk_key: str) -> DataFrame:
        tiles = (
            spark.range(nb)
            .select(F.col("id").cast("int").alias("bi"))
            .crossJoin(
                spark.range(nb).select(F.col("id").cast("int").alias("bj"))
            )
            .filter(F.col("bi") <= F.col("bj"))
        )
        s = vectors.select(
            F.col(id_col).cast("long").alias(idn),
            F.col(vec_col).alias(vecn),
        ).withColumn(
            "_blk", F.pmod(F.xxhash64(F.col(idn)), F.lit(nb)).cast("int")
        )
        return s.join(
            F.broadcast(tiles), s["_blk"] == F.col(blk_key)
        ).select("bi", "bj", idn, vecn)

    left = side("_lid", "_lvec", "bi")
    right = side("_rid", "_rvec", "bj")

    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
        ]
    )
    cut = threshold - margin

    def gemm_tile(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf) or not len(rpdf):
            return pd.DataFrame({"vec_a": [], "vec_b": []}).astype("int64")
        lmat = np.stack(
            [np.asarray(x, dtype=np.float64) for x in lpdf["_lvec"]]
        )
        lmat /= np.linalg.norm(lmat, axis=1, keepdims=True)
        rmat = np.stack(
            [np.asarray(x, dtype=np.float64) for x in rpdf["_rvec"]]
        )
        rmat /= np.linalg.norm(rmat, axis=1, keepdims=True)
        sims = lmat @ rmat.T
        ii, jj = np.nonzero(sims >= cut)
        pa = lpdf["_lid"].to_numpy()[ii]
        pb = rpdf["_rid"].to_numpy()[jj]
        if key[0] == key[1]:
            # diagonal tile: both sides identical — a<b dedupes the
            # orientation and drops self-pairs
            keep = pa < pb
            pa, pb = pa[keep], pb[keep]
        else:
            # off-diagonal: every cross pair appears exactly once —
            # canonicalize the orientation
            lo = np.minimum(pa, pb)
            hi = np.maximum(pa, pb)
            pa, pb = lo, hi
        return pd.DataFrame({"vec_a": pa, "vec_b": pb})

    cand = (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(gemm_tile, schema=out_schema)
    )
    a = vectors.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va")
    )
    b = vectors.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb")
    )
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            cosine(F.col("va"), F.col("vb")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids (by
    cosine) — one Arrow-batched gemm per batch against the broadcast
    centroid matrix.  nprobe=1 builds the index; nprobe>1 probes it.
    Output: (id, cluster, rank) with rank 0 = nearest.
    """
    # a tiny corpus can seed fewer centroids than nprobe — clamp, or
    # the executor kernel dies on mismatched array lengths
    nprobe = min(nprobe, len(centroids))
    spark = vectors.sparkSession
    cids = np.array([c[0] for c in centroids], dtype=np.int64)
    cmat = np.stack(
        [np.asarray(c[1], dtype=np.float64) for c in centroids]
    )
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((cids, cmat))

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("cluster", T.LongType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat = bc.value
        for pdf in batches:
            a = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            sims = a @ c_mat.T
            # deterministic top-nprobe: sort by (-sim, centroid id)
            order = np.lexsort((c_ids[None, :].repeat(len(a), 0), -sims))
            top = order[:, :nprobe]
            n = len(a)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(nprobe),
                    "cluster": c_ids[top].ravel(),
                    "rank": np.tile(
                        np.arange(nprobe, dtype=np.int32), n
                    ),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        assign, schema=schema
    )


def ivf_build_centroids(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF coarse quantizer: seed with the k vectors of
    smallest xxhash64(id) (a deterministic sample), refine with
    ``iters`` Lloyd passes.  Assignment is the gemm kernel above;
    the centroid update is one groupBy over exploded components —
    both fully distributed, only k·d floats ever reach the driver.
    """
    seeds = (
        vectors.select(id_col, vec_col)
        .withColumn("h", F.xxhash64(F.col(id_col)))
        .orderBy("h", id_col)
        .limit(k)
        .collect()
    )
    centroids = [
        (i, list(map(float, r[vec_col]))) for i, r in enumerate(seeds)
    ]
    for _ in range(iters):
        assigned = ivf_assign(vectors, centroids, id_col, vec_col, 1)
        comp = (
            vectors.select(id_col, vec_col)
            .join(assigned.select(id_col, "cluster"), id_col)
            .select(
                "cluster",
                F.posexplode_outer(F.col(vec_col)).alias("dim", "x"),
            )
        )
        means = (
            comp.groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("dm")
            )
            .select(
                "cluster",
                F.transform("dm", lambda s: s["m"]).alias("centroid"),
            )
            .collect()
        )
        by_cluster = {r["cluster"]: list(r["centroid"]) for r in means}
        centroids = [
            (cid, by_cluster.get(cid, vec)) for cid, vec in centroids
        ]
    return centroids


def ivf_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 2,
) -> DataFrame:
    """IVF approximate top-k: search only the inverted lists of the
    query's ``nprobe`` nearest centroids.  Work per query drops from
    O(N) to O(N·nprobe/n_clusters); recall is tunable via nprobe.
    """
    centroids = ivf_build_centroids(
        vectors, n_clusters, iters, id_col, vec_col
    )
    lists = ivf_assign(vectors, centroids, id_col, vec_col, 1).select(
        F.col(id_col).alias("nbr_id"), "cluster"
    )
    v = vectors.select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec")
    ).join(lists, "nbr_id")
    probes = ivf_assign(queries, centroids, id_col, vec_col, nprobe).select(
        F.col(id_col).alias("query_id"), "cluster"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    ).join(probes, "query_id")
    scored = (
        q.join(v, "cluster")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select(
            "query_id",
            "nbr_id",
            cosine(F.col("query_vec"), F.col("nbr_vec")).alias("score"),
        )
        .dropDuplicates(["query_id", "nbr_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "score")
    )


def deterministic_planes(
    seed: int, n_planes: int, dim: int
) -> list[list[float]]:
    """Hyperplane constants derived from md5(seed:plane:dim-index).

    md5 is bit-identical in Python hashlib, Spark, and DuckDB, so the
    same constants can be rebuilt (or inlined) on every engine — the
    SQL oracle reproduces the exact buckets.  Components are exact
    multiples of 2^-15 in [-1, 1), so their decimal literals round-trip
    exactly through any parser.
    """
    import hashlib

    return [
        [
            int(
                hashlib.md5(f"{seed}:{p}:{j}".encode()).hexdigest()[:4], 16
            )
            / 32768.0
            - 1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def ivf_ann_topk_portable(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF top-k with a portable deterministic quantizer.

    Centroids are the ``n_clusters`` data vectors with the smallest
    md5-hash of their id — no Lloyd averaging, so no float-accumulation
    ordering to diverge between engines; assignment, probing, and
    rescoring are all codegen cosine folds whose doubles are
    bit-identical to a SQL oracle's sequential evaluation.  The
    kmeans-refined gemm variant (``ivf_ann_topk``) is the recall/perf
    path; this is the exactly-checkable one — same inverted-list +
    probe machinery, different quantizer.

    Scale: the seed selection is a global top-``n_clusters``
    (TakeOrderedAndProject, k·d floats broadcast back); assignment is
    a broadcast cross join N×n_clusters with one narrow shuffle for
    the per-vector argmax window.

    Round 8 split the lifecycle stages into ``operators.ann_index``
    (build / assign / query over a PERSISTED index); this one-shot
    form is their composition — same expressions, same tie rules, so
    the same SQL oracle checks both paths.
    """
    from omniengine_spark.operators import ann_index as AI

    seeds = AI.seeded_centroids(vectors, id_col, vec_col, n_clusters)
    lists = AI.assign_lists(vectors, seeds, id_col, vec_col)
    return AI.query_index(
        queries, seeds, lists, id_col, vec_col, k=k, nprobe=nprobe
    )


def hyperplane_bucket_expr(
    vec_col: str, n_planes: int, seed: int, dim: int
) -> Column:
    """The bucket id as a pure Column: bit i = sign(v · h_i) with
    ``deterministic_planes`` literals baked in — no broadcast state,
    no per-element hash evaluation in an interpreted HOF lambda (a
    measured 13× trap), reproducible on any engine."""
    planes = deterministic_planes(seed, n_planes, dim)

    def plane_bit(plane: int) -> Column:
        lit_plane = F.array(*[F.lit(c) for c in planes[plane]])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                lit_plane,
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(
            dot >= 0, F.shiftleft(F.lit(1).cast("long"), plane)
        ).otherwise(F.lit(0).cast("long"))

    bucket = plane_bit(0)
    for p in range(1, n_planes):
        bucket = bucket.bitwiseOR(plane_bit(p))
    return bucket


def hyperplane_lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane signature per vector (see
    ``hyperplane_bucket_expr``)."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        hyperplane_bucket_expr(vec_col, n_planes, seed, dim).alias(
            "bucket"
        ),
    )


def adaptive_planes_sql(
    count_col: str = "cnt", occupancy: int = 64, floor_bits: int = 4
) -> str:
    """Active plane count for occupancy-stable LSH, as an SQL fragment
    valid on BOTH Spark and DuckDB: the smallest p with
    2^p >= ceil(N / occupancy), floored at ``floor_bits`` — i.e.
    expected bucket occupancy pinned at ~``occupancy`` regardless of
    N.  Integer-only (ceil-div + binary-string length), so both
    engines derive the IDENTICAL bit count from the same COUNT(*):
    no libm log2 whose last ulp could flip a ceil between engines.
    Ceil-div is ``floor((n + occ-1) / occ.0)`` because the integer-
    division TOKEN differs (Spark ``div``, DuckDB ``//``) while double
    division of exact-in-double ints is portable.  The ceil-div is
    clamped to >= 1: an empty input (COUNT(*)=0) would otherwise give
    m=0 and bin(-1) = 64 ones, exploding the active bit count to 64
    (and overflowing shiftleft(1, 64) masks downstream); clamped, an
    empty/tiny corpus falls to the ``floor_bits`` case."""
    m = (
        f"greatest(CAST(floor(((({count_col}) + {occupancy - 1})"
        f" / {occupancy}.0)) AS BIGINT), 1)"
    )
    return f"greatest({floor_bits}, length(bin({m} - 1)))"


def lsh_ann_topk(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    n_tables: int = 1,
    target_occupancy: int | None = None,
    max_planes: int = 16,
    n_probes: int = 0,
) -> DataFrame:
    """Approximate cosine top-k: compare only within LSH buckets,
    unioned over ``n_tables`` independent hash tables.

    One table of p planes partitions the corpus into 2^p buckets —
    cheap but recall-poor on hard (near-isotropic) data, because the
    true neighbor must agree on ALL p bits.  The standard fix is
    multiple tables: a candidate needs to collide in ANY table, so
    recall compounds (measured here: 1×4 planes ≈ 0.17 recall@5,
    4×4 ≈ 0.41 at a ~22% scan fraction).  Candidates are
    union-distinct across tables, then exactly rescored.  Still
    engine-independent: every table's planes are md5-derived, so the
    oracle rebuilds identical buckets.

    With ``target_occupancy`` set, the ACTIVE bit count scales with
    the data instead of being a constant: a fixed p means bucket
    occupancy grows ∝ N and within-bucket pairs ∝ N² — measured
    e≈1.34 at sf0.1→sf1, the thing that kills a 100× scale-up.  All
    ``max_planes`` bits are computed per table, then masked down to
    ``n_active = max(4, ceil(log2(N/64)))`` bits derived from COUNT(*)
    with integer-portable arithmetic (``adaptive_planes_expr``) — so
    occupancy stays ~64, candidate volume stays ∝ N·T, and the SQL
    oracle still rebuilds identical buckets at ANY scale factor.  The
    recall contract is per-bucket: holding recall while N grows means
    raising ``n_tables`` (cost stays ∝ N·T); 16 max planes covers
    N ≤ 64·2^16 ≈ 4.2M vectors per partition of the search space.

    ``n_probes`` > 0 adds MULTI-PROBE (Lv et al., VLDB'07): per table,
    each vector also probes the ``n_probes`` Hamming-adjacent buckets
    obtained by flipping the active bits with the smallest hyperplane
    margin |v·h_p| — the bits most likely to disagree with a true
    neighbor's.  Candidates become the SYMMETRIC CLOSURE of "a's home
    or probe set contains b's home bucket", so per-table collision
    probability rises from P(all bits agree) to ~P(≤1 low-margin bit
    disagrees) at ∝(1+2·n_probes)× candidate cost — recall per
    candidate beats adding tables (a new table re-pays the full home
    collision cost for independent bits; a probe reuses the table and
    targets exactly the likeliest miss).  Margins sort by (|dot|,
    plane index): double compares, bit-identical on both engines, so
    the probe set — and therefore the approximate result — remains
    exactly oracle-checkable.
    """
    # all T bucket keys in ONE scan, exploded to (table, bucket) rows,
    # then a single self-join on the composite key — one shuffle and
    # one join instead of T of each.  The VECTOR (and its precomputed
    # norm) rides along on the keyed row: N·T vector-bearing rows
    # shuffle once into bucket co-partitions, and each collision is
    # scored INLINE at join emit.  The alternative — skinny pairs,
    # distinct, then two joins to re-fetch vectors — shuffles
    # occupancy× more vector payload (measured 141 s / e≈+1.10 at sf5
    # vs this shape's near-linear cost: the per-pair fold is ~µs while
    # a pair-row carrying two 64-double arrays is ~1 KB of exchange).
    p_bits = max_planes if target_occupancy else n_planes
    # backtick-escape the caller-supplied column name before SQL-string
    # interpolation (Spark quoted-identifier escaping: ` -> ``)
    vec_q = vec_col.replace("`", "``")

    def dots_arr(t: int) -> Column:
        # ONE parsed SQL expression instead of ~p_bits·dim F.lit()
        # py4j calls: the constructed tree is the same fold
        # (zip_with → aggregate, same operand order, double literals
        # that round-trip exactly — plane components are multiples of
        # 2^-15), but expression CONSTRUCTION drops from ~4500 py4j
        # round trips (measured 15-31 s of pure driver-side build for
        # 4 tables × 16 planes × 64 dims) to n_tables expr() parses.
        planes = deterministic_planes(seed + t, p_bits, dim)

        def fold(p: int) -> str:
            arr = ",".join(f"{c!r}D" for c in planes[p])
            return (
                f"aggregate(zip_with(`{vec_q}`, array({arr}), "
                "(x, h) -> CAST(x AS DOUBLE) * h), 0.0D, "
                "(acc, x) -> acc + x)"
            )

        return F.expr(
            "array(" + ",".join(fold(p) for p in range(p_bits)) + ")"
        )

    # the p_bits plane dots land in an array column FIRST, so each
    # fold runs once per (vector, table) and both the bucket bits AND
    # the probe margins derive from the same stored doubles (the bit
    # is dot >= 0, exactly hyperplane_bucket_expr's test)
    dotted = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
        *[dots_arr(t).alias(f"dots{t}") for t in range(n_tables)],
    )
    if target_occupancy:
        n_active = adaptive_planes_sql("cnt", target_occupancy)
        nfr = vectors.agg(F.count(F.lit(1)).alias("cnt")).select(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({n_active} AS INT))"
            ).alias("two_p")
        )
        dotted = dotted.crossJoin(F.broadcast(nfr))
    else:
        dotted = dotted.withColumn(
            "two_p",
            F.lit(1 << p_bits).cast("long"),
        )
    # n_active bits = popcount of the mask (two_p - 1 is n_active ones)
    dotted = dotted.withColumn(
        "n_act", F.length(F.bin(F.col("two_p") - 1)).cast("int")
    )

    def home_bucket(t: int) -> Column:
        # same OR-of-sign-bits integer expression as the former
        # Column-DSL loop (p_bits whens + bitwiseORs per table), built
        # as one parsed string — integer ops, so "same bits set" is
        # "same value"; construction drops from ~p_bits·n_tables py4j
        # round trips to n_tables parses.
        ors = " | ".join(
            f"(CASE WHEN element_at(`dots{t}`, {p + 1}) >= 0 "
            f"THEN CAST({1 << p} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END)"
            for p in range(p_bits)
        )
        return F.expr(f"({ors}) & (`two_p` - 1)")

    for t in range(n_tables):
        dotted = dotted.withColumn(f"bkt{t}", home_bucket(t))

    def probe_buckets(t: int) -> Column:
        # (|margin|, plane, mask) structs for the ACTIVE planes only,
        # sorted ascending — ties impossible past the plane index, so
        # both engines pick the identical flip set.  One parsed
        # string per table (construction cost), identical structs,
        # sort key, slice, and xor as the former Column-DSL form.
        structs = ",".join(
            f"struct(abs(element_at(`dots{t}`, {p + 1})) AS d, "
            f"{p} AS p, CAST({1 << p} AS BIGINT) AS m)"
            for p in range(p_bits)
        )
        return F.expr(
            f"transform(slice(array_sort(filter(array({structs}), "
            f"x -> x.p < `n_act`)), 1, {n_probes}), "
            f"x -> `bkt{t}` ^ x.m)"
        )

    tb_arrays = [
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    F.col(f"bkt{t}").alias("bucket"),
                    F.lit(True).alias("home"),
                )
                for t in range(n_tables)
            ]
        )
    ]
    if n_probes > 0:
        # closure factory, NOT `lambda b, t=t`: F.transform treats a
        # two-parameter lambda as (element, index) and would pass the
        # ARRAY INDEX as t — mislabeling every probe's table
        def probe_struct(tt: int):
            return lambda b: F.struct(
                F.lit(tt).alias("t"),
                b.alias("bucket"),
                F.lit(False).alias("home"),
            )

        tb_arrays += [
            F.transform(probe_buckets(t), probe_struct(t))
            for t in range(n_tables)
        ]
    keyed = dotted.select(
        "vec_id",
        "vec",
        "nrm",
        F.explode(F.concat(*tb_arrays)).alias("tb"),
    ).select("vec_id", "vec", "nrm", "tb.t", "tb.bucket", "tb.home")
    # the index side is a FILTERED projection of the same lineage —
    # rename its payload columns so the self-join below is
    # unambiguous by construction (alias-qualified refs against a
    # filter-of-self resolve wrong: measured 42k spurious + 33k
    # missing pairs at the sf0.01 gate)
    index_side = keyed.filter(F.col("home")).select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("vec").alias("b_vec"),
        F.col("nrm").alias("b_nrm"),
        "t",
        "bucket",
    )

    # candidates normalized to UNORDERED pairs (least, greatest):
    # cosine is symmetric — dot(a,b) is the same products in the same
    # index order as dot(b,a) and na·nb == nb·na bitwise — so each
    # discovered pair is scored once and mirrored afterwards.  Home
    # rows join home rows a < b (each unordered pair emits once);
    # probe rows join home rows in EITHER id order (b's home landing
    # in a's probe set says nothing about a's home landing in b's),
    # normalized at projection.  A pair colliding in several
    # tables/probes folds once per collision, but every collision
    # computes the IDENTICAL double (same arrays, same fold order),
    # so the distinct on (query, nbr, score) still collapses it to
    # one row and the oracle — the symmetric closure of probe∪home
    # containment — is unchanged.
    scored = (
        keyed.join(index_side, ["t", "bucket"])
        .filter(
            (
                F.col("home")
                & (F.col("vec_id") < F.col("b_vec_id"))
            )
            | (
                (~F.col("home"))
                & (F.col("vec_id") != F.col("b_vec_id"))
            )
        )
        .select(
            F.least(F.col("vec_id"), F.col("b_vec_id")).alias(
                "query_id"
            ),
            F.greatest(F.col("vec_id"), F.col("b_vec_id")).alias(
                "nbr_id"
            ),
            (
                _dot(F.col("vec"), F.col("b_vec"))
                / (F.col("nrm") * F.col("b_nrm"))
            ).alias("score"),
        )
        .distinct()
        # materialize once: the mirror union below would otherwise
        # duplicate the whole scan→bucket→join→score subtree into
        # both branches (AQE exchange reuse is not guaranteed across
        # union arms).  Bounded: one skinny (id, id, score) row per
        # candidate pair — ∝ N·T·occupancy/2.  Lazy: the block-level
        # cache underneath the checkpoint serializes the two union
        # arms' reads anyway, and eager cost a build-time job.
        .localCheckpoint(eager=False)
    )
    both = scored.unionByName(
        scored.select(
            F.col("nbr_id").alias("query_id"),
            F.col("query_id").alias("nbr_id"),
            "score",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc()
    )
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "score")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ), data-seeded — the memory-bounded ANN
# scale path.  A dim-D vector splits into M subspaces; each subvector
# is replaced by its nearest codeword id, so a 64-dim float vector
# compresses to M small ints (~64× smaller than float32) and search
# scans reconstructions, not raw vectors.  Corpus-independent random
# codebooks measured recall@5 ≈ 0.11 on near-isotropic embeddings;
# production PQ trains codebooks on the data.  The deterministic,
# oracle-restatable equivalent of training is to take the
# md5-smallest vectors (the IVF seed trick) and use their subvectors
# as codewords, quantizing NORMALIZED vectors so ADC approximates
# cosine directly.  With an ADC shortlist
# + exact re-rank (the standard two-pass), measured recall@5 reaches
# ~0.75 at a 5% exact-scan fraction on the same hard data.
# ---------------------------------------------------------------------------

def _normalized(
    vectors: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(vec_id, nv): L2-normalized double vectors.  Two-step select so
    the norm is computed once per row, not per element inside the
    transform lambda (interpreted-HOF lesson from the text plans)."""
    with_norm = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    return with_norm.select(
        "vec_id",
        F.transform(
            F.col("v"), lambda x: x.cast("double") / F.col("nrm")
        ).alias("nv"),
    )


def pq_build_index(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_codewords: int = 16,
    m: int = 8,
    dim: int = 64,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The train-equivalent phase of seeded PQ, split out so it can
    run (and persist) ONCE per corpus: normalize → seed codebooks
    (md5-smallest ids' subvectors) → per-subspace argmin encode.
    Returns ``(nv, seeds_sub, codes)`` — the index state
    ``pq_seeded_topk(index=...)`` serves queries from without
    re-encoding.  At scale this is the whole point of PQ: encoding is
    an offline pass over the corpus, serving touches only the M-code
    table plus a per-query LUT."""
    subdim = dim // m
    nv = _normalized(vectors, id_col, vec_col)

    h = md5_token_hash(F.col("vec_id").cast("string"))
    seeds = (
        nv.select(F.col("vec_id").alias("c"), F.col("nv").alias("cv"),
                  h.alias("h"))
        .orderBy("h", "c")
        .limit(n_codewords)
        .select("c", "cv")
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("m")
    seeds_sub = seeds.select("c", "cv", ms).select(
        "m",
        "c",
        F.expr(f"slice(cv, m*{subdim}+1, {subdim})").alias("cent"),
    )
    vec_sub = nv.select("vec_id", "nv", ms).select(
        "vec_id",
        "m",
        F.expr(f"slice(nv, m*{subdim}+1, {subdim})").alias("sv"),
    )
    d = _dot(F.col("cent"), F.col("cent")) - 2.0 * _dot(
        F.col("sv"), F.col("cent")
    )
    codes = (
        vec_sub.join(F.broadcast(seeds_sub), "m")
        .select(
            "vec_id",
            "m",
            F.struct(d.alias("d"), F.col("c").alias("c")).alias("cand"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min("cand").alias("best"))
        .select("vec_id", "m", F.col("best.c").alias("c"))
    )
    return nv, seeds_sub, codes


def pq_seeded_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    knn: int = 5,
    n_codewords: int = 16,
    m: int = 8,
    dim: int = 64,
    shortlist: int = 100,
    probes: DataFrame | None = None,
    lists: DataFrame | None = None,
    index: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """ADC top-k over data-seeded PQ codes with exact re-rank.

    Pipeline: normalize → seed codebooks (md5-smallest ids'
    subvectors) → per-subspace argmin encode (one narrow shuffle on
    (vec_id, m)) → ADC via a broadcast lookup table
    (|queries|·M·K partial dot products, computed once) joined to the
    codes on (m, codeword) → per-query shortlist → exact cosine
    re-rank of the shortlist only.  When ``probes``/``lists`` are
    given ((query_id, cluster) / (vec_id, cluster)), the ADC scan is
    restricted to probed coarse lists — the IVF-PQ composite.

    This is the textbook asymmetric-distance layout: the scan reads
    ONLY the M-codeword codes — raw vectors are touched exactly
    twice, once to encode and once for the shortlist re-rank.  (An
    earlier version reconstructed full-dimension vectors for the
    scan, which forfeits PQ's memory advantage at scale.)  The
    per-subspace partials are summed in fixed m order — one
    conditional sum per subspace, each seeing exactly one row, added
    as a left-to-right expression — so the score is bit-identical
    across engines with no float-order ambiguity.

    ``index`` (from ``pq_build_index``, possibly persisted) skips the
    normalize/seed/encode phase: serving reuses the trained state, so
    query latency stops paying the corpus encode.

    At scale: per-vector scan state is M small ints; the LUT is
    |queries|·M·K rows (broadcast); the exact pass touches
    |queries|·shortlist raw vectors.  All stages are codegen
    DataFrame ops.
    """
    subdim = dim // m
    if index is None:
        index = pq_build_index(
            vectors, id_col, vec_col, n_codewords, m, dim
        )
    nv, seeds_sub, codes = index

    qn = _normalized(queries, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), F.col("nv").alias("qv")
    )
    # ADC lookup table: partial dot product of every query subvector
    # against every (m, codeword) centroid — |queries|·M·K rows,
    # computed once and broadcast into the code scan.
    lut = qn.crossJoin(F.broadcast(seeds_sub)).select(
        "query_id",
        "m",
        "c",
        _dot(
            F.expr(f"slice(qv, m*{subdim}+1, {subdim})"), F.col("cent")
        ).alias("partial"),
    )
    if probes is not None and lists is not None:
        allowed = lists.join(F.broadcast(probes), "cluster").select(
            "query_id", "vec_id"
        )
        parts = codes.join(allowed, "vec_id").join(
            F.broadcast(lut), ["query_id", "m", "c"]
        )
    else:
        parts = codes.join(F.broadcast(lut), ["m", "c"])
    # One conditional sum per subspace (each sees exactly one row),
    # added in fixed m order — float-deterministic across engines.
    msums = [
        F.sum(
            F.when(F.col("m") == mi, F.col("partial"))
        ).alias(f"p{mi}")
        for mi in range(m)
    ]
    adc_expr = F.col("p0")
    for mi in range(1, m):
        adc_expr = adc_expr + F.col(f"p{mi}")
    adc = (
        parts.filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("nbr_id"))
        .agg(*msums)
        .select("query_id", "nbr_id", adc_expr.alias("adc"))
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("nbr_id").asc()
    )
    short = adc.withColumn("srank", F.row_number().over(ws)).filter(
        F.col("srank") <= shortlist
    )
    rerank = (
        short.join(qn, "query_id")
        .join(
            nv.select(
                F.col("vec_id").alias("nbr_id"), F.col("nv").alias("nn")
            ),
            "nbr_id",
        )
        .select(
            "query_id",
            "nbr_id",
            _dot(F.col("qv"), F.col("nn")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("nbr_id").asc()
    )
    return (
        rerank.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= knn)
        .select("query_id", "nbr_id", "rank", "score")
    )


def adaptive_clusters_sql(count_col: str = "cnt", floor_k: int = 16) -> str:
    """Centroid count for SemDeDup at scale, as an SQL fragment valid
    on both engines: k = max(floor_k, ceil(sqrt(N/2))) — the balance
    point of assignment cost (N·k dots) against in-cluster pair cost
    (N²/2k dots), total 2·N·√(N/2).  sqrt and ceil are IEEE
    correctly-rounded, so both engines derive the identical k.  A
    FIXED k is quadratic in within-cluster pairs (measured e≈+1.31 at
    sf0.1→sf1); √N-scaled k brings the exponent to 1.5, and the next
    rung (out of scope here) is ANN-assisted assignment, which makes
    assignment O(N) and restores near-linearity."""
    return (
        f"greatest({floor_k}, "
        f"CAST(ceil(sqrt(({count_col}) / 2.0)) AS BIGINT))"
    )


def coarse_cells_sql(k_sql: str, floor_kc: int = 4) -> str:
    """Coarse-cell count for the two-level SemDeDup quantizer, as an
    SQL fragment valid on both engines: kc = max(floor_kc, ceil(√k)).
    sqrt/ceil are IEEE correctly-rounded on exact-in-double integers,
    so Python's ``max(floor_kc, math.ceil(math.sqrt(k)))`` derives
    the identical kc and the oracle rebuilds the identical two-level
    index."""
    return (
        f"greatest({floor_kc}, "
        f"CAST(ceil(sqrt(CAST(({k_sql}) AS DOUBLE))) AS BIGINT))"
    )


def _pyfold_dot(a, b) -> float:
    """Sequential left-to-right double fold — the SAME IEEE operation
    sequence as Spark's ``aggregate`` lambda and DuckDB's
    ``list_dot_product``, so near-tie quantizer decisions made on the
    driver agree bit-for-bit with both engines."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def semantic_prune(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | None = 16,
    threshold: float = 0.4,
    min_clusters: int = 16,
    max_cluster: int | None = None,
    debug_frames: dict | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup: bucket embeddings by nearest
    centroid, compare pairs ONLY within a bucket, drop every vector
    that has a lower-id cluster-mate above the cosine threshold.

    This is the scale path for embedding near-dup (Abbas et al. 2023,
    "SemDeDup"): the blocked all-pairs gemm (``cosine_pair_join``)
    costs O(N²/B); clustering first makes it Σ|cluster|² — with
    n_clusters grown ∝ N (fixed expected list size) that's O(N·c̄).
    The quantizer is the portable md5-seeded one
    (``ivf_ann_topk_portable``), so the whole prune — assignment,
    in-cluster pairs, keep/drop — is exactly reproducible by a SQL
    oracle.

    Assignment is TWO-LEVEL (round 8): vectors pick one of
    kc = max(4, ⌈√k⌉) coarse cells first (N·kc gemm), then refine
    against only that cell's fine centroids (expected k/kc ≈ √k) —
    N·2√k FLOPs instead of the flat N·k, which round 7 measured as
    the operator's last super-linear term (e=+1.57 rv5→rv25 at
    k=√(N/2), i.e. N^1.5 FLOPs; two-level is N^1.25).  Coarse cells
    are a PREFIX of the same md5 seed ranking, and the fine→coarse
    map (k·kc dots, driver-side) uses the same near-tie exact-fold
    discipline, so the whole index stays oracle-reproducible.

    Exactness under BLAS (the cosine_pair_join discipline): both hot
    loops — the two-level assignment and the Σ|c|² in-cluster pair
    scan — were interpreted zip_with/aggregate folds (~7 µs per
    64-dim dot: Spark's higher-order lambdas never enter codegen),
    which dominated the plan 35× over the shuffles.  Both now run as
    numpy gemms whose values only PRUNE with a safety margin (gemm
    error ≲ d·ε ≈ 1e-13 ≪ the 1e-9 margin); every DECISION the
    oracle can see is still made by the exact sequential fold:
    near-threshold pairs are re-verified with ``_dot``, and near-tie
    argmax rows (top1−top2 gap ≤ 2·margin at EITHER level) fall back
    to the exact two-level fold argmax — so the SQL oracle
    reproduces the identical result at any sf.

    Plan shape: one bounded centroid collect (k ≤ √(N/2) — at larger
    N ship centroids as a broadcast join instead), one Arrow
    mapInPandas two-level assignment, one (cluster)-keyed
    applyInPandas pair scan (row-blocked so task memory stays bounded
    on hot clusters), one exact-verify join, one anti-join verdict.
    Output: (id, cluster, is_kept).

    ``n_clusters=None`` scales k with the data
    (``adaptive_clusters_sql``: max(16, ceil(sqrt(N/2)))) — a fixed k
    makes within-cluster pairs quadratic in N.  The count read is one
    bounded scalar (k parameterizes a ``limit``, which needs a Python
    int); ``math.sqrt``/``math.ceil`` match the SQL fragment's IEEE
    semantics, so the oracle still rebuilds the identical index.

    ``max_cluster`` bounds the pair-scan mass BY CONSTRUCTION: √N
    centroids minimize N·k + Σ|c|²/2 only under balanced membership,
    and real embeddings concentrate (measured e=+1.88 sf5→sf25 on
    10-real-cluster data, where Σ|c|² grows ~N²).  Members of each
    centroid bucket are ordered by (vec[1], id) — the RAW stored
    first coordinate: both engines compare the identical parquet
    bytes, so the split is decided with ZERO arithmetic, immune to
    the gemm-vs-fold epsilon that forces re-verification everywhere
    else — and chunked into ``max_cluster``-sized sub-buckets; pairs
    are compared within (cluster, sub) only, so Σ|bucket|² ≤
    cap·N whatever the data does.  The first coordinate is a 1-D
    projection sort, so near-dups land in the same chunk except at
    boundaries — a documented recall trade on oversized clusters
    (SemDeDup's in-cluster scan is itself a recall heuristic).
    Clusters at or under the cap get sub=0 for every row: output is
    IDENTICAL to the uncapped operator wherever the cap never binds
    (the sf0.01 gate: max |cluster| 125 > every observed cluster).
    With ``n_clusters=None``, the cap defaults to a CONSTANT (1024):
    round 7 measured that the earlier ∝N/k cap merely tracked the
    √N-SemDeDup design's own N^1.5 pair mass (e=+1.58 sf5→sf25);
    a constant cap bounds it at cap·N — see the inline comment.

    CACHE CONTRACT: this operator ``persist()``s three interior
    frames (the assignment output, the assigned vectors, the pair
    candidates) that the RETURNED lazy frame keeps referencing — the
    function cannot unpersist them itself.  The caller releases them
    after consuming the result: ``spark.catalog.clearCache()``
    between invocations (the bench/oracle harness already does), or
    unpersist via the frames exposed in ``debug_frames``.  A
    long-lived serving session that skips this accumulates one
    cached copy per invocation.

    EAGER-PROBE CONTRACT: construction runs one driver-side
    emptiness probe (``unc.isEmpty()``) over the cached assignment to
    skip the measure-zero near-tie branch, so building this plan
    EXECUTES the scan→assignment subtree — explain-only callers pay
    that job, and the certain/uncertain branch decision is frozen at
    build time (re-build the plan if the underlying source mutates
    between build and execution; the engine's build-then-run-
    immediately callers never do).
    """
    if n_clusters is None:
        import math

        n = vectors.count()
        n_clusters = max(min_clusters, math.ceil(math.sqrt(n / 2.0)))
        if max_cluster is None:
            # CONSTANT cap, not ∝ N/k: a cap of 4N/k = Θ(√N) bounds
            # the pair scan only to cap·N = N^1.5 (measured e=+1.58
            # sf5→sf25 — the √N-SemDeDup DESIGN exponent, not an
            # imbalance artifact).  A constant cap makes pair mass
            # ≤ cap·N, linear by construction; the assignment side
            # is handled by the two-level coarse quantizer below
            # (N·2√k instead of N·k FLOPs — round 7 measured the
            # flat N·k gemm at e=+1.57 rv5→rv25, the last
            # super-linear term in the operator).
            max_cluster = 1024
    import math

    kc = max(4, math.ceil(math.sqrt(n_clusters)))

    h = md5_token_hash(F.col(id_col).cast("string"))
    seeds = (
        vectors.select(
            F.col(id_col).alias("cluster"),
            F.col(vec_col).alias("cvec"),
            h.alias("h"),
        )
        .orderBy("h", "cluster")
        .limit(n_clusters)
        .select(
            "cluster", "cvec", "h", _norm(F.col("cvec")).alias("cnrm")
        )
    )
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    )

    margin = 1e-9

    # -- two-level coarse quantizer (the 100 TB assignment path) ----
    # Fine centroids: first k of the md5 seed ranking (as before).
    # Coarse cells: the first kc = max(4, ⌈√k⌉) of the SAME ranking —
    # a prefix, so one seed scan serves both levels.  Each FINE
    # centroid is assigned to its nearest coarse cell (k·kc dots,
    # driver-side); each VECTOR picks its coarse cell (N·kc gemm)
    # then refines against only that cell's fine centroids (expected
    # k/kc ≈ √k each) — N·2√k FLOPs total instead of the flat N·k
    # that measured e=+1.57 at the rv5→rv25 decade.  Every level's
    # tie rule is (cosine DESC, id ASC), and near-tie decisions (gap
    # ≤ 2·margin) fall back to exact sequential folds, so the SQL
    # oracle rebuilds the identical two-level index.  The recall
    # trade (a vector may refine in a cell that doesn't hold its
    # globally-nearest fine centroid) is standard IVF practice and
    # SemDeDup's in-cluster scan is itself a recall heuristic.
    srows = sorted(
        seeds.collect(), key=lambda r: (r["h"], r["cluster"])
    )
    coarse = srows[:kc]
    co_ids = [int(r["cluster"]) for r in coarse]
    co_raw = [list(map(float, r["cvec"])) for r in coarse]
    co_nrm = [math.sqrt(_pyfold_dot(x, x)) for x in co_raw]
    co_mat = np.stack([np.asarray(x) for x in co_raw])
    co_mat /= np.linalg.norm(co_mat, axis=1, keepdims=True)

    def _exact_argmax(vec, nrm, cand_ids, cand_raw, cand_nrm):
        """(sim desc, id asc) winner by the exact sequential fold —
        the decision procedure the oracle states."""
        best_id, best_sim = None, None
        for cid, craw, cn in zip(cand_ids, cand_raw, cand_nrm):
            s = _pyfold_dot(vec, craw) / (nrm * cn)
            if best_sim is None or s > best_sim or (
                s == best_sim and cid < best_id
            ):
                best_id, best_sim = cid, s
        return best_id

    # fine → coarse cell: gemm + near-tie exact fold recheck
    fine_cell: dict[int, int] = {}
    for r in srows:
        fv = np.asarray(r["cvec"], dtype=np.float64)
        fn = np.linalg.norm(fv)
        sims = (co_mat @ fv) / fn
        order = np.argsort(-sims, kind="stable")
        if len(sims) > 1 and (
            sims[order[0]] - sims[order[1]] <= 2 * margin
        ):
            fraw = list(map(float, r["cvec"]))
            fnrm = math.sqrt(_pyfold_dot(fraw, fraw))
            cell = _exact_argmax(fraw, fnrm, co_ids, co_raw, co_nrm)
        else:
            cell = co_ids[int(order[0])]
        fine_cell[int(r["cluster"])] = cell

    # non-empty cells only (a coarse id that attracted no fine
    # centroid — possible under exact ties — must not win vectors)
    seed_vec = {
        int(r["cluster"]): np.asarray(r["cvec"], dtype=np.float64)
        for r in srows
    }
    cells = sorted(set(fine_cell.values()))
    cell_mat = co_mat[[co_ids.index(c) for c in cells]]
    cell_fine: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for cell in cells:
        members = sorted(
            c for c, cc in fine_cell.items() if cc == cell
        )
        fmat = np.stack([seed_vec[c] for c in members])
        fmat /= np.linalg.norm(fmat, axis=1, keepdims=True)
        cell_fine[cell] = (np.asarray(members, dtype=np.int64), fmat)

    asg_schema = T.StructType(
        [
            T.StructField("vid", T.LongType()),
            T.StructField("cluster", T.LongType()),
            T.StructField("certain", T.BooleanType()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cell_arr = np.asarray(cells, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["vec"]]
            )
            vm /= np.linalg.norm(vm, axis=1, keepdims=True)
            csims = vm @ cell_mat.T
            # cells sorted asc → argmax's first-max IS the
            # (sim desc, ccell asc) winner
            ctop = np.argmax(csims, axis=1)
            if csims.shape[1] > 1:
                cpart = np.partition(csims, -2, axis=1)
                cgap = cpart[:, -1] - cpart[:, -2]
            else:
                cgap = np.full(len(vm), np.inf)
            out = np.empty(len(vm), dtype=np.int64)
            fgap = np.empty(len(vm))
            for ci in np.unique(ctop):
                rows = np.nonzero(ctop == ci)[0]
                fids, fmat = cell_fine[int(cell_arr[ci])]
                fs = vm[rows] @ fmat.T
                out[rows] = fids[np.argmax(fs, axis=1)]
                if fs.shape[1] > 1:
                    fpart = np.partition(fs, -2, axis=1)
                    fgap[rows] = fpart[:, -1] - fpart[:, -2]
                else:
                    fgap[rows] = np.inf
            yield pd.DataFrame(
                {
                    "vid": pdf["vid"].to_numpy(),
                    "cluster": out,
                    "certain": (cgap > 2 * margin)
                    & (fgap > 2 * margin),
                }
            )

    # persist: ``rough`` fans out to the certain/uncertain branches
    # and — unpersisted — Catalyst re-inlines the whole scan →
    # fan-out exchange → Arrow mapInPandas assignment subtree into
    # EVERY downstream reference (measured at sf0.1: the assignment
    # ran 6× inside one 305-node/130-Exchange plan, 4–8 s of action
    # for 2000 vectors).  One cached copy is N skinny rows; the
    # bench's clearCache() before each cold run keeps the timing
    # honest (the cache is rebuilt inside the timed region).
    rough = (
        v.select("vid", "vec").mapInPandas(assign, asg_schema).persist()
    )
    certain = rough.filter(F.col("certain")).select("vid", "cluster")
    # near-tie rows (measure-zero on continuous data): exact fold
    # argmax at BOTH levels, the decision procedure the oracle states
    spark = vectors.sparkSession
    unc = rough.filter(~F.col("certain")).select("vid")
    vunc = v.join(unc, "vid")
    fmap = spark.createDataFrame(
        [(int(c), int(cc)) for c, cc in sorted(fine_cell.items())],
        "cluster long, ccell long",
    )
    fine_df = seeds.join(F.broadcast(fmap), "cluster")
    coarse_df = fine_df.select(
        F.col("ccell").alias("cell_id")
    ).distinct().join(
        seeds.select(
            F.col("cluster").alias("cell_id"),
            F.col("cvec").alias("ccvec"),
            F.col("cnrm").alias("ccnrm"),
        ),
        "cell_id",
    )
    ex_coarse = (
        vunc.crossJoin(F.broadcast(coarse_df))
        .select(
            "vid",
            "cell_id",
            (
                _dot(F.col("vec"), F.col("ccvec"))
                / (F.col("nrm") * F.col("ccnrm"))
            ).alias("csim"),
        )
        .groupBy("vid")
        .agg(
            F.max_by(
                "cell_id", F.struct(F.col("csim"), -F.col("cell_id"))
            ).alias("ccell")
        )
    )
    exact_best = (
        vunc.join(ex_coarse, "vid")
        .join(F.broadcast(fine_df), "ccell")
        .select(
            "vid",
            "cluster",
            (
                _dot(F.col("vec"), F.col("cvec"))
                / (F.col("nrm") * F.col("cnrm"))
            ).alias("fsim"),
        )
        .groupBy("vid")
        .agg(
            F.max_by(
                "cluster", F.struct(F.col("fsim"), -F.col("cluster"))
            ).alias("cluster")
        )
    )
    # Near-tie rows are measure-zero on continuous data, yet the
    # exact-fold branch drags the seed scan + two broadcast joins +
    # a crossJoin through EVERY run's physical plan.  One driver-side
    # emptiness probe on the cached ``rough`` (same precedent as
    # connected_components' empty-labels guard) keeps the common-case
    # plan to the certain path only; the exact branch — identical
    # output when unc is non-empty — still runs whenever it matters.
    best = (
        certain
        if unc.isEmpty()
        else certain.unionByName(exact_best)
    )
    assigned = v.join(best, "vid").select("vid", "vec", "nrm", "cluster")
    if max_cluster:
        wsub = Window.partitionBy("cluster").orderBy(
            F.element_at(F.col("vec"), 1).asc(), F.col("vid").asc()
        )
        assigned = assigned.withColumn(
            "sub",
            F.floor(
                (F.row_number().over(wsub) - 1) / F.lit(max_cluster)
            ),
        )
    else:
        assigned = assigned.withColumn("sub", F.lit(0).cast("long"))
    # persist: ``assigned`` feeds the pair scan, the verify join's
    # BOTH vector sides (below), and the final verdict join — three
    # re-executions of scan+join+window without it.  MEMORY_AND_DISK:
    # the frame carries the vector payload, so it spills rather than
    # OOMs on a hot executor.
    assigned = assigned.persist()

    # In-cluster pair scan: one gemm per (cluster, sub), row-blocked
    # so a hot cluster's sims tile stays ≤ block·|c| doubles per
    # task.  The gemm ALREADY computes every candidate's cosine, so
    # pairs clearly above threshold (sim ≥ t + margin: the fold can't
    # disagree — gemm error ≲ d·ε ≈ 1e-13 ≪ 1e-9) are reduced to
    # UNIQUE dropped ids inside the pandas group; only the near-
    # threshold band [t−margin, t+margin) — measure-zero on
    # continuous data — is emitted as pairs for the exact-fold
    # verify join.  Round 8 measured the old emit-every-candidate-
    # pair-then-join form at 60.5M pair rows → two 33 GB SMJ
    # shuffles → 140 s at the rv25 rung (the pair MASS was already
    # capped; the pair TRAFFIC wasn't); per-group reduction bounds
    # the stage output by bucket membership (≤ N rows) instead.
    pair_schema = T.StructType(
        [
            T.StructField("vid", T.LongType()),
            T.StructField("b_vid", T.LongType()),
        ]
    )
    cut_lo = threshold - margin
    cut_hi = threshold + margin
    block = 4096

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"vid": [], "b_vid": []}).astype("int64")
        order = np.argsort(pdf["vid"].to_numpy(), kind="stable")
        ids = pdf["vid"].to_numpy()[order]
        vm = np.stack(
            [np.asarray(x, dtype=np.float64) for x in pdf["vec"]]
        )[order]
        vm /= np.linalg.norm(vm, axis=1, keepdims=True)
        sure = np.zeros(m, dtype=bool)  # row i has a certain mate
        hi_out, lo_out = [], []
        for s in range(0, m, block):
            e = min(s + block, m)
            sims = vm[s:e] @ vm.T
            ii, jj = np.nonzero(sims >= cut_lo)
            keep = jj < (ii + s)  # lower-id mate only, no self
            ii, jj = ii[keep], jj[keep]
            band = sims[ii, jj] < cut_hi
            sure[ii[~band] + s] = True  # bool store dedups for free
            hi_out.append(ids[ii[band] + s])
            lo_out.append(ids[jj[band]])
        border_hi = (
            np.concatenate(hi_out)
            if hi_out
            else np.array([], dtype=np.int64)
        )
        border_lo = (
            np.concatenate(lo_out)
            if lo_out
            else np.array([], dtype=np.int64)
        )
        n_sure = int(sure.sum())
        # NULL b_vid marks a certain drop (no verify needed); the
        # nullable Int64 dtype survives the Arrow long conversion
        bv = pd.array(
            np.concatenate(
                [np.zeros(n_sure, dtype=np.int64), border_lo]
            ),
            dtype="Int64",
        )
        bv[:n_sure] = pd.NA
        return pd.DataFrame(
            {
                "vid": np.concatenate([ids[sure], border_hi]),
                "b_vid": bv,
            }
        )

    # persist: ``cand`` (skinny id pairs) fans out to the sure-drop
    # filter and the border-verify join; unpersisted, the whole
    # applyInPandas pair scan runs twice.
    cand = assigned.select("vid", "vec", "cluster", "sub").groupBy(
        "cluster", "sub"
    ).applyInPandas(cluster_pairs, pair_schema).persist()
    sure_drops = cand.filter(F.col("b_vid").isNull()).select(
        F.col("vid").alias("drop_vid")
    )
    # exact verification of the near-threshold band: the threshold
    # decision is the fold's.  Vector payloads come from the cached
    # ``assigned`` (same vid/vec/nrm columns), not ``v`` — joining
    # ``v`` here would re-execute the raw scan subtree twice more.
    av = assigned.select("vid", "vec", "nrm")
    border_drops = (
        cand.filter(F.col("b_vid").isNotNull())
        .join(
            av.select(
                F.col("vid").alias("b_vid"),
                F.col("vec").alias("b_vec"),
                F.col("nrm").alias("b_nrm"),
            ),
            "b_vid",
        )
        .join(av, "vid")
        .filter(
            _dot(F.col("vec"), F.col("b_vec"))
            / (F.col("nrm") * F.col("b_nrm"))
            >= F.lit(threshold)
        )
        .select(F.col("vid").alias("drop_vid"))
    )
    droppers = sure_drops.unionByName(border_drops).distinct()
    if debug_frames is not None:
        debug_frames.update(
            rough=rough, best=best, assigned=assigned, cand=cand,
            droppers=droppers,
        )
    return assigned.join(
        droppers, assigned["vid"] == droppers["drop_vid"], "left"
    ).select(
        F.col("vid").alias(id_col),
        F.col("cluster"),
        F.col("drop_vid").isNull().alias("is_kept"),
    )
