#!/usr/bin/env python
"""Diagnose the sf1->sf5 super-linear dedup exponents: for each
offender, separate CANDIDATE growth (algorithmic, fixable) from
OUTPUT growth (the data's true pair count, which no exact algorithm
can beat).  Run:  python tools/dedup_diag.py .localdata/sf1 .localdata/sf5
"""
from __future__ import annotations

import sys
from fractions import Fraction
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from omniengine_spark.operators import dedup as D
    from omniengine_spark.session import get_spark
    from omniengine_spark.sources.catalog import load_table

    spark = get_spark(app_name="dedup-diag", shuffle_partitions=32)
    for sf_dir in sys.argv[1:]:
        docs = load_table(spark, sf_dir, "documents")
        n = docs.count()
        print(f"=== {sf_dir}: {n} docs", flush=True)

        # --- ngram jaccard: prefix-bucket candidates vs output
        t = Fraction(4, 5)
        hd = D.hashed_shingle_docs(docs, "doc_id", "text", 3)
        prefix_len = (
            F.size("hs")
            - F.expr("(4 * size(hs) + 4) div 5")
            + 1
        )
        prefix = hd.select(
            "doc_id",
            F.size("hs").alias("n_sh"),
            F.explode_outer(
                F.slice("hs", F.lit(1), prefix_len)
            ).alias("shash"),
        )
        cand = (
            prefix.alias("a")
            .join(
                prefix.alias("b"),
                (F.col("a.shash") == F.col("b.shash"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
                & (F.col("a.n_sh") * 4 <= F.col("b.n_sh") * 5)
                & (F.col("b.n_sh") * 4 <= F.col("a.n_sh") * 5),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
        )
        raw = cand.count()
        dist = cand.distinct().count()
        out = D.jaccard_similarity_join(
            docs, "doc_id", "text", n=3, threshold=t
        ).count()
        print(
            f"ngram    cand_raw={raw:>12,} cand_dist={dist:>12,} "
            f"out={out:>10,}",
            flush=True,
        )

        # --- minhash bands (dedup_clusters candidate source)
        sigs = D.minhash_signatures(docs, "doc_id", "text", 3, 64)
        band_rows = 2
        num_bands = 32
        bands = sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.xxhash64(
                                *[
                                    F.col("sig")[bi * band_rows + r]
                                    for r in range(band_rows)
                                ]
                            ).alias("bucket"),
                        )
                        for bi in range(num_bands)
                    ]
                )
            ).alias("bb"),
        ).select("doc_id", "bb.band", "bb.bucket")
        sdf2 = (
            bands.groupBy("band", "bucket")
            .count()
            .agg(
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias(
                    "pairs"
                )
            )
            .collect()[0]["pairs"]
        )
        mout = D.minhash_lsh_pairs(
            docs, "doc_id", "text", 3, 64, 2, t
        ).count()
        print(
            f"minhash  band_pairs={int(sdf2):>12,} out={mout:>10,}",
            flush=True,
        )

        # --- simhash: band-bucket pairs vs output
        fps = D.simhash(
            docs, "doc_id", "text", bits=60, hasher=D.md5_token_hash
        )
        n_bands = 4
        width = 15
        sbands = fps.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.shiftrightunsigned(
                                F.col("simhash64"), bi * width
                            )
                            .bitwiseAND(F.lit((1 << width) - 1))
                            .alias("bucket"),
                        )
                        for bi in range(n_bands)
                    ]
                )
            ).alias("bb"),
        ).select("doc_id", "bb.band", "bb.bucket")
        sh2 = (
            sbands.groupBy("band", "bucket")
            .count()
            .agg(
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias(
                    "pairs"
                )
            )
            .collect()[0]["pairs"]
        )
        sout = D.simhash_near_pairs(
            docs, "doc_id", "text", max_hamming=3, bits=60,
            hasher=D.md5_token_hash,
        ).count()
        print(
            f"simhash  band_pairs={int(sh2):>12,} out={sout:>10,}",
            flush=True,
        )


if __name__ == "__main__":
    main()
