#!/usr/bin/env python
"""Scale-parity sweep: re-run the oracle comparison at a bigger scale
factor than the driver's sf0.01 gate, to catch scale-dependent
divergence (e.g. conversion ulp edges that need 600k rows to appear).

Usage: python tools/scale_parity.py [sf_dir] [plan ...]
Defaults to sf0.1 and every oracle-backed plan.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))


def main() -> None:
    from omniengine_spark.plans import ORACLES, QUERIES
    from omniengine_spark.session import get_spark
    from tests.conftest import make_duck

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # The Jaccard-family oracles are all-pairs in DuckDB — O(N²) list
    # intersections (12.5M pairs at sf0.1; 1.25B at sf1) make the
    # ORACLE the bottleneck; run them explicitly if you have the
    # minutes.  The Spark plans themselves are banded/bucketed and
    # fine at sf1 (see tools/scale_soak_sf1.json); their semantics at
    # scale are pinned instead by the union-find/hypothesis tests.
    slow_oracles = {
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        # O(N²) DuckDB side: 20k vectors → 200M list-dot pairs
        "dedup_embedding_cosine",
        # recursive-CTE closure over an all-pairs Jaccard edge list —
        # tractable at the sf0.1 sweep, hours at sf1's 50k docs
        "dedup_clusters",
        # same all-pairs Jaccard oracle as dedup_minhash_lsh (1.25B
        # list intersections at sf1's 50k docs — measured >58 min
        # before timeout, round 10); engine-side equality with the
        # one-shot banded pair set is pinned instead at rv25 (1.25M
        # docs, 25× this scale) by tools/stream_steady.py
        "dedup_incremental_shard",
        "dedup_stream_ingest",
    }
    names = sys.argv[2:] or sorted(set(ORACLES) - slow_oracles)

    spark = get_spark(app_name="scale-parity", shuffle_partitions=32)
    duck = make_duck(sf_dir)

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    fails = 0
    for name in names:
        s = QUERIES[name](spark, sf_dir).toPandas()
        d = duck.execute(ORACLES[name]).fetchdf()
        ok = len(s) == len(d) and sorted(s.columns) == sorted(d.columns)
        if ok:
            a, b = canon(s), canon(d)
            for col in a.columns:
                for x, y in zip(a[col], b[col]):
                    if (
                        isinstance(x, float)
                        and isinstance(y, float)
                        and math.isnan(x)
                        and math.isnan(y)
                    ):
                        continue
                    if x != y:
                        ok = False
                        print(f"  MISMATCH {name}.{col}: {x!r} != {y!r}")
                        break
                if not ok:
                    break
        fails += 0 if ok else 1
        print(("OK  " if ok else "FAIL"), name, len(s), "rows", flush=True)
    print("fails:", fails)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
