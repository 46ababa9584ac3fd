"""Round-12 construction memos and write distribution.

The memos reuse UNEXECUTED logical plans only — these tests pin the
three properties that keep that safe: same-session/same-file hits,
file-identity invalidation (a rewritten table must never be served a
stale plan), and zero result caching (actions recompute from parquet).
Plus the partition-distributed write layout (one file per partition
value).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from omniengine_spark.sources.catalog import (
    _RAW_SCHEMA_MEMO,
    _TABLE_MEMO,
    _path_sig,
    load_table,
)

from .conftest import SF_SMOKE


def test_load_table_memo_hits_same_session(spark):
    a = load_table(spark, SF_SMOKE, "region")
    b = load_table(spark, SF_SMOKE, "region")
    assert a is b  # identical unexecuted plan object, no re-read
    # and distinct tables / sf dirs get distinct entries
    c = load_table(spark, SF_SMOKE, "nation")
    assert c is not a


def test_load_table_memo_invalidates_on_rewrite(spark, tmp_path):
    src = tmp_path / "t.parquet"
    spark.range(3).toPandas().to_parquet(src)
    a = spark.read.parquet(str(src))  # warm the reader path
    df1 = load_table(spark, str(tmp_path), "t")
    assert df1.count() == 3
    # rewrite in place with different content: new (mtime, size)
    os.remove(src)
    spark.range(5).select(F.col("id")).toPandas().to_parquet(src)
    df2 = load_table(spark, str(tmp_path), "t")
    assert df2 is not df1  # stale plan must not be served
    assert df2.count() == 5


def test_memo_holds_plans_not_results(spark):
    # the memoized object must be lazy: no cached rows, every action
    # re-executes (spot-check: the plan has no InMemoryRelation and
    # clearing the cache does not affect it)
    df = load_table(spark, SF_SMOKE, "customer")
    spark.catalog.clearCache()
    n1 = df.count()
    n2 = df.count()
    assert n1 == n2 > 0
    assert "InMemoryRelation" not in df._jdf.queryExecution().analyzed().toString()


def test_path_sig_changes_with_content(tmp_path):
    p = tmp_path / "x.parquet"
    p.write_bytes(b"aaaa")
    s1 = _path_sig(str(p))
    p.write_bytes(b"bbbbbbbb")
    s2 = _path_sig(str(p))
    assert s1 is not None and s2 is not None and s1 != s2
    assert _path_sig(str(tmp_path / "missing")) is None


def test_stamped_deltas_memo_and_equivalence(spark):
    from omniengine_spark.pipeline import (
        expand_deltas,
        stamp_serials_distributed,
    )
    from omniengine_spark.plans.pipeline_plans import (
        _stamped_deltas,
        _tx_stream,
    )

    a = _stamped_deltas(spark, SF_SMOKE)
    b = _stamped_deltas(spark, SF_SMOKE)
    assert a is b
    # memoized chain == freshly built chain, row for row
    fresh = expand_deltas(
        stamp_serials_distributed(_tx_stream(spark, SF_SMOKE))
    )
    cols = sorted(fresh.columns)
    assert sorted(a.columns) == cols
    diff = a.select(*cols).exceptAll(fresh.select(*cols))
    assert diff.isEmpty()


def test_write_partitioned_one_file_per_partition(spark, tmp_path):
    from omniengine_spark.sources.sinks import write_partitioned

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    out = str(tmp_path / "wh")
    write_partitioned(df, out, ["k"])
    for k in range(7):
        part = os.path.join(out, f"k={k}")
        files = [f for f in os.listdir(part) if f.endswith(".parquet")]
        assert len(files) == 1, (k, files)  # hash-distributed: 1 file/value
    # dynamic overwrite still replaces only the partitions present
    patch = spark.range(50).select(
        F.col("id"), F.lit(3).alias("k")
    )
    write_partitioned(patch, out, ["k"])
    back = spark.read.parquet(out)
    assert back.filter("k = 3").count() == 50
    assert back.filter("k = 2").count() == 1000 // 7 + (1 if 2 < 1000 % 7 else 0)
    shutil.rmtree(out, ignore_errors=True)
