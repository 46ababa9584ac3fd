"""Parquet table catalog over a warehouse directory.

The reference reads everything through per-row psycopg2 cursors
(reference ``sqltools.py:48-64``); here a "table" is a parquet dataset
and reads are columnar, pushdown-enabled scans.  ``load_table`` is the
single choke point so partition layout / format changes stay local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Harness-provided TPC-H-ish star schema + events/documents/embeddings
# (TESTDATA.md).  Dimension tables marked small are broadcast-preferred
# in joins; ``ts_cols`` are event-time columns stored by the generator
# as nanosecond parquet timestamps.
TABLES: dict[str, dict] = {
    "region": {"small": True},
    "nation": {"small": True},
    "customer": {"small": False},
    "supplier": {"small": True},
    "part": {"small": False},
    "orders": {"small": False, "ts_cols": ["o_orderdate"]},
    "lineitem": {"small": False, "ts_cols": ["l_shipdate"]},
    "events": {"small": False, "ts_cols": ["ts"]},
    "documents": {"small": False},
    "embeddings": {"small": False},
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table from the warehouse dir as a DataFrame.

    The harness parquet stores timestamps as TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; we read them as raw nano longs
    (``nanosAsLong``) and truncate to microsecond TimestampType — the
    same truncation DuckDB applies, so oracles agree.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Driver sessions are not built by our factory; pin the timezone
    # here so epoch/interval plans agree with the (UTC) DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in TABLES.get(name, {}).get("ts_cols", []):
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read several tables at once; defaults to the whole catalog."""
    names = names or list(TABLES)
    return {n: load_table(spark, sf_dir, n) for n in names}
