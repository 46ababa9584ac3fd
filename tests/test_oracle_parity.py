"""Oracle parity: every registered plan with an oracle must match
DuckDB exactly at sf0.01 — same row count, same schema names, same
values (bit-exact for the decimal-routed aggregates).

This mirrors the driver's CORRECTNESS gate so regressions surface
locally before a round ends.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from omniengine_spark.plans import ORACLES, QUERIES

from .conftest import SF_CORRECT


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all columns — the driver's
    order-insensitive comparison."""
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _assert_frames_equal(spark_pd: pd.DataFrame, duck_pd: pd.DataFrame, name: str):
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: row count {len(spark_pd)} != oracle {len(duck_pd)}"
    )
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"{name}: columns {sorted(spark_pd.columns)} != "
        f"oracle {sorted(duck_pd.columns)}"
    )
    a, b = _canon(spark_pd), _canon(duck_pd)
    # The driver's value-hash is dtype-sensitive: DuckDB HUGEINT sums
    # surface as float64 while Spark returns int64, hashing differently
    # even when every value is equal (round-1 lesson — 11 plans failed
    # only on this).  Enforce pandas dtype equality column-by-column.
    def _canon_dtype(dt) -> str:
        s = str(dt)
        # Driver evidence (r1): f2/x1 hash-matched with spark
        # datetime64[ns] vs duckdb datetime64[us], so timestamp unit
        # is normalized by the driver; int64-vs-float64 is NOT.
        return "datetime64" if s.startswith("datetime64") else s

    for col in a.columns:
        assert _canon_dtype(a[col].dtype) == _canon_dtype(b[col].dtype), (
            f"{name}.{col}: spark dtype {a[col].dtype} != "
            f"oracle dtype {b[col].dtype} (driver hash is dtype-sensitive; "
            f"CAST the oracle aggregate, see VERDICT r1)"
        )
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, (
                    f"{name}.{col}[{i}]: {x!r} != {y!r} (Δ={x - y!r})"
                )
            else:
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"


ORACLE_NAMES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    q = QUERIES[name]
    spark_pd = q(spark, SF_CORRECT).toPandas()
    duck_pd = duck.execute(ORACLES[name]).fetchdf()
    _assert_frames_equal(spark_pd, duck_pd, name)


def test_all_queries_have_runnable_plans(spark):
    # Plans without oracles must still run and return a stable schema.
    for name, q in QUERIES.items():
        df = q(spark, SF_CORRECT)
        assert df.columns, f"{name}: empty schema"
