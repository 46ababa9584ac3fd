"""HTTP source adapters (SURVEY §2.1 S9-S12).

The reference polls fiat-rate / market / fee / supply HTTP APIs from
cron scripts (``updatePrices.py:113-236``, ``updateFees.py:27-93``,
``sql.py:1460-1467``) and upserts rows one at a time.  Here each
adapter is a *pure function* from a parsed JSON response to rows, so
it is unit-testable with fixtures and network-free; the driver-side
fetch is a thin wrapper, and the rows land as a small DataFrame that
joins broadcast-style against facts.

No network calls happen in this module unless ``fetch_json`` is
invoked explicitly by a deployment.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RATE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("base", T.StringType(), False),
        T.StructField("quote", T.StringType(), False),
        T.StructField("rate", T.DoubleType(), False),
        T.StructField("asof_epoch", T.LongType(), False),
    ]
)

FEE_SCHEMA = T.StructType(
    [
        T.StructField("provider", T.StringType(), False),
        T.StructField("tier", T.StringType(), False),
        T.StructField("fee_per_kb", T.LongType(), False),
    ]
)


def fetch_json(url: str, timeout_s: int = 15) -> dict:
    """Driver-side fetch (reference 15 s API timeout,
    updatePrices.py:116).  Kept out of every test path."""
    with urllib.request.urlopen(url, timeout=timeout_s) as resp:
        return json.loads(resp.read())


# ---- pure response normalizers -------------------------------------

def normalize_fiat_rates(
    payload: dict, source: str, asof_epoch: int
) -> list[tuple]:
    """bitcoinaverage-shaped table {CUR: {last: x}} → rate rows
    (reference updateBTC, updatePrices.py:113-138)."""
    rows = []
    for cur, body in sorted(payload.items()):
        last = body.get("last") if isinstance(body, dict) else None
        if last is None:
            continue
        rows.append((source, "BTC", cur, float(last), asof_epoch))
    return rows


def normalize_market_quote(
    payload: dict, source: str, asof_epoch: int
) -> list[tuple]:
    """CMC-shaped [{symbol, price_btc}] → rate rows (reference
    updateOMNISP, updatePrices.py:189-236)."""
    rows = []
    for entry in payload.get("data", []):
        sym, price = entry.get("symbol"), entry.get("price_btc")
        if sym is None or price is None:
            continue
        rows.append((source, sym, "BTC", float(price), asof_epoch))
    return rows


def normalize_fee_estimates(payload: dict, provider: str) -> list[tuple]:
    """BitGo/mempool-shaped fee maps → (provider, tier, fee) rows
    (reference updateFees.py:27-93)."""
    rows = []
    for tier in ("fastestFee", "halfHourFee", "hourFee"):
        if tier in payload:
            rows.append((provider, tier, int(payload[tier])))
    if "feePerKb" in payload:
        rows.append((provider, "feePerKb", int(payload["feePerKb"])))
    return rows


def vwap(trades: Iterable[tuple[float, float]]) -> float | None:
    """Volume-weighted average price over (amount, rate) pairs
    (reference updatePrices.py:215-222)."""
    num = den = 0.0
    for amount, rate in trades:
        num += amount * rate
        den += amount
    return num / den if den else None


# ---- DataFrame constructors ----------------------------------------

def rates_frame(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, RATE_SCHEMA)


def fees_frame(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, FEE_SCHEMA)
