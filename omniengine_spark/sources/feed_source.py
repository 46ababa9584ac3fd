"""Pluggable feed connector on the Spark 4 Python DataSource API
(SURVEY §2.1 S9-S12, the reference's HTTP polling cron surface).

``sources/http.py`` normalizes provider payloads into rows with the
fetch kept driver-side.  This module packages the same adapters as a
*registered Spark data source* — ``spark.read.format("omni_feed")``
— so feed ingestion composes like any other connector: one input
partition PER PROVIDER, fetched in parallel on executors, with the
normalizers reused verbatim.  Deployments point ``url.<provider>``
options at live endpoints; with no url option the partition serves
the deterministic fixture payload (network-free, like the reference
test style — updatePrices fixtures, ``updatePrices.py:113-236``).

At scale this is the correct shape for *many* feeds (hundreds of
markets × providers): each (provider, market) becomes an input
partition, fetch latency overlaps across executors, and the result
is a small exchange-free frame that broadcasts into rate joins.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql import types as T

from omniengine_spark.sources.http import (
    FEE_SCHEMA,
    RATE_SCHEMA,
    normalize_fee_estimates,
    normalize_fiat_rates,
)

# Deterministic fixture payloads per provider — the offline backend.
_RATE_FIXTURES: dict[str, dict] = {
    "alpha": {
        "USD": {"last": 51000.0},
        "EUR": {"last": 47000.0},
        "JPY": {"last": 7400000.0},
    },
    "beta": {
        "USD": {"last": 50950.0},
        "EUR": {"last": 46900.0},
    },
}
_FEE_FIXTURES: dict[str, dict] = {
    "mempool": {"fastestFee": 31, "halfHourFee": 18, "hourFee": 9},
    "bitgo": {"feePerKb": 21000},
}
_ASOF_EPOCH = 1_700_000_000


class _FeedPartition(InputPartition):
    def __init__(self, provider: str, url: str | None):
        self.provider = provider
        self.url = url


class _FeedReader(DataSourceReader):
    def __init__(self, kind: str, options: dict):
        self.kind = kind
        self.options = options

    def _providers(self) -> Sequence[str]:
        fixtures = _RATE_FIXTURES if self.kind == "rates" else _FEE_FIXTURES
        explicit = self.options.get("providers")
        if not explicit:
            return sorted(fixtures)
        return [p.strip() for p in explicit.split(",") if p.strip()]

    def partitions(self) -> Sequence[InputPartition]:
        fixtures = _RATE_FIXTURES if self.kind == "rates" else _FEE_FIXTURES
        parts = []
        for p in self._providers():
            url = self.options.get(f"url.{p}")
            # fail at PLANNING time with a clear message — an unknown
            # provider inside read() would surface as an opaque
            # executor-retry traceback
            if url is None and p not in fixtures:
                raise ValueError(
                    f"omni_feed: provider {p!r} has no url.{p} option "
                    f"and no fixture; known fixtures: {sorted(fixtures)}"
                )
            parts.append(_FeedPartition(p, url))
        return parts

    def read(self, partition: _FeedPartition) -> Iterator[tuple]:
        if partition.url is not None:
            with urllib.request.urlopen(
                partition.url, timeout=15
            ) as resp:  # pragma: no cover - live mode
                payload = json.loads(resp.read())
        elif self.kind == "rates":
            payload = _RATE_FIXTURES[partition.provider]
        else:
            payload = _FEE_FIXTURES[partition.provider]
        if self.kind == "rates":
            yield from normalize_fiat_rates(
                payload, partition.provider, _ASOF_EPOCH
            )
        else:
            yield from normalize_fee_estimates(payload, partition.provider)


class FeedDataSource(DataSource):
    """``format("omni_feed")`` — options: ``kind`` (rates|fees),
    ``providers`` (csv, optional), ``url.<provider>`` (optional live
    endpoint per provider; fixture payload otherwise)."""

    @classmethod
    def name(cls) -> str:
        return "omni_feed"

    def schema(self) -> T.StructType:
        return (
            RATE_SCHEMA
            if self.options.get("kind", "rates") == "rates"
            else FEE_SCHEMA
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return _FeedReader(self.options.get("kind", "rates"), self.options)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(FeedDataSource)
