"""The omni block-sync pipeline (SURVEY §3.1) as bronze→silver→gold
DataFrame stages."""

from omniengine_spark.pipeline.omni import (
    RAW_TX_SCHEMA,
    build_balances,
    expand_deltas,
    stamp_serials,
    stamp_serials_distributed,
    with_after_balances,
)

__all__ = [
    "RAW_TX_SCHEMA",
    "build_balances",
    "expand_deltas",
    "stamp_serials",
    "stamp_serials_distributed",
    "with_after_balances",
]
