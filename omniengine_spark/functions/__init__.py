"""Scalar column-expression library (SURVEY §2.8 F1-F9).

Everything here is a pure pyspark.sql.functions composition — JVM-side,
whole-stage-codegen friendly.  No Python UDFs.
"""

from omniengine_spark.functions.scalars import (
    decimal_sum,
    epoch_to_ts,
    hex_to_amount,
    hex_to_long,
    money,
    null_to_zero,
    scale_base_units,
    trailing_window,
)

__all__ = [
    "decimal_sum",
    "epoch_to_ts",
    "hex_to_amount",
    "hex_to_long",
    "money",
    "null_to_zero",
    "scale_base_units",
    "trailing_window",
]
