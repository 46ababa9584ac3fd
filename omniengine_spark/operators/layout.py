"""Multi-dimensional data layout: Z-order clustering for file/row-
group skipping.

The reference's answer to "serve this address fast" is a btree per
column (``database/omni_db_schema.psql:101-117`` — nine single-column
indexes on AddressBalances/AddressesInTxs).  A columnar lake has no
btrees; what it has is min/max statistics per parquet file and row
group, and those only prune when the data is CLUSTERED on the filter
column.  A single-column sort clusters one dimension and destroys the
other; interleaving the bits of both keys (a Z-order / Morton curve —
the standard lakehouse recipe, cf. Delta/Iceberg OPTIMIZE ZORDER)
gives every file a tight bounding box in BOTH dimensions, so point or
range filters on EITHER column skip most files.

Everything here is codegen arithmetic (shifts/masks over integer
ranks) — the expensive part is the one range-partitioned sort, which
is exactly the shuffle a 100 TB layout job should spend.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits per dimension: 2 dims interleave into 32 bits — plenty of
# resolution for file-level clustering (a 100 TB table has ~10^5-10^6
# files; 2^32 curve positions over-resolve that by orders of
# magnitude).
_BITS = 16


def _quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column onto the integer grid [0, 2^bits-1] by
    min/max scaling — rank-free, so it needs only two scalar stats,
    not a global sort per dimension."""
    span = (hi - lo).cast("double")
    unit = (col - lo).cast("double") / F.when(span > 0, span).otherwise(
        F.lit(1.0)
    )
    return F.least(
        F.lit((1 << bits) - 1),
        F.floor(unit * ((1 << bits) - 1)).cast("long"),
    )


def _interleave(a: Column, b: Column, bits: int) -> Column:
    """Morton-interleave two ``bits``-wide integers: bit i of ``a``
    lands at position 2i+1, bit i of ``b`` at 2i.  Built as a sum of
    masked shifts — one codegen expression, no UDF."""
    parts = []
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        parts.append(F.shiftleft(bit_a, 2 * i + 1))
        parts.append(F.shiftleft(bit_b, 2 * i))
    return reduce(lambda x, y: x + y, parts)


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = _BITS
) -> DataFrame:
    """Attach a ``_zkey`` column: the Morton code of the two columns'
    quantized values.  Stats (min/max per dimension) come from one
    tiny aggregate broadcast back via crossJoin."""
    # 2·bits must stay below the BIGINT sign bit: at bits=32 the top
    # bit of dimension a lands at position 63, flipping keys negative
    # and breaking the curve's range ordering silently
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31]: {bits}")
    stats = df.agg(
        F.min(F.col(col_a).cast("long")).alias("_a_lo"),
        F.max(F.col(col_a).cast("long")).alias("_a_hi"),
        F.min(F.col(col_b).cast("long")).alias("_b_lo"),
        F.max(F.col(col_b).cast("long")).alias("_b_hi"),
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    qa = _quantize(
        F.col(col_a).cast("long"), F.col("_a_lo"), F.col("_a_hi"), bits
    )
    qb = _quantize(
        F.col(col_b).cast("long"), F.col("_b_lo"), F.col("_b_hi"), bits
    )
    return with_stats.withColumn(
        "_zkey", _interleave(qa, qb, bits)
    ).drop("_a_lo", "_a_hi", "_b_lo", "_b_hi")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = _BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-curve of (col_a, col_b): range-partition by ``_zkey`` (equal
    curve segments per file → tight per-file bounding boxes in both
    dimensions), drop the key, write.

    ``repartitionByRange`` samples the key distribution, so skew in
    curve position becomes file-size balance automatically — the same
    job layout Delta's OPTIMIZE ZORDER runs."""
    keyed = zorder_key(df, col_a, col_b, bits)
    (
        keyed.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
