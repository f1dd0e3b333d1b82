"""Z-order (Morton-curve) clustering for multi-dimensional pruning.

Partition/bucket layouts prune on ONE leading dimension; a filter on
the second column of a sort key reads everything. Interleaving the
bits of two normalized keys into one Morton value and range-writing by
it gives every parquet file a tight min/max envelope in BOTH
dimensions, so scan-time row-group/file skipping works for either
predicate — the standard lakehouse technique for two-column point/range
workloads at 100 TB.

All plain column expressions: normalization is ``width_bucket`` over
the observed min/max (two scalars from one tiny aggregate), the
interleave is a shift/or chain over ``bits`` levels (codegen), and the
layout write is ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``
— one shuffle, paid once at write time like bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton value of two non-negative ints already in [0, 2^bits):
    bit j of ``a`` lands at position 2j+1, of ``b`` at 2j."""
    z = F.lit(0).cast("long")
    for j in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, j).bitwiseAND(F.lit(1)), 2 * j + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, j).bitwiseAND(F.lit(1)), 2 * j)
        )
    return z


def z_value(
    df: DataFrame, col_a: str, col_b: str, bits: int = 12
) -> DataFrame:
    """Attach ``__z``: the Morton value of the two columns, each
    min/max-normalized into 2^bits equal-width cells (one tiny
    aggregate produces all four scalars; constant per write job)."""
    stats = df.agg(
        F.min(col_a).alias("amin"),
        F.max(col_a).alias("amax"),
        F.min(col_b).alias("bmin"),
        F.max(col_b).alias("bmax"),
    ).first()
    if stats is None or any(stats[k] is None for k in range(4)):
        raise ValueError(
            f"z_value({col_a!r}, {col_b!r}): cannot normalize an empty "
            "DataFrame or an all-NULL cluster column (min/max undefined)"
        )
    cells = float(1 << bits)

    def bucket(c: str, lo, hi) -> Column:
        span = float(hi - lo) or 1.0
        raw = F.floor(
            (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span)
            * F.lit(cells)
        ).cast("long")
        return F.least(F.greatest(raw, F.lit(0)), F.lit((1 << bits) - 1))

    return df.withColumn(
        "__z",
        interleave_bits(
            bucket(col_a, stats["amin"], stats["amax"]),
            bucket(col_b, stats["bmin"], stats["bmax"]),
            bits,
        ),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 16,
    bits: int = 12,
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of
    (col_a, col_b): range-partition by ``__z`` into ``num_files``
    output tasks and sort within each, so every file's min/max
    envelope is tight in both dimensions and either predicate skips
    most files at scan time."""
    (
        z_value(df, col_a, col_b, bits)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
