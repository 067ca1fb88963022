"""Multi-dimensional data layout: Z-order clustered parquet writes.

A table range-partitioned and sorted on ONE key prunes scans on that
key alone; filters on a second dimension read everything. Interleaving
the key bits (Morton / Z-order curve) makes file and row-group min/max
stats narrow in EVERY participating dimension at once, so the parquet
reader's stats-based skipping works for filters on any of them — the
standard layout trick behind `OPTIMIZE ... ZORDER BY` in lakehouse
engines, reconstructed here from public curve math.

The z-value is pure integer bit arithmetic (shift/mask/or), so any
SQL engine reproduces it bit-for-bit and it can serve as a sort or
range-partition key in plans and oracles alike.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton code of the low ``bits`` bits of the given non-negative
    integer columns: bit ``j`` of column ``i`` lands at position
    ``j * len(cols) + i``. One codegen expression (``2 * bits *
    len(cols)`` shift/mask terms), no UDF.

    Callers map raw values into [0, 2^bits) first (e.g. ``% 2**bits``
    or a scaled quantile rank) — the curve needs bounded coordinates;
    values beyond ``bits`` bits would silently alias, so the low-bit
    mask is applied here defensively."""
    ncols = len(cols)
    z = F.lit(0).cast("bigint")
    for i, col in enumerate(cols):
        c = (F.col(col) if isinstance(col, str) else col).cast("bigint")
        for j in range(bits):
            z = z + (
                F.shiftleft(
                    F.shiftright(c, j).bitwiseAND(F.lit(1)), j * ncols + i
                )
            )
    return z


def zvalue_sql(cols: list[str], bits: int = 16) -> str:
    """The DuckDB/ANSI twin of :func:`zvalue` — same bit placement,
    rendered as a SQL expression string for oracles."""
    terms = []
    for i, col in enumerate(cols):
        for j in range(bits):
            terms.append(f"((({col} >> {j}) & 1) << {j * len(cols) + i})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered along the Z-order curve of
    ``zcols``: range-partition on the z-value (contiguous curve
    segments per file), sort within each partition, drop the helper
    column. Files then carry narrow min/max for EVERY z column, so
    stats-based file/row-group skipping serves filters on any of them.

    At 100 TB this is the compaction-time layout pass: a periodic
    rewrite job, not a per-query cost. ``num_files`` sizes the curve
    segments (files ~ |df| / num_files rows each); on a cluster set it
    from the table size / target file size (e.g. 1 GiB)."""
    z = zvalue(list(zcols), bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
