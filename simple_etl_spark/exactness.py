"""Cross-engine numeric exactness helpers.

The correctness gate hash-compares Spark results against a DuckDB
oracle, so floating-point aggregates must be *bit-identical*, not just
close. Strategy: aggregate in DECIMAL (exact, order-insensitive), then
convert the exact decimal to double at the very end; any further
arithmetic is a single deterministic double op mirrored in the oracle
SQL. Plain double SUM/AVG would differ in the last ulps because Spark
and DuckDB reduce in different orders.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Precision 9 (not 18): Spark's Decimal stays on the Long fast path
# when every intermediate precision ≤ 18 — (9,2) elements keep sums at
# (19,2) and products at (14,4), all Long-backed; (18,2) elements push
# products past precision 19 onto the BigDecimal slow path (~40×
# slower per row). All measured quantities are < 10^7 so (9,2) is
# lossless here; widen per-call if a column can exceed it.
DEC = "decimal(9,2)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact sum of a 2-dp quantity, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-sum average: decimal sum converted to double, then one
    double division by the group count (same op in the oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def oracle_sum(expr: str, alias: str) -> str:
    return f"cast(sum(cast({expr} as decimal(9,2))) as double) as {alias}"


def oracle_avg(expr: str, alias: str) -> str:
    return f"cast(sum(cast({expr} as decimal(9,2))) as double) / count(*) as {alias}"
