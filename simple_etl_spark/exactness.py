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


def units(col: Column | str, scale: int = 2) -> Column:
    """A 2-dp quantity as integer units of 10^-scale (long).

    The decimal(9,2) cast fixes the rounding (HALF_UP, matching the
    oracle's cast); the *100 and the long conversion are exact. From
    here on, per-row arithmetic and the sum accumulator run entirely
    in JVM longs — the same int64-with-tracked-scale strategy columnar
    engines use internally for decimal aggregation — instead of the
    BigDecimal slow path that Spark's sum(decimal) promotion (p+10 >
    18) would force.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast(DEC) * F.lit(10**scale)).cast("long")


def lsum(units_col: Column, scale: int, alias: str) -> Column:
    """Sum of integer units → double value (exact S/10^scale).

    Scale posture: the group sum S overflows int64 loudly (ANSI mode)
    rather than silently, and stays double-exact while S < 2^53 —
    ~9·10^15 units, i.e. ~10^11 rows of typical 2-dp values per group
    at scale=2. Beyond that envelope use :func:`dsum` (decimal
    accumulator, unbounded) — correctness first, speed where safe.
    """
    return (F.sum(units_col).cast("double") / F.lit(float(10**scale))).alias(alias)


def lavg(units_col: Column, scale: int, alias: str) -> Column:
    """Exact-sum average on the long fast path (see lsum)."""
    return (
        F.sum(units_col).cast("double") / F.lit(float(10**scale)) / F.count(F.lit(1))
    ).alias(alias)


def oracle_sum(expr: str, alias: str) -> str:
    return f"cast(sum(cast({expr} as decimal(9,2))) as double) as {alias}"


def oracle_avg(expr: str, alias: str) -> str:
    return f"cast(sum(cast({expr} as decimal(9,2))) as double) / count(*) as {alias}"
