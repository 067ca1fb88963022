"""Stream-stream joins (Structured Streaming superset, SURVEY §2.9).

The reference never joins two live streams (its consumer enriches
against static Postgres state), but a complete streaming engine needs
the operator: two unbounded inputs, each watermarked, joined with an
event-time range condition so Spark can bound the join state — rows
older than watermark + range are evicted instead of accumulating
forever. Without BOTH watermarks and the time-range predicate the
state store grows unboundedly; this module's API makes those
mandatory."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    within: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands within
    ``[left_ts, left_ts + within]`` — the click-attribution /
    enrichment shape.

    Both sides are watermarked with ``watermark``; state for a given
    event is dropped once the other stream's watermark passes its
    eligibility window, so state size tracks the rate × window
    product, not history. For outer joins Spark additionally needs
    the time bound to know when an unmatched row can be emitted."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how)
