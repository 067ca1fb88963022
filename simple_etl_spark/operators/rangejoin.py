"""Bucketed range join: match point rows to the intervals containing
them, per key — without the θ-join pair explosion.

A raw ``p.ts BETWEEN i.start AND i.end`` join (plus key equality)
gives Catalyst only an inequality predicate beyond the key, so every
key group devolves to an O(points·intervals) comparison — the shape
that dies first at 100 TB. The standard fix (what engines with native
range-join optimization do internally) is expressible with stock
operators: decompose each interval into the fixed-width buckets it
overlaps (``sequence()`` + ``explode``), assign each point its single
bucket, equi-join on (key, bucket) — a hash shuffle, broadcastable,
AQE-skew-splittable — and keep exact containment as a residual
predicate. Each (point, interval) pair can only meet in the point's
one bucket, so no dedup pass is needed. Bucket width tunes the trade:
wider → fewer interval replicas, narrower → tighter candidate sets;
pick it near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
}


def _bucket_seconds(bucket: str) -> int:
    try:
        qty, unit = bucket.strip().split()
        return int(qty) * _UNIT_SECONDS[unit.lower()]
    except (ValueError, KeyError):
        raise ValueError(
            f"bucket must look like '1 day' / '6 hours', got {bucket!r}"
        ) from None


def _bucket_id(col: Column, width_s: int) -> Column:
    # floor(epoch / width): integer bucket ids — engine-reproducible,
    # and monotone, so ts ∈ [start, end] ⇒ bucket(ts) ∈
    # [bucket(start), bucket(end)] (coverage is exact, never missed)
    return F.floor(F.unix_timestamp(col) / F.lit(width_s)).cast("bigint")


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with the same key
    whose ``[start_col, end_col]`` contains ``point_col`` (inclusive
    both ends). ``how`` is ``inner`` or ``left`` (a point without any
    containing interval keeps NULL interval columns).

    Output: all point columns, then the interval's non-key columns.
    Non-key column names must not collide between the inputs —
    project/rename beforehand."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    width = _bucket_seconds(bucket)

    overlap = set(points.columns) & set(intervals.columns) - set(keys)
    if overlap:
        raise ValueError(f"non-key columns collide: {sorted(overlap)}")

    iv_cols = [c for c in intervals.columns if c not in keys]
    iv = intervals.select(
        *[F.col(k).alias(f"_rj_{k}") for k in keys],
        *iv_cols,
        F.explode(
            F.sequence(
                _bucket_id(F.col(start_col), width),
                _bucket_id(F.col(end_col), width),
            )
        ).alias("_rj_bucket"),
    )
    pt = points.withColumn("_rj_pbucket", _bucket_id(F.col(point_col), width))

    cond = F.col("_rj_pbucket") == F.col("_rj_bucket")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_rj_{k}"))
    cond = (
        cond
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    joined = pt.join(iv, cond, how)
    return joined.select(*points.columns, *iv_cols)


# ---------------------------------------------------------------------------
# Driver-contract query: purchases inside the user's same-day click span.
# ---------------------------------------------------------------------------

from simple_etl_spark.engine import Catalog  # noqa: E402
from simple_etl_spark.queries import query  # noqa: E402


@query(
    "events_range_join_sessions",
    oracle="""
    WITH spans AS (
        SELECT user_id, min(ts) AS span_start, max(ts) AS span_end,
               count(*) AS n_clicks
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, cast(ts as date)
    ),
    p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           s.span_start, s.span_end, s.n_clicks
    FROM p LEFT JOIN spans s
      ON s.user_id = p.user_id
     AND p.ts >= s.span_start AND p.ts <= s.span_end
    """,
    survey="RANGE join (interval containment via bucket decomposition "
    "— equi-join on (key, bucket) + residual predicate, no θ-join "
    "explosion; oracle is the ANSI BETWEEN twin)",
)
def events_range_join_sessions(cat: Catalog) -> DataFrame:
    """Each purchase joined to the same user's same-day click span
    containing it (left: purchases outside any click span keep
    NULLs) — point-in-interval matching at one hash shuffle."""
    ev = cat["events"]
    spans = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").cast("date").alias("_d"))
        .agg(
            F.min("ts").alias("span_start"),
            F.max("ts").alias("span_end"),
            F.count(F.lit(1)).alias("n_clicks"),
        )
        .drop("_d")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = range_join_bucketed(
        purchases, spans, on="user_id", point_col="ts",
        start_col="span_start", end_col="span_end",
        bucket="1 day", how="left",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.col("span_start").cast("timestamp_ntz").alias("span_start"),
        F.col("span_end").cast("timestamp_ntz").alias("span_end"),
        "n_clicks",
    )
