"""As-of join: match each left row to the latest right row at or
before its timestamp, per key — the time-series/attribution primitive
(trades-to-quotes, purchase-to-last-click, sensor alignment).

Spark-first design. The naive formulation is a θ-join on
``r.ts <= l.ts`` + keep-latest, which Catalyst can only plan as a
broadcast-nested-loop or an exploding inequality sort-merge — O(n·m)
pairs per key before the cut. Columnar engines with a native ASOF
operator (e.g. DuckDB's ASOF JOIN) all implement the same thing this
module expresses with stock operators: tag the two sides, union them,
hash-shuffle once on the key, sort each partition by (ts, side,
payload), and let a running ``last(ignore nulls)`` window carry the
most recent right payload into every left row. O((n+m) log(n+m)) per
key partition, no pair explosion, and the single exchange is
AQE-skew-splittable — the plan that survives 100 TB.

Determinism: the sort key is total — (ts, side, payload struct) —
so ties between right rows at the same timestamp resolve to the
largest payload struct (field order: ts, then the payload columns in
caller order) on any engine and any partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str,
    payload_cols: list[str],
    *,
    allow_exact_matches: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. Every ``left`` row gains ``ts{suffix}`` plus
    ``{c}{suffix}`` for each payload column — taken from the latest
    ``right`` row with the same key and ``right.ts <= left.ts``
    (``< left.ts`` when ``allow_exact_matches=False``), or NULLs when
    no right row precedes it (left-outer semantics).

    ``left`` must not already contain the output column names or the
    internal ``_is_left`` / ``_rpay`` markers.
    """
    keys = [on] if isinstance(on, str) else list(on)
    for c in ("_is_left", "_rpay"):
        if c in left.columns or c in right.columns:
            raise ValueError(f"column name {c!r} is reserved by asof_join")

    payload = F.struct(
        F.col(ts_col).alias("ts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col),
        payload.alias("_rpay"),
    ).withColumn("_is_left", F.lit(1 if not allow_exact_matches else 0))
    l = left.withColumn(
        "_is_left", F.lit(0 if not allow_exact_matches else 1)
    )

    # Equal-timestamp ordering encodes the match mode: with exact
    # matches allowed the right row sorts first (visible to the left
    # row's "everything strictly before me" frame); in strict mode the
    # left row sorts first, hiding same-instant right rows.
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc(), F.col("_rpay").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    filled = u.withColumn("_asof", F.last("_rpay", ignorenulls=True).over(w))

    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("_asof.ts").alias(f"ts{suffix}"))
    out_cols.extend(F.col(f"_asof.{c}").alias(f"{c}{suffix}") for c in payload_cols)
    is_left_val = 1 if allow_exact_matches else 0
    return filled.filter(F.col("_is_left") == is_left_val).select(*out_cols)


# ---------------------------------------------------------------------------
# Driver-contract query: last-click attribution over the events table.
# ---------------------------------------------------------------------------

from simple_etl_spark.engine import Catalog  # noqa: E402
from simple_etl_spark.queries import query  # noqa: E402


@query(
    "events_asof_attribution",
    oracle="""
    WITH pc AS (
        SELECT p.event_id, p.user_id, p.ts,
               c.ts AS click_ts, c.event_id AS click_event_id,
               c.value AS click_value,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.ts DESC, c.event_id DESC, c.value DESC
               ) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id AND c.ts <= p.ts
    )
    SELECT event_id, user_id, ts, click_ts, click_event_id, click_value
    FROM pc WHERE rn = 1
    """,
    survey="AS-OF join (union + fill-forward window — the custom "
    "operator Spark lacks natively, per-key single shuffle; oracle is "
    "the ANSI keep-latest θ-join twin)",
)
def events_asof_attribution(cat: Catalog) -> DataFrame:
    """Last-click attribution: each purchase matched to the same
    user's latest click at or before the purchase instant (NULLs when
    the user never clicked before buying)."""
    ev = cat["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, clicks, on="user_id", ts_col="ts",
        payload_cols=["event_id", "value"], suffix="_click",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.col("ts_click").cast("timestamp_ntz").alias("click_ts"),
        F.col("event_id_click").alias("click_event_id"),
        F.col("value_click").alias("click_value"),
    )
