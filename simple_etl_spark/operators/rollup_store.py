"""Incremental materialized rollup — combinable state, never rescan history.

At 100 TB the daily analytics rollup (A4 family, reference
init.sql:91-103) cannot be recomputed from raw events on every load;
the production pattern is a materialized per-day state of COMBINABLE
aggregates that each new batch merges into:

- counts and integer-cent sums merge by addition (exact),
- distinct counts merge as HLL register maps by per-bucket max
  (exact merge of the sketch: merge(partial(A), partial(B)) ≡
  partial(A ∪ B) bit-for-bit — the mergeability property tested in
  tests/test_sketches.py and relied on here).

Non-combinable aggregates (exact medians, exact distincts) are
precisely the ones this pattern CANNOT maintain — which is why the
sketch columns exist.

State schema: (day, total_events, value_units, user_regs
map<bucket, m_j>). The map stays JVM-side (map_from_entries /
map_zip_with — no Python in the path), and the estimate is derived by
exploding the registers through the same
:func:`~simple_etl_spark.operators.sketches.hll_estimate` fold the
one-shot queries use, so incremental and direct answers agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_etl_spark.engine import Catalog
from simple_etl_spark.exactness import units
from simple_etl_spark.operators.sketches import (
    _hll_oracle_sql,
    hll_estimate,
    hll_registers,
)
from simple_etl_spark.queries import query


def partial_rollup(events: DataFrame, p: int = 8) -> DataFrame:
    """Fold a batch of events into per-day combinable state. Two
    grouped aggregations (scalars; registers) joined on day — the
    register side is ≤ 2**p rows per day before the map fold."""
    day = F.col("ts").cast("date").alias("day")
    scal = events.groupBy(day).agg(
        F.count(F.lit(1)).alias("total_events"),
        F.sum(units("value")).alias("value_units"),
    )
    regs = hll_registers(
        events.select(day, "user_id"), "user_id", ["day"], p=p
    )
    reg_map = regs.groupBy("day").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("m_j")))
        ).alias("user_regs")
    )
    # LEFT join: a day whose user_ids are all NULL has counts and sums
    # but no registers (hll_registers skips NULL keys, as COUNT
    # DISTINCT would) — it must keep its scalars with an empty
    # register map, not vanish from the state.
    empty_map = F.map_from_arrays(
        F.array().cast("array<bigint>"), F.array().cast("array<int>")
    )
    return scal.join(reg_map, "day", "left").withColumn(
        "user_regs", F.coalesce(F.col("user_regs"), empty_map)
    )


def merge_rollup(a: DataFrame, b: DataFrame) -> DataFrame:
    """Combine two rollup states: full-outer on day, add the scalars,
    per-bucket max of the register maps. Associative and commutative,
    so batches can arrive in any order and partial states can be
    merged tree-wise across a cluster."""
    zero = F.lit(0).cast("long")
    la, lb = a.alias("l"), b.alias("r")
    joined = la.join(lb, "day", "full_outer")
    lc = lambda c: F.col(f"l.{c}")  # noqa: E731
    rc = lambda c: F.col(f"r.{c}")  # noqa: E731
    both = F.map_zip_with(
        lc("user_regs"),
        rc("user_regs"),
        lambda k, v1, v2: F.greatest(F.coalesce(v1, F.lit(0)), F.coalesce(v2, F.lit(0))),
    )
    regs = (
        F.when(lc("user_regs").isNull(), rc("user_regs"))
        .when(rc("user_regs").isNull(), lc("user_regs"))
        .otherwise(both)
    )
    return joined.select(
        F.col("day"),
        (F.coalesce(lc("total_events"), zero) + F.coalesce(rc("total_events"), zero)).alias(
            "total_events"
        ),
        (F.coalesce(lc("value_units"), zero) + F.coalesce(rc("value_units"), zero)).alias(
            "value_units"
        ),
        regs.alias("user_regs"),
    )


def finish_rollup(state: DataFrame, p: int = 8) -> DataFrame:
    """Serve the rollup: cents → value (the single-division idiom the
    direct queries use), register maps → HLL estimates via the same
    fold as the one-shot path."""
    regs = state.select(
        "day", F.explode("user_regs").alias("bucket", "m_j")
    )
    est = hll_estimate(regs, ["day"], p=p).withColumnRenamed(
        "approx_distinct", "approx_users"
    )
    # LEFT join + 0: a day with an empty register map (all user_ids
    # NULL) has no est row; its true distinct count is 0.
    return (
        state.join(est, "day", "left")
        .select(
            "day",
            "total_events",
            (F.col("value_units").cast("double") / F.lit(100.0)).alias("value_sum"),
            F.coalesce(
                F.col("approx_users"), F.lit(0).cast("decimal(18,6)")
            ).alias("approx_users"),
        )
    )


# Watermark column: the last applied micro-batch id rides every state
# row inside the same snapshot commit (see rollup_sink). Optional on
# read, always written, so batch and streaming maintenance can share
# one base.
_BATCH_COL = "_last_batch_id"


def _load_state(spark: SparkSession, base: str):
    """Persisted (state, last_batch_id) with the bookkeeping column
    split off — both maintenance paths read through here, so a base
    written by either path loads in either (the watermark column is
    optional on read, always written back)."""
    from simple_etl_spark.sources import table_store as ts

    raw = ts.read_table(spark, base)
    if raw is None:
        return None, None
    last = None
    if _BATCH_COL in raw.columns:
        last = raw.agg(F.max(_BATCH_COL)).collect()[0][0]
        raw = raw.drop(_BATCH_COL)
    return raw, last


def _commit_state(state: DataFrame, base: str, last_batch_id) -> None:
    """Stamp the watermark column and commit (caller holds the lock)."""
    from simple_etl_spark.sources import table_store as ts

    ts.commit_snapshot(
        state.withColumn(_BATCH_COL, F.lit(last_batch_id).cast("long")), base
    )


def upsert_rollup(
    spark: SparkSession,
    base: str,
    delta_events: DataFrame,
    p: int = 8,
    lock_timeout: float = 120.0,
) -> DataFrame:
    """Merge a delta batch into the persisted rollup snapshot at
    ``base`` and return the new state. Only day-level state is
    rewritten — the raw history is never rescanned. The whole
    read → merge → commit cycle runs under ONE commit_lock
    acquisition: resolving the previous snapshot outside the lock
    would let a concurrent upsert land in between and be silently
    undone (the lost-update race compact() documents). The streaming
    watermark, if present, is preserved untouched. (The write rewrites
    the full state relation; day-partitioned writes would restrict the
    rewrite to touched days once state outgrows one snapshot file.)"""
    from simple_etl_spark.sources import table_store as ts

    with ts.commit_lock(base, timeout=lock_timeout):
        prev, last = _load_state(spark, base)
        delta = partial_rollup(delta_events, p=p)
        state = delta if prev is None else merge_rollup(prev, delta)
        path = ts.commit_snapshot(
            state.withColumn(_BATCH_COL, F.lit(last).cast("long")), base
        )
    # Read back the exact snapshot this call committed (not whatever
    # the pointer says after the lock is released — a concurrent
    # writer may already have moved it).
    return spark.read.parquet(path).drop(_BATCH_COL)


@query(
    "events_rollup_merge",
    oracle=f"""
    WITH est AS ({_hll_oracle_sql("user_id", "cast(ts as date)", "events", p=8)}),
    scal AS (
        SELECT cast(ts as date) AS day, count(*) AS total_events,
               sum(cast(floor(value * 100 + 0.5) as bigint)) AS cents
        FROM events GROUP BY 1
    )
    SELECT scal.day, scal.total_events,
           cast(cents as double) / 100.0 AS value_sum,
           est.approx_distinct AS approx_users
    FROM scal JOIN est ON est.grp = scal.day
    ORDER BY day
    """,
    survey="A4 at scale: incremental materialized rollup "
    "(merge of combinable partials ≡ direct rollup, incl. HLL registers)",
)
def events_rollup_merge(cat: Catalog) -> DataFrame:
    """Split events at Jan 15, fold each half into combinable state,
    merge, serve. The oracle computes the rollup DIRECTLY from the full
    table — a hash match is a proof that the incremental path loses
    nothing (exact scalars; bit-exact register merge)."""
    ev = cat["events"]
    d = F.col("ts").cast("date")
    cut = F.lit("2024-01-15").cast("date")
    state = merge_rollup(
        partial_rollup(ev.filter(d <= cut)), partial_rollup(ev.filter(d > cut))
    )
    return finish_rollup(state).orderBy("day")


# ---------------------------------------------------------------------------
# Streaming maintenance (foreachBatch)
# ---------------------------------------------------------------------------


def rollup_sink(base: str, p: int = 8, lock_timeout: float = 120.0):
    """foreachBatch body that maintains the rollup from a stream.

    Additive state is NOT naturally idempotent (a replayed micro-batch
    would double-count — unlike the medallion's keyed merges), so the
    last applied batch_id rides every state row as a constant column
    inside the SAME snapshot commit: replayed batch_ids are skipped
    before merging. One atomic pointer-swap per micro-batch carries
    both the state and its watermark — crash-safe exactly-once for the
    additive aggregates (the streaming twin of ST6/ST7 bookkeeping).
    """
    from simple_etl_spark.sources import table_store as ts

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        with ts.commit_lock(base, timeout=lock_timeout):
            prev, last = _load_state(spark, base)
            if last is not None and batch_id <= last:
                return  # replayed micro-batch: already folded in
            delta = partial_rollup(batch_df, p=p)
            state = delta if prev is None else merge_rollup(prev, delta)
            _commit_state(state, base, batch_id)

    return process


def run_streaming_rollup(
    stream_df: DataFrame,
    base: str,
    checkpoint: str,
    p: int = 8,
    lock_timeout: float = 120.0,
):
    """Continuously maintain the rollup from a streaming events frame
    (availableNow drain — tests and batch-catchup mode)."""
    return (
        stream_df.writeStream.foreachBatch(
            rollup_sink(base, p=p, lock_timeout=lock_timeout)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, base: str, p: int = 8) -> DataFrame:
    """Serve the persisted rollup (drops the bookkeeping column)."""
    from simple_etl_spark.sources import table_store as ts

    state = ts.read_table(spark, base)
    if state is None:
        raise FileNotFoundError(f"no rollup snapshot at {base}")
    if _BATCH_COL in state.columns:
        state = state.drop(_BATCH_COL)
    return finish_rollup(state, p=p)
