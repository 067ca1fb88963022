"""Incremental rollup: merge-equivalence and persisted upsert cycle."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_etl_spark.engine import Catalog
from simple_etl_spark.operators.rollup_store import (
    finish_rollup,
    merge_rollup,
    partial_rollup,
    read_rollup,
    rollup_sink,
    run_streaming_rollup,
    upsert_rollup,
)


def _state_rows(df):
    rows = df.collect()
    return sorted(
        (r["day"], r["total_events"], r["value_units"], tuple(sorted(r["user_regs"].items())))
        for r in rows
    )


def test_merge_of_splits_equals_direct(spark, sf_dir):
    """partial(A) ⊕ partial(B) ⊕ partial(C) must equal partial(A∪B∪C)
    EXACTLY — scalars by addition, register maps by per-bucket max."""
    ev = Catalog(spark, sf_dir)["events"]
    d = F.col("ts").cast("date")
    c1, c2 = F.lit("2024-01-10").cast("date"), F.lit("2024-01-20").cast("date")
    merged = merge_rollup(
        merge_rollup(
            partial_rollup(ev.filter(d <= c1)),
            partial_rollup(ev.filter((d > c1) & (d <= c2))),
        ),
        partial_rollup(ev.filter(d > c2)),
    )
    assert _state_rows(merged) == _state_rows(partial_rollup(ev))


def test_merge_is_commutative(spark, sf_dir):
    ev = Catalog(spark, sf_dir)["events"]
    d = F.col("ts").cast("date")
    cut = F.lit("2024-01-15").cast("date")
    a, b = partial_rollup(ev.filter(d <= cut)), partial_rollup(ev.filter(d > cut))
    assert _state_rows(merge_rollup(a, b)) == _state_rows(merge_rollup(b, a))


def test_streaming_rollup_matches_direct(spark, sf_dir, tmp_path):
    """Drain the events table through the streaming sink (one file per
    micro-batch) and serve — must equal the one-shot rollup."""
    ev = Catalog(spark, sf_dir)["events"]
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)
    base, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_streaming_rollup(stream, base, ckpt).awaitTermination(120)
    got = sorted(map(tuple, read_rollup(spark, base).collect()))
    want = sorted(map(tuple, finish_rollup(partial_rollup(ev)).collect()))
    assert got == want


def test_streaming_rollup_skips_replayed_batch(spark, sf_dir, tmp_path):
    """Additive state must not double-count an at-least-once redelivery:
    re-applying the same batch_id is a no-op."""
    ev = Catalog(spark, sf_dir)["events"]
    base = str(tmp_path / "state")
    sink = rollup_sink(base)
    sink(ev, 0)
    once = sorted(map(tuple, read_rollup(spark, base).collect()))
    sink(ev, 0)  # redelivery
    assert sorted(map(tuple, read_rollup(spark, base).collect())) == once


def test_batch_and_streaming_paths_share_one_base(spark, sf_dir, tmp_path):
    """upsert_rollup and rollup_sink must interoperate on the same
    base in either order: the batch path preserves the streaming
    watermark, the streaming path loads watermark-less state, and the
    served rollup equals the one-shot computation."""
    ev = Catalog(spark, sf_dir)["events"]
    d = F.col("ts").cast("date")
    c1, c2 = F.lit("2024-01-10").cast("date"), F.lit("2024-01-20").cast("date")
    base = str(tmp_path / "state")
    upsert_rollup(spark, base, ev.filter(d <= c1))  # batch first (no watermark)
    sink = rollup_sink(base)
    sink(ev.filter((d > c1) & (d <= c2)), 0)  # then streaming
    upsert_rollup(spark, base, ev.filter(d > c2))  # batch again
    sink(ev.limit(10), 0)  # replay of batch 0 must still be a no-op
    got = sorted(map(tuple, read_rollup(spark, base).collect()))
    want = sorted(map(tuple, finish_rollup(partial_rollup(ev)).collect()))
    assert got == want


def test_partial_rollup_ignores_null_user_ids(spark, sf_dir):
    """A NULL user_id must not poison the register map (COUNT DISTINCT
    ignores NULL; so does the sketch)."""
    ev = Catalog(spark, sf_dir)["events"].withColumn(
        "user_id",
        F.when(F.col("event_id") % 97 == 0, F.lit(None)).otherwise(F.col("user_id")),
    )
    state = partial_rollup(ev)
    assert state.count() > 0  # map_from_entries would throw on a null key


def test_all_null_day_keeps_scalars_and_serves_zero_users(spark, sf_dir):
    """A day whose user_ids are ALL NULL must keep its event counts and
    sums (empty register map, not a dropped row) and serve
    approx_users = 0."""
    ev = Catalog(spark, sf_dir)["events"].withColumn(
        "user_id",
        F.when(
            F.col("ts").cast("date") == F.lit("2024-01-03").cast("date"),
            F.lit(None),
        ).otherwise(F.col("user_id")),
    )
    direct_days = ev.select(F.col("ts").cast("date")).distinct().count()
    state = partial_rollup(ev)
    assert state.count() == direct_days  # the all-null day survives
    served = {
        str(r["day"]): r for r in finish_rollup(state).collect()
    }
    row = served["2024-01-03"]
    assert row["total_events"] > 0
    assert float(row["approx_users"]) == 0.0


def test_upsert_cycle_matches_direct_serve(spark, sf_dir, tmp_path):
    """Feeding batches through the persisted store must serve the same
    rollup as a one-shot computation over all events."""
    ev = Catalog(spark, sf_dir)["events"]
    d = F.col("ts").cast("date")
    cut = F.lit("2024-01-15").cast("date")
    base = str(tmp_path / "rollup")
    upsert_rollup(spark, base, ev.filter(d <= cut))
    state = upsert_rollup(spark, base, ev.filter(d > cut))
    got = sorted(map(tuple, finish_rollup(state).collect()))
    want = sorted(map(tuple, finish_rollup(partial_rollup(ev)).collect()))
    assert got == want
