"""Incremental rollup: merge-equivalence and persisted upsert cycle."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_etl_spark.engine import Catalog
from simple_etl_spark.operators.rollup_store import (
    finish_rollup,
    merge_rollup,
    partial_rollup,
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
