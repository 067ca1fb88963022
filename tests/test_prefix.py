"""Distributed prefix sum: equivalence, packing properties, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_etl_spark.engine import Catalog
from simple_etl_spark.operators.prefix import distributed_cumsum, shard_packing


@pytest.fixture(scope="module")
def cat(spark, sf_dir):
    return Catalog(spark, sf_dir)


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_cumsum_matches_sequential_model(cat):
    """Two-phase prefix sums must equal a driver-side running total
    over the same (bucket, order) layout."""
    ev = cat["events"].select(
        "event_id", (F.col("event_id") % 7).alias("b"), F.lit(1).alias("one")
    )
    got = {
        r["event_id"]: r["cum"]
        for r in distributed_cumsum(ev, "one", "b", ["event_id"]).collect()
    }
    rows = sorted(ev.collect(), key=lambda r: (r["b"], r["event_id"]))
    run = 0
    for r in rows:
        run += 1
        assert got[r["event_id"]] == run


def test_shard_packing_is_contiguous_and_budgeted(cat):
    """Along the layout order: shard ids are non-decreasing, every
    row starts inside its shard's budget block, and a shard's total
    overflows the budget by at most its final row."""
    docs = cat["documents"].select(
        "doc_id", F.greatest(F.lit(1), F.col("n_chars") / 10).cast("long").alias("t")
    )
    budget = 2000
    out = shard_packing(docs, "doc_id", "t", budget=budget).collect()
    # reconstruct layout order from the prefix sums themselves
    out.sort(key=lambda r: r["cum_tokens"])
    prev_shard, prev_cum = 0, 0
    totals: dict[int, int] = {}
    for r in out:
        assert r["shard"] >= prev_shard
        start = r["cum_tokens"] - r["t"]
        assert start == prev_cum  # contiguous: no gaps or overlaps
        assert r["shard"] * budget <= start < (r["shard"] + 1) * budget
        totals[r["shard"]] = totals.get(r["shard"], 0) + r["t"]
        prev_shard, prev_cum = r["shard"], r["cum_tokens"]
    for shard, tot in totals.items():
        last = max(r["t"] for r in out if r["shard"] == shard)
        assert tot <= budget + last


def test_only_single_partition_exchange_is_bucket_sized(cat):
    """The global-order window must NOT run on the fact relation: the
    one Exchange SinglePartition in the plan feeds the bucket-totals
    aggregate, and the fact-side window is partitioned by bucket."""
    ev = cat["events"].select("event_id", (F.col("event_id") % 7).alias("b"))
    plan = _plan(
        distributed_cumsum(ev.withColumn("one", F.lit(1)), "one", "b", ["event_id"])
    )
    import re

    # exactly one single-partition exchange; fact-side exchanges stay
    # hash-partitioned by bucket
    assert plan.count("Arguments: SinglePartition") == 1
    assert plan.count("Arguments: hashpartitioning") >= 1
    # the single-partition exchange consumes the per-bucket totals
    # HashAggregate, never the raw relation: in the formatted detail
    # list, the operator numbered just before it is that aggregate
    before = plan.split("Arguments: SinglePartition")[0]
    xid, op = re.findall(r"\((\d+)\) (\w+)", before)[-1]
    assert op == "Exchange"
    assert (f"({int(xid) - 1}) HashAggregate") in plan
