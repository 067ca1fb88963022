"""Semantics + plan shape of the bucketed range join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from simple_etl_spark.operators.rangejoin import range_join_bucketed


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:30:00")),  # inside iv A
            (2, "u1", _ts("2024-01-01T12:00:00")),  # == iv A end (inclusive)
            (3, "u1", _ts("2024-01-03T10:30:00")),  # no interval that day
            (4, "u2", _ts("2024-01-01T10:30:00")),  # other key, no interval
            (5, "u1", _ts("2024-01-05T00:30:00")),  # inside midnight-crossing iv B
        ],
        "point_id long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", "A", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T12:00:00")),
            # crosses a day boundary: must be exploded into both buckets
            ("u1", "B", _ts("2024-01-04T23:00:00"), _ts("2024-01-05T01:00:00")),
        ],
        "user_id string, iv_id string, start timestamp, stop timestamp",
    )
    return points, intervals


def test_containment_inclusive_and_left_nulls(spark, frames):
    points, intervals = frames
    out = {
        r["point_id"]: r
        for r in range_join_bucketed(
            points, intervals, "user_id", "ts", "start", "stop", how="left"
        ).collect()
    }
    assert len(out) == 5
    assert out[1]["iv_id"] == "A"
    assert out[2]["iv_id"] == "A"  # end-inclusive
    assert out[3]["iv_id"] is None
    assert out[4]["iv_id"] is None
    # the midnight-crossing interval is found from the next day's bucket
    assert out[5]["iv_id"] == "B"


def test_inner_drops_unmatched(spark, frames):
    points, intervals = frames
    out = range_join_bucketed(
        points, intervals, "user_id", "ts", "start", "stop", how="inner"
    ).collect()
    assert sorted(r["point_id"] for r in out) == [1, 2, 5]


def test_collisions_and_bad_args_rejected(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="collide"):
        range_join_bucketed(
            points.withColumn("iv_id", F.lit("x")), intervals,
            "user_id", "ts", "start", "stop",
        )
    with pytest.raises(ValueError, match="how"):
        range_join_bucketed(
            points, intervals, "user_id", "ts", "start", "stop", how="full"
        )
    with pytest.raises(ValueError, match="bucket"):
        range_join_bucketed(
            points, intervals, "user_id", "ts", "start", "stop", bucket="fortnight"
        )


def test_range_join_plan_is_hash_join_not_nested_loop(spark, frames):
    """The whole point: (key, bucket) equality must reach the join as
    hash keys with containment as a residual — never a nested-loop /
    cartesian over the key group."""
    points, intervals = frames
    df = range_join_bucketed(
        points, intervals, "user_id", "ts", "start", "stop"
    )
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # a keyed join (hash or sort-merge — statistics pick) whose
    # equality keys include the bucket id
    assert ("HashJoin [_rj_pbucket" in plan) or ("SortMergeJoin [_rj_pbucket" in plan)
