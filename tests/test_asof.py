"""Semantics of the as-of join: match mode at equal instants, tie
resolution, left-outer NULLs, and the plan shape (single hash
shuffle on the key — never a θ-join pair explosion)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from simple_etl_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),
            (2, "u1", _ts("2024-01-01T12:00:00")),
            (3, "u2", _ts("2024-01-01T09:00:00")),  # before any right row
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", _ts("2024-01-01T09:30:00"), 1.0),
            (11, "u1", _ts("2024-01-01T12:00:00"), 2.0),  # equal-instant
            (12, "u1", _ts("2024-01-01T12:00:00"), 3.0),  # equal-ts tie
            (13, "u2", _ts("2024-01-01T23:00:00"), 4.0),
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    return left, right


def test_exact_matches_allowed_and_tie_resolution(spark, sides):
    left, right = sides
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, "user_id", "ts", ["event_id", "value"]
        ).collect()
    }
    assert out[1]["event_id_asof"] == 10
    # equal-instant rows are eligible; the tie between 11 and 12
    # resolves to the largest payload struct -> event_id 12
    assert out[2]["event_id_asof"] == 12
    assert out[2]["value_asof"] == 3.0
    # u2's only right row is later: left-outer NULLs
    assert out[3]["event_id_asof"] is None
    assert out[3]["ts_asof"] is None


def test_strict_mode_hides_equal_instant(spark, sides):
    left, right = sides
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, "user_id", "ts", ["event_id", "value"],
            allow_exact_matches=False,
        ).collect()
    }
    # at 12:00 the equal-instant clicks are hidden; 09:30 wins
    assert out[2]["event_id_asof"] == 10
    assert out[1]["event_id_asof"] == 10


def test_reserved_column_rejected(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="_rpay"):
        asof_join(
            left.withColumn("_rpay", F.lit(1)), right,
            "user_id", "ts", ["value"],
        )


def test_asof_plan_is_single_key_shuffle(spark, sides):
    """The whole point: one hash exchange on the key feeding a window
    — no BroadcastNestedLoopJoin / CartesianProduct from a ts-range
    θ-join."""
    left, right = sides
    df = asof_join(left, right, "user_id", "ts", ["event_id", "value"])
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning(user_id") >= 1
