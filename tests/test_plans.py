"""Physical-plan quality regressions (the 100 TB posture, checked).

Correctness tests prove the answers; these prove the *plans* — that
filters reach the parquet scan, dimension joins broadcast, top-k
avoids a global sort, and aggregations are partial before the
shuffle. A plan regression here is a scale bug even when results
stay right.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from simple_etl_spark.engine import Catalog


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def cat(spark, sf_dir):
    return Catalog(spark, sf_dir)


def test_filter_pushdown_reaches_scan(cat):
    df = cat["orders"].filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)" in plan


def test_column_pruning_reaches_scan(cat):
    df = cat["lineitem"].groupBy("l_returnflag").count()
    plan = _plan(df)
    assert "ReadSchema: struct<l_returnflag:string>" in plan


def test_dimension_join_broadcasts(spark, sf_dir):
    from simple_etl_spark.queries import queries

    df = queries()["revenue_by_segment"](spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    from simple_etl_spark.queries import queries

    df = queries()["top10_orders"](spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_aggregation_is_partial_before_shuffle(cat):
    df = cat["lineitem"].groupBy("l_returnflag").agg(F.count(F.lit(1)))
    plan = _plan(df)
    # partial HashAggregate must appear below the Exchange
    assert plan.index("partial_count") > 0
    assert "Exchange" in plan


def test_left_anti_join_no_cartesian(spark, sf_dir):
    from simple_etl_spark.queries import queries

    df = queries()["customers_without_orders"](spark, sf_dir)
    plan = _plan(df)
    assert "Cartesian" not in plan
    assert "LeftAnti" in plan


def test_events_timestamp_canonicalized(cat):
    # the NANOS fix-up must yield a usable timestamp type, not a long
    assert dict(cat["events"].dtypes)["ts"].startswith("timestamp")
