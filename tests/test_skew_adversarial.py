"""Adversarial hot-key fixture for the skew posture (SCALE.md §9):
one key owns 40% of all rows — the megadomain / NULL-ish-default
shape SURVEY §4 names as the canonical scale-killer. The at-scale
wall-clock evidence lives in SKEW_r12.jsonl (tools/skew_bench.py at
sf1/sf10); these tests pin the CORRECTNESS half so the posture cannot
regress silently: salted results must be exactly the plain results,
and skew_profile must expose the hot key."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from simple_etl_spark.operators.skew import (
    salted_agg,
    salted_join,
    skew_profile,
)


@pytest.fixture(scope="module")
def hot(spark):
    """20k-row fact: key 0 owns 40%, the rest spread over 997 keys;
    decimal amounts so equality checks are exact."""
    fact = spark.range(0, 20000).select(
        F.when(F.pmod("id", 10) < 4, F.lit(0))
        .otherwise(F.pmod(F.hash(F.col("id")), F.lit(997)) + 1)
        .cast("bigint")
        .alias("key"),
        (F.pmod("id", 50) + 1).cast("bigint").alias("qty"),
        F.pmod(F.hash("id", F.lit(7)), F.lit(1 << 12))
        .cast("bigint")
        .alias("val"),
        (F.pmod("id", 9973) / F.lit(100)).cast("decimal(18,2)")
        .alias("amount"),
    )
    dim = spark.range(0, 998).select(
        F.col("id").alias("key"),
        F.pmod("id", 16).cast("bigint").alias("segment"),
    )
    return fact, dim


def _rows(df):
    # repr-keyed sort: NULL segments (unmatched left rows) are not
    # orderable against ints
    return sorted(map(tuple, df.collect()), key=repr)


def test_profile_exposes_the_hot_key(hot):
    fact, _ = hot
    top = skew_profile(fact, ["key"], top_n=1).collect()[0]
    assert top["key"] == 0
    assert 380 <= top["share_permille"] <= 420
    assert top["skew_factor"] > 100


def test_salted_agg_exact_on_hot_key(hot):
    fact, _ = hot
    plain = fact.groupBy("key").agg(
        F.sum("qty").alias("sq"),
        F.sum("amount").alias("sa"),
        F.count(F.lit(1)).alias("n"),
    )
    salted = salted_agg(
        fact,
        ["key"],
        [F.sum("qty").alias("pq"), F.sum("amount").alias("pa"),
         F.count(F.lit(1)).alias("pn")],
        [F.sum("pq").alias("sq"), F.sum("pa").alias("sa"),
         F.sum("pn").alias("n")],
        factor=8,
    )
    assert _rows(plain) == _rows(salted)


def test_salted_distinct_count_exact_on_hot_key(hot):
    """countDistinct decomposes across salts only when the salt is a
    function of the distinct column — project to (key, val) first so
    the whole-row salt qualifies (same val → same salt within a key,
    so SUM of per-salt exact counts is exact)."""
    fact, _ = hot
    kv = fact.select("key", "val")
    plain = kv.groupBy("key").agg(F.countDistinct("val").alias("nv"))
    salted = salted_agg(
        kv,
        ["key"],
        [F.countDistinct("val").alias("pv")],
        [F.sum("pv").alias("nv")],
        factor=8,
    )
    assert _rows(plain) == _rows(salted)


def test_salted_join_exact_on_hot_key(hot):
    fact, dim = hot
    rollup = lambda j: j.groupBy("segment").agg(  # noqa: E731
        F.sum("amount").alias("sa"), F.count(F.lit(1)).alias("n")
    )
    plain = rollup(fact.join(dim, "key"))
    salted = rollup(salted_join(fact, dim, ["key"], factor=8))
    assert _rows(plain) == _rows(salted)


def test_salted_left_join_keeps_unmatched_big_rows(hot):
    fact, dim = hot
    small = dim.filter(F.col("key") < 100)  # most fact keys unmatched
    plain = fact.join(small, "key", "left").groupBy("segment").agg(
        F.count(F.lit(1)).alias("n")
    )
    salted = (
        salted_join(fact, small, ["key"], factor=8, how="left")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _rows(plain) == _rows(salted)


def test_salted_holistic_set_exact_on_hot_key(hot):
    """HOLISTIC aggregate recombination (VERDICT r12 #1): per-salt
    collect_sets are disjoint because the whole-row salt on (key, val)
    is a function of val within a key, so flatten(collect_list(...))
    IS the exact set — pinned against the plain collect_set
    element-for-element (sorted)."""
    fact, _ = hot
    kv = fact.select("key", "val")
    plain = kv.groupBy("key").agg(
        F.array_sort(F.collect_set("val")).alias("vals")
    )
    salted = salted_agg(
        kv,
        ["key"],
        [F.collect_set("val").alias("pv")],
        [F.array_sort(F.flatten(F.collect_list("pv"))).alias("vals")],
        factor=8,
    )
    assert _rows(plain) == _rows(salted)


def test_salted_pandas_udaf_exact_on_hot_key(hot):
    """Grouped-agg pandas UDAF through the salted two-phase: the hot
    group's Arrow batch splits across salts and the integer partials
    (sum / count / max) recombine to exactly the plain result."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def p_sum(v: pd.Series) -> int:
        return int(v.sum())

    @pandas_udf("bigint")
    def p_cnt(v: pd.Series) -> int:
        return len(v)

    @pandas_udf("bigint")
    def p_max(v: pd.Series) -> int:
        return int(v.max())

    fact, _ = hot
    kv = fact.select("key", "val")
    plain = kv.groupBy("key").agg(
        p_sum("val").alias("s"), p_cnt("val").alias("n"),
        p_max("val").alias("m"),
    )
    salted = salted_agg(
        kv,
        ["key"],
        [p_sum("val").alias("ps"), p_cnt("val").alias("pn"),
         p_max("val").alias("pm")],
        [F.sum("ps").alias("s"), F.sum("pn").alias("n"),
         F.max("pm").alias("m")],
        factor=8,
    )
    assert _rows(plain) == _rows(salted)


def test_hot_key_only_salting_exact_on_hot_key(hot):
    """hot_keys restricts salting to the profiled keys (the r13 fix
    for the 27x whole-corpus-salting blowup on per-group-overhead
    aggregates): results must still equal the plain plan exactly, and
    cold keys must keep salt 0 (one phase-1 group each)."""
    fact, _ = hot
    kv = fact.select("key", "val")
    plain = kv.groupBy("key").agg(
        F.array_sort(F.collect_set("val")).alias("vals")
    )
    salted = salted_agg(
        kv,
        ["key"],
        [F.collect_set("val").alias("pv")],
        [F.array_sort(F.flatten(F.collect_list("pv"))).alias("vals")],
        factor=8,
        hot_keys=[0],
    )
    assert _rows(plain) == _rows(salted)
    # structural pin: phase-1 group count is |cold keys| + factor
    # (NOT |keys| * factor) — the whole point of hot_keys
    from simple_etl_spark.operators.skew import _salt_col, _SALT
    salted_df = kv.withColumn(
        _SALT,
        F.when(F.col("key").isin([0]), _salt_col(kv, 8)).otherwise(F.lit(0)),
    )
    n_groups = salted_df.select("key", _SALT).distinct().count()
    n_keys = kv.select("key").distinct().count()
    assert n_groups <= n_keys + 8
