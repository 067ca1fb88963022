"""Stats-manifest data skipping: manifest correctness, conservative
pruning, and composition with Z-order compaction (narrow per-file
intervals → real file skipping with identical results)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from simple_etl_spark.sources.manifest import (
    load_manifest,
    prune_files,
    read_pruned,
    write_manifest,
)
from simple_etl_spark.sources.table_store import (
    compact,
    table_path,
    write_table,
)


@pytest.fixture()
def ztable(spark, tmp_path):
    base = str(tmp_path / "zt")
    side = 32
    df = spark.range(side * side).select(
        (F.col("id") % side).alias("x"),
        ((F.col("id") / side).cast("bigint") % side).alias("y"),
    )
    write_table(df, base)
    compact(spark, base, target_file_bytes=1500, zorder_by=["x", "y"], zorder_bits=5)
    return base, side


def test_commit_writes_manifest(spark, tmp_path):
    base = str(tmp_path / "t")
    write_table(spark.range(10).select(F.col("id").alias("v")), base)
    m = load_manifest(table_path(base))
    assert m is not None and m["files"]
    mins = [f["columns"]["v"]["min"] for f in m["files"].values()]
    maxs = [f["columns"]["v"]["max"] for f in m["files"].values()]
    assert min(mins) == 0 and max(maxs) == 9
    assert sum(f["rows"] for f in m["files"].values()) == 10


def test_prune_is_conservative_and_effective(spark, ztable):
    base, side = ztable
    snap = table_path(base)
    kept, total = prune_files(snap, "y", 3, 3)
    assert total >= 4
    assert 0 < len(kept) < total  # skips real files, keeps some
    # every matching row survives pruning
    got = read_pruned(spark, snap, "y", 3, 3)
    assert got.count() == side  # one full row of the grid
    full = (
        spark.read.parquet(snap).filter(F.col("y").between(3, 3)).count()
    )
    assert got.count() == full


def test_prune_empty_interval_returns_zero_rows(spark, ztable):
    base, _side = ztable
    snap = table_path(base)
    assert read_pruned(spark, snap, "y", 10_000, 20_000).count() == 0


def test_missing_column_stats_keep_file(spark, tmp_path):
    base = str(tmp_path / "m")
    write_table(spark.range(5).select(F.col("id").alias("v")), base)
    snap = table_path(base)
    kept, total = prune_files(snap, "no_such_col", 0, 1)
    assert len(kept) == total  # conservative: unknown stats never skip


def test_string_stats_roundtrip(spark, tmp_path):
    base = str(tmp_path / "s")
    write_table(
        spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",)], "name string"
        ),
        base,
    )
    snap = table_path(base)
    m = load_manifest(snap)
    stats = [
        f["columns"]["name"] for f in m["files"].values() if f["columns"]
    ]
    assert min(s["min"] for s in stats) == "alpha"
    assert max(s["max"] for s in stats) == "gamma"
    # the interval [delta, epsilon] intersects [beta, gamma]-ish files
    kept, total = prune_files(snap, "name", "delta", "epsilon")
    assert 0 < len(kept) <= total


def test_manifest_survives_hive_partitioning(spark, tmp_path):
    base = str(tmp_path / "h")
    df = spark.range(20).select(
        (F.col("id") % 2).alias("p"), F.col("id").alias("v")
    )
    write_table(df, base, partition_by=["p"])
    m = load_manifest(table_path(base))
    assert m and all("v" in f["columns"] for f in m["files"].values())


def test_hive_partition_columns_survive_pruned_read(spark, tmp_path):
    base = str(tmp_path / "hp")
    df = spark.range(20).select(
        (F.col("id") % 2).alias("p"), F.col("id").alias("v")
    )
    write_table(df, base, partition_by=["p"])
    snap = table_path(base)
    got = read_pruned(spark, snap, "v", 3, 8)
    assert set(got.columns) == {"p", "v"}  # partition column preserved
    assert got.count() == 6
    # filtering on the PARTITION column resolves too (manifest has no
    # stats for it → conservative keep-all, basePath restores the col)
    assert read_pruned(spark, snap, "p", 1, 1).count() == 10
    # empty-interval branch returns the same schema
    assert set(read_pruned(spark, snap, "v", 999, 999).columns) == {"p", "v"}
