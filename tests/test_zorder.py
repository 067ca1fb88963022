"""Z-order layout: Morton-code correctness and the actual layout
benefit — per-file min/max stats narrow in BOTH dimensions, which is
what parquet stats-based skipping prunes on."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from simple_etl_spark.sources.layout import write_zordered, zvalue


def _morton2(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_zvalue_matches_reference_morton(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 2, 7, 1023)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = df.select("x", "y", zvalue(["x", "y"]).alias("z")).collect()
    for r in got:
        assert r["z"] == _morton2(r["x"], r["y"]), (r["x"], r["y"])


def test_zvalue_masks_high_bits(spark):
    # values beyond `bits` bits alias onto their low bits, never corrupt
    df = spark.createDataFrame([(1 << 20, 0)], "x bigint, y bigint")
    assert df.select(zvalue(["x", "y"], bits=16).alias("z")).head()["z"] == 0


def _file_spans(path: str, cols):
    spans = {c: [] for c in cols}
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        for c in cols:
            if lo[c] is not None:
                spans[c].append(hi[c] - lo[c])
    return spans


def test_zorder_layout_narrows_both_dims(spark, tmp_path):
    n, side = 4096, 64  # full 64x64 grid, x and y independent
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        ((F.col("id") / side).cast("bigint") % side).alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(df, zpath, ["x", "y"], bits=6, num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    zs = _file_spans(zpath, ["x", "y"])
    ls = _file_spans(lpath, ["x", "y"])
    z_x = sum(zs["x"]) / len(zs["x"])
    z_y = sum(zs["y"]) / len(zs["y"])
    l_y = sum(ls["y"]) / len(ls["y"])
    # z-order: BOTH dims' per-file spans well under the global range...
    assert z_x < 0.5 * (side - 1)
    assert z_y < 0.5 * (side - 1)
    # ...while the single-key linear layout leaves y unclustered
    assert l_y > 0.9 * (side - 1)
    # and a point filter on y prunes files under the z layout
    prunable = sum(
        1
        for f in glob.glob(os.path.join(zpath, "*.parquet"))
        for md in [pq.ParquetFile(f).metadata]
        if all(
            md.row_group(rg).column(ci).statistics is None
            or md.row_group(rg).column(ci).path_in_schema != "y"
            or not (
                md.row_group(rg).column(ci).statistics.min
                <= 7
                <= md.row_group(rg).column(ci).statistics.max
            )
            for rg in range(md.num_row_groups)
            for ci in range(md.row_group(rg).num_columns)
        )
    )
    assert prunable >= 4  # y=7 skips a real fraction of the 16 files


def test_roundtrip_preserves_rows(spark, tmp_path):
    df = spark.range(100).select(
        (F.col("id") % 10).alias("x"), (F.col("id") % 7).alias("y")
    )
    p = str(tmp_path / "z")
    write_zordered(df, p, ["x", "y"], bits=4, num_files=4)
    back = spark.read.parquet(p)
    assert back.count() == 100
    assert set(back.columns) == {"x", "y"}


def test_compact_zorder_clusters_snapshot(spark, tmp_path):
    import pytest as _pytest

    from simple_etl_spark.sources.table_store import compact, read_table, write_table

    base = str(tmp_path / "ztable")
    side = 32
    df = spark.range(side * side).select(
        (F.col("id") % side).alias("x"),
        ((F.col("id") / side).cast("bigint") % side).alias("y"),
    )
    write_table(df, base)
    info = compact(
        spark, base, target_file_bytes=1500, zorder_by=["x", "y"], zorder_bits=5
    )
    assert info["files_after"] >= 2
    back = read_table(spark, base)
    assert back.count() == side * side
    spans = _file_spans(info["path"], ["x", "y"])
    if len(spans["x"]) >= 4:
        assert sum(spans["x"]) / len(spans["x"]) < 0.7 * (side - 1)
        assert sum(spans["y"]) / len(spans["y"]) < 0.7 * (side - 1)
    with _pytest.raises(ValueError):
        compact(spark, base, partition_by=["x"], zorder_by=["y"])


def test_checksum_invariant_under_compaction_and_zorder(spark, tmp_path):
    """The commutative content checksum must be identical before and
    after compaction with Z-order clustering — layout changes, the
    row multiset must not."""
    from pyspark.sql import functions as F

    from simple_etl_spark.operators.relational import content_checksum
    from simple_etl_spark.sources.table_store import (
        compact,
        read_table,
        write_table,
    )

    base = str(tmp_path / "cktab")
    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") % 97).alias("a"),
        (F.col("id") * 31 % 89).alias("b"),
    )
    write_table(df.repartition(16), base)
    before = content_checksum(
        read_table(spark, base), ["id", "a", "b"]
    ).collect()[0]
    compact(spark, base, target_file_bytes=32_000, zorder_by=["a", "b"],
            zorder_bits=6)
    after = content_checksum(
        read_table(spark, base), ["id", "a", "b"]
    ).collect()[0]
    assert (before["n_rows"], before["checksum"]) == (
        after["n_rows"], after["checksum"],
    )
    # and it must CHANGE when a row changes
    mutated = read_table(spark, base).withColumn(
        "a", F.when(F.col("id") == 7, F.lit(-1)).otherwise(F.col("a"))
    )
    changed = content_checksum(mutated, ["id", "a", "b"]).collect()[0]
    assert changed["checksum"] != before["checksum"]


def test_content_checksum_rejects_empty_cols(spark):
    import pytest

    from simple_etl_spark.operators.relational import content_checksum

    with pytest.raises(ValueError, match="at least one"):
        content_checksum(spark.range(1), [])
