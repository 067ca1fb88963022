"""CSV/JSONL quarantine ingestion: schema enforcement and row splits."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from simple_etl_spark.sources.text_files import (
    read_csv_quarantine,
    read_jsonl_quarantine,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("n", LongType()),
    ]
)


def test_csv_split(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,n\n"
        "1,alice,10\n"
        "2,bob,not_a_number\n"  # type mismatch -> quarantine
        "3,carol,30\n"
    )
    good, bad = read_csv_quarantine(spark, str(p), SCHEMA)
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    raws = [r["raw"] for r in bad.collect()]
    assert raws == ["2,bob,not_a_number"]
    assert good.columns == ["id", "name", "n"]


def test_jsonl_split(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "alice", "n": 10}\n'
        "this is not json\n"
        '{"id": 2, "name": "bob", "n": "NaN-ish"}\n'
        '{"id": 3, "name": "carol"}\n'  # missing field -> null, still good
    )
    good, bad = read_jsonl_quarantine(spark, str(p), SCHEMA)
    rows = {r["id"]: r for r in good.collect()}
    assert sorted(rows) == [1, 3]
    assert rows[3]["n"] is None
    assert bad.count() == 2


def test_rejects_reserved_column(spark, tmp_path):
    clash = StructType([StructField("_corrupt_record", StringType())])
    with pytest.raises(ValueError):
        read_csv_quarantine(spark, str(tmp_path), clash)


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from simple_etl_spark.sources.text_files import read_orc, write_orc

    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("part"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
    )
    p = str(tmp_path / "orc")
    write_orc(df, p, partition_by=["part"])
    back = read_orc(spark, p)
    assert back.count() == 100
    assert set(back.columns) == {"k", "part", "v"}
    # partition pruning: filter on the partition column scans one dir
    one = back.filter(F.col("part") == 3)
    assert one.count() == 20
    got = {r["k"] for r in one.select("k").collect()}
    assert got == {i for i in range(100) if i % 5 == 3}
