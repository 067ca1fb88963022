"""Property tests for the merge primitives (SURVEY §5 item 3):
idempotency, latest-wins, insert-if-absent never overwrites,
delete-then-insert replaces children.
"""

from __future__ import annotations

import pytest

from simple_etl_spark.operators.merge import (
    delete_then_insert,
    insert_if_absent,
    upsert_latest_wins,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [("a", "old-a", 1), ("b", "old-b", 1), ("c", "old-c", 3)],
        ["link", "content", "ts"],
    )


@pytest.fixture()
def batch(spark):
    # a: newer → should win in latest-wins; c: older → should lose; d: new key
    return spark.createDataFrame(
        [("a", "new-a", 2), ("c", "stale-c", 2), ("d", "new-d", 2)],
        ["link", "content", "ts"],
    )


def test_latest_wins(base, batch):
    got = _rows(upsert_latest_wins(base, batch, ["link"], "ts"))
    assert got == [
        ("a", "new-a", 2),
        ("b", "old-b", 1),
        ("c", "old-c", 3),
        ("d", "new-d", 2),
    ]


def test_latest_wins_incoming_beats_existing_on_tie(spark, base):
    tie = spark.createDataFrame([("b", "tied-b", 1)], ["link", "content", "ts"])
    got = dict((r["link"], r["content"]) for r in upsert_latest_wins(base, tie, ["link"], "ts").collect())
    assert got["b"] == "tied-b"


def test_latest_wins_idempotent(base, batch):
    once = upsert_latest_wins(base, batch, ["link"], "ts")
    twice = upsert_latest_wins(once, batch, ["link"], "ts")
    assert _rows(once) == _rows(twice)


def test_insert_if_absent_never_overwrites(base, batch):
    got = _rows(insert_if_absent(base, batch, ["link"]))
    assert got == [
        ("a", "old-a", 1),
        ("b", "old-b", 1),
        ("c", "old-c", 3),
        ("d", "new-d", 2),
    ]


def test_insert_if_absent_idempotent(base, batch):
    once = insert_if_absent(base, batch, ["link"])
    twice = insert_if_absent(once, batch, ["link"])
    assert _rows(once) == _rows(twice)


def test_delete_then_insert_replaces_children(spark):
    existing = spark.createDataFrame(
        [("art1", "e1"), ("art1", "e2"), ("art2", "e3")],
        ["article_id", "entity"],
    )
    incoming = spark.createDataFrame([("art1", "e9")], ["article_id", "entity"])
    got = _rows(delete_then_insert(existing, incoming, ["article_id"]))
    assert got == [("art1", "e9"), ("art2", "e3")]


def test_partitioned_merge_rewrites_only_touched_partitions(spark, tmp_path):
    """write_merged + partitionOverwriteMode=dynamic: merging a batch
    that touches one date partition must leave the other partitions'
    files untouched on disk — the 100 TB incremental-load path."""
    import datetime as dt
    import glob
    import os

    from simple_etl_spark.operators.merge import upsert_latest_wins, write_merged

    path = str(tmp_path / "silver")
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    base = spark.createDataFrame(
        [("a", "old-a", 1, d1), ("b", "old-b", 1, d2)],
        ["link", "content", "ts", "dt"],
    )
    write_merged(base, path, partition_by=["dt"])

    untouched = set(glob.glob(os.path.join(path, "dt=2024-01-02", "*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in untouched}

    batch = spark.createDataFrame([("a", "new-a", 2, d1)], ["link", "content", "ts", "dt"])
    existing_d1 = spark.read.parquet(path).filter("dt = '2024-01-01'")
    merged_d1 = upsert_latest_wins(existing_d1, batch, ["link"], "ts")
    write_merged(merged_d1, path, partition_by=["dt"])

    after = set(glob.glob(os.path.join(path, "dt=2024-01-02", "*.parquet")))
    assert after == untouched
    assert all(os.path.getmtime(f) == mtimes[f] for f in after)
    got = {r["link"]: r["content"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": "new-a", "b": "old-b"}


def test_apply_changes_cdc_semantics(spark):
    from simple_etl_spark.operators.merge import apply_changes

    changes = spark.createDataFrame(
        [
            # key 1: insert then update → final value 20
            (1, 1, "U", 10), (1, 2, "U", 20),
            # key 2: insert then delete → gone
            (2, 1, "U", 30), (2, 2, "D", 0),
            # key 3: delete then re-insert → present with 50
            (3, 1, "D", 0), (3, 2, "U", 50),
            # key 4: tie on ts broken by seq → survivor seq=2
            (4, 2, "U", 70), (4, 2, "D", 0),
        ],
        "k bigint, seq bigint, op string, v bigint",
    )
    # order within (k) by (seq, v): key 4 has two seq=2 rows, v breaks the tie
    out = {
        r["k"]: r["v"]
        for r in apply_changes(
            changes, keys=["k"], order_cols=["seq", "v"], op_col="op"
        ).collect()
    }
    assert out == {1: 20, 3: 50, 4: 70}


def test_apply_changes_null_op_is_upsert_not_delete(spark):
    from simple_etl_spark.operators.merge import apply_changes

    changes = spark.createDataFrame(
        [(1, 1, "U", 10), (1, 2, None, 99), (2, 1, "D", 0)],
        "k bigint, seq bigint, op string, v bigint",
    )
    out = {
        r["k"]: r["v"]
        for r in apply_changes(
            changes, keys=["k"], order_cols=["seq"], op_col="op"
        ).collect()
    }
    # key 1's latest change has a NULL op: malformed, NOT a delete
    assert out == {1: 99}
