"""Streaming medallion tests (SURVEY §5 item 4): conservation
invariants through the foreachBatch pipeline and redelivery
idempotency (ST6) via deterministic file-stream micro-batches.
"""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from simple_etl_spark.streaming.medallion_stream import run_stream, windowed_counts

SCHEMA = "id string, content string, created_at timestamp"


def _clean(df):
    return df.withColumn("content", F.trim(F.col("content")))


@pytest.fixture()
def workdir(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_medallion_stream_conservation_and_idempotency(spark, workdir):
    import datetime as dt

    src = f"{workdir}/src"
    t = dt.datetime(2024, 1, 1)
    batch1 = [("a", " one ", t), ("b", "two", t)]
    batch2 = [("b", "two-updated", t + dt.timedelta(hours=1)), ("c", "three", t)]
    _write_batch(spark, src, batch1)
    _write_batch(spark, src, batch2)

    def start(checkpoint):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = run_stream(
            stream,
            f"{workdir}/bronze",
            f"{workdir}/silver",
            f"{workdir}/{checkpoint}",
            _clean,
            key="id",
            order_col="created_at",
        )
        q.awaitTermination(120)
        return q

    start("ckpt1")
    from simple_etl_spark.sources.table_store import read_table

    bronze = read_table(spark, f"{workdir}/bronze")
    silver = read_table(spark, f"{workdir}/silver")

    # conservation: every distinct id that entered is present once per layer
    assert sorted(r["id"] for r in bronze.select("id").collect()) == ["a", "b", "c"]
    assert sorted(r["id"] for r in silver.select("id").collect()) == ["a", "b", "c"]
    got = {r["id"]: r["content"] for r in silver.collect()}
    # silver cleaned + latest-wins on redelivered key
    assert got["a"] == "one"
    assert got["b"] == "two-updated"

    # snapshot before replay: the rewrite invalidates old file listings
    before = sorted(tuple(r) for r in silver.collect())

    # redelivery: replay everything with a fresh checkpoint → same state
    start("ckpt2")
    silver2 = read_table(spark, f"{workdir}/silver")
    assert sorted(tuple(r) for r in silver2.collect()) == before


def test_windowed_counts_event_time(spark, workdir):
    import datetime as dt

    src = f"{workdir}/evsrc"
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        ("a", "x", t0),
        ("b", "x", t0 + dt.timedelta(minutes=10)),
        ("c", "x", t0 + dt.timedelta(hours=1)),
    ]
    _write_batch(spark, src, rows)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = windowed_counts(stream, ts_col="created_at", window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window"]["start"]: r["cnt"]
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got[dt.datetime(2024, 1, 1, 0, 0)] == 2
    assert got[dt.datetime(2024, 1, 1, 1, 0)] == 1


def test_running_totals_state_across_batches(spark, workdir):
    import datetime as dt

    from simple_etl_spark.streaming.stateful import running_totals

    src = f"{workdir}/statesrc"
    t = dt.datetime(2024, 1, 1)
    _write_batch(spark, src, [("a", "x", t), ("a", "y", t), ("b", "z", t)])
    _write_batch(spark, src, [("a", "w", t), ("c", "v", t)])

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        running_totals(stream, key_col="id")
        .writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from running").collect()
    # final cumulative totals: a seen in 2 batches (3 rows), b and c once
    final = {}
    for r in rows:
        if r["batches"] >= final.get(r["key"], (0, 0))[1]:
            final[r["key"]] = (r["total"], r["batches"])
    assert final["a"] == (3, 2)
    assert final["b"][0] == 1
    assert final["c"][0] == 1


def test_first_seen_dedupe_across_batches(spark, workdir):
    import datetime as dt

    from simple_etl_spark.streaming.stateful import first_seen_dedupe

    src = f"{workdir}/dedupsrc"
    t = dt.datetime(2024, 1, 1)
    _write_batch(spark, src, [("a", "first-a", t), ("a", "dup-a", t), ("b", "first-b", t)])
    _write_batch(spark, src, [("a", "late-dup-a", t), ("c", "first-c", t)])

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        first_seen_dedupe(stream, key_col="id")
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dedup").collect()
    got = {r["id"]: r["content"] for r in rows}
    assert len(rows) == 3  # one row per key, ever
    assert got == {"a": "first-a", "b": "first-b", "c": "first-c"}


def test_first_seen_dedupe_order_col_pins_survivor(spark, workdir):
    """With ``order_col`` the in-batch survivor is the min-order row,
    not the physically-first one — the property that makes
    stream_first_seen_dedupe SQL-replayable (r14)."""
    import datetime as dt

    from simple_etl_spark.streaming.stateful import first_seen_dedupe

    src = f"{workdir}/ordsrc"
    t = dt.datetime(2024, 1, 1)
    # physical file order puts the LATER timestamps first per key; the
    # min-created_at row must still win inside the batch
    _write_batch(
        spark,
        src,
        [
            ("a", "late-a", t + dt.timedelta(hours=2)),
            ("a", "early-a", t),
            ("b", "late-b", t + dt.timedelta(hours=1)),
            ("b", "early-b", t + dt.timedelta(minutes=5)),
        ],
    )
    # a second batch must still lose to first-batch state even when it
    # carries a smaller order value (append mode cannot retract)
    _write_batch(spark, src, [("a", "earliest-but-late-batch", t - dt.timedelta(days=1))])

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        first_seen_dedupe(stream, key_col="id", order_col="created_at")
        .writeStream.format("memory")
        .queryName("ordered_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ordered_dedup").collect()
    got = {r["id"]: r["content"] for r in rows}
    assert got == {"a": "early-a", "b": "early-b"}


def test_sessionized_counts_merges_by_gap(spark, workdir):
    import datetime as dt

    from simple_etl_spark.streaming.medallion_stream import sessionized_counts

    src = f"{workdir}/sesssrc"
    t = dt.datetime(2024, 1, 1)
    # id "a": two events 10 min apart (one session), one 2h later (new
    # session); id "b": single event
    _write_batch(
        spark,
        src,
        [
            ("a", "e1", t),
            ("a", "e2", t + dt.timedelta(minutes=10)),
            ("a", "e3", t + dt.timedelta(hours=2)),
            ("b", "e4", t),
        ],
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        sessionized_counts(stream, ts_col="created_at", gap="30 minutes", group_cols=("id",))
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select id, cnt from sessions order by id, cnt").collect()
    got = [(r["id"], r["cnt"]) for r in rows]
    assert got == [("a", 1), ("a", 2), ("b", 1)]


def test_stream_stream_interval_join(spark, workdir):
    import datetime as dt

    from pyspark.sql import functions as F

    from simple_etl_spark.streaming.joins import interval_join

    t = dt.datetime(2024, 1, 1)
    imp_src = f"{workdir}/impressions"
    clk_src = f"{workdir}/clicks"
    # impressions: a@00:00, b@00:00 ; clicks: a@00:10 (in window),
    # a@01:00 (outside 30min), c@00:05 (no impression)
    _write_batch(spark, imp_src, [("a", "imp-a", t), ("b", "imp-b", t)])
    _write_batch(
        spark,
        clk_src,
        [
            ("a", "clk-a-early", t + dt.timedelta(minutes=10)),
            ("a", "clk-a-late", t + dt.timedelta(hours=1)),
            ("c", "clk-c", t + dt.timedelta(minutes=5)),
        ],
    )
    imp = (
        spark.readStream.schema(SCHEMA).parquet(imp_src)
        .select("id", F.col("content").alias("imp"), F.col("created_at").alias("imp_ts"))
    )
    clk = (
        spark.readStream.schema(SCHEMA).parquet(clk_src)
        .select(
            F.col("id").alias("c_id"),
            F.col("content").alias("clk"),
            F.col("created_at").alias("clk_ts"),
        )
    )
    joined = interval_join(
        imp, clk.withColumnRenamed("c_id", "id"),
        key="id", left_ts="imp_ts", right_ts="clk_ts", within="30 minutes",
    ).select(imp["id"], "imp", "clk")
    q = (
        joined.writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from attributed").collect()
    got = sorted((r["id"], r["clk"]) for r in rows)
    # only the in-window click attributes; late click and orphan click drop
    assert got == [("a", "clk-a-early")]


def test_checkpoint_resume_processes_only_new_data(spark, workdir):
    import datetime as dt

    from simple_etl_spark.sources.table_store import read_table

    src = f"{workdir}/ressrc"
    ckpt = f"{workdir}/resckpt"
    t = dt.datetime(2024, 1, 1)

    # run 1: two rows
    _write_batch(spark, src, [("a", " one ", t), ("b", "two", t)])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = run_stream(stream, f"{workdir}/bz", f"{workdir}/sv", ckpt, clean=_clean)
    q.awaitTermination(120)
    v1 = read_table(spark, f"{workdir}/bz").count()
    assert v1 == 2

    # run 2: same checkpoint, one new file — only the delta flows
    _write_batch(spark, src, [("c", "three", t)])
    stream2 = spark.readStream.schema(SCHEMA).parquet(src)
    q2 = run_stream(stream2, f"{workdir}/bz", f"{workdir}/sv", ckpt, clean=_clean)
    q2.awaitTermination(120)
    bronze = read_table(spark, f"{workdir}/bz")
    silver = read_table(spark, f"{workdir}/sv")
    assert bronze.count() == 3  # a, b, c — no reprocessing duplicates
    assert sorted(r["id"] for r in silver.collect()) == ["a", "b", "c"]
    # the second run's bronze merge only saw the new key: the "a" row
    # kept its original cleaned content (insert-if-absent, not rewrite)
    got = {r["id"]: r["content"] for r in silver.collect()}
    assert got["a"] == "one"


def test_stream_stream_interval_join_left_outer(spark, workdir):
    """Left-outer stream-stream join: an impression with no click in
    its window emits (id, imp, NULL) — but only once the CLICK-side
    watermark passes the impression's eligibility window, which for an
    availableNow run means the null row lands on a later restart after
    a watermark-advancing event arrives. Two runs over one checkpoint
    model exactly that production shape."""
    import datetime as dt

    from simple_etl_spark.streaming.joins import interval_join

    t = dt.datetime(2024, 1, 1)
    imp_src = f"{workdir}/o_impressions"
    clk_src = f"{workdir}/o_clicks"
    ckpt = f"{workdir}/o_ckpt"
    out = f"{workdir}/o_out"
    _write_batch(spark, imp_src, [("a", "imp-a", t), ("b", "imp-b", t)])
    _write_batch(spark, clk_src, [("a", "clk-a", t + dt.timedelta(minutes=10))])

    def run_once():
        imp = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(imp_src)
            .select(
                "id",
                F.col("content").alias("imp"),
                F.col("created_at").alias("imp_ts"),
            )
        )
        clk = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(clk_src)
            .select(
                F.col("id").alias("id"),
                F.col("content").alias("clk"),
                F.col("created_at").alias("clk_ts"),
            )
        )
        joined = interval_join(
            imp, clk, key="id", left_ts="imp_ts", right_ts="clk_ts",
            watermark="10 minutes", within="30 minutes", how="leftOuter",
        ).select(imp["id"], "imp", "clk")
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # the GLOBAL watermark is the min across both inputs, so BOTH
    # streams need later events; two nudge files per side so the
    # restarted run gets a batch AFTER the watermark-advancing one
    # (outer rows emit on the next batch, not the one that advances)
    for h in (6, 7):
        _write_batch(
            spark, clk_src, [("zc", "clk-late", t + dt.timedelta(hours=h))]
        )
        _write_batch(
            spark, imp_src, [("zi", "imp-late", t + dt.timedelta(hours=h))]
        )
    run_once()
    rows = spark.read.parquet(out).collect()
    got = sorted((r["id"], r["clk"]) for r in rows if r["id"] in ("a", "b"))
    assert got == [("a", "clk-a"), ("b", None)]  # outer null after watermark


def test_watermarked_dedupe_bounds_state_and_reemits_after_horizon(spark, workdir):
    import datetime as dt

    from simple_etl_spark.streaming.stateful import watermarked_dedupe

    t = dt.datetime(2024, 1, 1)
    src = f"{workdir}/wd_src"
    out = f"{workdir}/wd_out"
    ckpt = f"{workdir}/wd_ckpt"

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        deduped = watermarked_dedupe(
            stream, keys=["id"], ts_col="created_at", watermark="10 minutes"
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: a twice within the horizon + b once → a emits once
    _write_batch(
        spark,
        src,
        [
            ("a", "first", t),
            ("a", "dup-within", t + dt.timedelta(minutes=1)),
            ("b", "solo", t),
        ],
    )
    run_once()
    first = [(r["id"], r["content"]) for r in spark.read.parquet(out).collect()]
    assert sorted(i for i, _ in first) == ["a", "b"]
    assert ("a", "first") in first  # the FIRST copy is the survivor

    # the watermark only advances AFTER the batch that carries the
    # later event time, so expiry needs one batch to advance it and a
    # SUBSEQUENT batch to deliver the re-arriving key
    _write_batch(spark, src, [("z", "nudge", t + dt.timedelta(hours=5))])
    run_once()
    _write_batch(
        spark, src, [("a", "late-again", t + dt.timedelta(hours=5, minutes=1))]
    )
    run_once()
    ids = sorted(
        r["id"] for r in spark.read.parquet(out).collect() if r["id"] != "z"
    )
    assert ids == ["a", "a", "b"]  # expired state → 'a' re-emits


def test_enriched_stream_sees_dimension_updates(spark, workdir):
    """Slowly-changing-broadcast enrichment: a dimension update
    committed to the snapshot store BETWEEN micro-batches is visible
    to the next batch without a stream restart."""
    import datetime as dt

    from simple_etl_spark.sources.table_store import read_table, write_table
    from simple_etl_spark.streaming.medallion_stream import run_enriched_stream

    t = dt.datetime(2024, 1, 1)
    src = f"{workdir}/en_src"
    dim_base = f"{workdir}/en_dim"
    out_base = f"{workdir}/en_out"
    ckpt = f"{workdir}/en_ckpt"

    write_table(
        spark.createDataFrame([("a", "cat-v1")], "id string, category string"),
        dim_base,
    )
    _write_batch(spark, src, [("a", "one", t)])

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = run_enriched_stream(
            stream, dim_base, on=["id"], out_base=out_base,
            checkpoint=ckpt, key="id", order_col="created_at",
        )
        q.awaitTermination(120)

    run_once()
    got = {r["id"]: r["category"] for r in read_table(spark, out_base).collect()}
    assert got == {"a": "cat-v1"}

    # dimension update lands between batches; next batch sees it, and
    # an unknown key enriches to NULL (left join)
    write_table(
        spark.createDataFrame(
            [("a", "cat-v2"), ("b", "cat-b")], "id string, category string"
        ),
        dim_base,
    )
    _write_batch(
        spark, src,
        [("a", "two", t + dt.timedelta(hours=1)), ("z", "zzz", t)],
    )
    run_once()
    got = {r["id"]: r["category"] for r in read_table(spark, out_base).collect()}
    assert got == {"a": "cat-v2", "z": None}


def test_gap_session_finalizer_emits_on_watermark_timer(spark, workdir):
    import datetime as dt

    from simple_etl_spark.streaming.stateful import gap_session_finalizer

    src = f"{workdir}/sessrc"
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    # batch 1: a has two events, b one
    _write_batch(spark, src, [("a", "x", t0), ("a", "y", t0 + m), ("b", "z", t0)])
    # batch 2: a extends its session; c opens far later (advances watermark)
    _write_batch(spark, src, [("a", "w", t0 + 2 * m), ("c", "v", t0 + 30 * m)])
    # batch 3: far-future sentinel -> watermark passes every earlier timer
    _write_batch(spark, src, [("zz", "s", t0 + dt.timedelta(hours=10))])

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        gap_session_finalizer(
            stream, key_col="id", ts_col="created_at", gap_seconds=300
        )
        .writeStream.format("memory")
        .queryName("gap_sessions")
        .option("checkpointLocation", f"{workdir}/sessckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r["key"]: r for r in spark.sql("select * from gap_sessions").collect()}
    # a and b finalized when the watermark passed last+gap; c finalized
    # by the sentinel batch; zz still open -> absent
    base = int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["n_events"] == 3
    assert rows["a"]["end_ms"] - rows["a"]["start_ms"] == 120_000
    assert rows["b"]["n_events"] == 1
    assert rows["b"]["start_ms"] == rows["b"]["end_ms"]
    assert rows["c"]["n_events"] == 1
    assert "zz" not in rows


def test_gap_session_finalizer_splits_in_batch_gap(spark, workdir):
    """Two bursts separated by more than the gap INSIDE one batch must
    close the first session immediately (no timer needed)."""
    import datetime as dt

    from simple_etl_spark.streaming.stateful import gap_session_finalizer

    src = f"{workdir}/splitsrc"
    t0 = dt.datetime(2024, 1, 1)
    _write_batch(
        spark,
        src,
        [
            ("a", "e1", t0),
            ("a", "e2", t0 + dt.timedelta(seconds=30)),
            ("a", "e3", t0 + dt.timedelta(hours=1)),  # > gap later
        ],
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        gap_session_finalizer(
            stream, key_col="id", ts_col="created_at", gap_seconds=300
        )
        .writeStream.format("memory")
        .queryName("split_sessions")
        .option("checkpointLocation", f"{workdir}/splitckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from split_sessions").collect()
    # first burst's timer expired once the watermark (zero lateness)
    # reached the second burst; second still open
    assert len(rows) == 1
    assert rows[0]["n_events"] == 2
    assert rows[0]["end_ms"] - rows[0]["start_ms"] == 30_000


def test_gap_session_finalizer_holds_sessions_for_late_events(spark, workdir):
    """The round-5 ADVICE repro: gap=300s, watermark='2 hours'. Batch 1
    delivers 10:00 and 10:10 (two sessions); batch 2 delivers a LEGAL
    late 10:02 plus a far-future sentinel. The 10:00 session must not
    have been emitted at the batch-1 boundary — the late 10:02 extends
    it, so the final sessions are {10:00,10:02} and {10:10}, not three
    singletons."""
    import datetime as dt

    from simple_etl_spark.streaming.stateful import gap_session_finalizer

    src = f"{workdir}/latesrc"
    t0 = dt.datetime(2024, 1, 1, 10, 0)
    m = dt.timedelta(minutes=1)
    _write_batch(spark, src, [("a", "e1", t0), ("a", "e2", t0 + 10 * m)])
    _write_batch(
        spark, src,
        [("a", "late", t0 + 2 * m), ("zz", "s", t0 + dt.timedelta(hours=12))],
    )
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        gap_session_finalizer(
            stream, key_col="id", ts_col="created_at", gap_seconds=300,
            watermark="2 hours",
        )
        .writeStream.format("memory")
        .queryName("late_sessions")
        .option("checkpointLocation", f"{workdir}/lateckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        spark.sql("select * from late_sessions where key = 'a'").collect(),
        key=lambda r: r["start_ms"],
    )
    base = int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert [(r["start_ms"], r["end_ms"], r["n_events"]) for r in rows] == [
        (base, base + 120_000, 2),          # {10:00, 10:02}
        (base + 600_000, base + 600_000, 1),  # {10:10}
    ]


def test_gap_session_finalizer_rejects_bad_gap(spark):
    from simple_etl_spark.streaming.stateful import gap_session_finalizer

    with pytest.raises(ValueError, match="gap_seconds"):
        gap_session_finalizer(spark.range(1), gap_seconds=0)


def test_gap_session_finalizer_out_of_order_event_does_not_merge_backwards(
    spark, workdir
):
    """A cross-batch event far BEFORE the open session must open its
    own (older) session, not be absorbed into the later one."""
    import datetime as dt

    from simple_etl_spark.streaming.stateful import gap_session_finalizer

    src = f"{workdir}/ooosrc"
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    # batch 1: session at 10:00-10:05
    _write_batch(spark, src, [
        ("a", "x", t0), ("a", "y", t0 + dt.timedelta(minutes=5)),
    ])
    # batch 2: late event at 9:00 (watermark still behind it: delay 2h)
    _write_batch(spark, src, [("a", "late", t0 - dt.timedelta(hours=1))])
    # batch 3: sentinel far in the future closes everything
    _write_batch(spark, src, [("zz", "s", t0 + dt.timedelta(days=2))])

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        gap_session_finalizer(
            stream, key_col="id", ts_col="created_at",
            gap_seconds=300, watermark="2 hours",
        )
        .writeStream.format("memory")
        .queryName("ooo_sessions")
        .option("checkpointLocation", f"{workdir}/ooockpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        (r for r in spark.sql("select * from ooo_sessions").collect()
         if r["key"] == "a"),
        key=lambda r: r["start_ms"],
    )
    assert [r["n_events"] for r in rows] == [1, 2]
    assert rows[0]["start_ms"] == rows[0]["end_ms"]  # the 9:00 singleton
    assert rows[1]["end_ms"] - rows[1]["start_ms"] == 300_000


def test_gap_session_finalizer_skips_null_event_times(spark, workdir):
    import datetime as dt

    from simple_etl_spark.streaming.stateful import gap_session_finalizer

    src = f"{workdir}/nullsrc"
    t0 = dt.datetime(2024, 1, 1)
    _write_batch(spark, src, [("a", "x", t0), ("a", "nullts", None)])
    _write_batch(spark, src, [("zz", "s", t0 + dt.timedelta(days=1))])
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        gap_session_finalizer(stream, key_col="id", ts_col="created_at",
                              gap_seconds=300)
        .writeStream.format("memory")
        .queryName("null_sessions")
        .option("checkpointLocation", f"{workdir}/nullckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r["key"]: r for r in spark.sql("select * from null_sessions").collect()}
    assert rows["a"]["n_events"] == 1  # the null-ts row carried no signal


def test_crash_recovery_mid_drain_conserves_and_never_duplicates(spark, workdir):
    """ST6 under an actual interrupted run (VERDICT r7 #6): the first
    drain is killed MID-BATCH — after micro-batch 2's bronze commit
    but before its silver commit, and after micro-batch 1 committed
    to the checkpoint — then restarted from the SAME checkpoint. The
    replayed batch hits both sinks again (at-least-once), and the
    keyed merges must absorb the partial state: every id exactly once
    per layer, values identical to a never-crashed run."""
    import datetime as dt
    import os

    src = f"{workdir}/src"
    ckpt = f"{workdir}/crashckpt"
    sentinel = f"{workdir}/crash.flag"
    t = dt.datetime(2024, 1, 1)
    batches = [
        [("a", " one ", t), ("b", "two", t)],
        [("c", "three", t), ("b", "two-updated", t + dt.timedelta(hours=1))],
        [("e", "five", t)],
    ]
    for rows in batches:
        _write_batch(spark, src, rows)

    def crashing_clean(df):
        if os.path.exists(sentinel) and df.filter(
            F.col("id") == "c"
        ).limit(1).count():
            raise RuntimeError("injected crash: after bronze, before silver")
        return _clean(df)

    def start(paths=("bronze", "silver")):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = run_stream(
            stream,
            f"{workdir}/{paths[0]}",
            f"{workdir}/{paths[1]}",
            ckpt,
            crashing_clean,
            key="id",
            order_col="created_at",
        )
        return q

    # run 1: dies inside micro-batch 2, between the two sink commits
    open(sentinel, "w").close()
    q = start()
    with pytest.raises(Exception, match="injected crash: after bronze"):
        q.awaitTermination(120)
        # guard message deliberately does NOT match the raises pattern,
        # so a regression where the injection stops firing fails here
        raise AssertionError("stream query survived — injection never fired")
    # the crash landed after ≥1 COMMITTED micro-batch (a real
    # mid-drain interruption, not a failure on the first batch)
    committed = os.listdir(f"{ckpt}/commits")
    assert len(committed) >= 1, committed

    from simple_etl_spark.sources.table_store import read_table

    # partial state is visible and expected: batch 2's bronze landed,
    # its silver did not
    bronze_ids = sorted(
        r["id"] for r in read_table(spark, f"{workdir}/bronze").collect()
    )
    silver_ids = sorted(
        r["id"] for r in read_table(spark, f"{workdir}/silver").collect()
    )
    assert "c" in bronze_ids and "c" not in silver_ids

    # run 2: same checkpoint, crash removed — batch 2 replays into
    # BOTH sinks (bronze sees it a second time), batch 3 follows
    os.remove(sentinel)
    q2 = start()
    q2.awaitTermination(120)

    bronze = read_table(spark, f"{workdir}/bronze")
    silver = read_table(spark, f"{workdir}/silver")
    assert sorted(r["id"] for r in bronze.collect()) == ["a", "b", "c", "e"]
    assert sorted(r["id"] for r in silver.collect()) == ["a", "b", "c", "e"]
    got = {r["id"]: r["content"] for r in silver.collect()}
    assert got == {
        "a": "one", "b": "two-updated", "c": "three", "e": "five",
    }

    # ...and the recovered state is byte-identical to a run that
    # never crashed (fresh checkpoint + sinks over the same source)
    q3 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q3 = run_stream(
        q3, f"{workdir}/bronze_ref", f"{workdir}/silver_ref",
        f"{workdir}/refckpt", _clean, key="id", order_col="created_at",
    )
    q3.awaitTermination(120)
    ref_silver = read_table(spark, f"{workdir}/silver_ref")
    assert sorted(tuple(r) for r in silver.collect()) == sorted(
        tuple(r) for r in ref_silver.collect()
    )


def test_env_positive_int_validates_and_falls_back(monkeypatch, capsys):
    """ADVICE r8: malformed or non-positive drain sizing env vars must
    fall back to the default with a warning, never raise mid-drain or
    turn awaitTermination into an instant fake timeout."""
    from simple_etl_spark.streaming.stream_queries import _env_positive_int

    monkeypatch.delenv("X_DRAIN_KNOB", raising=False)
    assert _env_positive_int("X_DRAIN_KNOB", 300) == 300

    monkeypatch.setenv("X_DRAIN_KNOB", "120")
    assert _env_positive_int("X_DRAIN_KNOB", 300) == 120

    for bad in ("12s", "", "0", "-5", "3.5"):
        monkeypatch.setenv("X_DRAIN_KNOB", bad)
        assert _env_positive_int("X_DRAIN_KNOB", 300) == 300
        assert "X_DRAIN_KNOB" in capsys.readouterr().err


def test_parquet_drain_sink_matches_memory_sink(spark, sf_dir, monkeypatch):
    """SPARK_GRAFT_DRAIN_SINK=parquet drains an append-mode query to a
    FileStreamSink (rows never land in driver memory — the sf10 §8c
    fix) and must return exactly the memory sink's rows."""
    from simple_etl_spark.queries import REGISTRY, _load_all

    _load_all()
    gap = REGISTRY["stream_gap_sessions"].fn

    monkeypatch.delenv("SPARK_GRAFT_DRAIN_SINK", raising=False)
    mem = sorted(map(tuple, gap(spark, sf_dir).collect()))
    monkeypatch.setenv("SPARK_GRAFT_DRAIN_SINK", "parquet")
    pq = sorted(map(tuple, gap(spark, sf_dir).collect()))
    assert pq == mem and len(mem) > 0


def test_parquet_drain_sink_update_mode_falls_back_loudly(
    spark, sf_dir, monkeypatch, capsys
):
    """File sinks are append-only: an update-mode drain under
    SPARK_GRAFT_DRAIN_SINK=parquet must warn and use the memory sink
    rather than silently emit append-duplicated state rows."""
    from simple_etl_spark.queries import REGISTRY, _load_all

    _load_all()
    run = REGISTRY["stream_running_totals"].fn
    monkeypatch.delenv("SPARK_GRAFT_DRAIN_SINK", raising=False)
    mem = sorted(map(tuple, run(spark, sf_dir).collect()))
    monkeypatch.setenv("SPARK_GRAFT_DRAIN_SINK", "parquet")
    got = sorted(map(tuple, run(spark, sf_dir).collect()))
    assert got == mem
    assert "append-only" in capsys.readouterr().err


def test_drain_sink_auto_cutover_by_size(tmp_path, monkeypatch, capsys):
    """The drain sink defaults by input size (VERDICT r12 watch item
    #1): append-mode drains whose source exceeds the cutover pick the
    parquet FileStreamSink with no env var set; explicit env always
    wins; non-append modes never auto-switch."""
    from simple_etl_spark.streaming import stream_queries as sq

    big = tmp_path / "events.parquet"
    big.write_bytes(b"\x00" * 2048)
    monkeypatch.delenv("SPARK_GRAFT_DRAIN_SINK", raising=False)
    monkeypatch.setattr(sq, "_PARQUET_CUTOVER_BYTES", 1024)
    assert sq._sink_format("append", str(big), "s") == "parquet"
    assert "cutover" in capsys.readouterr().err
    monkeypatch.setattr(sq, "_PARQUET_CUTOVER_BYTES", 1 << 30)
    assert sq._sink_format("append", str(big), "s") == "memory"
    monkeypatch.setattr(sq, "_PARQUET_CUTOVER_BYTES", 1024)
    assert sq._sink_format("update", str(big), "s") == "memory"
    assert sq._sink_format("complete", str(big), "s") == "memory"
    assert sq._sink_format("append", None, "s") == "memory"
    # explicit env wins in both directions
    monkeypatch.setenv("SPARK_GRAFT_DRAIN_SINK", "memory")
    assert sq._sink_format("append", str(big), "s") == "memory"
    monkeypatch.setenv("SPARK_GRAFT_DRAIN_SINK", "parquet")
    monkeypatch.setattr(sq, "_PARQUET_CUTOVER_BYTES", 1 << 30)
    assert sq._sink_format("append", str(big), "s") == "parquet"
    # malformed env warns and falls back to automatic sizing
    monkeypatch.setenv("SPARK_GRAFT_DRAIN_SINK", "bogus")
    monkeypatch.setattr(sq, "_PARQUET_CUTOVER_BYTES", 1024)
    assert sq._sink_format("append", str(big), "s") == "parquet"
    assert "bogus" in capsys.readouterr().err
    # dataset directories are sized by the sum of their parquet parts
    monkeypatch.delenv("SPARK_GRAFT_DRAIN_SINK", raising=False)
    d = tmp_path / "ds"
    (d / "x").mkdir(parents=True)
    (d / "part-0.parquet").write_bytes(b"\x00" * 800)
    (d / "x" / "part-1.parquet").write_bytes(b"\x00" * 800)
    assert sq._sink_format("append", str(d), "s") == "parquet"


def test_auto_cutover_default_path_matches_memory(
    spark, sf_dir, monkeypatch, capsys
):
    """End-to-end on the DEFAULT path (no env var): with the source
    above the cutover the drain lands in the parquet sink and returns
    exactly the memory sink's rows — so a user who never heard of
    SPARK_GRAFT_DRAIN_SINK cannot re-discover the sf10 memory-sink
    driver OOM."""
    from simple_etl_spark.queries import REGISTRY, _load_all
    from simple_etl_spark.streaming import stream_queries as sq

    _load_all()
    gap = REGISTRY["stream_gap_sessions"].fn
    monkeypatch.delenv("SPARK_GRAFT_DRAIN_SINK", raising=False)
    mem = sorted(map(tuple, gap(spark, sf_dir).collect()))
    monkeypatch.setattr(sq, "_PARQUET_CUTOVER_BYTES", 0)
    auto = sorted(map(tuple, gap(spark, sf_dir).collect()))
    assert "cutover" in capsys.readouterr().err
    assert auto == mem and len(mem) > 0
