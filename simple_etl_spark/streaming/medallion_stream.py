"""Structured-Streaming medallion topology (SURVEY §2.9 ST1-ST8).

The reference's consumer loop (`pipeline/consumer_pipeline.py:237-316`:
poll → bronze insert → silver clean → gold flag) becomes one streaming
query with ``foreachBatch``: checkpoints subsume the ``processed``-flag
watermark (ST7), and idempotent keyed merges per micro-batch give the
same at-least-once + idempotent-sink guarantee (ST6) with exact
bookkeeping.

Source-agnostic: any streaming DataFrame works — Kafka
(`readStream.format("kafka")` + from_json, see sources/kafka.py), or a
file stream in tests (deterministic micro-batches via
``maxFilesPerTrigger``). Sinks are parquet tables merged with the
operators/merge primitives.

Superset feature (SURVEY §2.9 note): the reference has no event-time
windows; :func:`windowed_counts` adds watermarked tumbling-window
aggregation for the daily/hourly analytics in streaming mode.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_etl_spark.operators.merge import insert_if_absent, upsert_latest_wins
from simple_etl_spark.sources.table_store import read_table, write_table


def _read_or_empty(spark: SparkSession, base: str, like: DataFrame) -> DataFrame:
    """Existing sink contents, or an empty frame with the right schema."""
    existing = read_table(spark, base)
    return existing if existing is not None else spark.createDataFrame([], like.schema)


def medallion_sink(
    bronze_path: str,
    silver_path: str,
    clean: Callable[[DataFrame], DataFrame],
    key: str = "id",
    order_col: str = "created_at",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: bronze insert-if-absent (S6 semantics), then
    clean → silver latest-wins upsert (S7). Both merges are idempotent
    by key, so at-least-once redelivery is safe (ST6).

    Note on atomicity (SURVEY §7 hard part (a)): sinks are versioned
    snapshot tables (sources/table_store.py) — each micro-batch writes
    a fresh snapshot and swaps the pointer, so a crash mid-merge
    leaves the previous snapshot intact and readers never observe a
    partial table."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.dropDuplicates([key])

        bronze = _read_or_empty(spark, bronze_path, batch_df)
        merged_bronze = insert_if_absent(bronze, batch_df, [key])
        write_table(merged_bronze, bronze_path)

        cleaned = clean(batch_df)
        silver = _read_or_empty(spark, silver_path, cleaned)
        merged_silver = upsert_latest_wins(silver, cleaned, [key], order_col)
        write_table(merged_silver, silver_path)

    return process


def run_stream(
    stream_df: DataFrame,
    bronze_path: str,
    silver_path: str,
    checkpoint: str,
    clean: Callable[[DataFrame], DataFrame],
    key: str = "id",
    order_col: str = "created_at",
    trigger: str | None = None,
):
    """Start the medallion stream (ST1). Default trigger drains all
    available input and stops (availableNow); pass a processing-time
    interval (e.g. ``"5 seconds"``, ST5) for a continuous consumer.
    Returns the StreamingQuery; callers awaitTermination."""
    writer = stream_df.writeStream.foreachBatch(
        medallion_sink(bronze_path, silver_path, clean, key, order_col)
    ).option("checkpointLocation", checkpoint)
    if trigger is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger)
    return writer.start()


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 day",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark —
    the streaming twin of the daily/hourly analytics views."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), *group_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def sessionized_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 day",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Event-time session windows: rows closer than ``gap`` merge into
    one session per key. Watermark bounds session state — a session
    closes (and its row becomes final) once the watermark passes its
    end, so state size tracks the number of *open* sessions, not
    history."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(ts_col).alias("first_event"),
            F.max(ts_col).alias("last_event"),
        )
    )


def run_enriched_stream(
    stream,
    dim_base: str,
    on: list[str],
    out_base: str,
    checkpoint: str,
    key: str,
    order_col: str,
    how: str = "left",
):
    """Stream-to-dimension enrichment with a per-micro-batch dimension
    reload — the slowly-changing-broadcast pattern: the dimension
    lives in the snapshot store, each micro-batch resolves the CURRENT
    snapshot (a dimension update committed between batches is visible
    to the next batch, no restart), and the join broadcasts the
    (small) dimension per batch.

    This is the streaming shape a plain static-DataFrame join cannot
    give you: Spark resolves a static side ONCE at query start, so
    dimension updates would be invisible until restart. foreachBatch
    re-reads the pointer per batch — at most one snapshot behind,
    which is the freshness contract of every broadcast-dim stream.

    Output upserts latest-wins into ``out_base`` keyed on ``key`` /
    ``order_col`` (same idempotent sink as the medallion stream, so
    redelivered batches are safe)."""
    def handle(batch_df, _batch_id):
        spark = batch_df.sparkSession
        dim = read_table(spark, dim_base)
        if dim is None:
            # enriching against a dimension that has never committed
            # would write a sink snapshot WITHOUT the dim columns, and
            # the first post-commit batch would then fail the keyed
            # merge on schema mismatch — permanently poisoning the
            # sink. Fail the stream loudly instead: commit the
            # dimension (even empty) before starting.
            raise FileNotFoundError(
                f"run_enriched_stream: no committed dimension under "
                f"{dim_base}; commit it (even with zero rows) first"
            )
        out = batch_df.join(F.broadcast(dim), on, how)
        merged = upsert_latest_wins(
            _read_or_empty(spark, out_base, out), out,
            keys=[key], order_col=order_col,
        )
        write_table(merged, out_base)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
