"""Driver-contract queries that exercise the stateful streaming
operators end-to-end: each callable starts a real Structured Streaming
query (file source → applyInPandasWithState → memory sink), drains it
with availableNow, and returns the sink contents as the result
DataFrame.

``stream_running_totals`` is oracle-verified: with one source file the
run is exactly one micro-batch, so per-key totals equal a batch
``count(*) GROUP BY`` and ``batches`` is literally 1. The dedupe query
keeps a rows-only check — which row survives per key depends on
arrival order inside the batch, which no batch SQL can pin down
(SURVEY §2.9: the driver records the weaker check for such ops).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from simple_etl_spark.queries import query
from simple_etl_spark.engine import Catalog
from simple_etl_spark.streaming.stateful import first_seen_dedupe, running_totals

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _doc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def _drain(result: DataFrame, name_prefix: str) -> DataFrame:
    spark = result.sparkSession
    sink = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{sink}_")
    mode = "update" if name_prefix == "running" else "append"
    q = (
        result.writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink)


@query(
    "stream_running_totals",
    oracle="""
    SELECT lang AS key, count(*) AS total, 1 AS batches
    FROM documents GROUP BY lang
    """,
    survey="ST8 + applyInPandasWithState (keyed state across micro-batches)",
)
def stream_running_totals(cat: Catalog) -> DataFrame:
    """Per-language running document counts via keyed state store —
    drained with availableNow so one source file ≡ one micro-batch and
    the totals equal the batch GROUP BY."""
    stream = _doc_stream(cat.spark, cat.sf_dir)
    return _drain(running_totals(stream, key_col="lang"), "running")


@query(
    "stream_first_seen_dedupe",
    oracle=None,  # survivor row is arrival-order-defined; rows-only check
    survey="S6-streaming (first-seen exact dedup via applyInPandasWithState)",
)
def stream_first_seen_dedupe(cat: Catalog) -> DataFrame:
    """Streaming exact dedup keyed by lang: one survivor per language
    (row count = distinct langs, content arrival-defined)."""
    stream = _doc_stream(cat.spark, cat.sf_dir)
    return _drain(first_seen_dedupe(stream, key_col="lang"), "dedup")
