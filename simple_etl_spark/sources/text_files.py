"""CSV / JSONL ingestion with a corrupt-record quarantine.

The reference ingests semi-structured payloads (Kafka JSON bodies,
crawler output — pipeline/consumer_pipeline.py, crawler/cnn.py) and
silently trusts their shape; a production lake cannot. These readers
enforce a caller-supplied schema and split every load into a (good,
quarantine) pair instead of dropping or poisoning rows:

- good: rows that parsed to the full schema,
- quarantine: the raw text of every row that did not, preserved
  verbatim for replay once the producer is fixed.

Both use Spark's PERMISSIVE mode with ``columnNameOfCorruptRecord`` —
the distributed-parse path (no driver-side sniffing), so the split is
a single scan plus a null filter, scale-free. The quarantine relation
must not be the only projected column of a raw file scan (Spark
disallows corrupt-record-only queries since 2.3), which is why the
split selects through the full parsed frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if _CORRUPT in schema.fieldNames():
        raise ValueError(f"schema must not already contain {_CORRUPT}")
    return StructType(list(schema.fields) + [StructField(_CORRUPT, StringType())])


def _split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    # Spark refuses a scan whose only referenced column is the corrupt
    # record (column pruning would parse nothing to validate); caching
    # the parsed frame is the supported route — and the load is
    # consumed twice (good + quarantine) anyway, so the cache pays for
    # itself. Callers should unpersist after both sides are written.
    parsed = parsed.cache()
    good = parsed.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    quarantine = parsed.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw")
    )
    return good, quarantine


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced CSV load → (good, quarantine).

    A row lands in quarantine when it cannot parse to the schema
    (wrong arity, type mismatch) — its original text is kept whole.
    """
    parsed = (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .csv(path)
    )
    return _split(parsed)


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Schema-enforced JSON-lines load → (good, quarantine).

    Malformed JSON and type-mismatched documents quarantine; fields
    missing from a document parse as null (schema presence, not
    per-field strictness — tighten with a post-filter when a field is
    mandatory).
    """
    parsed = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    return _split(parsed)


def write_orc(df, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink — the second columnar interchange format warehouses
    actually exchange (Hive/Trino estates). Same layout controls as
    the parquet paths; Spark's native writer, no extra packages."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark, path: str):
    """ORC scan with the same pushdown/pruning behavior as parquet
    (Spark's native vectorized ORC reader; predicate pushdown via
    ORC's internal min/max indexes)."""
    return spark.read.orc(path)
