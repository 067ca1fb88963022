"""Canonical StructTypes per medallion layer (SURVEY §1.3).

One explicitly declared schema per layer, mirroring the reference's
CREATE TABLE DDL (bronze: services/staging_pg.py:43-56 / init.sql:6-17;
silver: services/staging_pg.py:59-73 / init.sql:27-39; entities:
services/staging_pg.py:76-88). Gold has no schema of its own — it is
a derived projection (operators/medallion.gold_view), exactly as the
reference keeps gold a view.

Schema-on-write promotion: bronze carries ``date_raw`` as a string;
silver parses it to a typed timestamp (functions/clean.parse_date).
Kafka JSON is parsed against BRONZE_SCHEMA via from_json — in-flight
messages are schemaless, the engine's boundary is typed.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

BRONZE_SCHEMA = StructType(
    [
        StructField("id", StringType()),  # md5(link), backfilled if absent
        StructField("title", StringType()),
        StructField("link", StringType(), nullable=False),
        StructField("image", StringType()),
        StructField("date_raw", StringType()),  # untyped at bronze
        StructField("topic", StringType()),
        StructField("content", StringType()),
        StructField("source", StringType()),
        StructField("created_at", TimestampType()),
        StructField("processed", BooleanType()),
    ]
)

SILVER_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("title", StringType()),
        StructField("link", StringType(), nullable=False),
        StructField("image", StringType()),
        StructField("date", TimestampType()),  # parsed, nullable on failure
        StructField("topic", StringType()),
        StructField("content", StringType()),
        StructField("content_length", IntegerType()),
        StructField("source", StringType()),
        StructField("created_at", TimestampType()),
        StructField("updated_at", TimestampType()),
        StructField("processed", BooleanType()),
    ]
)

ENTITY_SCHEMA = StructType(
    [
        StructField("article_id", StringType(), nullable=False),
        StructField("entity_text", StringType()),
        StructField("entity_type", StringType()),
        StructField("confidence_score", DoubleType()),
        StructField("start_position", IntegerType()),
        StructField("end_position", IntegerType()),
        StructField("processed_at", TimestampType()),
    ]
)
