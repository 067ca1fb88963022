"""Kafka source/sink builders (SURVEY §2.1 S3-S5).

The reference's producer/consumer services
(`services/producer_services.py:14-58`, `services/consumer_services.py:
54-70`, robust variants `services/kafka_services.py:91-210`) map 1:1
onto Spark's Kafka connector options; these builders encode that
mapping. No broker exists in the test environment, so everything here
is plan construction — exercised by schema tests, and by integration
when a broker is configured via KAFKA_BOOTSTRAP.

Delivery semantics: the reference relies on at-least-once +
id-keyed idempotent upserts (ST6); the streaming medallion keeps that
contract via checkpoints + merge sinks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DEFAULT_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")


def read_stream(
    spark: SparkSession,
    topic: str,
    schema: StructType,
    bootstrap: str = DEFAULT_BOOTSTRAP,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S4 (stream): kafka JSON topic → typed columns.

    ``maxOffsetsPerTrigger`` plays the role of the reference's
    ``max_poll_records`` batch cap."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    return raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.from_json(F.col("value").cast("string"), schema).alias("j"),
        "timestamp",
    ).select("kafka_key", "j.*", F.col("timestamp").alias("kafka_ts"))


def read_batch(
    spark: SparkSession,
    topic: str,
    schema: StructType,
    bootstrap: str = DEFAULT_BOOTSTRAP,
) -> DataFrame:
    """S4 (batch): bounded read of a topic's current contents —
    the reference's `consume_batch(timeout_ms, max_records)`."""
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("j")
    ).select("j.*")


# The reference's robust-producer contract
# (services/kafka_services.py:23-33, producer_services.py:19-22):
# every write ships with these passed through to the Kafka producer.
PRODUCER_CONTRACT = {
    "kafka.acks": "all",
    "kafka.enable.idempotence": "true",
    "kafka.compression.type": "snappy",
    "kafka.linger.ms": "10",
    "kafka.batch.size": "32768",
    "kafka.retries": "5",
}


def write_batch(
    df: DataFrame,
    topic: str,
    key_col: str = "id",
    bootstrap: str = DEFAULT_BOOTSTRAP,
) -> None:
    """S3: JSON-serialize rows keyed by id — the producer's
    `value_serializer=json.dumps`, `key=article id` contract
    (`services/producer_services.py:14-58`). Producer-side delivery
    settings carry the reference's robust contract
    (:data:`PRODUCER_CONTRACT`: acks=all, idempotent, snappy,
    linger 10 ms, batch 32 KB, retries 5) as `kafka.`-prefixed
    connector pass-throughs."""
    writer = (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.to_json(F.struct("*")).alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
    )
    for k, v in PRODUCER_CONTRACT.items():
        writer = writer.option(k, v)
    writer.save()


def to_kafka_frame(df: DataFrame, key_col: str = "id") -> DataFrame:
    """The serialization transform alone (testable without a broker):
    (key, value-as-JSON) exactly as the producer would emit."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct("*")).alias("value"),
    )


def ensure_topic(
    topic: str,
    partitions: int = 3,
    retention_days: int = 7,
    bootstrap: str = DEFAULT_BOOTSTRAP,
) -> dict:
    """S5: topic provisioning with the reference's layout — 3
    partitions, 7-day retention (`services/kafka_services.py:56-62`).

    Admin-client work, not engine work: gated behind an import-try
    (no broker or kafka client exists in the test environment). The
    returned config dict is the provisioning contract either way, so
    callers and tests can validate the layout without a broker.
    """
    config = {
        "topic": topic,
        "num_partitions": partitions,
        "replication_factor": 1,
        "config": {"retention.ms": str(retention_days * 24 * 3600 * 1000)},
    }
    try:
        from kafka.admin import KafkaAdminClient, NewTopic  # type: ignore
    except ImportError:
        return {**config, "created": False, "reason": "kafka client not installed"}
    admin = KafkaAdminClient(bootstrap_servers=bootstrap)
    try:
        admin.create_topics(
            [
                NewTopic(
                    name=topic,
                    num_partitions=partitions,
                    replication_factor=1,
                    topic_configs=config["config"],
                )
            ]
        )
        return {**config, "created": True}
    finally:
        admin.close()
