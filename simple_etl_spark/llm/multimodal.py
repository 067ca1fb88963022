"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride through the engine as opaque ``binary``
columns with a metadata struct; decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` so payload bytes never round-trip
through Python row-at-a-time.

The decode step itself is STUBBED (image/audio codecs are not in this
environment): :func:`decode_image` raises ``NotImplementedError`` and
tests/queries use :func:`byte_features`, a deterministic extractor
with the same signature and batch shape — the Spark-side plumbing
(schema, partitioning, UDF signature, Arrow batching) is real and
oracle-tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("modality", StringType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real deployments plug a codec here (PIL/libvips on executors).

    STUB: codecs are unavailable in this environment."""
    raise NotImplementedError("image decode requires a codec library on executors")


def byte_features(payload: bytes) -> tuple[int, int]:
    """Deterministic fake 'decoder': (byte length, first byte)."""
    return len(payload), (payload[0] if payload else -1)


def binary_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: payload as binary + metadata struct
    (here synthesized from text so the pipeline is testable)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(text_col).cast("bigint").alias("declared_size"),
        ).alias("meta"),
    )


def extract_features(
    binary_df: DataFrame,
    extractor: Callable[[bytes], tuple[int, int]] = byte_features,
    modality: str = "text",
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas: each batch arrives as a pandas DataFrame whose
    payload cells are ``bytes`` — the extractor is called per payload
    but the transfer is columnar (one Arrow batch per ~10k rows, not
    one pickle per row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [extractor(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [f[0] for f in feats],
                    "first_byte": [f[1] for f in feats],
                    "modality": modality,
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
