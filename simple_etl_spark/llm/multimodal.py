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


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("orig_bytes", LongType()),
        StructField("out_bytes", IntegerType()),
        StructField("out_md5", StringType()),
    ]
)


def sample_frames(
    binary_df: DataFrame, frame_size: int = 32, stride: int = 2
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: split each
    payload into fixed-size byte frames and emit every ``stride``-th
    one — a table-generating transform (rows out > rows in) expressed
    as ``mapInPandas`` so the fan-out happens inside the executor,
    per Arrow batch, never on the driver.

    A real deployment swaps the byte-chunking for a container demuxer
    (pyav/ffmpeg on executors) with this exact signature and output
    schema; frames travel onward as rows, so downstream decode /
    feature-extract stages parallelize per frame, not per video."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + frame_size - 1) // frame_size
                for idx in range(0, n_frames, stride):
                    chunk = payload[idx * frame_size : (idx + 1) * frame_size]
                    out["doc_id"].append(did)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return binary_df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def resize_payload(binary_df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize plumbing for image-like payloads: normalize every payload
    to a fixed byte budget (truncate, or right-pad with 0x20) and
    report the digest of the resized buffer.

    STUB semantics: a real deployment replaces the truncate/pad with a
    decoder+resampler (PIL/libvips on executors) returning the
    re-encoded bytes — the Spark-side contract (Arrow-batched
    mapInPandas, fixed output schema, per-payload independence) is
    what this function locks in."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                (p[:target_bytes] if len(p) >= target_bytes else p.ljust(target_bytes, b" "))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": [len(p) for p in pdf["payload"]],
                    "out_bytes": [len(r) for r in resized],
                    "out_md5": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


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


SUITE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("modality", StringType()),
        StructField("out_bytes", IntegerType()),
        StructField("out_md5", StringType()),
    ]
)


def multimodal_features(
    binary_df: DataFrame,
    extractor: Callable[[bytes], tuple[int, int]] = byte_features,
    modality: str = "text",
    target_bytes: int = 64,
) -> DataFrame:
    """Feature-extract + resize in ONE Arrow pass over the payloads —
    the fused form of :func:`extract_features` ∘ :func:`resize_payload`
    (joining their outputs would scan the binary column twice and add
    a shuffle join on doc_id for no reason)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [extractor(p) for p in pdf["payload"]]
            resized = [
                (p[:target_bytes] if len(p) >= target_bytes else p.ljust(target_bytes, b" "))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [f[0] for f in feats],
                    "first_byte": [f[1] for f in feats],
                    "modality": modality,
                    "out_bytes": [len(r) for r in resized],
                    "out_md5": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(run, SUITE_SCHEMA)


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


def register_frame_sample_udtf(spark, name: str = "sample_frames"):
    """SQL-invocable twin of :func:`sample_frames` via the Spark 4
    Python UDTF API: after registration, SQL users fan payloads out to
    frames with a LATERAL table-function call —

        SELECT doc_id, s.frame_idx, s.frame_md5
        FROM binary_docs, LATERAL sample_frames(payload, 32, 2) s

    Same chunking/stride/digest semantics as the mapInPandas path
    (locked by a pytest equivalence check); rows fan out inside the
    executor exactly like the DataFrame version."""
    import hashlib

    from pyspark.sql.functions import udtf

    @udtf(returnType="frame_idx int, frame_bytes int, frame_md5 string")
    class _SampleFrames:
        def eval(self, payload, frame_size: int, stride: int):
            if payload is None:
                return
            data = bytes(payload)
            n_frames = (len(data) + frame_size - 1) // frame_size
            for idx in range(0, n_frames, stride):
                chunk = data[idx * frame_size : (idx + 1) * frame_size]
                yield (idx, len(chunk), hashlib.md5(chunk).hexdigest())

    spark.udtf.register(name, _SampleFrames)
    return _SampleFrames
