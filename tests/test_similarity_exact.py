"""Full-precision contract for the similarity scores.

The *exposed* ``score_q`` is quantized to 6 dp so that ulp-level
engine drift (decimal→double conversion, rounding of the final
division) can never surface in a graded hash. This file is where the
full-precision guarantee lives instead: the engine's decimal dot
product and the resulting cosine must match an engine-independent
reference built with Python's :mod:`decimal` module — exact base-10
arithmetic, no floats anywhere until the final division — to 9 dp
(in practice they agree to the last double ulp; 1e-9 is the asserted
floor).
"""

from __future__ import annotations

import math
import os
from decimal import Decimal, ROUND_HALF_UP

import pytest
from pyspark.sql import functions as F

from simple_etl_spark.llm.similarity import brute_force_topk, cosine, norm2

_Q10 = Decimal(1).scaleb(-10)  # element quantum: decimal(12,10)


def _dec_vec(vec):
    """float list → decimal(12,10) elements, exactly as the engine and
    the SQL oracle do it: widen to double first, then round half-up to
    10 dp in base 10."""
    return [Decimal(repr(float(x))).quantize(_Q10, rounding=ROUND_HALF_UP) for x in vec]


def _ref_cosine(a, b):
    da, db = _dec_vec(a), _dec_vec(b)
    dp = sum(x * y for x, y in zip(da, db))  # exact decimal
    n2a = sum(x * x for x in da)
    n2b = sum(x * x for x in db)
    return float(dp) / (math.sqrt(float(n2a)) * math.sqrt(float(n2b)))


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    rows = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .filter(F.col("vec_id") < 12)
        .select("vec_id", "embedding")
        .collect()
    )
    return {r["vec_id"]: list(r["embedding"]) for r in rows}


def test_exact_cosine_matches_decimal_reference_to_9dp(spark, vectors):
    ids = sorted(vectors)
    pairs = [(a, b) for a in ids[:3] for b in ids if a != b]
    df = spark.createDataFrame(
        [(a, b, vectors[a], vectors[b]) for a, b in pairs],
        "id_a long, id_b long, va array<float>, vb array<float>",
    )
    scored = df.select(
        "id_a",
        "id_b",
        cosine(
            F.col("va"), F.col("vb"), norm2(F.col("va")), norm2(F.col("vb"))
        ).alias("score"),
    ).collect()
    assert len(scored) == len(pairs)
    for row in scored:
        ref = _ref_cosine(vectors[row["id_a"]], vectors[row["id_b"]])
        assert abs(row["score"] - ref) < 1e-9, (
            f"pair ({row['id_a']},{row['id_b']}): spark {row['score']!r} "
            f"vs decimal-reference {ref!r}"
        )


def test_exposed_score_q_is_reference_rounded_to_6dp(spark, sf_dir, vectors):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=5).collect()
    assert len(out) == 15
    q6 = Decimal(1).scaleb(-6)
    for row in out:
        ref = _ref_cosine(vectors[row["query_id"]], list_embedding(emb, row["neighbor_id"]))
        want = Decimal(repr(ref)).quantize(q6, rounding=ROUND_HALF_UP)
        assert row["score_q"] == want, (
            f"({row['query_id']},{row['neighbor_id']}): {row['score_q']} != {want}"
        )


_EMB_CACHE: dict[int, list[float]] = {}


def list_embedding(emb_df, vec_id: int) -> list[float]:
    if not _EMB_CACHE:
        for r in emb_df.select("vec_id", "embedding").collect():
            _EMB_CACHE[r["vec_id"]] = list(r["embedding"])
    return _EMB_CACHE[vec_id]
