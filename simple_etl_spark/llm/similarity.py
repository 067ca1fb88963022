"""Embedding similarity search (ANN) over array<float> columns.

Brute-force cosine top-k as the exact baseline, and a bucket-pruned
variant as the scale path (search only the query's coarse partition —
an IVF-style inverted file, here keyed by the precomputed ``label``
assignment; at 100 TB the bucket column is the partition key, so
Catalyst prunes the scan to the probed buckets).

Numeric strategy: element-wise products are accumulated in DECIMAL
(exact, order-independent) and converted to double only for the final
sqrt/divide — so distributed partial aggregation order can't change
the score, and an external SQL oracle reproduces it bit-for-bit.
float64 accumulation would make scores depend on reduction order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# decimal(12,10) holds any |x| < 100 float element at 1e-10 resolution;
# products are decimal(25,20) — inside the 38-digit cap of Spark/DuckDB.
# The accumulator stays at precision 30 so decimal addition never hits
# the 38-digit cap (which would force Spark to drop a scale digit and
# round); the merge result is cast back to (30,20) — same scale, no
# rounding — because F.aggregate requires merge output ≡ zero type.
_ELEM_DEC = "decimal(12,10)"
_ACC_DEC = "decimal(30,20)"


def _dec_arr(col: Column) -> Column:
    # widen float→double BEFORE the decimal cast: engines agree on
    # rounding a double to 10 dp, but float→decimal directly may go
    # through the float's shortest string repr in some engines
    return F.transform(col, lambda x: x.cast("double").cast(_ELEM_DEC))


def dot(a: Column, b: Column) -> Column:
    """Exact decimal dot product of two float arrays."""
    prods = F.zip_with(_dec_arr(a), _dec_arr(b), lambda x, y: (x * y).cast(_ACC_DEC))
    return F.aggregate(
        prods, F.lit(0).cast(_ACC_DEC), lambda acc, x: (acc + x).cast(_ACC_DEC)
    )


def norm2(a: Column) -> Column:
    """Exact decimal squared L2 norm."""
    return dot(a, a)


def cosine(a: Column, b: Column, n2a: Column, n2b: Column) -> Column:
    """cosine(a,b) given precomputed squared norms — three IEEE double
    ops on exact decimal inputs (deterministic across engines)."""
    return dot(a, b).cast("double") / (
        F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))
    )


def dot_fast(a: Column, b: Column) -> Column:
    """float64 dot product — whole-stage-codegen arithmetic, ~100×
    the decimal path's throughput, but reduction-order sensitive in
    the last ulps. Use for pruning with an epsilon band; never for a
    reported score (see :func:`dot`)."""
    prods = F.zip_with(
        a, b, lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, score every pair, window-rank per query.

    One pass over the corpus, no corpus self-join; the per-query
    ranking windows operate on |corpus| rows per query — at scale use
    per-partition top-k pre-reduction (TakeOrderedAndProject does this
    for single queries; for query batches the window after a
    `filter(score > floor)` is the practical path)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm2(F.col(vec_col)).alias("q_n2"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm2(F.col(vec_col)).alias("c_n2"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(
                F.col("q_vec"), F.col("c_vec"), F.col("q_n2"), F.col("c_n2")
            ).alias("score"),
        )
    )
    return _rank_topk(scored, k)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Rank by the raw double score (per-engine ulp noise is orders of
    magnitude below real score gaps, so ranking is stable), but expose
    the score quantized to 9 dp — decimal output absorbs the 1-ulp
    decimal→double conversion differences between engines."""
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("score").cast("decimal(18,9)").alias("score_q"),
            "rnk",
        )
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b) in the same
    coarse bucket with cosine ≥ threshold.

    The bucket key bounds the pairing to |bucket|² instead of |corpus|²
    — at 100 TB the bucket is the partition key (the ANN inverted-file
    assignment), so each shuffle partition holds one bucket's vectors
    and the self-join never crosses partitions.

    Scoring is two-phase: a float64 prefilter keeps pairs within an
    epsilon band of the threshold (codegen arithmetic over every
    candidate pair — the O(|bucket|²) part), then only the survivors
    are rescored with the exact decimal dot product and cut at the
    true threshold. The band (1e-6) is orders of magnitude above the
    double path's reduction error for unit-magnitude embeddings, so
    no true pair can be lost — the result is identical to scoring
    everything in decimal, at a fraction of the cost."""
    # per-vector double norms once, before the pair join — the join
    # multiplies rows, so anything computable per vector must not be
    # recomputed per pair
    n = embeddings.select(
        F.col(id_col),
        F.col(bucket_col).alias("_bucket"),
        F.col(vec_col).alias("_vec"),
        F.sqrt(dot_fast(F.col(vec_col), F.col(vec_col))).alias("_nd"),
    )
    a = n.select(
        F.col(id_col).alias("id_a"),
        F.col("_bucket").alias("b_a"),
        F.col("_vec").alias("v_a"),
        F.col("_nd").alias("nd_a"),
    )
    b = n.select(
        F.col(id_col).alias("id_b"),
        F.col("_bucket").alias("b_b"),
        F.col("_vec").alias("v_b"),
        F.col("_nd").alias("nd_b"),
    )
    fast = (
        a.join(b, (F.col("b_a") == F.col("b_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn(
            "_fast",
            dot_fast(F.col("v_a"), F.col("v_b")) / (F.col("nd_a") * F.col("nd_b")),
        )
        .filter(F.col("_fast") >= F.lit(threshold - 1e-6))
    )
    exact = fast.select(
        "id_a",
        "id_b",
        cosine(
            F.col("v_a"),
            F.col("v_b"),
            norm2(F.col("v_a")),
            norm2(F.col("v_b")),
        ).alias("score"),
    )
    return exact.filter(F.col("score") >= F.lit(threshold)).select(
        "id_a", "id_b", F.col("score").cast("decimal(18,9)").alias("score_q")
    )


def bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: candidates restricted to the query's coarse
    bucket (inverted-file partition). Same scoring, but the join key
    includes the bucket — the scan prunes to matching partitions and
    the pairing is |bucket|-sized, not |corpus|-sized."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(bucket_col).alias("q_bucket"),
        F.col(vec_col).alias("q_vec"),
        norm2(F.col(vec_col)).alias("q_n2"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(bucket_col).alias("c_bucket"),
        F.col(vec_col).alias("c_vec"),
        norm2(F.col(vec_col)).alias("c_n2"),
    )
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q_bucket") == F.col("c_bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            cosine(
                F.col("q_vec"), F.col("c_vec"), F.col("q_n2"), F.col("c_n2")
            ).alias("score"),
        )
    )
    return _rank_topk(scored, k)
