"""Record linkage: multi-pass blocked fuzzy matching.

The classic entity-resolution shape (Fellegi-Sunter era blocking +
edit-distance comparison): generating all |n|² pairs is impossible at
scale, so candidate pairs come from the UNION of several cheap
*blocking keys* — two records are compared only if they agree on at
least one key. Each pass is an equi-join shuffled on its block key
(bounded pair generation, exactly the LSH-band shape); the union is
deduped and only then does the expensive comparator (levenshtein)
run, on candidates alone.

No reference twin (the reference dedupes articles by exact link id,
consumer_pipeline.py upsert path); this is the engine's capability
superset for fuzzy identity — near-identical titles, typo'd names,
re-crawled articles with OCR-class noise.

Determinism: the comparator and score are pure integer arithmetic
(edit distance, integer-division permille similarity), so any SQL
engine reproduces results bit-for-bit — no float anywhere.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    block_keys: list[Callable[[Column], Column]],
    id_col: str = "id",
    text_col: str = "title",
    max_dist: int = 6,
    max_block: int | None = None,
    comparator_partitions: int | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) agreeing on >= 1 blocking key,
    kept when ``levenshtein(text_a, text_b) <= max_dist``.

    ``block_keys`` are functions Column->Column over the match text
    (e.g. ``F.length``, first-n-chars). Multi-pass blocking is the
    standard recall hedge: a single key misses every pair it
    mis-blocks, several cheap keys OR'd miss only pairs disagreeing
    on ALL of them.

    Scale shape: one row per (record, key) — |keys|·n rows — shuffled
    on the (key index, key value) pair; within-block self-join bounds
    pair generation to Σ|block|²; `distinct` merges pairs found by
    multiple passes BEFORE the comparator runs, so levenshtein cost is
    per candidate pair, once.

    ``max_block`` bounds per-block pair generation: blocks holding
    more than ``max_block`` records are DROPPED for that pass (one
    count shuffle over |keys|·n key rows, then a filter) — a hot key
    value ("Jakarta, …" as an 8-char prefix) can otherwise go
    quadratic no matter how selective the key is on average. Dropping
    is the standard blocking-cap semantics (a block that full carries
    no identity signal for its members) and the same recall dial as
    winnowing's ``max_df``: a pair lost to one pass's cap is still
    found by any other pass that blocks it. Sizes are observable via
    ``block_profile``; None preserves the uncapped behavior.

    ``comparator_partitions`` repartitions the deduped candidate set
    before the comparator. AQE coalesces shuffles by BYTE size, and a
    candidate-pair relation is tiny in bytes but CPU-heavy per row
    (levenshtein is O(len·max_dist) per pair) — at small scale AQE
    happily coalesces 50k comparisons onto one core. Pass e.g.
    ``spark.sparkContext.defaultParallelism`` to spread the
    comparator; None keeps the plan AQE-sized (right at cluster scale
    where the pair relation is byte-heavy too).

    The comparator runs banded: ``levenshtein(a, b, threshold)`` abandons
    a row once the running distance exceeds ``max_dist`` — O(len·max_dist)
    instead of O(len²) per pair. The threshold form returns -1 past the
    band, so the keep-filter is ``0 <= dist <= max_dist``; kept rows carry
    the exact distance, so results are identical to the unbanded form.

    Output: id_a, id_b, dist, sim_permille — similarity as integer
    permille of the longer string (1000 = identical), exact in any
    engine (integer division, no floats)."""
    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    # one scan for ALL passes: explode an array of (pass, key) structs
    # instead of a union branch per key — a K-key union reads the
    # source K times, which multiplies scan cost at the design scale
    passes = F.array(
        *[
            F.struct(
                F.lit(i).alias("p"),
                key_fn(F.col("_t")).cast("string").alias("k"),
            )
            for i, key_fn in enumerate(block_keys)
        ]
    )
    keyed = base.select(
        "_id", "_t", F.explode(passes).alias("_pk")
    ).select(
        "_id",
        "_t",
        F.col("_pk.p").alias("_pass"),
        F.col("_pk.k").alias("_bk"),
    )
    if max_block is not None:
        sizes = keyed.groupBy("_pass", "_bk").agg(F.count(F.lit(1)).alias("_sz"))
        keyed = (
            keyed.join(
                sizes.filter(F.col("_sz") <= max_block), ["_pass", "_bk"]
            ).drop("_sz")
        )
    a = keyed.select(
        F.col("_pass"),
        F.col("_bk"),
        F.col("_id").alias("id_a"),
        F.col("_t").alias("_ta"),
    )
    b = keyed.select(
        F.col("_pass").alias("_pass_b"),
        F.col("_bk").alias("_bk_b"),
        F.col("_id").alias("id_b"),
        F.col("_t").alias("_tb"),
    )
    cands = (
        a.join(
            b,
            (F.col("_pass") == F.col("_pass_b"))
            & (F.col("_bk") == F.col("_bk_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", "_ta", "_tb")
        .distinct()
    )
    if comparator_partitions is not None:
        cands = cands.repartition(comparator_partitions)
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"), threshold=max_dist)
    return (
        cands.withColumn("dist", dist.cast("bigint"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select(
            "id_a",
            "id_b",
            "dist",
            F.expr(
                "cast(1000 - (1000 * dist) div"
                " greatest(length(_ta), length(_tb), 1) as bigint)"
            ).alias("sim_permille"),
        )
    )


def block_profile(
    df: DataFrame,
    block_keys: list[Callable[[Column], Column]],
    text_col: str = "title",
) -> DataFrame:
    """Per-pass block-size profile: the operational check that no
    blocking key degenerates (one giant block → quadratic pairs).
    Returns (pass, n_blocks, max_block, pairs_bound = Σ sz·(sz-1)/2)."""
    base = df.select(F.col(text_col).alias("_t"))
    passes = F.array(
        *[
            F.struct(
                F.lit(i).alias("p"),
                key_fn(F.col("_t")).cast("string").alias("k"),
            )
            for i, key_fn in enumerate(block_keys)
        ]
    )
    sizes = (
        base.select(F.explode(passes).alias("_pk"))
        .groupBy(F.col("_pk.p").alias("pass"), F.col("_pk.k").alias("_bk"))
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return (
        sizes.groupBy("pass")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.max("sz").alias("max_block"),
            F.sum(F.expr("sz * (sz - 1) div 2")).alias("pairs_bound"),
        )
        .orderBy("pass")
    )
