"""DSIR-shaped importance selection: weight direction, selection
behavior on a planted corpus, and the all-integer exposure. Oracle
parity is covered by test_parity (`llm_dsir_selection`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_etl_spark.llm.selection import (
    dsir_select,
    hashed_ngram_features,
    importance_scores,
    ngram_importance_weights,
)

# target speaks about quantum physics, raw pool is sports chatter
_TARGET = [
    (100 + i, "quantum field theory lattice gauge simulation results")
    for i in range(5)
]
_RAW_NOISE = [
    (i, "football match score goal referee penalty shootout highlights")
    for i in range(20)
]
_RAW_HIT = [(50, "quantum field theory lecture notes"), (51, "lattice gauge simulation")]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_weights_favor_target_features(spark):
    target = _df(spark, _TARGET)
    raw = _df(spark, _RAW_NOISE + _RAW_HIT + _TARGET)
    w = ngram_importance_weights(target, raw, buckets=1 << 12)
    feats_t = hashed_ngram_features(target, buckets=1 << 12).select("feature").distinct()
    feats_noise = (
        hashed_ngram_features(_df(spark, _RAW_NOISE), buckets=1 << 12)
        .select("feature")
        .distinct()
    )
    wt = [r["w"] for r in w.join(feats_t, "feature").collect()]
    wn = [r["w"] for r in w.join(feats_noise, "feature").collect()]
    assert min(wt) > max(wn), (min(wt), max(wn))


def test_dsir_select_surfaces_target_like_docs(spark):
    target = _df(spark, _TARGET)
    raw = _df(spark, _RAW_NOISE + _RAW_HIT)
    top = dsir_select(target, raw, k=2, buckets=1 << 12).collect()
    assert {r["doc_id"] for r in top} == {50, 51}
    assert [r["rnk"] for r in sorted(top, key=lambda r: r["rnk"])] == [1, 2]


def test_exposure_is_all_bigint_and_mean_is_integral_division(spark):
    target = _df(spark, _TARGET)
    raw = _df(spark, _RAW_NOISE + _RAW_HIT)
    out = dsir_select(target, raw, k=3, buckets=1 << 12)
    assert all(f.dataType.simpleString() == "bigint" for f in out.schema.fields)
    for r in out.collect():
        assert r["score_permille"] == r["sum_w"] // r["n_feat"]


def test_short_docs_are_omitted(spark):
    target = _df(spark, _TARGET)
    raw = _df(spark, _RAW_NOISE + [(99, "single")])  # < n tokens: no bigram
    w = ngram_importance_weights(target, raw, buckets=1 << 12)
    scored = importance_scores(raw, w, buckets=1 << 12)
    assert scored.filter(F.col("doc_id") == 99).count() == 0


def test_quality_buckets_competition_rank_and_edges(spark):
    """Ties share the strictly-better count (competition rank); the
    permille edges cut head/middle/tail per group independently."""
    from simple_etl_spark.llm.selection import quality_percentile_buckets

    rows = [
        # group g1: scores 30, 20, 20, 10 (4 rows, n-1 = 3)
        (1, "g1", 30), (2, "g1", 20), (3, "g1", 20), (4, "g1", 10),
        # group g2: all equal — everyone is rank 0 → head
        (5, "g2", 7), (6, "g2", 7),
    ]
    df = spark.createDataFrame(rows, "id bigint, g string, score bigint")
    out = {r["id"]: r for r in quality_percentile_buckets(
        df, "score", ["g"], head_permille=100, middle_permille=700
    ).collect()}
    # g1: better counts are 0, 1, 1, 3 → permille 0, 333, 333, 1000
    assert out[1]["permille"] == 0 and out[1]["bucket"] == "head"
    assert out[2]["permille"] == 333 and out[2]["bucket"] == "middle"
    assert out[3]["permille"] == 333  # tie shares the percentile
    assert out[4]["permille"] == 1000 and out[4]["bucket"] == "tail"
    # g2: all tied at better=0 → everyone head (n-1=1 guard holds)
    assert out[5]["permille"] == 0 and out[6]["permille"] == 0


def test_quality_buckets_single_row_group(spark):
    """A 1-row group must not divide by zero (n-1 → greatest(...,1))."""
    from simple_etl_spark.llm.selection import quality_percentile_buckets

    df = spark.createDataFrame([(1, "g", 5)], "id bigint, g string, score bigint")
    r = quality_percentile_buckets(df, "score", ["g"]).collect()[0]
    assert r["permille"] == 0 and r["bucket"] == "head"


def test_quality_buckets_windows_run_over_histogram_not_rows(spark):
    """The ranking windows must consume the (group, score) histogram,
    not the raw relation — the property that keeps a one-domain corpus
    from funnelling all its rows through a single window task. Pinned
    structurally: the window's child aggregates before it."""
    from simple_etl_spark.llm.selection import quality_percentile_buckets

    df = spark.createDataFrame(
        [(i, "only_domain", i % 3) for i in range(100)],
        "id bigint, g string, score bigint",
    )
    out = quality_percentile_buckets(df, "score", ["g"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the Window node's subtree must contain the histogram Aggregate
    w_at = plan.find("Window")
    assert w_at >= 0, plan
    assert "Aggregate" in plan[w_at:], plan
    rejoined = {r["id"]: r["permille"] for r in out.collect()}
    # ids 0..99, score = id % 3: 34×score0, 33×score1, 33×score2 →
    # better counts 66 / 33 / 0 over n-1 = 99
    assert rejoined[2] == 0 and rejoined[1] == 333 and rejoined[0] == 666


def test_quality_buckets_rejects_bad_edges(spark):
    import pytest

    from simple_etl_spark.llm.selection import quality_percentile_buckets

    df = spark.createDataFrame([(1, "g", 5)], "id bigint, g string, score bigint")
    with pytest.raises(ValueError, match="head < middle"):
        quality_percentile_buckets(df, "score", ["g"], 700, 100)


def test_quality_buckets_null_scores_kept_unbucketed(spark):
    """NULL-scored rows must neither vanish nor inflate the group's
    denominator: they come back with NULL permille/bucket, and the
    scored rows' percentiles are computed among scored rows only."""
    from simple_etl_spark.llm.selection import quality_percentile_buckets

    rows = [(1, "g", 30), (2, "g", 10), (3, "g", None)]
    df = spark.createDataFrame(rows, "id bigint, g string, score bigint")
    out = {r["id"]: r for r in quality_percentile_buckets(
        df, "score", ["g"]
    ).collect()}
    assert len(out) == 3
    assert out[3]["permille"] is None and out[3]["bucket"] is None
    # n-1 = 1 among the two SCORED rows, not 2 among all three
    assert out[1]["permille"] == 0 and out[2]["permille"] == 1000
