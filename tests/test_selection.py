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
