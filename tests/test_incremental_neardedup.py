"""Incremental near-dedup: a new batch vs the corpus signature store.

The continuous-pipeline twin of near_dedup_minhash — batch docs
matching the store (or a smaller-id batch sibling) are dropped;
survivors come back with signatures ready to append to the store.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_etl_spark.llm.dedup import (
    incremental_lsh_matches,
    incremental_near_dedup,
    lsh_candidate_pairs,
    minhash_signature,
    signature_store,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill nearby every single afternoon"
)
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines"
)
THIRD = (
    "yet another unrelated document discussing garden vegetables "
    "tomatoes cucumbers peppers and the art of composting kitchen waste"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_store_match_dropped_unique_survives(spark):
    corpus = _df(spark, [(1, BASE), (2, OTHER)])
    store = signature_store(corpus, "doc_id", "text")
    # batch: near-copy of stored doc 1 (one word changed) + brand-new doc
    batch = _df(
        spark,
        [(100, BASE.replace("lazy", "sleepy")), (101, THIRD)],
    )
    out = incremental_near_dedup(batch, store, "doc_id", "text")
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [101]
    # survivors carry their full signature for the store append
    sig = minhash_signature(_df(spark, [(101, THIRD)]), "doc_id", "text").head()
    got = rows[0]
    assert all(got[f"h{i}"] == sig[f"h{i}"] for i in range(8))


def test_in_batch_greedy_min_id_survivor(spark):
    store = signature_store(_df(spark, [(1, OTHER)]), "doc_id", "text")
    batch = _df(
        spark,
        [(200, BASE), (201, BASE.replace("warm", "cold")), (202, THIRD)],
    )
    out = incremental_near_dedup(batch, store, "doc_id", "text")
    assert sorted(r["doc_id"] for r in out.collect()) == [200, 202]


def test_matches_relation_shape(spark):
    corpus = _df(spark, [(1, BASE)])
    store = signature_store(corpus, "doc_id", "text")
    batch_sig = minhash_signature(
        _df(spark, [(300, BASE), (301, THIRD)]), "doc_id", "text"
    )
    m = incremental_lsh_matches(batch_sig, store, "doc_id").collect()
    assert {(r["batch_id"], r["store_id"]) for r in m} == {(300, 1)}


def test_store_never_self_pairs(spark):
    # two near-identical docs in the STORE must not appear in matches —
    # the incremental join never pairs the store with itself
    corpus = _df(spark, [(1, BASE), (2, BASE.replace("dog", "pup"))])
    store = signature_store(corpus, "doc_id", "text")
    batch_sig = minhash_signature(_df(spark, [(400, THIRD)]), "doc_id", "text")
    assert incremental_lsh_matches(batch_sig, store, "doc_id").count() == 0


def test_band_refactor_preserves_self_join(spark):
    # lsh_candidate_pairs through the shared band_keys path still finds
    # the in-corpus near pair
    sig = minhash_signature(
        _df(spark, [(1, BASE), (2, BASE.replace("cat", "bird")), (3, OTHER)]),
        "doc_id",
        "text",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sig, "doc_id").collect()}
    assert (1, 2) in pairs
    assert all(p in {(1, 2)} or 3 not in p for p in pairs)
