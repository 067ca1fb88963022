"""Winnowing guarantees (Schleimer/Wilkerson/Aiken, SIGMOD'03):
any shared substring of length >= k + w - 1 yields a shared
fingerprint; selection density ~2/(w+1); short-doc degradation.
"""

from __future__ import annotations

import pytest

from simple_etl_spark.llm.dedup import winnow_fingerprints, winnowing_near_dups


def _fps(spark, rows, k=8, w=4):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = winnow_fingerprints(df, k=k, w=w).collect()
    by_doc: dict[int, set[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    return by_doc

def test_shared_substring_guarantee(spark):
    # docs share a 20-char substring > k + w - 1 = 11 → overlap certain
    shared = "abcdefghijklmnopqrst"
    fps = _fps(
        spark,
        [(1, "XX " + shared + " YY"), (2, "completely other " + shared)],
    )
    assert fps[1] & fps[2]


def test_disjoint_alphabets_share_nothing(spark):
    fps = _fps(spark, [(1, "aaaa bbbb cccc dddd eeee"), (2, "1111 2222 3333 4444 5555")])
    assert not (fps[1] & fps[2])


def test_short_doc_degradation(spark):
    # shorter than k → no fingerprints; k <= len < k + w - 1 → min of all grams
    fps = _fps(spark, [(1, "abc"), (2, "abcdefghi")], k=8, w=4)
    assert 1 not in fps
    assert len(fps[2]) == 1  # 2 grams, one window over both


def test_density(spark):
    text = " ".join(f"w{i:04d}" for i in range(200))  # ~1200 chars, no repeats
    fps = _fps(spark, [(1, text)], k=8, w=4)
    n_positions = len(text) - 8 + 1
    # expected density 2/(w+1) = 0.4; allow wide slack, but far below 1.0
    assert 0.1 * n_positions < len(fps[1]) < 0.7 * n_positions


def test_near_dups_whitespace_invariant(spark):
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the   quick\tbrown fox JUMPS over the lazy dog again and again"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id bigint, text string")
    out = winnowing_near_dups(df, min_shared=2, max_df=10).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]


def test_df_cap_drops_boilerplate(spark):
    # one fingerprint set shared by many docs is dropped at max_df
    rows = [(i, "common boilerplate header text block") for i in range(1, 6)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = winnowing_near_dups(df, min_shared=1, max_df=4).collect()
    assert out == []  # every fp appears in 5 docs > max_df=4
