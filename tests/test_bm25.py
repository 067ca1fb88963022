"""BM25 semantics: rarity weighting, tf saturation, length norm.

Parity with the DuckDB oracle is covered by test_parity
(`m_search_bm25`); these pin the *model* properties the reference's
ES relies on (services/es.py:166-240, default Lucene similarity).
"""

from __future__ import annotations

import math

import pytest

from simple_etl_spark.functions.text import bm25_rank


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id bigint, search_text string")


@pytest.fixture(scope="module")
def corpus(spark):
    # 'common' appears in every doc, 'rare' in one; doc 4 is long.
    return _mk(
        spark,
        [
            (1, "common rare alpha beta"),
            (2, "common alpha beta gamma"),
            (3, "common beta gamma delta"),
            (4, "common " + "filler " * 60 + "alpha"),
        ],
    )


def test_rare_term_outscores_common(corpus):
    rows = {
        r["doc"]: float(r["score_q"])
        for r in bm25_rank(
            corpus, ["rare", "common"], text_col="search_text", stopwords=()
        ).collect()
    }
    # doc 1 holds the rare term → strictly top; every doc matches 'common'
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1] > max(v for k, v in rows.items() if k != 1)


def test_length_normalization_penalizes_long_docs(corpus):
    rows = {
        r["doc"]: float(r["score_q"])
        for r in bm25_rank(
            corpus, ["common"], text_col="search_text", stopwords=()
        ).collect()
    }
    # same tf=1 for 'common' everywhere: the 62-token doc scores lowest
    assert rows[4] == min(rows.values())
    assert rows[4] < rows[1]


def test_matches_lucene_formula(spark):
    # two-doc corpus small enough to check against the closed form
    df = _mk(spark, [(1, "apple banana"), (2, "banana banana cherry")])
    got = {
        r["doc"]: float(r["score_q"])
        for r in bm25_rank(df, ["banana"], stopwords=(), top_n=10).collect()
    }
    n, avgdl, k1, b = 2, 2.5, 1.2, 0.75
    idf = math.log(1.0 + (n - 2 + 0.5) / (2 + 0.5))

    def tfn(tf, dl):
        return tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1] == pytest.approx(idf * tfn(1, 2), abs=2e-6)
    assert got[2] == pytest.approx(idf * tfn(2, 3), abs=2e-6)


def test_min_len_and_stopwords_apply(spark):
    df = _mk(spark, [(1, "ab yang spark"), (2, "spark spark")])
    out = bm25_rank(df, ["ab", "yang", "spark"]).collect()
    # 'ab' (<3 chars) and 'yang' (stopword) never index; both docs
    # match only via 'spark'
    assert {r["doc"] for r in out} == {1, 2}
