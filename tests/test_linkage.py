"""Multi-pass blocked record linkage: recall across blocks, integer
scoring, and the block-size profile. Oracle parity is covered by
test_parity (`llm_record_linkage`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_etl_spark.operators.linkage import block_profile, blocked_fuzzy_pairs

KEYS = [lambda c: F.length(c), lambda c: F.substring(c, 1, 4)]


def _pairs(spark, rows, max_dist=3):
    df = spark.createDataFrame(rows, "id bigint, title string")
    return {
        (r["id_a"], r["id_b"]): (r["dist"], r["sim_permille"])
        for r in blocked_fuzzy_pairs(
            df, KEYS, id_col="id", text_col="title", max_dist=max_dist
        ).collect()
    }


def test_multi_pass_recall(spark):
    # (1,2): same length, different prefix → only the length pass blocks them
    # (3,4): same prefix, different length → only the prefix pass blocks them
    got = _pairs(
        spark,
        [
            (1, "karl miller"),
            (2, "carl miller"),
            (3, "ann lee"),
            (4, "ann leeson"),
            (5, "completely unrelated title"),
        ],
    )
    assert set(got) == {(1, 2), (3, 4)}
    assert got[(1, 2)] == (1, 1000 - 1000 // 11)
    assert got[(3, 4)] == (3, 1000 - 3000 // 10)


def test_pair_found_by_both_passes_emitted_once(spark):
    df = spark.createDataFrame(
        [(1, "same title"), (2, "same titl3")], "id bigint, title string"
    )
    out = blocked_fuzzy_pairs(df, KEYS, id_col="id", text_col="title").collect()
    assert len(out) == 1  # distinct() merges the two blocking passes


def test_comparator_cuts_far_pairs(spark):
    got = _pairs(spark, [(1, "abcdefghij"), (2, "zzzzzzzzzz")], max_dist=3)
    assert got == {}  # same length block, but dist=10 > 3


def test_block_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "bbbb"), (3, "aaaazz")], "id bigint, title string"
    )
    prof = {
        r["pass"]: (r["n_blocks"], r["max_block"], r["pairs_bound"])
        for r in block_profile(df, KEYS, text_col="title").collect()
    }
    # pass 0 (length): blocks {4:2, 6:1} → bound 1; pass 1 (prefix):
    # blocks {aaaa:2, bbbb:1} → bound 1
    assert prof[0] == (2, 2, 1)
    assert prof[1] == (2, 2, 1)


def test_max_block_drops_planted_hot_block(spark):
    """A degenerate key value (every title shares the prefix) must not
    go quadratic: with max_block set below the hot block's size, that
    pass contributes zero pairs — but a second, selective pass still
    finds the true match (the multi-pass recall argument applied to
    the cap)."""
    # 12 titles all sharing prefix "jakarta " → one hot block of 12 in
    # the prefix pass; lengths differ, so the length pass stays selective
    rows = [(i, "jakarta " + ("x" * i)) for i in range(1, 13)]
    # plant a true near-dup pair with EQUAL length (caught by length pass)
    rows += [(100, "jakarta qqqqqq"), (101, "jakarta qqqqqz")]
    df = spark.createDataFrame(rows, "id bigint, title string")
    keys = [lambda c: F.substring(c, 1, 8), lambda c: F.length(c)]
    capped = blocked_fuzzy_pairs(
        df, keys, id_col="id", text_col="title", max_dist=2, max_block=5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    # the hot prefix block (size 14 > 5) is dropped; the length-pass
    # block for len 14 holds only the planted pair
    assert (100, 101) in got
    # pairs only the hot prefix block could produce are gone
    assert all(a >= 100 for a, _ in got), got
    # uncapped control: the hot block would have produced prefix pairs
    uncapped = blocked_fuzzy_pairs(
        df, keys, id_col="id", text_col="title", max_dist=2
    ).collect()
    assert len(uncapped) > len(capped)


def test_max_block_inert_when_blocks_small(spark):
    rows = [(1, "alpha one"), (2, "alpha two"), (3, "beta one")]
    df = spark.createDataFrame(rows, "id bigint, title string")
    keys = [lambda c: F.substring(c, 1, 5)]
    a = sorted(map(tuple, blocked_fuzzy_pairs(
        df, keys, id_col="id", text_col="title", max_dist=9
    ).collect()))
    b = sorted(map(tuple, blocked_fuzzy_pairs(
        df, keys, id_col="id", text_col="title", max_dist=9, max_block=100,
        comparator_partitions=4,
    ).collect()))
    assert a == b
