"""Edge-case behavior of the round-4 curation operators (incremental
dedup, repetition features, stratified sampling). Oracle parity is in
test_parity; these pin the corners an oracle query can't reach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_etl_spark.llm.dedup import fingerprint_store, incremental_dedup
from simple_etl_spark.llm.sampling import stratified_sample
from simple_etl_spark.llm.textstats import repetition_features


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a", "the quick brown fox"),
        (2, "a", "the quick brown fox"),          # exact dup of 1
        (3, "a", "spark spark spark spark"),      # maximally repetitive
        (4, "b", "one"),                          # single word: no bigram
        (5, "b", "all distinct words here now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_incremental_dedup_drops_already_ingested(spark, docs):
    store = fingerprint_store(docs.filter("doc_id <= 2"), "text")
    out = incremental_dedup(
        docs.filter("doc_id >= 2"), store, "text", "doc_id"
    ).collect()
    # doc 2's text is in the store -> dropped; 3, 4, 5 survive
    assert sorted(r["survivor_id"] for r in out) == [3, 4, 5]


def test_incremental_dedup_empty_batch(spark, docs):
    store = fingerprint_store(docs, "text")
    out = incremental_dedup(docs.filter("doc_id < 0"), store, "text", "doc_id")
    assert out.count() == 0


def test_incremental_dedup_empty_store_reduces_to_exact_dedup(spark, docs):
    store = fingerprint_store(docs.filter("doc_id < 0"), "text")
    out = incremental_dedup(docs, store, "text", "doc_id").collect()
    # 5 docs, one duplicated text -> 4 survivors, dup keeps min id with 2 copies
    assert len(out) == 4
    dup = next(r for r in out if r["copies"] == 2)
    assert dup["survivor_id"] == 1


def test_repetition_features_extremes(spark, docs):
    feats = {r["doc_id"]: r for r in repetition_features(docs).collect()}
    r3 = feats[3]  # one word repeated 4x
    assert r3["n_words"] == 4 and r3["distinct_words"] == 1
    assert r3["top_word_frac"] == 1.0
    assert r3["dup_word_frac"] == 0.75
    assert r3["is_repetitive"]  # via the any-length dup-word rule
    r5 = feats[5]  # all distinct, but short: top-word rule must not fire
    assert r5["dup_word_frac"] == 0.0
    assert r5["top_word_frac"] == 0.2  # > threshold, yet n_words < 20
    assert not r5["is_repetitive"]


def test_repetition_single_word_doc_has_null_bigram_frac(spark, docs):
    row = repetition_features(docs).filter("doc_id = 4").collect()[0]
    assert row["n_words"] == 1
    assert row["top_bigram_frac"] is None
    assert not row["is_repetitive"]


def test_stratified_sample_quota_and_determinism(spark, docs):
    out = stratified_sample(docs, "lang", 2, "doc_id")
    rows = out.collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["sample_rank"])
    assert all(len(v) <= 2 for v in by_lang.values())
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_lang.values())
    # repartitioning must not change membership (hash-ranked, not layout-ranked)
    again = stratified_sample(docs.repartition(7), "lang", 2, "doc_id").collect()
    key = lambda r: (r["lang"], r["doc_id"], r["sample_rank"])  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, again))


def test_stratified_sample_quota_is_monotone(spark, docs):
    small = stratified_sample(docs, "lang", 1, "doc_id").collect()
    big = stratified_sample(docs, "lang", 3, "doc_id").collect()
    small_ids = {(r["lang"], r["doc_id"]) for r in small}
    big_ids = {(r["lang"], r["doc_id"]) for r in big}
    assert small_ids <= big_ids


def test_stratified_sample_rejects_bad_quota(spark, docs):
    with pytest.raises(ValueError, match="n_per_stratum"):
        stratified_sample(docs, "lang", 0, "doc_id")


def test_chunking_covers_all_tokens_with_overlap(spark):
    from simple_etl_spark.llm.textstats import chunk_documents

    text = " ".join(f"w{i}" for i in range(1, 41))  # 40 words
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        chunk_documents(df, chunk_tokens=32, overlap=8).collect(),
        key=lambda r: r["start_word"],
    )
    assert [r["start_word"] for r in chunks] == [1, 25]
    assert chunks[0]["n_tokens"] == 32
    assert chunks[1]["n_tokens"] == 16  # tail runs short
    # overlap: chunk 2 starts at word 25, chunk 1 ends at word 32
    assert chunks[0]["chunk_text"].split()[24:] == chunks[1]["chunk_text"].split()[:8]
    # full coverage
    covered = set(chunks[0]["chunk_text"].split()) | set(chunks[1]["chunk_text"].split())
    assert covered == set(text.split())


def test_chunking_short_doc_yields_one_chunk(spark):
    from simple_etl_spark.llm.textstats import chunk_documents

    df = spark.createDataFrame([(1, "just three words")], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    assert len(out) == 1
    assert out[0]["n_tokens"] == 3
    assert out[0]["chunk_text"] == "just three words"


def test_chunking_rejects_bad_overlap(spark):
    from simple_etl_spark.llm.textstats import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_redact_pii_counts_and_tokens(spark):
    from simple_etl_spark.llm.textstats import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d+x@e-f.org call 555-123-4567 ip 10.0.0.1"),
            (2, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    r1 = out[1]
    assert (r1["n_email"], r1["n_phone"], r1["n_ipv4"]) == (2, 1, 1)
    assert "<EMAIL>" in r1["redacted"] and "<PHONE>" in r1["redacted"]
    assert "<IPV4>" in r1["redacted"]
    assert "a@b.co" not in r1["redacted"] and "10.0.0.1" not in r1["redacted"]
    r2 = out[2]
    assert (r2["n_email"], r2["n_phone"], r2["n_ipv4"]) == (0, 0, 0)
    assert r2["redacted"] == r2["text"]


def test_quota_dict_mix_and_exclusion(spark, docs):
    out = stratified_sample(
        docs, "lang", {"a": 2}, "doc_id", default_quota=0
    ).collect()
    # lang b excluded entirely by default_quota=0
    assert {r["lang"] for r in out} == {"a"}
    assert len(out) == 2
    with pytest.raises(ValueError, match="quotas"):
        stratified_sample(docs, "lang", {"a": -1}, "doc_id")
    with pytest.raises(ValueError, match="empty"):
        stratified_sample(docs, "lang", {}, "doc_id")


def test_contamination_flags_eval_slice_and_reports_all_rows(spark, docs):
    from simple_etl_spark.llm.dedup import contamination_check

    bench = docs.filter("doc_id = 1").select("text")
    out = {r["doc_id"]: r for r in
           contamination_check(docs, bench, "doc_id", "text").collect()}
    assert len(out) == 5  # every input row reports
    # docs 1 and 2 share doc 1's exact text -> contaminated
    assert out[1]["is_contaminated"] and out[2]["is_contaminated"]
    assert out[1]["n_overlap"] == 2  # 4-word text -> two 3-gram shingles
    # unrelated docs report zero
    assert out[5]["n_overlap"] == 0 and not out[5]["is_contaminated"]


def test_zero_norm_vectors_excluded_from_near_dups(spark):
    from simple_etl_spark.llm.similarity import embedding_near_dups

    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [1.0, 0.0]),   # exact dup of 1: cosine 1.0
        (3, 0, [0.0, 0.0]),   # zero-norm: cosine undefined, must not appear
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    out = embedding_near_dups(df, threshold=0.9)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs == {(1, 2)}


def test_lm_quality_separates_languages(spark, sf_dir):
    """The en-trained bigram LM must score English docs above
    non-English ones on average (per-bigram log-prob) — the signal the
    CCNet-style filter thresholds on."""
    import pyspark.sql.functions as F

    from simple_etl_spark.engine import Catalog
    from simple_etl_spark.llm.textstats import bigram_lm, lm_score

    cat = Catalog(spark, sf_dir)
    d = cat["documents"]
    uni, bi, vocab = bigram_lm(d.filter(F.col("lang") == "en"))
    scored = lm_score(d, uni, bi, vocab).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    per_lang = {
        r["l"]: r["m"]
        for r in scored.groupBy(F.col("lang").alias("l"))
        .agg(
            F.avg(
                F.col("sum_logprob").cast("double") / F.col("n_bigrams")
            ).alias("m")
        )
        .collect()
    }
    others = [v for k, v in per_lang.items() if k != "en"]
    assert per_lang["en"] > max(others)


def test_pseudonymize_consistent_surrogates(spark):
    from simple_etl_spark.llm.textstats import pseudonymize_pii

    rows = [
        (1, "mail alice@x.com and bob@y.org; call 555-123-4567"),
        (2, "again alice@x.com from 10.0.0.1"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["pseudo_text"] for r in pseudonymize_pii(df).collect()}
    # raw identifiers gone
    assert "alice@x.com" not in out[1] and "555-123-4567" not in out[1]
    assert "10.0.0.1" not in out[2]
    # SAME address -> SAME surrogate across documents
    import re

    tok1 = re.search(r"<email:[0-9a-f]{10}>", out[1]).group(0)
    assert tok1 in out[2]
    # different addresses -> different surrogates
    toks = set(re.findall(r"<email:[0-9a-f]{10}>", out[1]))
    assert len(toks) == 2
    # deterministic across runs
    out2 = {r["doc_id"]: r["pseudo_text"] for r in pseudonymize_pii(df).collect()}
    assert out == out2


def test_span_decontaminate_surgical(spark):
    """Only the contaminated SEGMENT goes; the rest of the doc
    survives verbatim — and a fully-contaminated doc empties."""
    from simple_etl_spark.llm.dedup import span_decontaminate

    bench_text = "alpha beta gamma delta epsilon"
    clean16 = " ".join(f"w{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            # seg0 clean, seg1 contains the benchmark 5-gram
            (1, clean16 + " " + bench_text + " pad1 pad2 pad3"),
            (2, clean16),          # untouched
            (3, bench_text),       # fully contaminated
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame([(bench_text,)], "text string")
    out = {r["doc_id"]: r for r in span_decontaminate(docs, bench).collect()}
    assert out[1]["n_segments"] == 2 and out[1]["n_removed"] == 1
    assert out[1]["clean_text"] == clean16
    assert out[2]["n_removed"] == 0 and out[2]["clean_text"] == clean16
    assert out[3]["n_removed"] == out[3]["n_segments"] == 1
    assert out[3]["clean_text"] == ""


def test_span_decontaminate_catches_straddling_gram(spark):
    """A benchmark 5-gram crossing a segment boundary must remove BOTH
    segments — per-segment shingling would miss it entirely."""
    from simple_etl_spark.llm.dedup import span_decontaminate

    bench_text = "alpha beta gamma delta epsilon"
    pre = " ".join(f"w{i}" for i in range(14))  # gram occupies words 15-19
    docs = spark.createDataFrame(
        [(1, pre + " " + bench_text)], "doc_id bigint, text string"
    )
    bench = spark.createDataFrame([(bench_text,)], "text string")
    r = span_decontaminate(docs, bench).head()
    assert r["n_segments"] == 2 and r["n_removed"] == 2
    assert r["clean_text"] == ""


# ---------------------------------------------------------------------------
# Round 5: training order, URL canonicalization, boilerplate removal
# ---------------------------------------------------------------------------


def test_training_order_is_deterministic_and_contiguous(spark):
    from simple_etl_spark.llm.sampling import training_order

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = training_order(df, "doc_id", seed=7, n_shards=4)
    b = training_order(df, "doc_id", seed=7, n_shards=4)
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))
    # every shard's positions are exactly 1..n_shard
    per = {}
    for doc_id, shard, pos in rows_a:
        per.setdefault(shard, []).append(pos)
    assert set(per) <= {0, 1, 2, 3}
    for shard, positions in per.items():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    assert sum(len(v) for v in per.values()) == 500


def test_training_order_seed_changes_order_not_membership(spark):
    from simple_etl_spark.llm.sampling import training_order

    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = training_order(df, "doc_id", seed=1, n_shards=4).collect()
    b = training_order(df, "doc_id", seed=2, n_shards=4).collect()
    assert {r["doc_id"] for r in a} == {r["doc_id"] for r in b}
    assert sorted(map(tuple, a)) != sorted(map(tuple, b))


def test_training_order_single_shard_and_bad_input(spark):
    import pytest
    from simple_etl_spark.llm.sampling import training_order

    df = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    one = training_order(df, "doc_id", n_shards=1)
    rows = one.collect()
    assert {r["shard"] for r in rows} == {0}
    assert sorted(r["pos"] for r in rows) == list(range(1, 51))
    with pytest.raises(ValueError):
        training_order(df, "doc_id", n_shards=0)


def test_training_order_single_shuffle_plan(spark):
    """The permutation must be ONE shard-keyed exchange + per-shard
    sort — never a global range sort over the corpus."""
    from simple_etl_spark.llm.sampling import training_order
    from simple_etl_spark.planinfo import plan_summary, plan_text

    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    out = training_order(df, "doc_id", n_shards=8)
    s = plan_summary(out)
    assert s["shuffle_exchanges"] == 1
    assert "rangepartitioning" not in plan_text(out).lower()


def test_canonicalize_url_rules(spark):
    from simple_etl_spark.functions.clean import canonicalize_url

    cases = [
        # fragment + tracking + trailing slash + case + default port
        ("HTTPS://Ex.COM:443/A/b/?utm_source=f&id=9&ref=t#top",
         "https://ex.com/A/b?id=9"),
        ("https://ex.com/A/b?id=9", "https://ex.com/A/b?id=9"),
        ("http://ex.com:80/", "http://ex.com"),
        ("http://ex.com", "http://ex.com"),
        # param sort + fbclid strip; path case preserved
        ("https://sub.Ex.com/a/B/?b=2&a=1&fbclid=x", "https://sub.ex.com/a/B?a=1&b=2"),
        # non-default port kept
        ("https://ex.com:8443/x", "https://ex.com:8443/x"),
        # schemeless input: host+path rules still apply, no scheme out
        ("Ex.com/a/?gclid=1", "ex.com/a"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]
    for (raw, want), g in zip(cases, got):
        assert g == want, f"{raw} -> {g}, want {want}"


def test_remove_boilerplate_strikes_frequent_lines_in_order(spark):
    from simple_etl_spark.llm.dedup import remove_boilerplate_lines

    rows = []
    for i in range(10):
        rows.append((i, f"unique head {i}\nSHARED FOOTER\n\nunique tail {i}"))
    rows.append((99, "shared footer"))  # casing/trim-normalized match
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_boilerplate_lines(df, min_doc_freq=5).collect()}
    assert out[0]["clean_text"] == "unique head 0\nunique tail 0"
    # blank line is removed but NOT counted against the offender set
    assert out[0]["n_lines"] == 4 and out[0]["n_removed"] == 2
    # the doc that was pure boilerplate is still reported, empty
    assert out[99]["clean_text"] == "" and out[99]["n_removed"] == 1


def test_remove_boilerplate_rejects_bad_threshold(spark):
    import pytest
    from simple_etl_spark.llm.dedup import remove_boilerplate_lines

    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        remove_boilerplate_lines(df, min_doc_freq=1)


def test_semantic_contamination_flags_paraphrase_not_orthogonal(spark):
    from simple_etl_spark.llm.similarity import semantic_contamination

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    corpus = spark.createDataFrame(
        [
            (1, [0.99, 0.01, 0.0, 0.0]),   # near-copy of bench 100
            (2, [0.0, 0.0, 1.0, 0.0]),     # orthogonal to both
            (3, [0.7, 0.7, 0.0, 0.0]),     # mid-similar (cos ~0.707)
        ],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r for r in
           semantic_contamination(corpus, bench, threshold=0.9).collect()}
    assert out[1]["n_hits"] == 1 and out[1]["max_score2_e12"] is not None
    # score is the squared cosine in pico-units: 0.99994² ≈ 0.9999e12
    assert out[1]["max_score2_e12"] >= 810000000000
    assert out[2]["n_hits"] == 0 and out[2]["max_score2_e12"] is None
    assert out[3]["n_hits"] == 0


def test_semantic_contamination_benchmark_is_broadcast(spark):
    """The eval set must ride as a broadcast — the corpus side is the
    100 TB side and must not shuffle before the per-id rollup."""
    from simple_etl_spark.llm.similarity import semantic_contamination
    from simple_etl_spark.planinfo import plan_summary

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], ["vec_id", "embedding"]
    )
    out = semantic_contamination(emb, emb.filter("vec_id % 5 = 0"))
    s = plan_summary(out)
    assert s["broadcast_exchanges"] >= 1
    assert s["cartesian_products"] == 0


def test_canonicalize_url_is_idempotent(spark):
    from simple_etl_spark.functions.clean import canonicalize_url
    from pyspark.sql import functions as F

    raws = [
        "HTTPS://Ex.COM:443/A/b/?utm_source=f&id=9&ref=t#top",
        "http://ex.com:80/",
        "https://sub.Ex.com/a/B/?b=2&a=1&fbclid=x",
        "https://ex.com:8443/x?z=1&y=2#frag",
        "Ex.com/a/?gclid=1",
    ]
    df = spark.createDataFrame([(u,) for u in raws], ["url"])
    once = df.select(canonicalize_url("url").alias("c"))
    twice = once.select(F.col("c").alias("url")).select(
        canonicalize_url("url").alias("c")
    )
    assert [r["c"] for r in once.collect()] == [r["c"] for r in twice.collect()]


def test_canonicalize_port_strip_is_scheme_dependent(spark):
    from simple_etl_spark.functions.clean import canonicalize_url

    cases = [
        ("http://ex.com:443/page", "http://ex.com:443/page"),  # real service
        ("https://ex.com:80/page", "https://ex.com:80/page"),
        ("http://ex.com:80/page", "http://ex.com/page"),
        ("https://ex.com:443/page", "https://ex.com/page"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]
    for (raw, want), g in zip(cases, got):
        assert g == want, f"{raw} -> {g}, want {want}"


def test_remove_boilerplate_sep_is_literal_not_regex(spark):
    from simple_etl_spark.llm.dedup import remove_boilerplate_lines

    rows = [(i, f"unique {i}|SHARED|tail {i}") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_boilerplate_lines(df, min_doc_freq=3, sep="|").collect()}
    # '|' as a regex would explode to single chars; as a literal it
    # yields 3 segments, the shared one struck
    assert out[0]["n_lines"] == 3 and out[0]["n_removed"] == 1
    assert out[0]["clean_text"] == "unique 0|tail 0"


def test_remove_boilerplate_is_idempotent(spark):
    from pyspark.sql import functions as F
    from simple_etl_spark.llm.dedup import remove_boilerplate_lines

    rows = [(i, f"unique head {i}\nSHARED FOOTER\nunique tail {i}")
            for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    once = remove_boilerplate_lines(df, min_doc_freq=4)
    again = remove_boilerplate_lines(
        once.select("doc_id", F.col("clean_text").alias("text")),
        min_doc_freq=4,
    )
    a = {r["doc_id"]: r["clean_text"] for r in once.collect()}
    b = {r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in again.collect()}
    for i in a:
        assert b[i] == (a[i], 0)  # fixpoint: nothing left to strike


def test_dataset_split_is_stable_under_growth_and_exhaustive(spark):
    from simple_etl_spark.llm.sampling import dataset_split

    small = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 900).withColumnRenamed("id", "doc_id")
    s_small = {r["doc_id"]: r["split"]
               for r in dataset_split(small, "doc_id").collect()}
    s_big = {r["doc_id"]: r["split"]
             for r in dataset_split(big, "doc_id").collect()}
    # growth never moves an existing key's split (leakage safety)
    assert all(s_big[k] == v for k, v in s_small.items())
    assert set(s_big.values()) == {"train", "val", "test"}
    assert len(s_big) == 900  # exhaustive: every row assigned


def test_dataset_split_rejects_bad_permilles(spark):
    import pytest
    from simple_etl_spark.llm.sampling import dataset_split

    df = spark.range(1).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="< 1000"):
        dataset_split(df, "doc_id", val_permille=500, test_permille=500)
    with pytest.raises(ValueError, match=">= 0"):
        dataset_split(df, "doc_id", val_permille=-1)


def test_topn_with_other_lump_and_ties(spark):
    import pytest
    from simple_etl_spark.operators.relational import topn_with_other

    rows = (["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"] * 1 + ["e"] * 1)
    df = spark.createDataFrame([(x,) for x in rows], ["g"])
    out = [tuple(r) for r in topn_with_other(df, "g", 2).collect()]
    # tie at the cut (b vs c, both 3) breaks by group value: b in, c out
    assert out[0] == ("a", 5, True)
    assert out[1] == ("b", 3, True)
    assert ("Other", 5, False) in out  # c(3) + d(1) + e(1)
    assert len(out) == 3
    with pytest.raises(ValueError):
        topn_with_other(df, "g", 0)


def test_topn_with_other_window_is_post_agg(spark):
    """The rank window must run over the aggregated counts frame, not
    the fact table: the single-partition exchange sits ABOVE a
    HashAggregate in the plan."""
    from simple_etl_spark.operators.relational import topn_with_other
    from simple_etl_spark.planinfo import plan_summary, plan_text

    df = spark.createDataFrame([(str(i % 7),) for i in range(100)], ["g"])
    out = topn_with_other(df, "g", 3)
    s = plan_summary(out)
    assert s["window_ops"] == 1 and s["cartesian_products"] == 0
    tree = plan_text(out).split("\n\n", 1)[0]
    wpos = tree.find("Window")
    assert wpos != -1
    # in the top-down tree print, the window's INPUT appears below it:
    # a HashAggregate after the Window line means the counts were
    # aggregated before entering the rank window (fact never windowed)
    assert "HashAggregate" in tree[wpos:]


def test_topn_with_other_preserves_a_real_other_group(spark):
    from simple_etl_spark.operators.relational import topn_with_other

    rows = ["Other"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"] * 1
    df = spark.createDataFrame([(x,) for x in rows], ["g"])
    out = [tuple(r) for r in topn_with_other(df, "g", 2).collect()]
    # the REAL 'Other' group (5 rows, rank 1) stays a top row; the
    # residual lump (c+d = 3) is its own is_top=false row
    assert ("Other", 5, True) in out
    assert ("b", 3, True) in out
    assert ("Other", 3, False) in out
    assert len(out) == 3


def test_topn_with_other_no_residual_row_when_all_fit(spark):
    from simple_etl_spark.operators.relational import topn_with_other

    df = spark.createDataFrame([("a",), ("b",), ("a",)], ["g"])
    out = [tuple(r) for r in topn_with_other(df, "g", 5).collect()]
    assert out == [("a", 2, True), ("b", 1, True)]


def test_time_weighted_mean_weights_by_duration(spark):
    import datetime as dt
    from simple_etl_spark.operators.relational import time_weighted_mean

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # value 10.00 held for 60s, then 20.00 for 30s, last drops
        ("u1", t0, 10.0),
        ("u1", t0 + dt.timedelta(seconds=60), 20.0),
        ("u1", t0 + dt.timedelta(seconds=90), 99.0),
        ("u2", t0, 5.0),  # single event: no interval, excluded
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {r["user_id"]: r for r in
           time_weighted_mean(df, "user_id", "ts", "value").collect()}
    u1 = out["u1"]
    assert u1["n_intervals"] == 2
    assert u1["span_us"] == 90_000_000
    # (10*60 + 20*30) / 90 = 13.333...
    assert abs(u1["twa"] - (10 * 60 + 20 * 30) / 90) < 1e-9
    assert "u2" not in out


def test_daily_revenue_ewma_matches_direct_formula(spark, sf_dir):
    """The sequential fold must equal the closed-form trailing EWMA
    (sum of r^k-weighted values / sum of weights) computed in Python."""
    from simple_etl_spark import queries as q

    q._load_all()
    rows = sorted(
        q.REGISTRY["daily_revenue_ewma"].fn(spark, sf_dir).collect(),
        key=lambda r: r["d"],
    )
    vals = [r["revenue"] for r in rows]
    for t in (0, 1, 5, len(rows) - 1):
        lo = max(0, t - 29)
        window = vals[lo:t + 1]
        n = len(window)
        num = sum(v * 0.8 ** (n - 1 - i) for i, v in enumerate(window))
        den = sum(0.8 ** (n - 1 - i) for i in range(n))
        # ewma_q is quantized to cents: half a cent of rounding slack
        assert abs(float(rows[t]["ewma_q"]) - num / den) <= 0.005 + 1e-9


def test_daily_trend_recovers_planted_slope(spark):
    import datetime as dt
    from simple_etl_spark import queries  # noqa: F401  (registry import path)
    from simple_etl_spark.operators.relational import event_type_daily_trend

    # build a synthetic catalog-less check through the same moments math
    from pyspark.sql import functions as F
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for day in range(10):
        for _ in range(5 + 3 * day):          # up: slope exactly 3/day
            rows.append(("up", t0 + dt.timedelta(days=day)))
        for _ in range(40 - 2 * day):         # down: slope exactly -2/day
            rows.append(("down", t0 + dt.timedelta(days=day)))
    df = spark.createDataFrame(rows, ["event_type", "ts"])

    class FakeCat(dict):
        def __getitem__(self, k):
            assert k == "events"
            return df

    # @query returns the bare fn, which takes any Catalog-like mapping
    out = {r["event_type"]: float(r["slope_q"])
           for r in event_type_daily_trend(FakeCat()).collect()}
    assert abs(out["up"] - 3.0) < 1e-9
    assert abs(out["down"] + 2.0) < 1e-9


def test_minmax_normalize_bounds_and_constant_group(spark):
    from simple_etl_spark.llm.sampling import minmax_normalize

    rows = [("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 7.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = minmax_normalize(df, "v", ["g"], out_col="nv").collect()
    a = sorted(r["nv"] for r in out if r["g"] == "a")
    assert a == [0.0, 0.5, 1.0]
    # constant group: NULL, not a division by zero
    assert all(r["nv"] is None for r in out if r["g"] == "b")


def test_grouped_mode_deterministic_tie_break(spark):
    from simple_etl_spark.operators.relational import grouped_mode

    rows = [("g", "b")] * 3 + [("g", "a")] * 3 + [("g", "c")] * 1
    df = spark.createDataFrame(rows, ["k", "v"])
    out = grouped_mode(df, "k", "v").collect()
    assert len(out) == 1
    # a and b tie at 3; the deterministic winner is the smaller value
    assert (out[0]["mode_value"], out[0]["mode_count"]) == ("a", 3)


def test_cluster_safe_split_never_straddles_near_dups(spark):
    """The leakage-safety contract: with cluster-keyed assignment no
    near-dup pair straddles splits; the per-doc hash split on the same
    pairs DOES straddle (which is the bug this operator removes)."""
    from simple_etl_spark.llm.sampling import cluster_safe_split, dataset_split

    # 400 two-doc near-dup clusters: (2k, 2k+1) are copies
    docs = spark.range(800).select(F.col("id"))
    pairs = spark.range(400).select(
        (F.col("id") * 2).alias("id_a"), (F.col("id") * 2 + 1).alias("id_b")
    )
    clusters = docs.select(
        "id", (F.floor(F.col("id") / 2) * 2).alias("cluster_id")
    )

    def straddles(assigned):
        return (
            pairs.join(
                assigned.select(F.col("id").alias("id_a"),
                                F.col("split").alias("_sa")), "id_a")
            .join(assigned.select(F.col("id").alias("id_b"),
                                  F.col("split").alias("_sb")), "id_b")
            .filter(F.col("_sa") != F.col("_sb"))
            .count()
        )

    safe = cluster_safe_split(docs, clusters, id_col="id",
                              val_permille=200, test_permille=200)
    assert straddles(safe) == 0
    # coverage: every doc assigned, splits jointly exhaustive
    assert safe.count() == 800
    naive = dataset_split(docs, "id", val_permille=200, test_permille=200)
    assert straddles(naive) > 0


def test_contamination_report_per_set_accounting(spark):
    from simple_etl_spark.llm.dedup import contamination_report

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence with no overlap at all"),
            (3, "the quick brown fox went home early today"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [
            ("hot", "the quick brown fox jumps"),
            ("cold", "unrelated benchmark text entirely elsewhere"),
        ],
        "eval_set string, text string",
    )
    rep = {
        r["eval_set"]: r
        for r in contamination_report(docs, bench, n=3, min_hits=1).collect()
    }
    # 'hot' shares 'the quick brown'/'quick brown fox' with docs 1 and 3
    assert rep["hot"]["contaminated_docs"] == 2
    assert rep["hot"]["total_docs"] == 3
    assert rep["hot"]["contaminated_permille"] == 666  # integral div
    # zero-overlap set still reports, with zeros
    assert rep["cold"]["contaminated_docs"] == 0
    assert rep["cold"]["contaminated_permille"] == 0
    assert rep["cold"]["n_eval_grams"] > 0


def test_nfc_normalize_collapses_decomposed_and_keeps_nulls(spark):
    from simple_etl_spark.llm.textstats import (
        doc_fingerprint,
        nfc_normalize,
        normalized_fingerprint,
    )

    df = spark.createDataFrame(
        [(1, "café"), (2, "café"), (3, None), (4, "plain")],
        ["id", "t"],
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            nfc_normalize("t").alias("n"),
            normalized_fingerprint("t").alias("fp_n"),
            doc_fingerprint(F.col("t")).alias("fp_raw"),
        ).collect()
    }
    # composed and decomposed collapse to the same normalized text + key
    assert out[1]["n"] == out[2]["n"] == "café"
    assert out[1]["fp_n"] == out[2]["fp_n"]
    # ...which the raw fingerprint misses (the dedup leak)
    assert out[1]["fp_raw"] != out[2]["fp_raw"]
    # NULL passes through; ASCII is a fixed point
    assert out[3]["n"] is None and out[3]["fp_n"] is None
    assert out[4]["n"] == "plain"


def test_curriculum_order_phases_consumed_in_order_within_shard(spark):
    """Within every shard, all phase-0 rows precede all phase-1 rows,
    etc.; within a phase the order is the seeded permutation (same
    digest as training_order). Unlisted/NULL phases land at the end."""
    from simple_etl_spark.llm.sampling import curriculum_order, training_order

    rows = [(i, ["head", "middle", "tail"][i % 3]) for i in range(60)]
    rows += [(100, "weird"), (101, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, bucket string")
    out = curriculum_order(
        df, "bucket", ["head", "middle", "tail"], "doc_id", seed=7, n_shards=4
    ).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4)) and len(out) == 62
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["pos"])
        idxs = [r["phase_idx"] for r in shard_rows]
        assert idxs == sorted(idxs), "phases interleaved within a shard"
        # positions contiguous from 1
        assert [r["pos"] for r in shard_rows] == list(
            range(1, len(shard_rows) + 1)
        )
    # catch-all tail: unlisted and NULL phases get idx == len(order)
    tail = {r["doc_id"]: r["phase_idx"] for r in out if r["doc_id"] >= 100}
    assert tail == {100: 3, 101: 3}
    # same digest as training_order: shard assignment matches
    t = {r["doc_id"]: r["shard"] for r in training_order(
        df, "doc_id", seed=7, n_shards=4
    ).collect()}
    assert all(r["shard"] == t[r["doc_id"]] for r in out)


def test_curriculum_order_rejects_empty_phases(spark):
    from simple_etl_spark.llm.sampling import curriculum_order

    df = spark.createDataFrame([(1, "head")], "doc_id bigint, bucket string")
    with pytest.raises(ValueError, match="phase_order"):
        curriculum_order(df, "bucket", [], "doc_id")


def test_curriculum_and_buckets_parity_with_null_text(spark, tmp_path):
    """NULL-text parity pin (latent on the driver data, which has no
    NULL texts): an unscorable row must keep bucket NULL and land in
    the catch-all phase (3) in BOTH engines. Runs the registered
    llm_quality_buckets and llm_curriculum_order queries and their
    oracles over a fixture WITH a NULL text, through the same strict
    compare as test_parity."""
    import duckdb

    from simple_etl_spark import queries as q
    from tests.oracle_harness import compare

    q._load_all()
    rows = [
        (1, "the quick brown fox and the dog", "en", "web", 31),
        (2, "alpha beta gamma delta", "en", "web", 22),
        (3, None, "en", "web", 0),                       # unscorable
        (4, "of a the and of a the and", "en", "books", 25),
        (5, "zeta eta theta", "en", "books", 14),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    d = str(tmp_path / "docs_nulltext")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    try:
        for name in ("llm_quality_buckets", "llm_curriculum_order"):
            spec = q.REGISTRY[name]
            ok, msg = compare(spec.fn(spark, d), con, spec.oracle)
            assert ok, f"{name}: {msg}"
        # and the engine's catch-all is visible: doc 3 has phase_idx 3
        out = q.REGISTRY["llm_curriculum_order"].fn(spark, d)
        r3 = out.filter(F.col("doc_id") == 3).head()
        assert r3["bucket"] is None and r3["phase_idx"] == 3
    finally:
        con.close()


# ---------------------------------------------------------------------------
# hot_ngrams / word_ngrams / token_fertility (round 7)
# ---------------------------------------------------------------------------


def test_word_ngrams_short_and_empty_docs_contribute_nothing(spark):
    """sequence(1, m) DESCENDS for m < 1 in Spark — the guard must
    empty the gram list for docs shorter than n, and '' / NULL text
    must yield zero rows, not a [''] phantom gram."""
    from simple_etl_spark.llm.textstats import word_ngrams

    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, None), (4, "a b c d")],
        "doc_id long, text string",
    )
    out = word_ngrams(df, ["doc_id"], "text", n=3).collect()
    assert {(r.doc_id, r.ngram) for r in out} == {
        (4, "a b c"), (4, "b c d"),
    }


def test_word_ngrams_counts_occurrences_not_distinct(spark):
    from simple_etl_spark.llm.textstats import word_ngrams

    df = spark.createDataFrame(
        [(1, "x y x y x y")], "doc_id long, text string"
    )
    grams = [r.ngram for r in word_ngrams(df, ["doc_id"], "text", n=2).collect()]
    assert sorted(grams) == ["x y", "x y", "x y", "y x", "y x"]


def test_hot_ngrams_doc_freq_vs_occurrences_and_min_df(spark):
    """A phrase repeated 5x inside ONE doc has doc_freq 1 (filtered by
    min_df=2) while occurrences still counts every repeat for phrases
    that do clear the bar."""
    from simple_etl_spark.llm.textstats import hot_ngrams

    df = spark.createDataFrame(
        [
            (1, "cookie banner here cookie banner here"),
            (2, "cookie banner here"),
            (3, "only in this doc only in this doc only in this doc"),
        ],
        "doc_id long, text string",
    )
    out = {r.ngram: r for r in hot_ngrams(
        df, "doc_id", "text", n=3, top_k=10, min_df=2
    ).collect()}
    assert "only in this" not in out  # doc_freq 1 < min_df
    r = out["cookie banner here"]
    assert (r.doc_freq, r.occurrences) == (2, 3)
    assert r.df_permille == 666  # 2*1000 div 3 — integral, floor


def test_hot_ngrams_head_is_deterministic_total_order(spark):
    """(doc_freq desc, occurrences desc, ngram asc) is a total order,
    so a LIMIT cutting through a tie group is still value-stable."""
    from simple_etl_spark.llm.textstats import hot_ngrams

    rows = [(i, "alpha beta gamma") for i in range(3)]
    rows += [(10 + i, "delta epsilon zeta") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = hot_ngrams(df, "doc_id", "text", n=3, top_k=1, min_df=1).collect()
    assert [r.ngram for r in out] == ["alpha beta gamma"]  # tie → asc name


def test_token_fertility_null_text_and_zero_denominators(spark):
    """NULL texts count toward n_docs but are skipped by every sum;
    an all-NULL stratum reports NULL ratios (nullif), never 0."""
    from simple_etl_spark.llm.textstats import token_fertility

    df = spark.createDataFrame(
        [
            ("s1", "en", "ab cd"),      # 5 chars, 2 words, 2 bpe tokens
            ("s1", "en", None),
            ("s2", "de", None),
        ],
        "source string, lang string, text string",
    )
    out = {(r.source, r.lang): r for r in
           token_fertility(df, ("source", "lang"), "text").collect()}
    s1 = out[("s1", "en")]
    assert (s1.n_docs, s1.total_chars, s1.total_ws_tokens,
            s1.total_bpe_tokens) == (2, 5, 2, 2)
    assert s1.chars_per_bpe_permille == 2500
    assert s1.bpe_per_ws_permille == 1000
    s2 = out[("s2", "de")]
    assert s2.n_docs == 1
    assert s2.total_chars is None
    assert s2.chars_per_bpe_permille is None
    assert s2.bpe_per_ws_permille is None


def test_hot_ngrams_rejects_bad_params(spark):
    from simple_etl_spark.llm.textstats import hot_ngrams, word_ngrams

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        hot_ngrams(df, "doc_id", "text", top_k=0)
    with pytest.raises(ValueError):
        hot_ngrams(df, "doc_id", "text", min_df=0)
    with pytest.raises(ValueError):
        word_ngrams(df, ["doc_id"], "text", n=0)


# ---------------------------------------------------------------------------
# prefix_duplicates (round 7)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pfx_docs(spark):
    long = "the quick brown fox jumps over the lazy dog " * 4  # 180 chars
    rows = [
        (1, long),
        (2, long[:100]),                 # truncated re-crawl of 1
        (3, long.upper()),               # case-variant: SAME normalized text
        (4, "tiny doc"),                 # below min_chars: out of scope
        (5, "a completely different long document about spark plans here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_duplicates_finds_truncation_and_strict_only(spark, pfx_docs):
    """The truncated doc pairs with BOTH full-length variants; the two
    equal-length normalized-identical docs do NOT pair (strict < —
    that's the exact-dedup tier's case), and short docs are skipped."""
    from simple_etl_spark.llm.dedup import prefix_duplicates

    out = prefix_duplicates(pfx_docs, "doc_id", "text").collect()
    pairs = {(r.short_id, r.long_id) for r in out}
    assert pairs == {(2, 1), (2, 3)}
    for r in out:
        assert r.short_len < r.long_len


def test_prefix_duplicates_whitespace_run_cut_still_pairs(spark):
    """A truncation landing inside a whitespace run must still pair:
    normalization (collapse + trim) is prefix-monotone."""
    from simple_etl_spark.llm.dedup import prefix_duplicates

    full = "alpha beta gamma delta epsilon zeta   \t eta theta iota kappa"
    cut = full[:38]  # ends inside the whitespace run
    assert cut != cut.rstrip()
    df = spark.createDataFrame(
        [(1, full), (2, cut)], "doc_id long, text string"
    )
    out = prefix_duplicates(df, "doc_id", "text").collect()
    assert {(r.short_id, r.long_id) for r in out} == {(2, 1)}


def test_prefix_duplicates_degenerate_band_dropped(spark):
    """A band over max_bucket is dropped whole — the shared-banner
    corpus cannot go quadratic."""
    from simple_etl_spark.llm.dedup import prefix_duplicates

    banner = "this exact cookie banner opens every single page here "
    rows = [(i, banner + f"unique tail number {i} " * 3) for i in range(6)]
    rows.append((100, banner))  # a strict prefix of every other row
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = prefix_duplicates(df, "doc_id", "text", max_bucket=5).collect()
    assert capped == []
    uncapped = prefix_duplicates(df, "doc_id", "text", max_bucket=None)
    assert {r.short_id for r in uncapped.collect()} == {100}


def test_prefix_duplicates_rejects_min_below_band(spark, pfx_docs):
    from simple_etl_spark.llm.dedup import prefix_duplicates

    with pytest.raises(ValueError):
        prefix_duplicates(pfx_docs, "doc_id", "text", band_chars=32, min_chars=16)
    with pytest.raises(ValueError):
        prefix_duplicates(pfx_docs, "doc_id", "text", band_chars=0, min_chars=0)


def test_word_ngrams_n1_has_no_phantom_empty_gram(spark):
    """The [''] split artifact for empty/whitespace-only text must not
    surface as a phantom '' unigram (review finding, r7)."""
    from simple_etl_spark.llm.textstats import word_ngrams

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "solo")],
        "doc_id long, text string",
    )
    out = word_ngrams(df, ["doc_id"], "text", n=1).collect()
    assert {(r.doc_id, r.ngram) for r in out} == {(4, "solo")}


def test_token_fertility_all_empty_stratum_reports_null_not_zero(spark):
    """Empty texts contribute 0 whitespace tokens (not the phantom 1),
    so an all-empty stratum's ratios are NULL — the docstring's
    never-a-fake-0 contract (review finding, r7)."""
    from simple_etl_spark.llm.textstats import token_fertility

    df = spark.createDataFrame(
        [("s1", "en", ""), ("s1", "en", "   "), ("s2", "en", "ab cd")],
        "source string, lang string, text string",
    )
    out = {(r.source, r.lang): r for r in
           token_fertility(df, ("source", "lang"), "text").collect()}
    s1 = out[("s1", "en")]
    assert (s1.total_chars, s1.total_ws_tokens, s1.total_bpe_tokens) == (3, 0, 0)
    assert s1.chars_per_bpe_permille is None
    assert s1.bpe_per_ws_permille is None
    assert out[("s2", "en")].bpe_per_ws_permille == 1000
