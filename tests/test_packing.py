"""Sequence packing (llm/packing.py) and temperature mixture
(llm/sampling.py) — invariants an oracle query can't pin: layout
algebra, the greedy fold vs a pure-Python reference, partition
independence, apportionment exactness."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from simple_etl_spark.llm.packing import pack_concat_cut, pack_greedy_nosplit
from simple_etl_spark.llm.sampling import temperature_mixture, temperature_weights

CAP = 64


@pytest.fixture(scope="module")
def docs(spark):
    # token counts chosen to exercise: zero, exact-fit, straddler,
    # oversized (> CAP), and a null
    rows = [(i, (i * 37) % 90) for i in range(1, 60)]
    rows += [(100, 0), (101, CAP), (102, CAP + 30), (103, None)]
    return spark.createDataFrame(rows, "doc_id bigint, tok int")


def _perm(key, seed, n_shards):
    dg = hashlib.md5(f"{seed}|{key}".encode()).hexdigest()
    return int(dg[:15], 16) % n_shards, dg[15:32]


def test_concat_cut_layout_algebra(spark, docs):
    out = pack_concat_cut(docs, "tok", "doc_id", CAP, seed=3, n_shards=4)
    rows = sorted(
        out.collect(), key=lambda r: (r["shard"], r["pos"])
    )
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert sum(len(v) for v in by_shard.values()) == docs.count()
    for shard, rs in by_shard.items():
        stream = 0
        for i, r in enumerate(rs):
            tok = max(r["tok"] or 0, 0)
            assert r["pos"] == i + 1
            assert r["start_tok"] == stream
            assert r["first_seq"] == stream // CAP
            assert r["last_seq"] == (stream + max(tok, 1) - 1) // CAP
            assert r["n_seqs"] == r["last_seq"] - r["first_seq"] + 1 >= 1
            # straddle iff the doc crosses a cut boundary
            straddles = tok >= 1 and (stream % CAP) + tok > CAP
            assert (r["n_seqs"] > 1) == straddles
            stream += tok


def test_concat_cut_partition_invariance(spark, docs):
    a = pack_concat_cut(docs, "tok", "doc_id", CAP, seed=3, n_shards=4)
    b = pack_concat_cut(
        docs.repartition(13), "tok", "doc_id", CAP, seed=3, n_shards=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_concat_cut_matches_permutation_reference(spark, docs):
    """The shard/order assignment must be the md5(seed|key) digest
    split — reproduced here from hashlib, independent of Spark."""
    out = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in pack_concat_cut(
            docs, "tok", "doc_id", CAP, seed=3, n_shards=4
        ).collect()
    }
    per_shard = {}
    for r in docs.collect():
        sh, ok = _perm(r["doc_id"], 3, 4)
        per_shard.setdefault(sh, []).append((ok, r["doc_id"]))
    for sh, lst in per_shard.items():
        for pos, (_, did) in enumerate(sorted(lst), start=1):
            assert out[did] == (sh, pos)


def _greedy_ref(items, cap):
    """Pure-Python next-fit no-split fold: items = [(key, tok)] in
    walk order; returns {key: (pos, seq, fill_after, overflow)}."""
    res, seq, fill = {}, 0, 0
    for pos, (key, tok) in enumerate(items, start=1):
        t = max(tok or 0, 0)
        if pos == 1:
            fill = t
        elif fill + t > cap:
            seq, fill = seq + 1, t
        else:
            fill += t
        res[key] = (pos, seq, fill, t > cap)
    return res


def test_greedy_nosplit_matches_python_fold(spark, docs):
    out = pack_greedy_nosplit(docs, "tok", "doc_id", CAP, seed=3, n_shards=4)
    got = {
        r["doc_id"]: (r["shard"], r["pos"], r["seq"], r["seq_fill"], r["overflow"])
        for r in out.collect()
    }
    assert len(got) == docs.count()
    per_shard = {}
    for r in docs.collect():
        sh, ok = _perm(r["doc_id"], 3, 4)
        per_shard.setdefault(sh, []).append((ok, r["doc_id"], r["tok"]))
    for sh, lst in per_shard.items():
        ref = _greedy_ref([(d, t) for _, d, t in sorted(lst)], CAP)
        for did, (pos, seq, fill, over) in ref.items():
            assert got[did] == (sh, pos, seq, fill, over), did


def test_greedy_nosplit_capacity_invariant(spark, docs):
    """No sequence exceeds capacity unless it holds exactly one
    oversized (flagged) document."""
    out = pack_greedy_nosplit(docs, "tok", "doc_id", CAP, seed=3, n_shards=4)
    agg = (
        out.groupBy("shard", "seq")
        .agg(
            F.sum(F.greatest(F.coalesce(F.col("tok"), F.lit(0)), F.lit(0))).alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.max(F.col("overflow").cast("int")).alias("has_overflow"),
        )
        .collect()
    )
    for r in agg:
        if r["total"] > CAP:
            assert r["has_overflow"] == 1 and r["n"] == 1, dict(r.asDict())


def test_greedy_nosplit_partition_invariance(spark, docs):
    a = pack_greedy_nosplit(docs, "tok", "doc_id", CAP, seed=3, n_shards=4)
    b = pack_greedy_nosplit(
        docs.repartition(17), "tok", "doc_id", CAP, seed=3, n_shards=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_packing_rejects_bad_params(spark, docs):
    for fn in (pack_concat_cut, pack_greedy_nosplit):
        with pytest.raises(ValueError, match="capacity"):
            fn(docs, "tok", "doc_id", 0)
        with pytest.raises(ValueError, match="n_shards"):
            fn(docs, "tok", "doc_id", 8, n_shards=0)


# ---------------------------------------------------------------------------
# temperature mixture
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def strata(spark):
    rows = [(i, "big") for i in range(900)]
    rows += [(1000 + i, "mid") for i in range(90)]
    rows += [(2000 + i, "tiny") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id bigint, source string")


def test_temperature_targets_sum_exactly(spark, strata):
    for alpha in (1.0, 0.5, 0.25):
        w = temperature_weights(strata, "source", 997, alpha=alpha)
        assert w.agg(F.sum("target_n")).head()[0] == 997, alpha


def test_temperature_alpha1_is_proportional_reference(spark, strata):
    """alpha=1 apportionment must equal a pure-Python largest-remainder
    apportionment on the raw counts."""
    got = {
        r["stratum"]: r["target_n"]
        for r in temperature_weights(strata, "source", 100, alpha=1.0).collect()
    }
    counts = {"big": 900, "mid": 90, "tiny": 10}
    tot = sum(counts.values())
    base = {k: (100 * v) // tot for k, v in counts.items()}
    rem = {k: (100 * v) % tot for k, v in counts.items()}
    leftover = 100 - sum(base.values())
    for k in sorted(counts, key=lambda k: (-rem[k], k))[:leftover]:
        base[k] += 1
    assert got == base


def test_temperature_flattens_toward_small_domains(spark, strata):
    p1 = {
        r["stratum"]: r["target_n"]
        for r in temperature_weights(strata, "source", 1000, alpha=1.0).collect()
    }
    p5 = {
        r["stratum"]: r["target_n"]
        for r in temperature_weights(strata, "source", 1000, alpha=0.5).collect()
    }
    p25 = {
        r["stratum"]: r["target_n"]
        for r in temperature_weights(strata, "source", 1000, alpha=0.25).collect()
    }
    assert p5["tiny"] > p1["tiny"] and p25["tiny"] > p5["tiny"]
    assert p5["big"] < p1["big"] and p25["big"] < p5["big"]


def test_temperature_mixture_delivers_take_n(spark, strata):
    out = temperature_mixture(strata, "source", "doc_id", 500, alpha=0.5)
    got = {r["source"]: r["cnt"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    want = {
        r["stratum"]: r["take_n"]
        for r in temperature_weights(strata, "source", 500, alpha=0.5).collect()
        if r["take_n"] > 0
    }
    assert got == want
    # deterministic membership: re-run picks the identical rows
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_mixture(
            strata.repartition(7), "source", "doc_id", 500, alpha=0.5
        ).collect()
    )
    assert a == b


def test_temperature_rejects_bad_params(spark, strata):
    with pytest.raises(ValueError, match="alpha"):
        temperature_weights(strata, "source", 10, alpha=0.3)
    with pytest.raises(ValueError, match="total_n"):
        temperature_weights(strata, "source", -1)


def test_epoch_mixture_delivers_exact_targets(spark, strata):
    from simple_etl_spark.llm.sampling import epoch_expanded_mixture

    out = epoch_expanded_mixture(strata, "source", "doc_id", 2000, alpha=0.25)
    targets = {
        r["stratum"]: r["target_n"]
        for r in temperature_weights(strata, "source", 2000, alpha=0.25).collect()
    }
    got = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == {k: v for k, v in targets.items() if v > 0}
    # per-doc copies within a stratum differ by at most one, and the
    # extra copy goes to the md5-rank-first docs
    per_doc = (
        out.groupBy("source", "doc_id", "sample_rank")
        .agg(F.count(F.lit(1)).alias("copies"))
        .collect()
    )
    by_src = {}
    for r in per_doc:
        by_src.setdefault(r["source"], []).append((r["sample_rank"], r["copies"]))
    for src, lst in by_src.items():
        lst.sort()
        cs = [c for _, c in lst]
        assert max(cs) - min(cs) <= 1, src
        # the +1 copies are a prefix of the rank order
        boundary_seen = False
        for _, c in lst:
            if c == min(cs):
                boundary_seen = True
            else:
                assert not boundary_seen, src
    # epochs are 1..copies per doc (dense)
    dense = (
        out.groupBy("source", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("epoch").alias("mx"),
             F.min("epoch").alias("mn"))
        .filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1))
        .count()
    )
    assert dense == 0


def test_epoch_mixture_partition_invariance(spark, strata):
    from simple_etl_spark.llm.sampling import epoch_expanded_mixture

    a = epoch_expanded_mixture(strata, "source", "doc_id", 777, alpha=0.5)
    b = epoch_expanded_mixture(
        strata.repartition(11), "source", "doc_id", 777, alpha=0.5
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_manifest_sequences_are_capacity_exact(spark, docs):
    from simple_etl_spark.llm.packing import pack_manifest

    packed = pack_concat_cut(docs, "tok", "doc_id", CAP, seed=3, n_shards=4)
    man = pack_manifest(packed, CAP)
    rows = man.collect()
    # per-doc coverage: slices are contiguous [0, tok) partitions
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["seq"], r["from_tok"], r["to_tok"])
        )
    toks = {r["doc_id"]: max(r["tok"] or 0, 0) for r in docs.collect()}
    for did, slices in by_doc.items():
        slices.sort()
        assert slices[0][1] == 0
        assert slices[-1][2] == toks[did]
        for (s1, _, t1), (s2, f2, _) in zip(slices, slices[1:]):
            assert s2 == s1 + 1 and f2 == t1
    # zero-token docs contribute no slices
    assert all(toks[d] >= 1 for d in by_doc)
    assert set(by_doc) == {d for d, t in toks.items() if t >= 1}
    # per-(shard, seq) totals: exactly CAP except each shard's last seq
    per_seq = {}
    for r in rows:
        per_seq.setdefault((r["shard"], r["seq"]), 0)
        per_seq[(r["shard"], r["seq"])] += r["to_tok"] - r["from_tok"]
    last = {}
    for (sh, sq) in per_seq:
        last[sh] = max(last.get(sh, -1), sq)
    for (sh, sq), total in per_seq.items():
        if sq < last[sh]:
            assert total == CAP, (sh, sq, total)
        else:
            assert 1 <= total <= CAP, (sh, sq, total)


def test_pack_manifest_rejects_bad_capacity(spark, docs):
    from simple_etl_spark.llm.packing import pack_manifest

    packed = pack_concat_cut(docs, "tok", "doc_id", CAP)
    with pytest.raises(ValueError, match="capacity"):
        pack_manifest(packed, 0)


# ---------------------------------------------------------------------------
# OOV rate
# ---------------------------------------------------------------------------


def test_oov_stats_planted_outlier_and_wordless(spark):
    from simple_etl_spark.llm.textstats import oov_stats

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),
        (3, "the cat sat on the mat"),
        (4, "zzq qqz zqz"),          # pure OOV vs top-6 vocab
        (5, ""),                      # wordless
        (6, None),                    # NULL text
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: (r["n_words"], r["n_oov"], r["oov_permille"])
        for r in oov_stats(df, top_n=6).collect()
    }
    # vocab = 6 most frequent: the(x6) cat sat on mat (ties by word) +
    # one of the zz-words; the repeated sentence is fully in-vocab
    assert out[1] == (6, 0, 0) and out[2] == out[1] and out[3] == out[1]
    n_words, n_oov, pm = out[4]
    assert n_words == 3 and n_oov == 2 and pm == 666
    assert out[5] == (0, 0, 0) and out[6] == (0, 0, 0)


def test_oov_stats_rejects_bad_top_n(spark):
    from simple_etl_spark.llm.textstats import oov_stats

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="top_n"):
        oov_stats(df, top_n=0)


# ---------------------------------------------------------------------------
# source overlap
# ---------------------------------------------------------------------------


def test_source_overlap_planted_mirror_and_zero_pairs(spark):
    from simple_etl_spark.llm.dedup import source_overlap

    rows = [
        (1, "a", "alpha beta"),
        (2, "a", "gamma delta"),
        (3, "a", "Alpha   BETA"),     # same fingerprint as doc 1
        (4, "b", "alpha beta"),       # shared with a
        (5, "b", "epsilon zeta"),
        (6, "c", "eta theta"),        # no overlap with anyone
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {
        (r["source_a"], r["source_b"]): (
            r["n_a"], r["n_b"], r["n_common"], r["jaccard_permille"]
        )
        for r in source_overlap(df).collect()
    }
    # a has 2 distinct fps (docs 1/3 collapse), b has 2, c has 1
    assert out[("a", "b")] == (2, 2, 1, 333)   # 1/(2+2-1)
    assert out[("a", "c")] == (2, 1, 0, 0)
    assert out[("b", "c")] == (2, 1, 0, 0)
    assert len(out) == 3


def test_mixture_null_stratum_rows_are_delivered(spark):
    """Regression: the weights→rows join must be NULL-SAFE — a NULL
    stratum holds real quota in temperature_weights, so its rows must
    be delivered, not silently dropped (which would leave the total
    short of N with no error)."""
    from simple_etl_spark.llm.sampling import epoch_expanded_mixture

    rows = [(i, "en") for i in range(90)] + [(100 + i, None) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = epoch_expanded_mixture(df, "source", "doc_id", 100, alpha=1.0)
    assert out.count() == 100
    per = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    targets = {
        r["stratum"]: r["target_n"]
        for r in temperature_weights(df, "source", 100, alpha=1.0).collect()
    }
    assert per == targets and None in per

    sel = temperature_mixture(df, "source", "doc_id", 50, alpha=1.0)
    got = {
        r["source"]: r["cnt"]
        for r in sel.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    takes = {
        r["stratum"]: r["take_n"]
        for r in temperature_weights(df, "source", 50, alpha=1.0).collect()
        if r["take_n"] > 0
    }
    assert got == takes


def test_mixture_tolerates_caller_n_docs_column(spark):
    """Regression: the carry columns are underscore-prefixed, so an
    input frame already holding n_docs/target_n/take_n must not
    collide."""
    from simple_etl_spark.llm.sampling import (
        epoch_expanded_mixture,
        temperature_mixture,
    )

    df = spark.createDataFrame(
        [(i, "a", 7) for i in range(10)] + [(100 + i, "b", 7) for i in range(5)],
        "doc_id bigint, source string, n_docs int",
    )
    assert epoch_expanded_mixture(df, "source", "doc_id", 20).count() == 20
    assert temperature_mixture(df, "source", "doc_id", 6).count() == 6


def test_greedy_nosplit_null_and_duplicate_keys_pass_through(spark):
    """Regression: the fold threads the caller's columns through
    mapInPandas (no rejoin), so NULL-key and duplicate-key rows stay
    in the output and the per-shard pos is dense."""
    from simple_etl_spark.llm.packing import pack_greedy_nosplit

    rows = [(1, 10), (1, 20), (None, 30), (2, 40)]
    df = spark.createDataFrame(rows, "doc_id bigint, tok int")
    out = pack_greedy_nosplit(df, "tok", "doc_id", 64, seed=1, n_shards=2)
    assert out.count() == 4
    per_shard = {}
    for r in out.collect():
        per_shard.setdefault(r["shard"], []).append(r["pos"])
    for sh, poss in per_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), sh


def test_source_overlap_null_text_carries_no_fingerprint(spark):
    from simple_etl_spark.llm.dedup import source_overlap

    rows = [
        (1, "a", None),
        (2, "a", "shared doc"),
        (3, "b", "shared doc"),
        (4, "c", None),            # only NULL texts: drops out
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {
        (r["source_a"], r["source_b"]): (r["n_a"], r["n_b"], r["n_common"],
                                         r["jaccard_permille"])
        for r in source_overlap(df).collect()
    }
    # true Jaccard a-b is 1/1 — the NULL text must not deflate it
    assert out == {("a", "b"): (1, 1, 1, 1000)}


def test_cluster_canonical_prefers_quality_over_min_id(spark):
    """The canonical member must be the highest-quality doc, not the
    min id: a cluster where the LATER id has the better stopword score
    must elect the later id."""
    from pyspark.sql import functions as F  # noqa: F811
    from pyspark.sql.window import Window

    from simple_etl_spark.llm.dedup import dedup_clusters
    from simple_etl_spark.llm.textstats import (
        LANG_MARKERS,
        stopword_hits,
        whitespace_token_count,
    )

    # ids 1,2 are near-dups; 2 has the richer stopword profile
    corpus = spark.createDataFrame(
        [
            (1, "quick brown fox jumps high"),
            (2, "the quick brown fox and the dog"),
            (3, "unrelated text entirely"),
        ],
        "id bigint, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    clusters = dedup_clusters(pairs, corpus.select("id"))
    # the PRODUCTION scoring expression (not a hand-rolled copy that
    # could silently diverge from what llm_cluster_canonical runs)
    q = corpus.select(
        "id",
        (stopword_hits(F.col("text"), LANG_MARKERS["en"]) * 10000).alias("_s"),
        whitespace_token_count(F.col("text")).alias("_n"),
    ).select(
        "id", F.expr("_s div greatest(_n, 1)").cast("bigint").alias("score")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc_nulls_last("score"), F.asc("id")
    )
    best = {
        r["cluster_id"]: r["id"]
        for r in clusters.join(q, "id")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    # cluster {1,2} labeled by min id 1; canonical member is 2
    assert best[1] == 2
    assert best[3] == 3
    # sanity: the scores really order 2 above 1
    s = {r["id"]: r["score"] for r in q.collect()}
    assert s[2] > s[1]


def test_packing_and_mixture_refuse_reserved_columns(spark):
    from simple_etl_spark.llm.packing import pack_concat_cut, pack_greedy_nosplit
    from simple_etl_spark.llm.sampling import (
        epoch_expanded_mixture,
        temperature_mixture,
    )

    df = spark.createDataFrame(
        [(1, 5, "x")], "doc_id bigint, tok int, order_key string"
    )
    for fn in (pack_concat_cut, pack_greedy_nosplit):
        with pytest.raises(ValueError, match="order_key"):
            fn(df, "tok", "doc_id", 8)
    dm = spark.createDataFrame(
        [(1, "a", 9)], "doc_id bigint, source string, _mx_take int"
    )
    with pytest.raises(ValueError, match="_mx_take"):
        temperature_mixture(dm, "source", "doc_id", 1)
    with pytest.raises(ValueError, match="_mx_take"):
        epoch_expanded_mixture(dm, "source", "doc_id", 1)
