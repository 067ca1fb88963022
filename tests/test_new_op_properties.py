"""Property tests (hypothesis) for the round-5 operators: each Spark
implementation must agree with an obvious sequential reference model
on arbitrary inputs — planted near-dups, random changelogs with
NULL ops and ties, random Morton coordinates."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- winnowing: the shared-substring guarantee on random text --------

WORD = st.text("abcdefgh", min_size=3, max_size=6)
SENT = st.lists(WORD, min_size=6, max_size=12).map(" ".join)


@SET
@given(common=st.lists(WORD, min_size=5, max_size=8).map(" ".join),
       pre_a=SENT, pre_b=SENT)
def test_winnowing_guarantee_random(spark, common, pre_a, pre_b):
    from simple_etl_spark.llm.dedup import winnow_fingerprints

    # both docs contain `common` (>= k + w - 1 = 11 chars by
    # construction: 5 words x >=3 chars + separators) → must share >=1
    # fingerprint
    df = spark.createDataFrame(
        [(1, f"{pre_a} {common}"), (2, f"{common} {pre_b}")],
        "doc_id bigint, text string",
    )
    fps: dict[int, set] = {1: set(), 2: set()}
    for r in winnow_fingerprints(df, k=8, w=4).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2]


# --- apply_changes vs a dict-replay reference ------------------------

OP = st.sampled_from(["U", "D", None])
CHANGE = st.tuples(st.integers(1, 3), st.integers(0, 5), OP, st.integers(0, 99))
FEED = st.lists(CHANGE, max_size=12)


@SET
@given(feed=FEED)
def test_apply_changes_matches_replay(spark, feed):
    from simple_etl_spark.operators.merge import apply_changes

    # (k, seq, v) must be a total order per key — the operator's
    # documented contract; rows tying on the full order key with
    # different ops have no deterministic survivor in ANY engine
    feed = list({(k, seq, v): (k, seq, op, v) for k, seq, op, v in feed}.values())
    if not feed:
        return
    df = spark.createDataFrame(feed, "k int, seq int, op string, v int")
    got = {
        r["k"]: (r["seq"], r["op"], r["v"])
        for r in apply_changes(
            df, keys=["k"], order_cols=["seq", "v"], op_col="op"
        ).collect()
    }
    # reference: sort by (seq, v) per key, replay, last change wins;
    # trailing delete removes; NULL op is an upsert
    ref: dict[int, tuple] = {}
    by_key: dict[int, list] = {}
    for k, seq, op, v in feed:
        by_key.setdefault(k, []).append((seq, v, op))
    for k, changes in by_key.items():
        seq, v, op = sorted(changes)[-1]
        if op != "D":
            ref[k] = (seq, op, v)
    assert got == ref


# --- zvalue vs reference Morton on random coordinates ----------------


@SET
@given(coords=st.lists(
    st.tuples(st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1)),
    min_size=1, max_size=20,
))
def test_zvalue_matches_reference_random(spark, coords):
    from simple_etl_spark.sources.layout import zvalue

    def ref(x, y):
        z = 0
        for j in range(16):
            z |= ((x >> j) & 1) << (2 * j)
            z |= ((y >> j) & 1) << (2 * j + 1)
        return z

    df = spark.createDataFrame(coords, "x bigint, y bigint")
    for r in df.select("x", "y", zvalue(["x", "y"]).alias("z")).collect():
        assert r["z"] == ref(r["x"], r["y"])


# --- quantization: codes bounded, dequantization error bounded -------


@SET
@given(vecs=st.lists(
    st.lists(st.floats(-10, 10, allow_nan=False, width=32),
             min_size=4, max_size=8),
    min_size=1, max_size=6,
))
def test_quantization_error_bound_random(spark, vecs):
    from simple_etl_spark.llm.similarity import quantize_embeddings

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    for r in quantize_embeddings(df).collect():
        codes, scale = r["qvec"], r["qvec_scale"]
        orig = dict(rows)[r["vec_id"]]
        assert all(abs(c) <= 127 for c in codes)
        for c, x in zip(codes, orig):
            assert abs(c * scale - x) <= scale / 2 + 1e-12


# --- canonicalize_url vs a pure-Python reference ---------------------

_SCHEME = st.sampled_from(["http", "https", "HTTP", "HtTpS"])
_HOST = st.lists(st.text("abcDEF", min_size=1, max_size=4),
                 min_size=1, max_size=3).map(".".join)
_PORT = st.sampled_from(["", ":80", ":443", ":8080"])
_PATH = st.lists(st.text("abcXY19", min_size=1, max_size=4),
                 min_size=0, max_size=3)
_PARAM = st.tuples(
    st.sampled_from(["a", "b", "id", "utm_source", "utm_x", "fbclid",
                     "gclid", "ref", "z9"]),
    st.text("xy01", min_size=1, max_size=3),
)
_PARAMS = st.lists(_PARAM, max_size=4)
_FRAG = st.sampled_from(["", "#top", "#a?b=1"])
_SLASH = st.booleans()


def _py_canonical(scheme, host, port, path, params, frag, slash):
    """Sequential reference model of the documented canonical rules."""
    import re as _re

    s = scheme.lower()
    h = (host + port).lower()
    if s == "http":
        h = _re.sub(":80$", "", h)
    elif s == "https":
        h = _re.sub(":443$", "", h)
    p = "/" + "/".join(path) if path else ""
    if slash:
        p = p + "/"
    p = _re.sub("/+$", "", p)
    keep = sorted(
        f"{k}={v}" for k, v in params
        if not _re.match(r"^(utm_[^=]*|fbclid|gclid|ref)=", f"{k}={v}")
    )
    q = ("?" + "&".join(keep)) if keep else ""
    return f"{s}://{h}{p}{q}"


@SET
@given(scheme=_SCHEME, host=_HOST, port=_PORT, path=_PATH,
       params=_PARAMS, frag=_FRAG, slash=_SLASH)
def test_canonicalize_url_matches_reference(
    spark, scheme, host, port, path, params, frag, slash
):
    from simple_etl_spark.functions.clean import canonicalize_url

    raw_path = "/" + "/".join(path) if path else ""
    if slash:
        raw_path += "/"
    raw_q = "&".join(f"{k}={v}" for k, v in params)
    raw = f"{scheme}://{host}{port}{raw_path}"
    if raw_q:
        raw += "?" + raw_q
    raw += frag
    want = _py_canonical(scheme, host, port, path, params, frag, slash)
    df = spark.createDataFrame([(raw,)], ["url"])
    got = df.select(canonicalize_url("url").alias("c")).first()["c"]
    assert got == want, f"{raw!r} -> {got!r}, want {want!r}"


# --- quality percentile buckets: reference model on random multisets --

@SET
@given(
    scores=st.lists(
        st.tuples(st.sampled_from(["d1", "d2"]), st.integers(0, 5)),
        min_size=1,
        max_size=30,
    )
)
def test_quality_buckets_match_reference_on_random_multisets(spark, scores):
    """permille must equal the sequential competition-rank reference
    (count of strictly-better rows · 1000 div max(n−1, 1), per group)
    on arbitrary (group, score) multisets, independent of row order
    and partitioning."""
    from simple_etl_spark.llm.selection import quality_percentile_buckets

    rows = [(i, g, s) for i, (g, s) in enumerate(scores)]
    df = spark.createDataFrame(
        rows, "id bigint, g string, score bigint"
    ).repartition(3)
    got = {
        r["id"]: r["permille"]
        for r in quality_percentile_buckets(df, "score", ["g"]).collect()
    }
    by_g: dict[str, list[int]] = {}
    for _, g, s in rows:
        by_g.setdefault(g, []).append(s)
    for i, g, s in rows:
        pool = by_g[g]
        better = sum(1 for x in pool if x > s)
        want = (better * 1000) // max(len(pool) - 1, 1)
        assert got[i] == want, (i, g, s, got[i], want)


@SET
@given(
    n=st.integers(1, 40),
    seed=st.integers(0, 3),
    n_shards=st.integers(1, 5),
)
def test_curriculum_order_is_partition_invariant(spark, n, seed, n_shards):
    """shard/pos must be a pure content function: identical under any
    repartitioning, positions a contiguous 1..k per shard, phases
    non-decreasing along pos."""
    from simple_etl_spark.llm.sampling import curriculum_order

    rows = [(i, ["head", "tail"][i % 2]) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id bigint, bucket string")
    key = lambda r: (r["doc_id"], r["shard"], r["pos"])  # noqa: E731
    a = sorted(map(key, curriculum_order(
        df, "bucket", ["head", "tail"], "doc_id", seed, n_shards
    ).collect()))
    b = sorted(map(key, curriculum_order(
        df.repartition(4), "bucket", ["head", "tail"], "doc_id", seed, n_shards
    ).collect()))
    assert a == b


# --- packing: layout vs a pure-Python reference on random tokens -----

TOKS = st.lists(
    st.one_of(st.none(), st.integers(-3, 120)), min_size=1, max_size=40
)


@SET
@given(toks=TOKS, cap=st.integers(1, 64))
def test_concat_cut_matches_sequential_reference(spark, toks, cap):
    import hashlib

    from simple_etl_spark.llm.packing import pack_concat_cut

    df = spark.createDataFrame(
        list(enumerate(toks)), "doc_id bigint, tok int"
    )
    got = {
        r["doc_id"]: (r["shard"], r["pos"], r["start_tok"], r["first_seq"],
                      r["last_seq"])
        for r in pack_concat_cut(df, "tok", "doc_id", cap, seed=9,
                                 n_shards=3).collect()
    }
    per_shard: dict[int, list] = {}
    for did, t in enumerate(toks):
        dg = hashlib.md5(f"9|{did}".encode()).hexdigest()
        sh = int(dg[:15], 16) % 3
        per_shard.setdefault(sh, []).append((dg[15:32], did, max(t or 0, 0)))
    want = {}
    for sh, lst in per_shard.items():
        stream = 0
        for pos, (_, did, t) in enumerate(sorted(lst), start=1):
            want[did] = (sh, pos, stream, stream // cap,
                         (stream + max(t, 1) - 1) // cap)
            stream += t
    assert got == want


@SET
@given(toks=TOKS, cap=st.integers(1, 64))
def test_greedy_nosplit_matches_sequential_reference(spark, toks, cap):
    import hashlib

    from simple_etl_spark.llm.packing import pack_greedy_nosplit

    df = spark.createDataFrame(
        list(enumerate(toks)), "doc_id bigint, tok int"
    )
    got = {
        r["doc_id"]: (r["shard"], r["pos"], r["seq"], r["seq_fill"])
        for r in pack_greedy_nosplit(df, "tok", "doc_id", cap, seed=9,
                                     n_shards=3).collect()
    }
    per_shard: dict[int, list] = {}
    for did, t in enumerate(toks):
        dg = hashlib.md5(f"9|{did}".encode()).hexdigest()
        sh = int(dg[:15], 16) % 3
        per_shard.setdefault(sh, []).append((dg[15:32], did, max(t or 0, 0)))
    want = {}
    for sh, lst in per_shard.items():
        seq = fill = 0
        for pos, (_, did, t) in enumerate(sorted(lst), start=1):
            if pos == 1:
                fill = t
            elif fill + t > cap:
                seq, fill = seq + 1, t
            else:
                fill += t
            want[did] = (sh, pos, seq, fill)
    assert got == want


# --- apportionment: targets always sum to N on random strata ---------


@SET
@given(
    counts=st.lists(st.integers(1, 40), min_size=1, max_size=6),
    total=st.integers(0, 200),
    alpha=st.sampled_from([1.0, 0.5, 0.25]),
)
def test_temperature_targets_always_sum(spark, counts, total, alpha):
    from pyspark.sql import functions as F

    from simple_etl_spark.llm.sampling import temperature_weights

    rows = [
        (1000 * s + i, f"s{s}") for s, c in enumerate(counts) for i in range(c)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    w = temperature_weights(df, "source", total, alpha=alpha)
    assert w.agg(F.sum("target_n")).head()[0] == total


# --- near-dup membership vs the integer reference on random vectors --

# magnitudes straddle the prune-bypass cutoff (norm ~0.32): tiny
# vectors exercise the small-norm bypass, unit-ish ones the band prune
ELEM = st.one_of(
    st.floats(-1.0, 1.0, allow_nan=False, allow_infinity=False),
    st.floats(-1e-4, 1e-4, allow_nan=False, allow_infinity=False),
)
VEC = st.lists(ELEM, min_size=3, max_size=3)


@SET
@given(vecs=st.lists(VEC, min_size=2, max_size=5),
       thr=st.sampled_from([0.5, 0.9, 0.99]))
def test_near_dup_membership_matches_integer_reference(spark, vecs, thr):
    from tests.test_similarity_exact import _ref_pair_key

    from simple_etl_spark.llm.similarity import (
        embedding_near_dups,
        threshold_key,
    )

    rows = [(i, 0, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<double>"
    )
    got = {
        (r["id_a"], r["id_b"]): r["score2_e12"]
        for r in embedding_near_dups(df, threshold=thr).collect()
    }
    tk = threshold_key(thr)
    want = {}
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            ref = _ref_pair_key(vecs[i], vecs[j])
            if ref is not None and ref["score2_e12"] >= tk:
                want[(i, j)] = ref["score2_e12"]
    assert got == want
