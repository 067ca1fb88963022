"""Property tests (hypothesis) for the as-of and range joins: the
Spark implementations must agree with an obvious sequential reference
on arbitrary keyed timelines — duplicate timestamps, cross-key
isolation, empty sides, boundary instants."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from simple_etl_spark.operators.asof import asof_join
from simple_etl_spark.operators.rangejoin import range_join_bucketed

KEYS = st.sampled_from(["k1", "k2"])
EPOCH = dt.datetime(2024, 1, 1)


def _t(hours: int) -> dt.datetime:
    return EPOCH + dt.timedelta(hours=hours)


LEFT_ROW = st.tuples(KEYS, st.integers(0, 60))
RIGHT_ROW = st.tuples(KEYS, st.integers(0, 60), st.integers(0, 3))

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    left=st.lists(LEFT_ROW, min_size=1, max_size=7),
    right=st.lists(RIGHT_ROW, max_size=7),
    exact=st.booleans(),
)
@SET
def test_asof_matches_sequential_reference(spark, left, right, exact):
    ldf = spark.createDataFrame(
        [(i, k, _t(h)) for i, (k, h) in enumerate(left)],
        "lid long, key string, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(100 + i, k, _t(h), float(v)) for i, (k, h, v) in enumerate(right)],
        "rid long, key string, ts timestamp, value double",
    )
    got = {
        r["lid"]: (r["rid_asof"], r["value_asof"])
        for r in asof_join(
            ldf, rdf, "key", "ts", ["rid", "value"],
            allow_exact_matches=exact,
        ).collect()
    }
    assert len(got) == len(left)
    rrows = [(100 + i, k, _t(h), float(v)) for i, (k, h, v) in enumerate(right)]
    for i, (k, h) in enumerate(left):
        lts = _t(h)
        cands = [
            (ts, rid, v)
            for rid, rk, ts, v in rrows
            if rk == k and (ts <= lts if exact else ts < lts)
        ]
        want = max(cands) if cands else None  # (ts, rid, value) lexicographic
        if want is None:
            assert got[i] == (None, None), f"left {i}: expected no match"
        else:
            assert got[i] == (want[1], want[2]), f"left {i}"


@given(
    points=st.lists(LEFT_ROW, min_size=1, max_size=6),
    ivs=st.lists(st.tuples(KEYS, st.integers(0, 60), st.integers(0, 30)), max_size=5),
)
@SET
def test_range_join_matches_sequential_reference(spark, points, ivs):
    pdf = spark.createDataFrame(
        [(i, k, _t(h)) for i, (k, h) in enumerate(points)],
        "pid long, key string, ts timestamp",
    )
    idf = spark.createDataFrame(
        [(100 + i, k, _t(h), _t(h + w)) for i, (k, h, w) in enumerate(ivs)],
        "ivid long, key string, start timestamp, stop timestamp",
    )
    got = sorted(
        (r["pid"], r["ivid"])
        for r in range_join_bucketed(
            pdf, idf, "key", "ts", "start", "stop", bucket="1 day", how="inner"
        ).collect()
    )
    want = sorted(
        (pi, 100 + ii)
        for pi, (pk, ph) in enumerate(points)
        for ii, (ik, ih, iw) in enumerate(ivs)
        if pk == ik and ih <= ph <= ih + iw
    )
    assert got == want


@given(
    n_words=st.integers(1, 60),
    chunk=st.integers(2, 12),
    overlap_frac=st.integers(0, 99),
)
@SET
def test_chunking_reconstructs_document(spark, n_words, chunk, overlap_frac):
    """Invariant: chunks on the start ladder 1, 1+stride, … cover the
    document exactly — dropping the first `overlap` words of every
    non-first chunk and concatenating reconstructs the original token
    sequence (no token lost, none duplicated). The tail chunk is
    always longer than the overlap by ladder construction."""
    from simple_etl_spark.llm.textstats import chunk_documents

    overlap = (chunk - 1) * overlap_frac // 100  # 0 <= overlap < chunk
    text = " ".join(f"t{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r["start_word"],
    )
    stride = chunk - overlap
    assert [c["start_word"] for c in chunks] == list(
        range(1, max(1, n_words - overlap) + 1, stride)
    )
    rebuilt = chunks[0]["chunk_text"].split()
    for c in chunks[1:]:
        assert c["n_tokens"] > overlap  # tail longer than the overlap
        rebuilt.extend(c["chunk_text"].split()[overlap:])
    assert rebuilt == text.split()


SESS_ROW = st.tuples(KEYS, st.integers(0, 200))


@given(rows=st.lists(SESS_ROW, min_size=1, max_size=12), gap_h=st.integers(1, 5))
@SET
def test_gap_sessionize_matches_sequential_reference(spark, rows, gap_h):
    """Session splits, per-session counts and durations must agree
    with the obvious sequential scan — duplicate instants, single-row
    sessions, and boundary gaps (== gap is NOT a split) included."""
    from simple_etl_spark.operators.relational import gap_sessionize

    df = spark.createDataFrame(
        [(i, k, _t(h)) for i, (k, h) in enumerate(rows)],
        "eid long, key string, ts timestamp",
    )
    gap_us = gap_h * 3600 * 1_000_000
    got = sorted(
        (r["key"], r["n_events"], r["dur_us"])
        for r in gap_sessionize(df, "key", "ts", "eid", gap_us).collect()
    )
    want = []
    for key in {k for k, _ in rows}:
        mine = sorted(
            (h, i) for i, (k, h) in enumerate(rows) if k == key
        )
        sessions: list[list[int]] = []
        prev_h = None
        for h, _i in mine:
            if prev_h is None or (h - prev_h) * 3600 * 1_000_000 > gap_us:
                sessions.append([])
            sessions[-1].append(h)
            prev_h = h
        for s in sessions:
            want.append((key, len(s), (s[-1] - s[0]) * 3600 * 1_000_000))
    assert got == sorted(want)


def test_fk_integrity_audit_flags_planted_orphans(spark, sf_dir):
    """On consistent TPC-H data every edge reports 0; a planted orphan
    in a copied child table is counted by the right edge."""
    from simple_etl_spark import queries as q

    q._load_all()
    out = {r["fk"]: r["orphans"]
           for r in q.REGISTRY["fk_integrity_audit"].fn(spark, sf_dir).collect()}
    assert len(out) == 5 and all(v == 0 for v in out.values())
    # planted orphan: an order referencing a nonexistent customer
    from pyspark.sql import functions as F
    from simple_etl_spark.engine import Catalog

    cat = Catalog(spark, sf_dir)
    orders = cat["orders"]
    bad = orders.limit(1).withColumn("o_custkey", F.lit(-999999).cast("bigint"))
    patched = orders.unionByName(bad)
    orphans = (
        patched.join(
            cat["customer"].select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        ).count()
    )
    assert orphans == 1
