"""Golden tests for the cleaning library (SURVEY §5 item 2).

Inputs mirror the boilerplate patterns the reference strips
(processor/cleaner.py:24-54 / process_bronze_to_silver.sql:50-110);
expected outputs derived from the paired regex pipelines.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from simple_etl_spark.functions.clean import (
    clean_content,
    clean_title,
    gen_id,
    parse_date,
)

CONTENT_GOLDENS = [
    # dateline prefix
    ("Jakarta, CNN Indonesia -- Presiden meninjau lokasi.", "Presiden meninjau lokasi."),
    # advertisement block (dotall, case-insensitive)
    (
        "ADVERTISEMENT\n\nSCROLL TO CONTINUE WITH CONTENT Isi berita utama.",
        "Isi berita utama.",
    ),
    ("advertisement scroll to continue with content Body.", "Body."),
    # photo credits in parens
    ("Berita (ANTARA FOTO/Budi) lanjut.", "Berita lanjut."),
    ("Berita (CNN Indonesia/Abi) lanjut.", "Berita lanjut."),
    # embeds
    ("[Gambas:Video CNN] Konten utama.", "Konten utama."),
    # teaser lines strip to end-of-line
    ("Lihat Juga : Artikel lain\nParagraf kedua.", "Paragraf kedua."),
    ("Pilihan Redaksi item satu\nIsi berita.", "Isi berita."),
    # whitespace collapse
    ("a\n\n\n\nb", "a b"),
    ("kata   banyak    spasi", "kata banyak spasi"),
    # composition
    (
        "Jakarta, CNN Indonesia -- ADVERTISEMENT\nSCROLL TO CONTINUE WITH CONTENT "
        "Inti berita [Gambas:Video CNN] selesai.",
        "Inti berita selesai.",
    ),
]

TITLE_GOLDENS = [
    ("  Judul\n  Berita  ", "Judul Berita"),
    ("Satu\tDua", "Satu Dua"),
]

DATE_GOLDENS = [
    ("2025-08-10 14:30:00", dt.datetime(2025, 8, 10, 14, 30)),
    ("2025-08-10", dt.datetime(2025, 8, 10)),
    ("10/08/2025 07:05:00", dt.datetime(2025, 8, 10, 7, 5)),
    ("10/08/2025", dt.datetime(2025, 8, 10)),
    ("10-08-2025 07:05:00", dt.datetime(2025, 8, 10, 7, 5)),
    ("Senin, 25 Agu 2025 10:30 WIB", dt.datetime(2025, 8, 25, 10, 30)),
    ("Jumat, 01 Des 2023 23:59 WIB", dt.datetime(2023, 12, 1, 23, 59)),
    # long-form Indonesian month names (dateparser territory in the
    # reference; the \bAgu[a-z]*\b month map covers them)
    ("Kamis, 07 Agustus 2025 09:15 WIB", dt.datetime(2025, 8, 7, 9, 15)),
    ("Selasa, 17 Januari 2024 06:00 WIB", dt.datetime(2024, 1, 17, 6, 0)),
    ("12 Desember 2022", dt.datetime(2022, 12, 12)),
    # English dd MMM yyyy forms
    ("25 Aug 2025 14:30", dt.datetime(2025, 8, 25, 14, 30)),
    ("03 Oct 2024", dt.datetime(2024, 10, 3)),
    # r4 widening: US month-first, year-first slashes, epoch strings
    ("Aug 25, 2025 14:30", dt.datetime(2025, 8, 25, 14, 30)),
    ("Oct 03, 2024", dt.datetime(2024, 10, 3)),
    ("2025/08/10 14:30:00", dt.datetime(2025, 8, 10, 14, 30)),
    ("2025/08/10", dt.datetime(2025, 8, 10)),
    ("1723300200", dt.datetime(2024, 8, 10, 14, 30)),      # epoch seconds (UTC)
    ("1723300200000", dt.datetime(2024, 8, 10, 14, 30)),   # epoch millis (UTC)
    ("12345", None),     # neither 10 nor 13 digits: not an epoch
    ("not a date", None),
    ("", None),
]


def _apply(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    return [r["y"] for r in df.select(fn("x").alias("y")).collect()]


def test_clean_content_goldens(spark):
    got = _apply(spark, clean_content, [d for d, _ in CONTENT_GOLDENS])
    for (dirty, want), out in zip(CONTENT_GOLDENS, got):
        assert out == want, f"{dirty!r}: {out!r} != {want!r}"


def test_clean_title_goldens(spark):
    got = _apply(spark, clean_title, [d for d, _ in TITLE_GOLDENS])
    for (dirty, want), out in zip(TITLE_GOLDENS, got):
        assert out == want, f"{dirty!r}: {out!r} != {want!r}"


def test_parse_date_goldens(spark):
    got = _apply(
        spark,
        lambda c: parse_date(c).cast("timestamp_ntz"),
        [d for d, _ in DATE_GOLDENS],
    )
    for (raw, want), out in zip(DATE_GOLDENS, got):
        assert out == want, f"{raw!r}: {out!r} != {want!r}"


def test_iso_week_boundary_goldens(spark):
    """weekofyear (Spark) vs extract(week) (DuckDB) vs Python
    isocalendar around Dec-29..Jan-4 — the only dates where ISO-week
    conventions can silently diverge. weekly_trends depends on the
    engines agreeing here; sf0.01 data happens not to straddle a year
    boundary, so pin it explicitly."""
    import duckdb
    from pyspark.sql import functions as F

    dates = [
        dt.date(y, m, d)
        for y in (2023, 2024, 2025, 2026)
        for (m, d) in [(12, 29), (12, 30), (12, 31), (1, 1), (1, 2), (1, 3), (1, 4)]
    ]
    df = spark.createDataFrame([(d,) for d in dates], ["d"])
    got = {
        r["d"]: r["w"]
        for r in df.select("d", F.weekofyear("d").alias("w")).collect()
    }
    duck = dict(
        duckdb.sql(
            "SELECT d, extract(week FROM d) FROM (SELECT unnest($dates::date[]) d)",
            params={"dates": [d.isoformat() for d in dates]},
        ).fetchall()
    )
    for d in dates:
        iso = d.isocalendar()[1]
        assert got[d] == iso, f"spark weekofyear({d}) = {got[d]} != ISO {iso}"
        assert duck[d] == iso, f"duckdb week({d}) = {duck[d]} != ISO {iso}"


def test_gen_id_md5(spark):
    import hashlib

    link = "https://news.example/en/42"
    (got,) = _apply(spark, gen_id, [link])
    assert got == hashlib.md5(link.encode()).hexdigest()


def test_parse_date_relative_anchor_goldens(spark):
    """dateparser's relative grammar resolved against an explicit
    anchor (deterministic stand-in for the reference's NOW())."""
    from pyspark.sql import functions as F

    anchor = dt.datetime(2025, 8, 25, 12, 0, 0)
    cases = [
        ("5 menit yang lalu", dt.datetime(2025, 8, 25, 11, 55, 0)),
        ("2 jam lalu", dt.datetime(2025, 8, 25, 10, 0, 0)),
        ("3 hari yang lalu", dt.datetime(2025, 8, 22, 12, 0, 0)),
        ("2 minggu yang lalu", dt.datetime(2025, 8, 11, 12, 0, 0)),
        ("1 bulan yang lalu", dt.datetime(2025, 7, 25, 12, 0, 0)),
        ("2 hours ago", dt.datetime(2025, 8, 25, 10, 0, 0)),
        ("kemarin", dt.datetime(2025, 8, 24, 12, 0, 0)),
        ("Hari ini", dt.datetime(2025, 8, 25, 12, 0, 0)),
        ("baru saja", dt.datetime(2025, 8, 25, 12, 0, 0)),
        # absolute shapes still parse with an anchor present
        ("25/08/2025", dt.datetime(2025, 8, 25, 0, 0, 0)),
        ("Senin, 25 Agu 2025 10:30 WIB", dt.datetime(2025, 8, 25, 10, 30, 0)),
        # junk stays NULL, not anchored
        ("entah kapan", None),
        ("9999 eon yang lalu", None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["raw"])
    out = df.select(
        parse_date("raw", anchor=F.lit(anchor).cast("timestamp_ntz"))
        .cast("timestamp_ntz")
        .alias("ts")
    ).collect()
    for (raw, want), row in zip(cases, out):
        assert row["ts"] == want, f"{raw!r}: {row['ts']!r} != {want!r}"


def test_parse_date_without_anchor_keeps_relative_null(spark):
    df = spark.createDataFrame([("5 menit yang lalu",), ("kemarin",)], ["raw"])
    out = df.select(parse_date("raw").alias("ts")).collect()
    assert all(r["ts"] is None for r in out)


def test_phrase_search_adjacency_and_gaps(spark):
    from simple_etl_spark.functions.text import phrase_search

    df = spark.createDataFrame(
        [
            (1, "big table value here"),          # match
            (2, "table of value"),                # gap breaks adjacency
            (3, "table value and table value"),   # two matches
            (4, "value table"),                   # wrong order
            (5, "Table VALUE!"),                  # analyzer normalizes
        ],
        ["doc_id", "text"],
    )
    out = {r["doc"]: r["n_matches"] for r in
           phrase_search(df, "table value", id_col="doc_id",
                         text_col="text").collect()}
    assert out == {1: 1, 3: 2, 5: 1}


def test_phrase_search_three_terms_and_empty_phrase(spark):
    import pytest
    from simple_etl_spark.functions.text import phrase_search

    df = spark.createDataFrame(
        [(1, "fast table value scan"), (2, "fast table scan value")],
        ["doc_id", "text"],
    )
    out = {r["doc"]: r["n_matches"] for r in
           phrase_search(df, "fast table value", id_col="doc_id",
                         text_col="text").collect()}
    assert out == {1: 1}
    with pytest.raises(ValueError, match="no analyzable"):
        phrase_search(df, "123 456", id_col="doc_id", text_col="text")


def test_more_like_this_finds_the_planted_twin(spark):
    from simple_etl_spark.functions.text import more_like_this

    rows = [
        (1, "quantum entanglement photon laser optics experiment"),
        (2, "quantum entanglement photon laser optics research"),  # twin of 1
        (3, "football match goal referee penalty stadium"),
        (4, "football match goal referee penalty crowd"),          # twin of 3
        (5, "cooking recipe butter flour sugar oven"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = more_like_this(df, 1, id_col="doc_id", text_col="text",
                         max_query_terms=5, top_n=2).collect()
    assert out[0]["doc"] == 2  # the twin wins
    assert out[0]["score_q"] > (out[1]["score_q"] if len(out) > 1 else 0)


def test_suggest_prefix_ranking_and_validation(spark):
    import pytest
    from simple_etl_spark.functions.text import suggest

    df = spark.createDataFrame(
        [
            (1, "scan scanner scale"),
            (2, "scan scale"),
            (3, "scan sort"),
        ],
        ["doc_id", "text"],
    )
    out = [tuple(r) for r in
           suggest(df, "sc", id_col="doc_id", text_col="text", top_n=3).collect()]
    # scan in 3 docs, scale in 2, scanner in 1
    assert out == [("scan", 3), ("scale", 2), ("scanner", 1)]
    with pytest.raises(ValueError, match="non-empty"):
        suggest(df, "", id_col="doc_id", text_col="text")


def test_phrase_search_numeric_interloper_documented_divergence(spark):
    """Pins the documented analyzer divergence: digits fold to
    whitespace pre-positioning, so a numeric token does NOT break
    adjacency (unlike ES's standard analyzer)."""
    from simple_etl_spark.functions.text import phrase_search

    df = spark.createDataFrame(
        [(1, "table 5 value"), (2, "table of value")], ["doc_id", "text"]
    )
    out = {r["doc"]: r["n_matches"] for r in
           phrase_search(df, "table value", id_col="doc_id",
                         text_col="text").collect()}
    assert out == {1: 1}  # numeric folds away; alphabetic 'of' breaks
