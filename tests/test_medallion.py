"""Bronze→silver promotion unit test (E1 stage)."""

from __future__ import annotations

import datetime as dt
import hashlib


def test_silver_from_bronze(spark):
    from simple_etl_spark.operators.medallion import silver_from_bronze

    t = dt.datetime(2024, 1, 1)
    bronze = spark.createDataFrame(
        [
            (
                None,
                " Judul\nBerita ",
                "https://x/1",
                "img",
                "10/08/2025 07:05:00",
                "politik",
                "Jakarta, CNN Indonesia -- Isi   berita.",
                "cnn",
                t,
                False,
            ),
            # dropped: no link
            (None, "t", None, None, "", "x", "c", "cnn", t, False),
            # dropped: no content
            (None, "t", "https://x/2", None, "", "x", None, "cnn", t, False),
        ],
        "id string, title string, link string, image string, date_raw string, "
        "topic string, content string, source string, created_at timestamp, "
        "processed boolean",
    )
    rows = silver_from_bronze(bronze).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["id"] == hashlib.md5(b"https://x/1").hexdigest()
    assert r["title"] == "Judul Berita"
    assert r["content"] == "Isi berita."
    assert r["content_length"] == len("Isi berita.")
    assert r["date"] == dt.datetime(2025, 8, 10, 7, 5)
    assert r["processed"] is False
