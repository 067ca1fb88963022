"""Deterministic article-ization of the documents table.

The reference's domain tables (bronze/silver articles) don't exist in
the driver's testdata, so the medallion operators are exercised over a
*deterministic* derivation of ``documents`` into the silver-article
schema (SURVEY §1.1/FIXTURES.md §2). The same derivation exists twice,
kept textually parallel:

- :func:`silver_articles` — Spark DataFrame expression
- :data:`ARTICLES_CTE` — SQL CTE prefixed onto every medallion oracle

Any medallion query is then plain reference semantics over real
article-shaped columns, and DuckDB can verify it end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_etl_spark.engine import Catalog

# silver-article schema from documents (id, title, link, image, date,
# topic, content, content_length, source, created_at, processed)
ARTICLES_CTE = """
WITH articles AS (
    SELECT
        doc_id,
        md5(concat('https://news.example/', lang, '/', cast(doc_id as varchar))) AS id,
        trim(substring(text, 1, 60)) AS title,
        concat('https://news.example/', lang, '/', cast(doc_id as varchar)) AS link,
        CASE WHEN doc_id % 7 = 0 THEN NULL
             WHEN doc_id % 11 = 0 THEN 'No image'
             ELSE concat('https://img.example/', cast(doc_id as varchar)) END AS image,
        TIMESTAMP '2024-01-01 00:00:00'
            + (doc_id % 90) * INTERVAL 1 DAY
            + (doc_id % 24) * INTERVAL 1 HOUR
            + (doc_id % 60) * INTERVAL 1 MINUTE AS date,
        CASE doc_id % 12
            WHEN 0 THEN 'politik'
            WHEN 1 THEN 'pemerintahan daerah'
            WHEN 2 THEN 'ekonomi makro'
            WHEN 3 THEN 'bisnis startup'
            WHEN 4 THEN 'olahraga'
            WHEN 5 THEN 'teknologi'
            WHEN 6 THEN 'kesehatan masyarakat'
            WHEN 7 THEN 'pendidikan tinggi'
            WHEN 8 THEN 'hukum'
            WHEN 9 THEN 'berita internasional'
            WHEN 10 THEN 'lifestyle'
            ELSE NULL
        END AS topic,
        text AS content,
        length(text) AS content_length,
        source AS source,
        TIMESTAMP '2024-01-01 00:00:00'
            + (doc_id % 90) * INTERVAL 1 DAY
            + (doc_id % 24) * INTERVAL 1 HOUR
            + (doc_id % 60) * INTERVAL 1 MINUTE
            + INTERVAL 90 MINUTE AS created_at,
        (doc_id % 10) <> 0 AS processed
    FROM documents
)
"""


def silver_articles(cat: Catalog) -> DataFrame:
    """Spark twin of :data:`ARTICLES_CTE` (kept in lockstep)."""
    link = F.concat(
        F.lit("https://news.example/"), F.col("lang"), F.lit("/"),
        F.col("doc_id").cast("string"),
    )
    ts = F.expr(
        "cast(timestamp'2024-01-01 00:00:00'"
        " + make_interval(0, 0, 0, doc_id % 90, doc_id % 24, doc_id % 60, 0)"
        " as timestamp_ntz)"
    )
    return cat["documents"].select(
        F.col("doc_id"),
        F.md5(link).alias("id"),
        F.trim(F.substring("text", 1, 60)).alias("title"),
        link.alias("link"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 11 == 0, F.lit("No image"))
        .otherwise(F.concat(F.lit("https://img.example/"), F.col("doc_id").cast("string")))
        .alias("image"),
        ts.alias("date"),
        F.expr(
            """CASE doc_id % 12
                   WHEN 0 THEN 'politik'
                   WHEN 1 THEN 'pemerintahan daerah'
                   WHEN 2 THEN 'ekonomi makro'
                   WHEN 3 THEN 'bisnis startup'
                   WHEN 4 THEN 'olahraga'
                   WHEN 5 THEN 'teknologi'
                   WHEN 6 THEN 'kesehatan masyarakat'
                   WHEN 7 THEN 'pendidikan tinggi'
                   WHEN 8 THEN 'hukum'
                   WHEN 9 THEN 'berita internasional'
                   WHEN 10 THEN 'lifestyle'
                   ELSE NULL
               END"""
        ).alias("topic"),
        F.col("text").alias("content"),
        F.length("text").alias("content_length"),
        F.col("source").alias("source"),
        (ts + F.expr("INTERVAL 90 MINUTE")).alias("created_at"),
        (F.col("doc_id") % 10 != 0).alias("processed"),
    )
