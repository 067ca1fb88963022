"""Medallion layers: the gold view builder (SURVEY §2.2 P1-P4).

The reference's gold layer is a *virtual view* over silver
(`services/pg_staging.py:79-119` "Create Gold View (instead of
table)", `init.sql:53-88`, `process_silver_to_gold.sql:10-69`). A lazy
DataFrame IS that choice in Spark: :func:`gold_view` returns an
unmaterialized projection, Catalyst prunes/pushes through it, and any
analytics composed on top stay one fused plan.

``GOLD_CTE`` is the SQL twin used by every medallion oracle — kept in
lockstep with the DataFrame expressions, mirroring how the reference
itself pairs Python and SQL implementations of the same transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_etl_spark.operators.articles import ARTICLES_CTE

# P1 projection + P2 filter + P3 recategorization + P4 text stats,
# from process_silver_to_gold.sql:10-69 (richest variant: 4-bucket
# category, topic_category, word/sentence counts).
GOLD_CTE = ARTICLES_CTE + """
, gold AS (
    SELECT id, title, link, image, date, topic, content,
           cast(content_length as bigint) AS content_length, source, created_at,
           concat(coalesce(title, ''), ' ', coalesce(content, ''), ' ',
                  coalesce(topic, '')) AS search_text,
           CASE WHEN content_length < 500 THEN 'Short'
                WHEN content_length < 1500 THEN 'Medium'
                WHEN content_length < 3000 THEN 'Long'
                ELSE 'Very Long' END AS content_category,
           CASE WHEN lower(topic) LIKE '%politik%' OR lower(topic) LIKE '%pemerintah%' THEN 'Politik'
                WHEN lower(topic) LIKE '%ekonom%' OR lower(topic) LIKE '%bisnis%' THEN 'Ekonomi'
                WHEN lower(topic) LIKE '%olahraga%' OR lower(topic) LIKE '%sport%' THEN 'Olahraga'
                WHEN lower(topic) LIKE '%teknolog%' OR lower(topic) LIKE '%digital%' THEN 'Teknologi'
                WHEN lower(topic) LIKE '%kesehatan%' OR lower(topic) LIKE '%medis%' THEN 'Kesehatan'
                WHEN lower(topic) LIKE '%pendidikan%' OR lower(topic) LIKE '%sekolah%' THEN 'Pendidikan'
                WHEN lower(topic) LIKE '%hukum%' OR lower(topic) LIKE '%kriminal%' THEN 'Hukum'
                WHEN lower(topic) LIKE '%internasional%' OR lower(topic) LIKE '%dunia%' THEN 'Internasional'
                ELSE coalesce(topic, 'Umum') END AS topic_category,
           extract(hour FROM date) AS publish_hour,
           cast(dayofweek(date) as bigint) AS publish_dow,
           cast(weekofyear(date) as bigint) AS publish_week,
           extract(month FROM date) AS publish_month,
           extract(year FROM date) AS publish_year,
           cast(date AS date) AS publish_date,
           length(trim(title)) > 10 AS has_good_title,
           content_length > 200 AS has_substantial_content,
           (image IS NOT NULL AND image <> '' AND image <> 'No image') AS has_image,
           cast(len(string_split(content, ' ')) as bigint) AS word_count,
           cast(len(string_split(content, '.')) as bigint) AS sentence_count
    FROM articles
    WHERE processed AND title IS NOT NULL AND content IS NOT NULL
      AND date IS NOT NULL AND content_length > 50
)
"""


def gold_view(silver: DataFrame) -> DataFrame:
    """Spark twin of :data:`GOLD_CTE`: P1 derived columns, P2 row
    filter, P3 topic recategorization, P4 word/sentence counts.

    publish_dow is normalized to PG semantics (0=Sunday): Spark's
    dayofweek is 1=Sunday (SURVEY §4 dialect quirk F7)."""
    silver = silver.filter(
        F.col("processed")
        & F.col("title").isNotNull()
        & F.col("content").isNotNull()
        & F.col("date").isNotNull()
        & (F.col("content_length") > 50)
    )
    topic_l = F.lower(F.col("topic"))
    return silver.select(
        "id", "title", "link", "image", "date", "topic", "content",
        F.col("content_length").cast("bigint").alias("content_length"),
        "source", "created_at",
        F.concat(
            F.coalesce(F.col("title"), F.lit("")), F.lit(" "),
            F.coalesce(F.col("content"), F.lit("")), F.lit(" "),
            F.coalesce(F.col("topic"), F.lit("")),
        ).alias("search_text"),
        F.when(F.col("content_length") < 500, "Short")
        .when(F.col("content_length") < 1500, "Medium")
        .when(F.col("content_length") < 3000, "Long")
        .otherwise("Very Long")
        .alias("content_category"),
        # P3: the reference's 8 canonical Indonesian categories with the
        # COALESCE(topic,'Umum') fallback (process_silver_to_gold.sql:43-53).
        F.when(topic_l.like("%politik%") | topic_l.like("%pemerintah%"), "Politik")
        .when(topic_l.like("%ekonom%") | topic_l.like("%bisnis%"), "Ekonomi")
        .when(topic_l.like("%olahraga%") | topic_l.like("%sport%"), "Olahraga")
        .when(topic_l.like("%teknolog%") | topic_l.like("%digital%"), "Teknologi")
        .when(topic_l.like("%kesehatan%") | topic_l.like("%medis%"), "Kesehatan")
        .when(topic_l.like("%pendidikan%") | topic_l.like("%sekolah%"), "Pendidikan")
        .when(topic_l.like("%hukum%") | topic_l.like("%kriminal%"), "Hukum")
        .when(topic_l.like("%internasional%") | topic_l.like("%dunia%"), "Internasional")
        .otherwise(F.coalesce(F.col("topic"), F.lit("Umum")))
        .alias("topic_category"),
        F.hour("date").cast("bigint").alias("publish_hour"),
        (F.dayofweek("date") - 1).cast("bigint").alias("publish_dow"),
        F.weekofyear("date").cast("bigint").alias("publish_week"),
        F.month("date").cast("bigint").alias("publish_month"),
        F.year("date").cast("bigint").alias("publish_year"),
        F.col("date").cast("date").alias("publish_date"),
        (F.length(F.trim(F.col("title"))) > 10).alias("has_good_title"),
        (F.col("content_length") > 200).alias("has_substantial_content"),
        (
            F.col("image").isNotNull()
            & (F.col("image") != "")
            & (F.col("image") != "No image")
        ).alias("has_image"),
        F.size(F.split("content", " ")).cast("bigint").alias("word_count"),
        F.size(F.split("content", r"\.")).cast("bigint").alias("sentence_count"),
    )


def silver_from_bronze(bronze: DataFrame) -> DataFrame:
    """Bronze→silver promotion (E1 stage, services/pg_staging.py:184-265):
    validate, clean title/content, parse the raw date, derive id and
    content_length, stamp updated_at — one whole-stage-codegen
    projection instead of the reference's per-row Python loop.

    Rows without a link are dropped (P7 validation); the id is
    re-derived from the link even when present (consumers defensively
    re-derive ids, pipeline/cnn_news_kafka.py:87-93)."""
    from simple_etl_spark.functions.clean import (
        clean_content,
        clean_title,
        content_length,
        gen_id,
        parse_date,
    )

    cleaned_content = clean_content(F.col("content"))
    return (
        bronze.filter(F.col("link").isNotNull() & F.col("content").isNotNull())
        .select(
            gen_id(F.col("link")).alias("id"),
            clean_title(F.col("title")).alias("title"),
            F.col("link"),
            F.col("image"),
            parse_date(F.col("date_raw")).alias("date"),
            F.col("topic"),
            cleaned_content.alias("content"),
            content_length(cleaned_content).alias("content_length"),
            F.col("source"),
            F.col("created_at"),
            F.current_timestamp().alias("updated_at"),
            F.lit(False).alias("processed"),
        )
    )
