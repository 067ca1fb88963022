"""JSON batch ingestion (SURVEY §2.1 S8, §2.8 F16).

The reference's JSONB stored procedures (`init.sql:149-287`
`sp_insert_bronze_lv` / `sp_upsert_silver_lv`: json array →
jsonb_array_elements loop → per-element upsert → (inserted, updated,
errors) tallies) become one declarative plan: parse → explode →
validate-split → keyed merge, with the tallies computed as aggregates
instead of loop counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from simple_etl_spark.operators.merge import upsert_latest_wins


def parse_json_array(
    df: DataFrame, json_col: str, element_schema: StructType
) -> DataFrame:
    """JSON-array column → one typed row per element
    (from_json + explode ≈ jsonb_array_elements)."""
    return (
        df.select(
            F.explode(
                F.from_json(F.col(json_col), ArrayType(element_schema))
            ).alias("e")
        )
        .select("e.*")
    )


def ingest_json_batch(
    existing: DataFrame,
    batch: DataFrame,
    key: str,
    order_col: str,
    required: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """S8 semantics: split invalid rows (missing required fields),
    merge the rest latest-wins. Returns (merged, stats) where stats is
    a 1-row frame (received, valid, errors, inserted, updated) — the
    stored procedure's tally block as aggregates."""
    cond = F.lit(True)
    for c in required:
        cond = cond & F.col(c).isNotNull()
    valid = batch.filter(cond)
    invalid = batch.filter(~cond)

    merged = upsert_latest_wins(existing, valid, [key], order_col)

    received = batch.agg(F.count(F.lit(1)).alias("received"))
    n_valid = valid.agg(F.count(F.lit(1)).alias("valid"))
    n_err = invalid.agg(F.count(F.lit(1)).alias("errors"))
    pre = existing.agg(F.count(F.lit(1)).alias("pre_rows"))
    post = merged.agg(F.count(F.lit(1)).alias("post_rows"))
    stats = (
        received.crossJoin(n_valid)
        .crossJoin(n_err)
        .crossJoin(pre)
        .crossJoin(post)
        .withColumn("inserted", F.col("post_rows") - F.col("pre_rows"))
        .withColumn("updated", F.col("valid") - F.col("inserted"))
    )
    return merged, stats
