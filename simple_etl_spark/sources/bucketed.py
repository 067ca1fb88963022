"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact⋈fact equi-join is shuffling both
sides on the key. When the join key is stable (orders⋈lineitem on
orderkey, events⋈users on user_id), the standard fix is to pay that
shuffle ONCE at write time: `bucketBy(n, key)` hash-partitions rows
into a fixed number of buckets with Spark's own hash, and every later
join or aggregation on the key reads co-located buckets — the plan
shows SortMergeJoin with NO Exchange on either side.

Bucketing needs the session catalog (bucket metadata lives in the
table definition, not the parquet files), so these tables are written
via ``saveAsTable`` rather than the path-based snapshot store —
complementary tools: snapshots for mutate-heavy medallion tables,
buckets for append-mostly join-heavy facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 64,
    sort: bool = True,
    overwrite: bool = False,
) -> None:
    """Write ``df`` as a bucketed (and in-bucket sorted) catalog table.

    ``buckets`` should be sized so one bucket of the LARGEST table
    sharing this key fits an executor's memory at the target scale —
    all tables joined on the key must use the same bucket count, or
    Spark re-shuffles the mismatched side.

    In-bucket sorting makes the downstream SortMergeJoin skip its sort
    as well (plan shows neither Exchange nor Sort).

    Raises ``ValueError`` if ``table`` already exists and ``overwrite``
    is False — a name collision must never silently destroy a catalog
    table (dropping a 100 TB bucketed fact to re-create it costs the
    full write-time shuffle again, on top of the data loss).
    """
    keys = [key] if isinstance(key, str) else list(key)
    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        if not overwrite:
            raise ValueError(
                f"table '{table}' already exists; pass overwrite=True to replace it"
            )
        spark.sql(f"DROP TABLE IF EXISTS `{table.replace('`', '')}`")
    # a crashed/previous run can leave an orphaned managed location
    # (no catalog entry) that saveAsTable refuses to adopt — clear it;
    # safe because any *live* table was handled above
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    This is just ``join`` — the point is the *plan contract*: with both
    sides bucketed identically, Catalyst proves the partitioning
    requirement is already met and elides both Exchanges (asserted in
    tests/test_plans.py). Use for repeated large-fact joins where the
    write-time shuffle amortizes across many queries.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
