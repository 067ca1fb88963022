"""Keyed merge/upsert primitives (SURVEY §2.1 S6-S8, §2.3 J4-J5).

The reference's three mutation semantics, re-expressed as pure
DataFrame transforms over immutable tables:

- insert-if-absent  — `ON CONFLICT (id) DO NOTHING`
                      (services/pg_staging.py:140-144)
- latest-wins upsert — `ON CONFLICT (link) DO UPDATE SET ...`
                      (services/staging_pg.py:150-162, init.sql:185-193)
- delete-then-insert — per-parent entity refresh
                      (services/staging_pg.py:253-281)

Each returns the merged relation; `write_merged` persists it with
dynamic partition overwrite so only touched partitions rewrite — the
scale path for incremental loads on a partitioned table (at 100 TB a
merge touching one day rewrites one date partition, not the table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PRIORITY = "__merge_priority"
_ORDER = "__merge_order"


def _keyed_pick(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    order_col: str | None,
    prefer_existing: bool,
) -> DataFrame:
    """Union both sides, keep exactly one row per key.

    Winner: by ``order_col`` descending when given (latest wins), with
    the priority side breaking ties; otherwise purely by side priority.
    One shuffle on the merge keys; map-side the union is free.
    """
    lo, hi = (0, 1) if prefer_existing else (1, 0)
    e = existing.withColumn(_PRIORITY, F.lit(lo))
    i = incoming.withColumn(_PRIORITY, F.lit(hi))
    merged = e.unionByName(i)
    order: list[Column] = []
    if order_col is not None:
        order.append(F.desc_nulls_last(order_col))
    order.append(F.asc(_PRIORITY))
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        merged.withColumn(_ORDER, F.row_number().over(w))
        .filter(F.col(_ORDER) == 1)
        .drop(_ORDER, _PRIORITY)
    )


def insert_if_absent(existing: DataFrame, incoming: DataFrame, keys: list[str]) -> DataFrame:
    """S6: keep the existing row on key conflict; also dedupes the
    incoming batch on the key (first by priority only — deterministic
    because existing rows are unique per key by invariant)."""
    return _keyed_pick(existing, incoming, keys, None, prefer_existing=True)


def upsert_latest_wins(
    existing: DataFrame, incoming: DataFrame, keys: list[str], order_col: str
) -> DataFrame:
    """S7: latest-wins upsert — highest ``order_col`` per key survives,
    incoming beats existing on ties (the reference's DO UPDATE)."""
    return _keyed_pick(existing, incoming, keys, order_col, prefer_existing=False)


def delete_then_insert(
    existing: DataFrame, incoming: DataFrame, parent_keys: list[str]
) -> DataFrame:
    """S8/J5: replace all children of each parent present in the batch —
    left-anti join drops the old rows, union appends the new
    (services/staging_pg.py:253-281)."""
    parents = incoming.select(*parent_keys).distinct()
    kept = existing.join(F.broadcast(parents), parent_keys, "left_anti")
    return kept.unionByName(incoming)


def write_merged(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Persist a merged relation. With ``partition_by`` + the engine's
    ``partitionOverwriteMode=dynamic`` only partitions present in
    ``df`` are rewritten."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def apply_changes(
    changes: DataFrame,
    keys: list[str],
    order_cols: list[str],
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """CDC changelog compaction: given a change feed with an operation
    column (upserts + deletes) and a total per-key ordering, produce
    the final table state — the last change wins, and a last change of
    ``delete_op`` removes the key entirely.

    The standard lakehouse APPLY CHANGES primitive (the reference's
    Postgres layer gets this from row-level DML; a log-structured
    engine must compact). One window over the key partition ordered by
    ``order_cols`` desc — exactly the latest-wins shuffle shape of
    `upsert_latest_wins`, plus the delete filter. ``order_cols``
    must be a total order within each key (e.g. [ts, seq]) or the
    survivor is nondeterministic — pass the tiebreaker explicitly."""
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
    # NULL op is a malformed feed record, not a delete: `op != delete`
    # alone would evaluate NULL and silently DROP the key exactly like
    # a delete — treat NULL as an upsert so bad records never erase
    # state (callers wanting strictness filter/raise upstream)
    survives = F.col(op_col).isNull() | (F.col(op_col) != delete_op)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & survives)
        .drop("_rn")
    )
