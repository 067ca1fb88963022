"""Distributed prefix sum — global running totals without a global sort.

Spark has no scalable cumulative sum: a window with a bare ORDER BY
funnels the whole relation through ONE task. The classical fix (the
same two-phase scheme zipWithIndex uses for ids) is implemented here
as a pure DataFrame program:

1. within-bucket cumsum — a keyed window over a deterministic bucket
   column (shuffle on the bucket, per-bucket sort),
2. bucket offsets — per-bucket totals (tiny: |buckets| rows) given a
   cumulative sum by an unpartitioned window that is SAFE because its
   input is the bounded bucket frame, then broadcast back,
3. global = within + offset of all preceding buckets.

The global order is (bucket, *order_cols) — any deterministic bucket
function works as long as the caller treats that composite as the
order. The md5 bucket used by :func:`shard_packing` makes the order a
pure content function: same corpus → same prefix sums on any engine,
any partition layout.

Primary consumer: token-budget shard packing for training-data
serialization (each output shard holds a contiguous run of the hash
order totalling ≤ budget tokens, overflowing by at most one document
— split oversized docs upstream with textstats.chunk_documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simple_etl_spark.engine import Catalog
from simple_etl_spark.llm.textstats import bpe_token_count
from simple_etl_spark.queries import query


def distributed_cumsum(
    df: DataFrame,
    value_col: str,
    bucket_col: str,
    order_cols: list[str],
    out_col: str = "cum",
) -> DataFrame:
    """Running total of ``value_col`` in (bucket, *order_cols) order,
    computed with NO unbounded-parallelism loss: the only
    unpartitioned window runs over the |buckets|-row totals frame."""
    w_in = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = df.withColumn("_cum_in", F.sum(value_col).over(w_in))
    totals = df.groupBy(bucket_col).agg(F.sum(value_col).alias("_tot"))
    w_off = Window.orderBy(bucket_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        bucket_col,
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        within.join(F.broadcast(offsets), bucket_col)
        .withColumn(out_col, (F.col("_cum_in") + F.col("_off")).cast("long"))
        .drop("_cum_in", "_off")
    )


def shard_packing(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    buckets: int = 32,
) -> DataFrame:
    """Assign each row to a token-budget shard: rows are laid out in
    md5 order (content-deterministic, engine-independent), prefix
    sums computed via :func:`distributed_cumsum`, and a row's shard is
    the budget block its START offset falls in — shards are contiguous
    runs of ≤ budget tokens plus at most one overflowing row."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    h = F.md5(F.col(id_col).cast("string"))
    laid = df.select(
        F.col(id_col),
        F.col(tokens_col),
        h.alias("_h"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % buckets).alias(
            "_b"
        ),
    )
    cum = distributed_cumsum(laid, tokens_col, "_b", ["_h", id_col], "cum_tokens")
    # Exact integer floor division (the repo's exactness discipline:
    # never route exact longs through doubles — long/int promotes to
    # double and start offsets past 2^53 tokens could floor across a
    # budget boundary). Subtracting the remainder first makes the
    # numerator an exact multiple, and the decimal division of exact
    # integers has a zero fractional part — no rounding anywhere.
    start = F.col("cum_tokens") - F.col(tokens_col)
    shard = (
        (start - F.pmod(start, F.lit(budget))).cast("decimal(38,0)")
        / F.lit(budget)
    ).cast("bigint")
    return cum.select(id_col, tokens_col, "cum_tokens", shard.alias("shard"))


@query(
    "llm_shard_packing",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               cast(len(regexp_extract_all(text,
                   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) as bigint) AS n_tokens,
               md5(cast(doc_id as varchar)) AS h,
               ('0x' || substr(md5(cast(doc_id as varchar)), 1, 4))::bigint % 32
                   AS bucket
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               cast(sum(n_tokens) OVER (ORDER BY bucket, h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
                   AS cum_tokens
        FROM t
    )
    SELECT doc_id, n_tokens, cum_tokens,
           cast((cum_tokens - n_tokens) // 4096 as bigint) AS shard
    FROM c
    ORDER BY doc_id
    """,
    survey="LLM curation: token-budget shard packing via distributed "
    "prefix sum (two-phase — the oracle's single global window is the "
    "scale anti-pattern the operator exists to avoid)",
)
def llm_shard_packing(cat: Catalog) -> DataFrame:
    """Pack documents into 4096-token shards along the md5 layout.
    The oracle computes the same prefix sums with one global window —
    correct-but-serial; the operator's two-phase plan keeps every
    fact-scale stage keyed and pushes the unpartitioned window onto
    the 32-row bucket-totals frame (plan-tested)."""
    docs = cat["documents"].select(
        "doc_id", bpe_token_count(F.col("text")).alias("n_tokens")
    )
    return shard_packing(docs, "doc_id", "n_tokens", budget=4096, buckets=32).orderBy(
        "doc_id"
    )
