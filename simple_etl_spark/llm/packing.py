"""Sequence packing: laying documents into fixed-capacity training
sequences — the step between "curated corpus" and "token stream the
trainer reads".

Two industry-standard layouts:

* **Concat-and-cut** (:func:`pack_concat_cut`) — GPT-style
  pretraining: concatenate documents in a seeded deterministic order
  and cut the token stream every ``capacity`` tokens. No padding at
  all; documents may straddle sequence boundaries. Pure window
  arithmetic (one cumulative sum per shard), fully SQL-expressible,
  engine-exact.
* **Greedy no-split** (:func:`pack_greedy_nosplit`) — instruction/
  finetune-style packing where a document must not be cut: walk the
  shard order once, start a new sequence whenever the next document
  would overflow the current one. A sequential fold (each bin depends
  on every prior row), so it runs as one Arrow pass per shard via
  ``mapInPandas``; pinned against a pure-Python reference in pytest
  rather than a SQL oracle (the recursion is not window-expressible).

Scale shape (both): the permutation machinery is
:func:`~simple_etl_spark.llm.sampling.training_order`'s — md5(seed|key)
digest split into shard and within-shard order, ONE shuffle keyed by
shard, per-shard sort, no global ORDER BY. Each shard's packing is
independent of every other shard's, so the layout parallelizes to any
shard count and is reproducible forever under the same (seed,
n_shards, capacity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simple_etl_spark.llm.sampling import _perm_parts


def _validated(capacity: int, n_shards: int) -> None:
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")


def _check_reserved(df: DataFrame, reserved: set[str]) -> None:
    """Output/working column names must not exist on the input —
    silent clobbering is a bug, never an update (incl. the transient
    ``order_key``, which would otherwise be overwritten and then
    dropped without a trace)."""
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input already carries output column(s) {sorted(clash)}"
        )


def pack_concat_cut(
    df: DataFrame,
    token_col: str,
    key_col: str,
    capacity: int,
    seed: str | int = 0,
    n_shards: int = 16,
) -> DataFrame:
    """Concat-and-cut packing: per shard, documents are laid head to
    tail in the seeded order and the stream is cut every ``capacity``
    tokens. Adds:

    * ``shard`` / ``pos`` — the training_order permutation.
    * ``start_tok`` — 0-based offset of the document's first token in
      its shard's stream (the running sum of prior docs' tokens).
    * ``first_seq`` / ``last_seq`` — 0-based sequence indices the
      document lands in (``last_seq > first_seq`` ⇔ the document
      straddles a cut).
    * ``n_seqs`` — sequences spanned (``last_seq - first_seq + 1``).
    * ``tok_packed`` — the clamped token count actually laid out
      (``greatest(coalesce(tokens, 0), 0)``), which
      :func:`pack_manifest` needs to slice documents into sequences.

    NULL or negative token counts count as 0 (a 0-token document
    occupies no stream space; it reports the sequence its offset sits
    in). All arithmetic is non-negative bigint — ``div`` truncation ≡
    floor on both engines, so the layout is engine-bit-identical.

    At 100 TB this IS the writer plan for packed pretraining shards:
    the cumulative sum is one window per shard partition, and a
    downstream writer that needs physical sequences explodes
    ``first_seq..last_seq`` per document — output-sized, no extra
    shuffle."""
    _validated(capacity, n_shards)
    _check_reserved(
        df, {"shard", "pos", "start_tok", "first_seq", "last_seq", "n_seqs",
             "tok_packed", "order_key", "_tok"}
    )
    shard, order_key = _perm_parts(key_col, seed, n_shards)
    tok = F.greatest(F.coalesce(F.col(token_col).cast("bigint"), F.lit(0)), F.lit(0))
    w = Window.partitionBy("shard").orderBy("order_key", key_col)
    cum = F.sum("_tok").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # last occupied token index: start + max(tok,1) - 1 stays >= 0, so
    # truncating div == floor div on every engine (a raw cum-1 could
    # go negative for a 0-token doc at offset 0, where Spark's div
    # truncates toward zero but SQL '//' floors)
    return (
        df.withColumn("shard", shard)
        .withColumn("order_key", order_key)
        .withColumn("_tok", tok)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .withColumn("start_tok", cum - F.col("_tok"))
        .withColumn("first_seq", F.expr(f"start_tok div {capacity}"))
        .withColumn(
            "last_seq",
            F.expr(f"(start_tok + greatest(_tok, 1) - 1) div {capacity}"),
        )
        .withColumn("n_seqs", F.col("last_seq") - F.col("first_seq") + F.lit(1))
        .withColumnRenamed("_tok", "tok_packed")
        .drop("order_key")
    )


def pack_greedy_nosplit(
    df: DataFrame,
    token_col: str,
    key_col: str,
    capacity: int,
    seed: str | int = 0,
    n_shards: int = 16,
) -> DataFrame:
    """Greedy next-fit no-split packing: walk the shard's seeded
    order once; a document opens a new sequence iff adding it would
    push the CURRENT sequence past ``capacity`` (next-fit, not
    first-fit: earlier sequences with remaining room are never
    revisited — one open bin, O(1) state). Documents larger than
    ``capacity`` get a sequence of their own, flagged ``overflow``
    (the caller decides to truncate, chunk — see
    :func:`~simple_etl_spark.llm.textstats.chunk_documents` — or
    drop). Adds ``shard``, ``pos``, ``seq`` (0-based within shard),
    ``seq_fill`` (tokens in the sequence after placing this doc) and
    ``overflow``.

    The fold is sequential by construction (bin state threads through
    every row), so each shard packs in one Arrow batch stream via
    ``mapInPandas`` — per-shard state is two ints, memory is
    O(batch), and the caller's columns ride THROUGH the fold (no
    rejoin: the layout costs exactly ONE shuffle, the shard
    repartition — so NULL or duplicate keys pass through like any
    other row). Determinism: the walk order is the md5 permutation,
    independent of partitioning; pinned against a pure-Python fold in
    pytest. Rows sharing a key value (or with NULL keys) share a
    digest, so only their RELATIVE order — and hence their pos/seq —
    is unpinned; unique keys, the documented contract of every
    permutation op here, make the full layout deterministic. NULL/negative token counts count as 0, like
    :func:`pack_concat_cut`; the clamped count is exposed as
    ``tokens_packed``. The input must not already carry the output
    column names (``tokens_packed``, ``shard``, ``pos``, ``seq``,
    ``seq_fill``, ``overflow``)."""
    _validated(capacity, n_shards)
    _check_reserved(
        df, {"tokens_packed", "shard", "pos", "seq", "seq_fill", "overflow",
             "order_key"}
    )
    shard, order_key = _perm_parts(key_col, seed, n_shards)
    prepared = (
        df.withColumn(
            "tokens_packed",
            F.greatest(
                F.coalesce(F.col(token_col).cast("bigint"), F.lit(0)), F.lit(0)
            ),
        )
        .withColumn("shard", shard)
        .withColumn("order_key", order_key)
        # one partition per shard so the fold sees each shard's rows
        # as a single ordered stream (repartition by the fold key,
        # sort within; the projection after the sort is narrow —
        # order is preserved)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "order_key", key_col)
        .drop("order_key")
    )
    from pyspark.sql.types import (
        BooleanType, LongType, StructField, StructType,
    )

    out_schema = StructType(
        prepared.schema.fields
        + [
            StructField("pos", LongType()),
            StructField("seq", LongType()),
            StructField("seq_fill", LongType()),
            StructField("overflow", BooleanType()),
        ]
    )

    def _fold(pdf_iter):
        # rows arrive shard-sorted; two-int state resets at shard
        # change and persists across Arrow batches within a partition
        cur_shard = None
        seq = fill = pos = 0
        for pdf in pdf_iter:
            pos_l, seq_l, fill_l, of_l = [], [], [], []
            for sh, t in zip(pdf["shard"], pdf["tokens_packed"]):
                if sh != cur_shard:
                    cur_shard, seq, fill, pos = sh, 0, 0, 0
                pos += 1
                t = int(t)
                if pos == 1:
                    fill = t
                elif fill + t > capacity:
                    seq += 1
                    fill = t
                else:
                    fill += t
                pos_l.append(pos)
                seq_l.append(seq)
                fill_l.append(fill)
                of_l.append(t > capacity)
            out = pdf.copy()
            out["pos"], out["seq"] = pos_l, seq_l
            out["seq_fill"], out["overflow"] = fill_l, of_l
            yield out

    return prepared.mapInPandas(_fold, out_schema)


def pack_manifest(packed: DataFrame, capacity: int) -> DataFrame:
    """The loader-side view of a :func:`pack_concat_cut` layout: one
    row per (document, sequence) intersection, with the half-open
    token slice ``[from_tok, to_tok)`` of the DOCUMENT that lands in
    that sequence — exactly what a packed-pretraining data loader
    materializes per training sequence (read the manifest rows of a
    (shard, seq), concatenate the slices, get precisely ``capacity``
    tokens, boundary-straddling documents split across rows).

    ``packed`` is pack_concat_cut's output (needs ``shard``, ``pos``,
    ``start_tok``, ``first_seq``, ``last_seq``, ``tok_packed`` and the
    caller's key column). Zero-token documents contribute no slices
    and are dropped. Every sequence's slice lengths sum to exactly
    ``capacity`` except each shard's final partial sequence (tested).

    Scale shape: a per-row explode of ``first_seq..last_seq`` — sized
    by the output manifest itself (a document adds one row per
    sequence it touches, almost always 1-2), no shuffle beyond the
    layout's own."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    return (
        packed.filter(F.col("tok_packed") >= 1)
        .withColumn(
            "seq", F.explode(F.sequence(F.col("first_seq"), F.col("last_seq")))
        )
        .withColumn(
            "from_tok",
            F.greatest(F.col("seq") * F.lit(capacity) - F.col("start_tok"),
                       F.lit(0)),
        )
        .withColumn(
            "to_tok",
            F.least(
                (F.col("seq") + F.lit(1)) * F.lit(capacity)
                - F.col("start_tok"),
                F.col("tok_packed"),
            ),
        )
        .withColumn("from_tok", F.col("from_tok").cast("bigint"))
        .withColumn("to_tok", F.col("to_tok").cast("bigint"))
    )
