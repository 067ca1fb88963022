"""Byte-pair-encoding tokenizer: distributed pair counting for
training, Arrow-batched application.

The textstats module's `bpe_token_count` is a regex approximation for
quality metrics; this is the real algorithm (Sennrich et al. 2016,
the public BPE construction every GPT-family tokenizer descends
from): training greedily merges the most frequent adjacent symbol
pair; application replays the merge list in priority order.

Scale design:
- Training state is the merge list (tiny) plus per-iteration pair
  counts — ONE distributed aggregation per merge over the word-
  frequency relation (|vocab| rows, not |corpus|: counting unique
  words first collapses the corpus, exactly like the reference
  implementation's `get_stats` over a word-count dict). A 100 TB
  corpus trains on its word-frequency table, which is millions of
  rows regardless of corpus size.
- Application rides mapInPandas with an lru-cached per-word encoder:
  natural text re-uses words heavily, so the cache turns per-token
  work into per-distinct-word work within each Arrow batch.
- Ties on pair frequency break lexicographically, so training is
  deterministic on any engine or partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, per the original construction


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace-split lowercased text — the
    corpus-collapsing first step; one shuffle on the word."""
    return (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    max_vocab_rows: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    The corpus is scanned exactly ONCE — the distributed part is the
    word-frequency aggregation, which collapses 100 TB of text to a
    vocabulary-sized relation. The merge loop itself (pair counts →
    argmax → re-segment, with a lexicographic tie-break) runs
    driver-side over that collected vocabulary: per-iteration state is
    |vocab| symbol lists, orders of magnitude below the corpus, and a
    driver loop beats ``n_merges`` Spark jobs on both latency and
    shuffle count.

    ``max_vocab_rows`` is the driver-OOM guard on that collect: a
    pathological corpus (unsegmented text, binary junk) whose collapsed
    vocabulary exceeds the bound fails LOUDLY (reporting the bound as
    a lower bound on the size) instead of OOMing the driver. For legitimately web-scale
    vocabularies, cap the relation first (top-1M words carry >99.9% of
    token mass — ``freqs.orderBy(F.desc("freq")).limit(cap)``) and
    raise the bound deliberately; the merge-quality loss is in the
    tail the cap drops."""
    # guard via limit(bound+1), not count(): one job instead of two,
    # and driver memory is bounded by the cap we already accept
    rows = _word_freqs(df, text_col).limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        # the true size is unknowable from a bounded collect — report
        # the bound as a lower bound rather than pretending to know
        raise ValueError(
            f"collapsed vocabulary has > {max_vocab_rows} rows "
            f"(max_vocab_rows bound); cap the frequency relation "
            "(top-N by freq) or raise the bound deliberately"
        )
    vocab = [(list(r["word"]) + [END], int(r["freq"])) for r in rows]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for symbols, freq in vocab:
            for a, b in zip(symbols, symbols[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab = []
        for symbols, freq in vocab:
            out = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == pair[0]
                    and symbols[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab.append((out, freq))
        vocab = new_vocab
    return merges


def _encoder(merges: list[tuple[str, str]]):
    rank = {pair: i for i, pair in enumerate(merges)}
    from functools import lru_cache

    @lru_cache(maxsize=65536)
    def encode_word(word: str) -> tuple[str, ...]:
        symbols = list(word) + [END]
        while len(symbols) > 1:
            pairs = [
                (rank.get((a, b), 1 << 30), i)
                for i, (a, b) in enumerate(zip(symbols, symbols[1:]))
            ]
            r, i = min(pairs)
            if r == 1 << 30:
                break
            symbols[i : i + 2] = [symbols[i] + symbols[i + 1]]
        return tuple(symbols)

    return encode_word


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a trained merge list: adds ``out_col`` (array<string>) and
    ``{out_col}_count`` (bigint). Arrow-batched mapInPandas with a
    per-executor word cache; the merge table rides in the task closure
    (it is vocabulary-sized, broadcast-friendly).

    Word segmentation happens in the JVM with the SAME expression
    training uses (``split(lower(col), '\\s+')``) — a Python-side
    ``str.split()``/``str.lower()`` would disagree with the trained
    vocabulary on Unicode whitespace (U+00A0 etc.) and a few casing
    code points, silently wasting learned merges on such words."""
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + f", {out_col} array<string>, {out_col}_count bigint"
    )
    tokenized = df.withColumn(
        "_words", F.split(F.lower(F.col(text_col)), r"\s+")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encode_word = _encoder(merges)

        def encode_words(ws) -> list[str]:
            if ws is None:
                return []
            toks: list[str] = []
            for w in ws:
                if w:
                    toks.extend(encode_word(w))
            return toks

        for pdf in batches:
            toks = pdf["_words"].map(encode_words)
            pdf = pdf.drop(columns=["_words"])
            pdf[out_col] = toks
            pdf[f"{out_col}_count"] = toks.map(len).astype("int64")
            yield pdf

    return tokenized.mapInPandas(run, out_schema)
