"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting — all Column expressions (JVM-side,
codegen), designed to run as one projection pass over a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword-hit
# language heuristic (the mechanism; real deployments swap lexicons).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _words(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def whitespace_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(_words(c)).cast("bigint")


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-style pre-tokens via regexp_extract_all."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_REGEX), F.lit(0))).cast("bigint")


def stopword_hits(col: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens are in the marker set — array_size of the
    intersection-with-duplicates via filter()."""
    return F.size(
        F.filter(_words(col), lambda w: w.isin(*markers))
    ).cast("bigint")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, token counts, punctuation ratio,
    stopword ratio, and the resulting keep/drop flag (Gopher-style
    length + stopword heuristics)."""
    c = F.col(text_col)
    n_chars = F.length(c).cast("bigint")
    n_tokens = whitespace_token_count(c)
    punct = F.size(
        F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0))
    ).cast("bigint")
    stops = stopword_hits(c, LANG_MARKERS["en"])
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "bpe_tokens": bpe_token_count(c),
            # explicit double casts: a bare 1.0 literal is DECIMAL in
            # some SQL dialects, which would change the division type
            "punct_ratio": punct.cast("double") / n_chars,
            "stopword_ratio": stops.cast("double") / n_tokens,
            "is_quality": (n_tokens >= 10) & (n_chars >= 50),
        }
    )


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: stopword-marker hit counts per language,
    argmax with deterministic (alphabetical) tie-break, 'und' when no
    marker hits at all."""
    c = F.col(text_col)
    out = df
    for lang in sorted(LANG_MARKERS):
        out = out.withColumn(f"hits_{lang}", stopword_hits(c, LANG_MARKERS[lang]))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.lit("und")
    # reversed so the alphabetically-first language wins ties
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(F.col(f"hits_{lang}") == best, lang).otherwise(pred)
    return out.withColumn("predicted_lang", F.when(best > 0, pred).otherwise("und"))


def doc_fingerprint(col: Column | str) -> Column:
    """Normalization-stable fingerprint: md5 over lowercased,
    whitespace-collapsed text (rolling-hash stand-in; md5 keeps it
    oracle-reproducible)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher/C4 filter family):
    duplicate-word fraction, most-frequent-word fraction,
    most-frequent-bigram fraction, and the resulting flag.

    Unlike the single-projection ops above, repetition needs per-token
    frequencies, so it is expressed *relationally* — explode →
    two-level aggregation — rather than as per-row array expressions:
    counting each token against the whole document inside a transform()
    would be O(len²) codegen per row, while the explode plan is two
    map-side-combined shuffles keyed (id, token) then (id), linear in
    corpus size and exactly the shape that survives 100 TB.

    Every exposed fraction is a single IEEE double division (or one
    division plus one subtraction) of exact bigint counts —
    deterministic on any engine; no accumulation in floating point.
    Documents with a single word have no bigram; their bigram fraction
    is NULL (and cannot set the flag).

    The top-word rule only applies from 20 words up: a frequency
    threshold is meaningless on short documents (an all-distinct
    5-word doc already sits at 0.2), which is why the Gopher-family
    filters pair repetition signals with a minimum length. The
    duplicate-word rule applies at any length — half the tokens
    repeating is degenerate no matter how short the text."""
    words = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    wc = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    wstats = wc.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("distinct_words"),
        F.max("c").alias("top_word_count"),
    )

    from simple_etl_spark.llm.dedup import shingles

    grams = df.select(
        F.col(id_col),
        F.explode(shingles(F.lower(F.col(text_col)), 2)).alias("g"),
    )
    gc = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    gstats = gc.groupBy(id_col).agg(F.max("c").alias("top_bigram_count"))

    n = F.col("n_words").cast("double")
    top_word_frac = F.col("top_word_count").cast("double") / n
    dup_word_frac = F.lit(1.0).cast("double") - (
        F.col("distinct_words").cast("double") / n
    )
    top_bigram_frac = F.col("top_bigram_count").cast("double") / (
        n - F.lit(1.0).cast("double")
    )
    return (
        wstats.join(gstats, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_words"),
            F.col("distinct_words"),
            dup_word_frac.alias("dup_word_frac"),
            top_word_frac.alias("top_word_frac"),
            top_bigram_frac.alias("top_bigram_frac"),
            (
                ((F.col("n_words") >= F.lit(20)) & (top_word_frac > F.lit(0.12)))
                | (dup_word_frac > F.lit(0.5))
            ).alias("is_repetitive"),
        )
    )
