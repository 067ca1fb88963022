"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting — all Column expressions (JVM-side,
codegen), designed to run as one projection pass over a 100 TB corpus.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
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


def normalized_text(col: Column | str) -> Column:
    """THE dedup-tier text normalization: lower → collapse whitespace
    runs to one space → trim. Every operator whose verdicts must
    compose with the exact-dedup tier (doc_fingerprint, shingling,
    prefix_duplicates) builds on this one expression — keep them on
    this helper so the byte-identical-normalization guarantee can't
    drift copy by copy. (The NFC variant is normalized_fingerprint's,
    deliberately separate.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def doc_fingerprint(col: Column | str) -> Column:
    """Normalization-stable fingerprint: md5 over lowercased,
    whitespace-collapsed text (rolling-hash stand-in; md5 keeps it
    oracle-reproducible)."""
    return F.md5(normalized_text(col))


def vocabulary(
    df: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """Corpus vocabulary head: the ``top_n`` most frequent words with
    rank and cumulative coverage fraction — the sizing pass run before
    tokenizer/vocab training ("how many tokens cover 95% of the
    corpus?").

    Scale shape: explode → one map-side-combined count shuffle on the
    word, then ``orderBy().limit(top_n)`` (TakeOrderedAndProject — no
    global sort materializes) and the ranking/cumulative window runs
    over the *top-N aggregated rows only*, honoring the engine's
    post-agg contract for unpartitioned windows. The corpus total
    rides in as a broadcast 1-row aggregate. Coverage is one IEEE
    division of exact bigint counts per row — engine-deterministic."""
    words = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = wc.agg(F.sum("cnt").alias("total"))
    top = wc.orderBy(F.desc("cnt"), F.asc("w")).limit(top_n)
    from pyspark.sql.window import Window

    rank_w = Window.orderBy(F.desc("cnt"), F.asc("w"))
    cum_w = rank_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.col("w").alias("word"),
            F.col("cnt"),
            F.row_number().over(rank_w).cast("bigint").alias("rank"),
            (
                F.sum("cnt").over(cum_w).cast("double")
                / F.col("total").cast("double")
            ).alias("coverage"),
        )
    )


def distinctive_terms(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    top_n: int = 10,
) -> DataFrame:
    """Per-group distinctive vocabulary (TF-IDF family): for each
    group (language, domain, source) the ``top_n`` terms by term
    frequency, rarest-across-groups first — the corpus-profiling pass
    behind domain classification and mixture diagnostics.

    Numeric discipline on display: the *ranking* uses only exact
    integer keys (tf desc, group-df asc, term) so the selected row
    set is identical on any engine — a rank over the float TF-IDF
    score could flip on cross-engine ulps. The score itself is
    exposed quantized to decimal(18,6) per the engine's
    double-derived-exposure rule (ln() is IEEE arithmetic;
    tests/test_float_lineage.py would fail this query at a finer
    scale). Plan: one (group, term) count shuffle, a term-keyed df
    count over the *aggregated* tf relation (not the corpus), and the
    ranking window per group."""
    words = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    tf = words.groupBy("grp", "w").agg(F.count(F.lit(1)).alias("tf"))
    gdf = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    ngroups = tf.select("grp").distinct().agg(F.count(F.lit(1)).alias("n_groups"))

    from pyspark.sql.window import Window

    w_rank = Window.partitionBy("grp").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("w")
    )
    return (
        tf.join(gdf, "w")
        .crossJoin(F.broadcast(ngroups))
        .withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rnk") <= top_n)
        .select(
            F.col("grp").alias(group_col),
            F.col("w").alias("word"),
            "tf",
            "df",
            "rnk",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_groups").cast("double") / F.col("df").cast("double"))
            )
            .cast("decimal(18,6)")
            .alias("tfidf_q"),
        )
    )


# PII surface patterns, deliberately restricted to syntax whose
# semantics are identical in Java regex (Spark) and RE2 (most SQL
# engines): character classes, bounded quantifiers, \b — no
# lookaround, no backreferences. Replacement order is fixed
# (email → phone → ipv4); with these shapes no pattern can match
# inside another's replacement token.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub surface-level PII (emails, NANP-style phone numbers,
    IPv4 addresses) from a text column before it can enter a training
    set, and count what was removed per type.

    Adds ``n_email`` / ``n_phone`` / ``n_ipv4`` (counts over the
    original text) and ``redacted`` (the text with each match replaced
    by its ``<TYPE>`` token). Pure Column expressions — one codegen
    projection over the scan, shuffle-free at any corpus size. This is
    the pattern-matching tier of PII removal; entity-model-based
    scrubbing rides the same mapInPandas lane as the NER operator."""
    c = F.col(text_col)
    out = df
    red = c
    for name, pat in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("bigint"),
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return out.withColumn("redacted", red)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into fixed-size training chunks of
    ``chunk_tokens`` whitespace tokens with ``overlap`` tokens shared
    between consecutive chunks — the sequence-packing step every LLM
    data pipeline runs before tokenization.

    Chunk starts are the arithmetic ladder 1, 1+stride, … (stride =
    chunk − overlap) up to ``max(1, n − overlap)``, so every token is
    covered, the final chunk simply runs short, and a document shorter
    than one chunk still yields exactly one chunk. Everything is
    array-expression codegen — ``split`` once, ``sequence`` +
    ``explode`` for the starts, ``slice`` per chunk — so the operator
    is a single projection + generate over the corpus scan: no
    shuffle at all; at 100 TB it streams.

    Output: one row per chunk with ``start_word`` (1-based),
    ``n_tokens``, the chunk text, and its md5 (the id used when
    chunks feed the dedup operators downstream)."""
    if overlap < 0 or chunk_tokens <= overlap:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), n - F.lit(overlap)), F.lit(stride)
    )
    chunked = df.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(starts).alias("start_word"),
    ).select(
        F.col(id_col),
        F.col("start_word").cast("bigint").alias("start_word"),
        F.array_join(
            F.slice(F.split(F.col(text_col), " "), F.col("start_word"), chunk_tokens),
            " ",
        ).alias("chunk_text"),
    )
    return chunked.select(
        id_col,
        "start_word",
        F.size(F.split(F.col("chunk_text"), " ")).cast("bigint").alias("n_tokens"),
        "chunk_text",
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    )


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

    # lower(text) staged before shingling: shingles() references its
    # input several times per row (r14, the word_ngrams lesson)
    grams = df.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("_lt")
    ).select(
        F.col(id_col),
        F.explode(shingles(F.col("_lt"), 2)).alias("g"),
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


# ---------------------------------------------------------------------------
# N-gram language-model quality scoring (the CCNet/KenLM family, fully
# relational): train bigram counts on a reference corpus, score each
# candidate document by its average smoothed log-probability. Low
# scores = text unlike the reference (boilerplate, garble, wrong
# language) — the classic perplexity-style training-data filter,
# here with no model binary: the LM IS a count relation.
# ---------------------------------------------------------------------------


def _word_bigrams(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """(ids..., w1, w2) rows — adjacent word pairs via the shifted-array
    zip (one projection + generate, no per-gram indexing)."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    pairs = F.zip_with(
        words,
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = F.slice(pairs, 1, F.greatest(F.size(words) - 1, F.lit(0)))
    return df.select(
        *id_cols, F.explode(pairs).alias("_bg")
    ).select(*id_cols, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))


def bigram_lm(
    train: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the count model: (unigram counts, bigram counts, vocab
    size as a LAZY 1-row frame).

    Two grouped aggregations over the reference corpus — at 100 TB the
    reference set is a curated slice (e.g. one language's wiki), so
    the count relations are vocabulary-sized and broadcast-friendly;
    scoring joins against them by word key either way. |vocab| stays a
    deferred aggregate (not an eager .count()) so merely CONSTRUCTING
    a scoring plan runs no Spark job and the reference slice is
    scanned once, when the scored frame's action fires."""
    uni = (
        train.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w1")
        )
        .filter(F.col("w1") != "")
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        _word_bigrams(train, [], text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("_vs"))
    return uni, bi, vocab


def lm_score(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document average add-one-smoothed bigram log-probability:
    mean over the doc's bigrams of ln((c12+1)/(c1+V)), with c=0 for
    unseen grams/contexts.

    Shape: explode the doc bigrams once, LEFT-join the two count
    relations (broadcast when vocabulary-sized), one ln per row inside
    codegen, then a per-doc aggregation. Engine determinism: each
    per-bigram log quantizes to 6 dp before the EXACT decimal sum, so
    ln's last-ulp engine drift can never reach the exposed average
    (same contract as every transcendental-derived score here)."""
    bg = _word_bigrams(docs, [id_col], text_col)
    scored = (
        bg.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(uni), ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_logp",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1.0))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("_vs"))
            ).cast("decimal(18,6)"),
        )
    )
    # expose the EXACT decimal sum + count, not the average: a scale-6
    # sum divided by a small integer lands exactly on scale-7 half-
    # boundaries systematically (e.g. -63.387063/18 = -3.5215035), and
    # engines disagree on double→decimal tie rounding there — the
    # derived avg is one division away for any consumer, and ranking
    # by (sum/n) ≡ ranking by the pair
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_logp").cast("decimal(18,6)").alias("sum_logprob"),
        )
    )


def pseudonymize_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "pseudo_text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Consistent pseudonymization: every PII match is replaced by a
    surrogate DERIVED from the match text — ``<email:3f2a…>`` — so the
    same address maps to the same token in every document and every
    run, preserving referential structure (who-talks-to-whom, repeated
    contact fields) that :func:`redact_pii`'s flat ``<EMAIL>`` token
    destroys, while still removing the identifier itself.

    Surrogates are md5-prefixed (10 hex chars) — deterministic with no
    key material; deployments needing reversibility or collision
    margins swap in an HMAC with a managed key, same signature.

    Per-match computed replacement is beyond regexp_replace, so this
    is an Arrow-batched ``mapInPandas`` pass (one regex sweep per
    pattern per batch; the replacement callable hits a per-executor
    cache since PII values repeat heavily in real corpora)."""
    import hashlib
    import re as _re
    from collections.abc import Iterator as _It

    import pandas as _pd

    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + f", {out_col} string"
    )
    compiled = [(kind, _re.compile(pat)) for kind, pat in patterns]

    def run(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        # keyed by (kind, text): with caller-supplied overlapping
        # patterns the same literal may match under two kinds, and a
        # text-only cache would reuse the first kind's typed token
        cache: dict[tuple[str, str], str] = {}

        def surrogate(kind: str, m: _re.Match) -> str:
            key = (kind, m.group(0))
            tok = cache.get(key)
            if tok is None:
                tok = f"<{kind}:{hashlib.md5(key[1].encode()).hexdigest()[:10]}>"
                cache[key] = tok
            return tok

        def scrub(t) -> str | None:
            if t is None:
                return None
            s = str(t)
            for kind, rx in compiled:
                s = rx.sub(lambda m, k=kind: surrogate(k, m), s)
            return s

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(scrub)
            yield pdf

    return df.mapInPandas(run, out_schema)


_NFC_UDF = None  # lazily built: pandas_udf needs an active session


def _nfc_udf():
    global _NFC_UDF
    if _NFC_UDF is None:

        @F.pandas_udf("string")
        def _nfc(s: pd.Series) -> pd.Series:
            return s.map(
                lambda x: unicodedata.normalize("NFC", x)
                if x is not None
                else None
            )

        _NFC_UDF = _nfc
    return _NFC_UDF


def nfc_normalize(col: Column | str) -> Column:
    """Unicode NFC normalization — the canonicalization every hashing
    op should see first: composed ('é') and decomposed ('e' + U+0301)
    spellings of the same text hash differently, so un-normalized
    corpora leak duplicates straight past exact and MinHash dedup.

    Spark has no built-in normalizer, so this is an Arrow-batched
    pandas UDF over stdlib ``unicodedata`` (the vectorized lane —
    never a row-at-a-time Python UDF). NFC is a stable, engine-
    independent mapping (Unicode normalization is versioned and
    stability-guaranteed), and DuckDB's ``nfc_normalize`` reproduces
    it — parity-tested in llm_nfc_fingerprint. NULLs pass through."""
    c = F.col(col) if isinstance(col, str) else col
    return _nfc_udf()(c)


def normalized_fingerprint(col: Column | str) -> Column:
    """:func:`doc_fingerprint` over NFC-normalized text — the dedup
    key to use on corpora that mix input methods/encoders (the
    composed-vs-decomposed dupes collapse to one key). Kept separate
    from doc_fingerprint so existing stores keyed on the un-normalized
    fingerprint stay valid."""
    c = F.col(col) if isinstance(col, str) else col
    return doc_fingerprint(nfc_normalize(c))


def oov_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 500,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's OWN
    top-``top_n`` word vocabulary — the lexical-coverage screen run
    before committing to a tokenizer vocab size ("which documents are
    mostly words the vocabulary head doesn't cover?" — OCR noise,
    code, foreign-language contamination all light up here).

    Word basis is :func:`vocabulary`'s (lowercase, single-space split,
    empties dropped), so the two reports compose. Returns one row per
    input document: (id, n_words, n_oov, oov_permille) with
    ``oov_permille = (n_oov·1000) div max(n_words, 1)`` — integral
    permille, engine-exact. Wordless documents (empty/NULL text)
    report (0, 0, 0) via the closing left join.

    Scale shape: one explode → map-side-combined word count for the
    vocabulary (TakeOrderedAndProject for the head), the head is
    |vocab|-sized and BROADCAST against the exploded corpus (no
    shuffle on the fact side beyond the per-doc rollup), then one
    keyed aggregation on the doc id. The vocabulary tie-break
    (count desc, word asc) is total, so the head — and therefore
    every count — is deterministic on any engine."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    words = df.select(
        F.col(id_col).alias("_oid"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
    ).filter(F.col("w") != "")
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(top_n)
        .select(F.col("w").alias("_vw"))
    )
    per = (
        words.join(F.broadcast(vocab), words["w"] == vocab["_vw"], "left")
        .groupBy("_oid")
        .agg(
            F.count(F.lit(1)).alias("_nw"),
            F.sum(F.when(F.col("_vw").isNull(), 1).otherwise(0)).alias("_no"),
        )
    )
    return (
        df.select(F.col(id_col).alias("_oid"))
        .join(per, "_oid", "left")
        .select(
            F.col("_oid").alias(id_col),
            F.coalesce("_nw", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("_no", F.lit(0)).cast("bigint").alias("n_oov"),
            F.expr(
                "(coalesce(_no, 0) * 1000) div greatest(coalesce(_nw, 0), 1)"
            ).cast("bigint").alias("oov_permille"),
        )
    )


def word_ngrams(
    df: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(ids..., ngram) rows — every adjacent ``n``-word phrase of the
    lowercased whitespace-split text, one output row per occurrence
    (not deduplicated). Documents shorter than ``n`` words contribute
    nothing. Generalizes the :func:`_word_bigrams` shifted-array trick
    through a transform-over-sequence projection: one array build +
    one explode per document, no per-gram re-tokenization.

    ``sequence(1, m)`` DESCENDS when m < 1 (Spark yields [1, 0]), so
    the gram list is explicitly emptied for short documents instead of
    trusting the range to be empty. Empty/whitespace-only text splits
    to the [''] artifact — size 1, which at n=1 would emit a phantom
    '' gram — so that shape is excluded explicitly too.

    The words array is materialized as its OWN projection before the
    transform: a HOF lambda that captures the raw ``split(lower(text))``
    *expression* re-evaluates it per element (no common-subexpression
    elimination inside a projection — the same trap documented on
    :func:`~simple_etl_spark.llm.dedup.winnow_fingerprints`), which
    turned the gram build into O(positions × tokenize). Measured at
    sf0.1: gram construction 2.03 s → 0.29 s, full
    :func:`hot_ngrams` 3.06 s → 0.76 s, identical output (r14)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    wdf = df.select(*id_cols, _words(F.lower(F.col(text_col))).alias("_w"))
    words = F.col("_w")
    m = F.size(words) - F.lit(n - 1)
    grams = F.when(
        (m >= 1) & (words != F.array(F.lit(""))),
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return wdf.select(*id_cols, F.explode(grams).alias("ngram"))


def hot_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 50,
    min_df: int = 2,
) -> DataFrame:
    """Corpus-wide frequent-phrase discovery: the ``top_k`` word
    ``n``-grams by DOCUMENT frequency, with total occurrence counts
    and an integral document-frequency permille. This is the
    discovery step that FEEDS phrase/boilerplate removal (dedup.py's
    boilerplate pass removes known-bad *lines*; this finds the
    repeated phrases worth reviewing in the first place — licence
    blurbs, cookie banners, SEO padding).

    Returns (ngram, doc_freq, occurrences, df_permille) ordered by
    (doc_freq desc, occurrences desc, ngram asc) — a total order, so
    the LIMIT head is deterministic on any engine. ``df_permille =
    doc_freq·1000 div n_docs`` is integral division over bigints:
    engine-exact, no IEEE lineage.

    Scale shape: one explode, then TWO keyed aggregations that both
    map-side combine — (doc, ngram) pairs collapse inside their input
    partition before the first shuffle (each document lives in one
    partition, so the shuffle carries per-document phrase counts, not
    raw gram rows), and the second collapses per-phrase across
    documents. The corpus total is a broadcast 1-row aggregate
    (scalar-subquery pattern) and the head is TakeOrderedAndProject —
    no global sort materializes."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    per_doc = (
        word_ngrams(df, [id_col], text_col, n)
        .groupBy(id_col, "ngram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    agg = per_doc.groupBy("ngram").agg(
        F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
        F.sum("_c").cast("bigint").alias("occurrences"),
    )
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("_n_docs"))
    return (
        agg.filter(F.col("doc_freq") >= F.lit(min_df))
        .crossJoin(F.broadcast(total))
        .select(
            "ngram",
            "doc_freq",
            "occurrences",
            F.expr("(doc_freq * 1000) div _n_docs")
            .cast("bigint")
            .alias("df_permille"),
        )
        .orderBy(F.desc("doc_freq"), F.desc("occurrences"), F.asc("ngram"))
        .limit(top_k)
    )


def token_fertility(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Per-group token economics — the numbers a mixture designer
    reads before fixing a tokenizer or a sampling temperature: how
    many characters buy one BPE pre-token in each (source, lang)
    stratum, and how many pre-tokens each whitespace word splinters
    into (fertility; high = the tokenizer fragments this stratum's
    script, so its token budget buys fewer words).

    Returns one row per group: n_docs, total_chars, total_ws_tokens,
    total_bpe_tokens, chars_per_bpe_permille (= chars·1000 div bpe),
    bpe_per_ws_permille (= bpe·1000 div ws). Ratios are integral
    permille over bigint sums — engine-exact — and NULL when the
    denominator is zero (nullif), never a fake 0. NULL texts count
    toward n_docs but contribute NULL to every sum (skipped), the
    same contract as the SQL twin. Empty/whitespace-only texts
    contribute 0 whitespace tokens, not the phantom 1 the ['']
    split artifact would count — so an all-empty stratum's
    denominators really are zero and its ratios really are NULL.

    Scale shape: ONE codegen projection (length + two regex token
    counts) feeding one keyed aggregation with map-side combine; the
    group key is |sources|×|langs|-sized, so the shuffle is tiny
    regardless of corpus size."""
    c = F.col(text_col)
    ws = (
        F.when(F.length(F.trim(c)) == 0, F.lit(0))
        .otherwise(whitespace_token_count(c))
        .cast("bigint")
    )
    grouped = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.length(c).cast("bigint")).alias("total_chars"),
        F.sum(ws).alias("total_ws_tokens"),
        F.sum(bpe_token_count(c)).alias("total_bpe_tokens"),
    )
    return grouped.select(
        *group_cols,
        "n_docs",
        "total_chars",
        "total_ws_tokens",
        "total_bpe_tokens",
        F.expr("(total_chars * 1000) div nullif(total_bpe_tokens, 0)")
        .cast("bigint")
        .alias("chars_per_bpe_permille"),
        F.expr("(total_bpe_tokens * 1000) div nullif(total_ws_tokens, 0)")
        .cast("bigint")
        .alias("bpe_per_ws_permille"),
    )
