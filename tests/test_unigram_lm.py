"""Unigram-LM tokenizer (operators/unigram_lm.py): Viterbi
optimality vs brute-force enumeration, backtrack consistency,
combined-cost tie-breaks, coverage floor, pandas-adapter parity with
the distributed fold, and the golden gate pinning the published
PRETRAINED_UNIGRAM_V1 constant to a fresh training run."""

from __future__ import annotations

from itertools import product

import pytest
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.bpe import word_freq_table
from bio_lakehouse_spark.operators.unigram_lm import (
    _BIG,
    _PIECES_SCALE,
    PRETRAINED_UNIGRAM_V1,
    piece_cost_map,
    _dp_backtrack,
    seed_piece_table,
    train_unigram,
    unigram_token_counter,
    unigram_token_counts,
    unigram_word_tokens,
)
from bio_lakehouse_spark.suite.registry import load

SF = "/root/testdata/sf0.001"

TOY = [
    ("a", 3000), ("b", 3000), ("c", 3000), ("d", 3000),
    ("ab", 2000), ("bc", 2500), ("abc", 4500), ("cd", 2000),
]


def _brute_best(word: str, vocab: list[tuple[str, int]], max_len=4):
    """Enumerate ALL segmentations; return min combined cost
    (millibits·SCALE + n_pieces)."""
    cmap = {p: b for p, b in vocab}

    def segs(w):
        if not w:
            yield []
            return
        for l in range(1, min(max_len, len(w)) + 1):
            head = w[:l]
            if head in cmap:
                for rest in segs(w[l:]):
                    yield [head] + rest

    best = None
    for s in segs(word):
        c = sum(cmap[p] for p in s) * _PIECES_SCALE + len(s)
        best = c if best is None else min(best, c)
    return best


def test_viterbi_matches_bruteforce_exhaustive(spark):
    # every word over {a,b,c,d} up to length 5 — exact combined-cost
    # equality with full enumeration
    words = [
        "".join(t)
        for n in range(1, 6)
        for t in product("abcd", repeat=n)
    ]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["millibits"] * _PIECES_SCALE + r["n_tokens"]
        for r in unigram_word_tokens(df, "word", TOY).collect()
    }
    for w in words:
        assert got[w] == _brute_best(w, TOY), w


def test_tiebreak_prefers_fewer_pieces(spark):
    # 'abc' as one piece costs 4500; 'ab'+'c' = 2000+3000 = 5000;
    # 'a'+'bc' = 3000+2500 = 5500. Now craft equal-bits alternatives:
    vocab = [("a", 100), ("b", 100), ("ab", 200)]
    # 'ab': piece 'ab' (200 bits, 1 piece) vs 'a'+'b' (200 bits,
    # 2 pieces) — same bits, fewer pieces must win
    df = spark.createDataFrame([("ab",)], "word string")
    r = unigram_word_tokens(df, "word", vocab).collect()[0]
    assert (r["n_tokens"], r["millibits"]) == (1, 200)


def test_backtrack_reconstructs_word_and_cost(spark):
    words = ["abcd", "abab", "dcba", "abcabc", "a"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    cmap = piece_cost_map(TOY)
    rows = (
        df.select(
            "word",
            _dp_backtrack(F.col("word"), cmap, 4).alias("pieces"),
        )
        .collect()
    )
    costs = {p: b for p, b in TOY}
    enc = {
        r["word"]: r["millibits"] * _PIECES_SCALE + r["n_tokens"]
        for r in unigram_word_tokens(df, "word", TOY).collect()
    }
    for r in rows:
        assert "".join(r["pieces"]) == r["word"]
        combined = (
            sum(costs[p] for p in r["pieces"]) * _PIECES_SCALE
            + len(r["pieces"])
        )
        assert combined == enc[r["word"]]


def test_oov_word_hits_sentinel(spark):
    df = spark.createDataFrame([("axa",)], "word string")
    r = unigram_word_tokens(df, "word", TOY).collect()[0]
    assert r["millibits"] >= _BIG // _PIECES_SCALE  # 'x' not coverable


def test_seed_contains_char_floor_and_top_substrings(spark):
    wf = spark.createDataFrame(
        [("scan", 10), ("scat", 5)], "word string, count long"
    )
    rows = {
        r["piece"]: r["count"]
        for r in seed_piece_table(wf, max_len=4, seed_size=4).collect()
    }
    for ch in "scant":
        assert ch in rows
    assert rows["sca"] == 15  # shared 3-gram, occurrence-weighted


def test_trained_vocab_matches_published_constant(spark):
    docs = load(spark, SF, "documents")
    wf = word_freq_table(docs, "text").filter(F.length("word") > 0)
    vocab = train_unigram(wf)
    assert vocab == PRETRAINED_UNIGRAM_V1


def test_counter_adapter_parity_with_distributed(spark):
    docs = load(spark, SF, "documents").limit(40)
    dist = {
        r["doc_id"]: r["n_tokens"]
        for r in unigram_token_counts(
            docs, "doc_id", "text", PRETRAINED_UNIGRAM_V1
        ).collect()
    }
    counter = unigram_token_counter(PRETRAINED_UNIGRAM_V1)
    pdf = docs.select("doc_id", "text").toPandas()
    local = dict(zip(pdf["doc_id"], counter(pdf["text"])))
    assert dist == {k: v for k, v in local.items() if k in dist}
    assert len(dist) == len(local)


def test_every_corpus_word_segments_under_pretrained(spark):
    docs = load(spark, SF, "documents")
    wf = word_freq_table(docs, "text").filter(F.length("word") > 0)
    enc = unigram_word_tokens(
        wf.select("word"), "word", PRETRAINED_UNIGRAM_V1
    )
    bad = enc.filter(
        F.col("millibits") >= _BIG // _PIECES_SCALE
    ).count()
    assert bad == 0


def test_overlong_word_packing_guard(spark):
    """ADVICE r7: dp = millibits*64 + n_pieces corrupts for words of
    length >= _PIECES_SCALE (piece count bleeds into the millibits
    field). Both encoders must guard: Spark falls back to char count
    with NULL millibits; the pandas seam encoder returns char count."""
    import pandas as pd

    from bio_lakehouse_spark.operators.unigram_lm import (
        _PIECES_SCALE,
        PRETRAINED_UNIGRAM_V1,
        unigram_token_counter,
        unigram_word_tokens,
    )

    long_word = "ab" * _PIECES_SCALE  # length 128 >= 64
    short_word = "data"
    df = spark.createDataFrame(
        [(long_word,), (short_word,)], ["word"]
    )
    rows = {
        r["word"]: r
        for r in unigram_word_tokens(
            df, "word", PRETRAINED_UNIGRAM_V1
        ).collect()
    }
    assert rows[long_word]["n_tokens"] == len(long_word)
    assert rows[long_word]["millibits"] is None
    assert 0 < rows[short_word]["n_tokens"] <= len(short_word)
    assert rows[short_word]["millibits"] is not None

    counter = unigram_token_counter(PRETRAINED_UNIGRAM_V1)
    out = counter(pd.Series([long_word, short_word]))
    assert out.iloc[0] == len(long_word)
    assert out.iloc[1] == rows[short_word]["n_tokens"]
