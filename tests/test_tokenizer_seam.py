"""Pluggable-tokenizer seam (VERDICT r5 item 7): token_counter /
token_fertility_by_lang / dsir_importance accept a real tokenizer
(sentencepiece/tiktoken adapter shape) while defaulting to the
JVM-side proxies. These tests inject a FAKE exact-vocab tokenizer and
check the plumbing end-to-end — Arrow batch in, long counts out."""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bio_lakehouse_spark.operators.textops import (
    dsir_importance,
    token_counter,
    token_fertility_by_lang,
)

# Fake "trained" tokenizer: an exact vocab where known words cost 1
# token and unknown words fall back to per-character pieces — the
# worst-case fertility shape a real BPE shows on out-of-domain text.
# Built as a CLOSURE (factory) so cloudpickle ships it by value to
# executors — a module-level function in tests/ pickles by reference
# and fails on workers that can't import the test module.
def make_fake_vocab_tokenizer():
    vocab = {"the", "cat", "sat", "on", "mat", "dog", "und", "der"}

    def tokenize(series):
        def count(text: str) -> int:
            total = 0
            for w in text.lower().split():
                total += 1 if w in vocab else len(w)
            return total

        return series.map(count)

    return tokenize


def test_token_counter_default_is_jvm_proxy(spark):
    df = spark.createDataFrame([("The cat sat.",)], "text string")
    col_fn = token_counter(None)
    n = df.select(col_fn("text").alias("n")).collect()[0]["n"]
    # BPE-ish regex: the|cat|sat|. → 4
    assert n == 4


def test_token_counter_injected_fake_vocab(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("zebra the",), (None,)],
        "text string",
    )
    col_fn = token_counter(make_fake_vocab_tokenizer())
    got = [
        r["n"]
        for r in df.select(col_fn("text").alias("n")).collect()
    ]
    # all-vocab: 6 words → 6; "zebra"(5 chars) + "the"(1) → 6; null → 0
    assert got == [6, 6, 0]


def test_fertility_by_lang_with_injected_tokenizer(spark):
    df = spark.createDataFrame(
        [
            ("en", "the cat sat"),
            ("en", "the dog"),
            ("de", "und der zzz"),
        ],
        "lang string, text string",
    )
    out = {
        r["lang"]: r
        for r in token_fertility_by_lang(
            df, "lang", "text", tokenizer=make_fake_vocab_tokenizer()
        ).collect()
    }
    # en: tokens 3 + 2 = 5, ws words 3 + 2 = 5 → fertility 1.0
    assert out["en"]["bpe_tokens"] == 5
    assert out["en"]["fertility"] == 1.0
    # de: "und der zzz" → 1 + 1 + 3 = 5 tokens over 3 words
    assert out["de"]["bpe_tokens"] == 5
    assert abs(out["de"]["fertility"] - round(5 / 3, 6)) < 1e-9
    # default proxy still works and differs where vocab penalizes
    proxy = {
        r["lang"]: r
        for r in token_fertility_by_lang(df, "lang", "text").collect()
    }
    assert proxy["de"]["bpe_tokens"] == 3


def test_dsir_importance_pluggable_featurizer(spark):
    df = spark.createDataFrame(
        [
            (1, "aaa bbb", True),
            (2, "aaa ccc", False),
            (3, "ddd eee", False),
        ],
        "doc_id int, text string, tgt boolean",
    )

    # Featurizer via the injected tokenizer: one bucket per word,
    # xxhash64 mod dim — the shape a real-tokenizer id stream takes.
    def word_buckets(col_name):
        return F.transform(
            F.split(F.lower(F.col(col_name)), r"\s+"),
            lambda w: F.abs(F.xxhash64(w)) % 64,
        )

    out = dsir_importance(
        df, "doc_id", "text", "tgt", dim=64, feature_fn=word_buckets
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r["n_feat"] == 2 for r in rows.values())
    # Doc 1 is the target seed → highest importance; doc 3 shares no
    # tokens with the target → lowest.
    assert rows[1]["logw"] > rows[2]["logw"] > rows[3]["logw"]
