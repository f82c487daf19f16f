"""Distributed BPE tokenizer (operators/bpe.py): golden merges,
distributed-vs-pandas parity, roundtrip + monotonicity properties,
and the TokenCounterFn seam integration — the 'real tokenizer'
deliverable that sentencepiece/tiktoken absence otherwise blocks."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.bpe import (
    bpe_token_counter,
    bpe_token_counts,
    bpe_train,
    bpe_word_tokens,
    word_freq_table,
)

# The canonical constant lives next to the operator; training at
# sf0.001 must reproduce it exactly (deterministic: count desc, then
# lexicographic tie-break). Regenerate only after an intentional
# change to word normalization or merge selection.
from bio_lakehouse_spark.operators.bpe import (  # noqa: E402
    PRETRAINED_MERGES_V1 as GOLDEN_MERGES_12,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def merges(spark, corpus):
    return bpe_train(word_freq_table(corpus, "text"), num_merges=24)


@pytest.mark.heavy  # 264 s module-scoped bpe_train fixture
def test_trained_merges_match_golden(merges):
    assert merges[:12] == GOLDEN_MERGES_12


@pytest.mark.heavy
def test_word_tokens_roundtrip_and_monotone(spark, merges):
    """concat(tokens) == word for every word (merges never lose or
    invent characters), and more merges never increase a word's
    token count."""
    words_df = spark.createDataFrame(
        [("banana",), ("internationalization",), ("error",), ("a",),
         ("stern",), ("partner",)],
        "word string",
    )
    full = bpe_word_tokens(words_df, "word", merges)
    for r in full.collect():
        assert "".join(r["toks"]) == r["word"]
        assert 1 <= r["n_tokens"] <= len(r["word"])
    half = {
        r["word"]: r["n_tokens"]
        for r in bpe_word_tokens(words_df, "word", merges[:8]).collect()
    }
    for r in full.collect():
        assert r["n_tokens"] <= half[r["word"]]


@pytest.mark.heavy
def test_distributed_counts_match_pandas_encoder(corpus, merges):
    """The JVM-side fold pipeline and the pandas seam encoder must
    agree doc-for-doc — same merges, same greedy left-to-right
    application."""
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(corpus, "doc_id", "text", merges).collect()
    }
    pdf = corpus.select("doc_id", "text").toPandas()
    counted = bpe_token_counter(merges)(pdf["text"])
    assert len(got) == len(pdf)
    for did, n in zip(pdf["doc_id"], counted):
        assert got[did] == n, f"doc {did}: spark {got[did]} pandas {n}"


@pytest.mark.heavy
def test_token_counter_seam_integration(spark, corpus, merges):
    """bpe_token_counter plugs into textops.token_counter as a real
    TokenCounterFn: the resulting Column computes the same counts as
    the distributed pipeline through an Arrow-batched pandas UDF."""
    from bio_lakehouse_spark.operators.textops import token_counter

    col_fn = token_counter(bpe_token_counter(merges))
    sample = corpus.limit(50)
    via_seam = {
        r["doc_id"]: r["n"]
        for r in sample.select(
            "doc_id", col_fn("text").alias("n")
        ).collect()
    }
    via_pipeline = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(
            sample, "doc_id", "text", merges
        ).collect()
    }
    assert via_seam == via_pipeline


def test_oracle_expr_adjacent_repeats():
    """ADVICE r7: the single-pipe oracle under-merged words with
    back-to-back occurrences of a merge pair ('erer' under (e,r) →
    3 tokens instead of 2) because one replace() consumed the shared
    boundary pipe. The doubled-pipe expression must agree with the
    pandas encoder on exactly those words — and on ordinary words,
    merge-interaction words, and single chars."""
    import duckdb

    from bio_lakehouse_spark.operators.bpe import (
        PRETRAINED_MERGES_V1,
        bpe_token_counter,
    )
    from bio_lakehouse_spark.suite.text_queries import _bpe_word_expr

    def encode_len(w: str) -> int:
        toks = list(w)
        for a, b in PRETRAINED_MERGES_V1:
            out = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            toks = out
        return len(toks)

    words = [
        "erer", "ererer", "erere",          # adjacent repeats of (e,r)
        "inin", "orador", "arar", "parpar",  # more repeat shapes
        "stst", "atat", "anan", "cancan",
        "parar",                             # merge interaction (a,r)->(p,ar)
        "merer",                             # (e,r) then (m,er) then dangling er
        "e", "r", "x", "word", "pattern", "canonical",
    ]
    con = duckdb.connect()
    expr = _bpe_word_expr("word")
    for w in words:
        s = con.execute(
            f"SELECT {expr} AS s FROM (SELECT '{w}' AS word)"
        ).fetchone()[0]
        n_oracle = (len(s) - len(s.replace("|", ""))) // 2 - 1
        assert n_oracle == encode_len(w), (
            f"{w}: oracle {n_oracle} ({s}) vs encoder {encode_len(w)}"
        )
    # the specific ADVICE case: erer must be 2, not 3
    s = con.execute(
        f"SELECT {expr} AS s FROM (SELECT 'erer' AS word)"
    ).fetchone()[0]
    assert s == "||er||er||"
    con.close()
