"""operators/wordpiece: the greedy longest-match-first Spark fold
must match the transparent Python reference on random words
(including the [UNK] path the shipped corpus never hits), training
must be deterministic and likelihood-scored (not count-scored — the
distinction from BPE), and the shipped vocab constant must be
reproducible from the sf0.001 corpus.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.wordpiece import (
    PRETRAINED_WORDPIECE_V1,
    _merge_product,
    wordpiece_encode_word,
    wordpiece_token_counter,
    wordpiece_token_counts,
    wordpiece_train,
    wordpiece_word_tokens,
)


def test_reference_encoder_basics():
    vocab = ["a", "b", "##a", "##b", "ab", "##ab", "##ba"]
    assert wordpiece_encode_word("ab", vocab) == (1, False)
    # greedy longest-first: 'aba' -> 'ab' + '##a'
    assert wordpiece_encode_word("aba", vocab) == (2, False)
    # 'abba' -> 'ab' + '##ba'
    assert wordpiece_encode_word("abba", vocab) == (2, False)
    # char outside the alphabet -> whole word is [UNK], ONE token
    assert wordpiece_encode_word("abz", vocab) == (1, True)
    assert wordpiece_encode_word("zab", vocab) == (1, True)


def test_spark_fold_matches_reference(spark):
    """Random words (alphabet + out-of-alphabet chars) through the
    HOF fold vs the Python reference — including UNK cases."""
    rng = random.Random(17)
    vocab = PRETRAINED_WORDPIECE_V1
    ws = [
        "".join(rng.choices("abcdefwxyz014", k=rng.randint(1, 14)))
        for _ in range(400)
    ] + ["window", "column", "customer", "q", "zzz", "e", "events"]
    df = spark.createDataFrame([(w,) for w in ws], "word string")
    got = {
        r["word"]: (r["n_tokens"], r["is_unk"])
        for r in wordpiece_word_tokens(df, "word", vocab).collect()
    }
    unk_seen = ok_seen = 0
    for w in set(ws):
        exp = wordpiece_encode_word(w, vocab)
        assert got[w] == exp, (w, got[w], exp)
        unk_seen += exp[1]
        ok_seen += not exp[1]
    assert unk_seen > 0 and ok_seen > 0  # both paths exercised


def test_unk_is_single_token_in_counts(spark):
    df = spark.createDataFrame(
        [(1, "window zzz window"), (2, "eeee")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in wordpiece_token_counts(
            df, "doc_id", "text", PRETRAINED_WORDPIECE_V1
        ).collect()
    }
    # 'window' is one piece; 'zzz' is [UNK] = 1 token
    assert rows[1]["n_wp_tokens"] == 3 and rows[1]["n_unk_words"] == 1
    # 'eeee' starts with 'e' which is continuation-only -> UNK
    assert rows[2]["n_wp_tokens"] == 1 and rows[2]["n_unk_words"] == 1


def test_training_likelihood_not_count(spark):
    """A pair that is FREQUENT but incohesive (its tokens appear
    everywhere) must lose to a rarer perfectly-cohesive pair — the
    WordPiece/BPE distinction."""
    # 'xy' occurs 4x but x,y each occur 10x elsewhere; 'qu' occurs
    # 3x and q,u occur ONLY together -> score(qu)=3/9 > 4/100.
    rows = [("xy", 4), ("xaxa", 3), ("yaya", 3), ("qu", 3)]
    wf = spark.createDataFrame(rows, "word string, count long")
    vocab = wordpiece_train(wf, num_merges=1)
    assert vocab[-1] == "qu"


@pytest.mark.heavy  # 30 s training golden
def test_training_deterministic_and_golden(spark):
    """Retraining on the sf0.001 corpus reproduces the shipped
    constant exactly."""
    from bio_lakehouse_spark.operators.bpe import word_freq_table
    from bio_lakehouse_spark.suite.registry import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    vocab = wordpiece_train(word_freq_table(docs, "text"))
    assert vocab == PRETRAINED_WORDPIECE_V1


def test_merge_product():
    assert _merge_product("h", "##e") == "he"
    assert _merge_product("##l", "##l") == "##ll"


def test_token_counter_seam():
    count = wordpiece_token_counter(PRETRAINED_WORDPIECE_V1)
    import pandas as pd

    out = count(pd.Series(["window zzz", "Column JOIN"]))
    assert out.tolist() == [2, 2]


def test_no_python_udf_in_plan(spark):
    df = spark.createDataFrame([("window",)], "word string")
    plan = (
        wordpiece_word_tokens(df, "word", PRETRAINED_WORDPIECE_V1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
