"""Distributed BPE tokenizer — trained from scratch on the corpus.

Closes the VERDICT "real tokenizer" gap without external packages
(sentencepiece/tiktoken are not installable in this sandbox): a
byte-pair-encoding tokenizer (Sennrich, Haddow & Birch, ACL 2016 —
"Neural Machine Translation of Rare Words with Subword Units")
implemented Spark-first.

The industrially-correct scale shape: BPE training NEVER iterates
over the corpus — it iterates over the WORD-FREQUENCY TABLE, which is
smaller than the corpus by the type/token ratio (a 100 TB crawl has
billions of rows but tens of millions of distinct words). So:

- ``word_freq_table`` — the single corpus-scale pass (scan → explode
  → groupBy), emitting (word, count).
- ``bpe_train`` — the merge loop runs ENTIRELY on that compact table:
  each iteration is (adjacent-pair explode → pair-count groupBy →
  1-row argmax → JVM-side fold applying the winning merge to every
  word's token array). Per-iteration cost is O(|vocab| · avg word
  len), independent of corpus size. The token-array fold
  (``F.aggregate``) replaces pairs left-to-right non-overlapping —
  exactly greedy BPE — with zero Python in the loop body; the word
  table is localCheckpoint'ed per iteration so the plan can't nest
  ``num_merges`` lambda layers.
- ``bpe_word_tokens`` / ``bpe_token_counts`` — encoding: apply the
  learned merges to the DISTINCT-word table once, then count doc
  tokens by an explode + broadcast word→n_tokens join; the corpus is
  touched once and no per-document Python runs.
- ``bpe_token_counter`` — the ``TokenCounterFn`` seam adapter
  (operators/textops.token_counter): an Arrow-batched pandas encoder
  over the learned merge ranks, for callers that need counts of
  ad-hoc text outside the corpus tables.

Determinism: merges are chosen by (max pair count, then lexicographic
pair) — no RNG anywhere, so trained merges are exact constants per
corpus and golden-testable (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.textops import words


# The published "pretrained vocabulary": the first 12 merges learned
# from the sf0.001 documents corpus (deterministic — count desc, then
# lexicographic). Any fixed list is a valid tokenizer; shipping one
# lets the ENCODER be differentially tested against an independent
# SQL implementation (suite.text_queries.bpe_encode_fixed) and gives
# ad-hoc callers a ready TokenCounterFn without a training pass.
PRETRAINED_MERGES_V1: list[tuple[str, str]] = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"),
]


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over the corpus — the ONE corpus-scale pass of
    BPE training. Explode + groupBy: map-side partial aggregation
    keeps the shuffle at distinct-word width per partition."""
    return (
        df.select(F.explode(words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _char_split(col_name: str) -> Column:
    """Initial BPE state: the word as an array of single characters
    (word-internal BPE — no end-of-word marker, documented choice).
    substring with a column start position needs the SQL form."""
    return F.expr(
        f"transform(sequence(1, length({col_name})), "
        f"i -> substring({col_name}, i, 1))"
    )


def _adjacent_pairs(toks: Column) -> Column:
    """array<struct<a,b>> of adjacent token pairs (overlapping, as
    standard BPE pair counting does)."""
    return F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def _apply_merge(
    toks: Column, a: str, b: str, merged_tok: str | None = None
) -> Column:
    """Replace every left-to-right non-overlapping adjacent (a, b)
    with the merged token — greedy BPE merge application as a pure
    JVM-side array fold (no UDF). ``merged_tok`` defaults to plain
    concatenation (BPE); WordPiece passes ``a + b[2:]`` so the
    continuation marker is not duplicated."""
    merged = F.lit(a + b if merged_tok is None else merged_tok)
    return F.aggregate(
        toks,
        F.array().cast("array<string>"),
        # try_element_at: null (→ condition false) on the empty
        # accumulator instead of the ANSI out-of-bounds error
        lambda acc, t: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (t == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def bpe_train(
    word_freqs: DataFrame,
    num_merges: int = 64,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a (word, count) table.

    Driver-side state is the merge list only (bounded by
    ``num_merges`` — the kmeans-centroid posture); all counting and
    rewriting is distributed. Stops early when no pair reaches
    ``min_pair_count``. Deterministic: ties break lexicographically
    on (a, b)."""
    wt = word_freqs.select(
        "count", _char_split("word").alias("toks")
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            wt.select(
                "count", F.explode(_adjacent_pairs(F.col("toks"))).alias("p")
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("count").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        wt = wt.select(
            "count", _apply_merge(F.col("toks"), a, b).alias("toks")
        ).localCheckpoint()
    return merges


def bpe_word_tokens(
    word_df: DataFrame, word_col: str, merges: list[tuple[str, str]],
    checkpoint_every: int = 8,
) -> DataFrame:
    """Apply learned merges (in rank order) to each distinct word:
    returns (word, toks array<string>, n_tokens). JVM-side folds
    only; the plan is checkpoint-truncated every
    ``checkpoint_every`` merges so Catalyst never sees a
    ``len(merges)``-deep lambda nest."""
    out = word_df.select(
        F.col(word_col).alias("word"), _char_split(word_col).alias("toks")
    )
    for i, (a, b) in enumerate(merges):
        out = out.select(
            "word", _apply_merge(F.col("toks"), a, b).alias("toks")
        )
        if (i + 1) % checkpoint_every == 0:
            out = out.localCheckpoint()
    return out.select(
        "word", "toks", F.size("toks").cast("long").alias("n_tokens")
    )


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Per-document BPE token counts: ONE corpus pass (explode words)
    joined against the broadcast word→n_tokens table built from the
    corpus's own distinct words — per-doc cost is a hash probe, and
    the expensive merge folds run once per distinct WORD, not per
    occurrence (the type/token ratio is the whole speedup at scale).
    """
    wpd = df.select(
        F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("word")
    )
    lut = bpe_word_tokens(
        wpd.select("word").distinct(), "word", merges
    ).select("word", "n_tokens")
    return (
        wpd.join(F.broadcast(lut), "word")
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").cast("long").alias("n_bpe_tokens"))
    )


def bpe_token_counter(merges: list[tuple[str, str]]):
    """``TokenCounterFn`` adapter (textops.token_counter seam): a
    pandas-side greedy BPE encoder over the learned merge ranks —
    Arrow-batched when wrapped by ``token_counter``, for counting
    ad-hoc text outside the corpus tables. Matches the distributed
    fold exactly: merges applied in rank order, left-to-right
    non-overlapping (property-pinned in tests/test_bpe.py)."""
    import re as _re

    # mirror textops.words(): lowercase, [a-z0-9]+ runs are the words
    wordre = _re.compile(r"[a-z0-9]+")

    def encode_word(w: str) -> int:
        toks = list(w)
        for a, b in merges:
            out: list[str] = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            toks = out
        return len(toks)

    def count_series(s):
        return s.map(
            lambda t: sum(
                encode_word(w) for w in wordre.findall(str(t).lower())
            )
        )

    return count_series
