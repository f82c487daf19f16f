"""Distributed WordPiece tokenizer — trained from scratch on the
corpus; the third tokenizer family next to BPE (operators/bpe.py)
and the unigram LM (operators/unigram_lm.py).

WordPiece (Schuster & Nakajima, ICASSP 2012; the BERT tokenizer)
differs from BPE on BOTH halves:

* **Training** picks the merge maximizing the LIKELIHOOD gain
  ``count(ab) / (count(a) · count(b))`` instead of the raw pair
  count — rare-but-cohesive pairs win over merely frequent ones.
  Continuation pieces carry the ``##`` marker from the start, so the
  learned vocabulary distinguishes word-initial from word-internal
  pieces.
* **Encoding** ignores merge order entirely: each word is encoded by
  greedy LONGEST-MATCH-FIRST against the final vocabulary (at each
  position take the longest vocab piece that matches; a position
  with no match makes the whole word ``[UNK]`` — one token).

Scale shape mirrors bpe.py: training iterates over the compact
(word, count) type table, never the corpus; encoding runs the greedy
fold once per DISTINCT word and joins the n_tokens lookup back
broadcast — per-occurrence cost is a hash probe. The greedy match
itself is a pure JVM-side ``aggregate`` fold over character
positions (no UDF): at each step the longest matching piece length
is ``array_max(filter(sequence(...), L -> array_contains(vocab,
piece)))`` with the vocabulary riding the plan as an array literal
(WordPiece vocabularies are bounded — 30k for BERT — well inside
literal/broadcast territory).

Determinism: merge choice orders by (score desc, pair count desc,
lexicographic pair) with Fraction-exact score comparison — no float
ties, no RNG; the trained vocab is an exact constant per corpus
(tests/test_wordpiece.py golden-pins it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.bpe import (
    _adjacent_pairs,
    _apply_merge,
)
from bio_lakehouse_spark.operators.textops import words

_CONT = "##"

# The published "pretrained vocabulary": alphabet + 48 likelihood-
# scored merges learned from the sf0.001 documents corpus
# (deterministic — Fraction-exact score desc, pair count desc, then
# lexicographic; regenerate with tools/train_wordpiece_v1.py). Any
# fixed vocab is a valid tokenizer; shipping one lets the greedy
# ENCODER be differentially tested against an independent DuckDB
# recursive-CTE implementation (suite.text_queries.
# wordpiece_encode_fixed) and gives ad-hoc callers a ready
# TokenCounterFn without a training pass.
PRETRAINED_WORDPIECE_V1: list[str] = [
    'a', 'b', 'c', 'd', 'f', 'g',
    'h', 'j', 'k', 'l', 'm', 'o',
    'p', 'q', 'r', 's', 't', 'v',
    'w', '##a', '##b', '##c', '##d', '##e',
    '##g', '##h', '##i', '##k', '##l', '##m',
    '##n', '##o', '##p', '##r', '##s', '##t',
    '##u', '##w', '##y', 'wi', 'li', 'qu',
    'win', 'wind', 'lin', 'th', '##sh', '##ch',
    'fi', 'bi', '##in', 'big', 'ag', 'agg',
    'fil', '##bl', '##up', 'sp', '##us', 'cus',
    '##lu', '##lum', '##lumn', '##ll', 'sl', 'sc',
    '##ct', 'filt', '##st', '##tch', 'cust', '##ow',
    'window', 'slow', 'row', '##olumn', 'column', '##oin',
    'join', '##cto', 'custo', '##oup', 'dup', 'custom',
    'so', 'sm', 'st',
]


def _wp_char_split(col_name: str) -> Column:
    """Initial WordPiece state: first char plain, every later char
    marked as a continuation piece ('hello' → [h, ##e, ##l, ##l,
    ##o])."""
    return F.expr(
        f"transform(sequence(1, length({col_name})), i -> "
        f"CASE WHEN i = 1 THEN substring({col_name}, 1, 1) "
        f"ELSE '{_CONT}' || substring({col_name}, i, 1) END)"
    )


def _merge_product(a: str, b: str) -> str:
    """The piece produced by merging (a, b): b's continuation marker
    is absorbed, a's prefix status is kept."""
    return a + (b[len(_CONT):] if b.startswith(_CONT) else b)


# Hard cap on the float-score tie group collected for the exact
# Fraction tie-break (driver-side). Exceeding it raises rather than
# silently truncating — the documented exactness guarantee fails
# LOUDLY or not at all.
_TIE_GROUP_CAP = 4096


def wordpiece_train(
    word_freqs: DataFrame,
    num_merges: int = 48,
    min_pair_count: int = 2,
) -> list[str]:
    """Learn a WordPiece vocabulary from a (word, count) table.

    Returns the vocab as a list: the corpus alphabet (word-initial
    chars, then ``##``-marked continuation chars, each sorted) +
    one merged piece per learned merge in rank order. Each iteration
    is one distributed pass over the type table: adjacent-pair
    counts and unigram token counts from the same exploded frame,
    scored count(ab)/(count(a)·count(b)). The merge choice is EXACT:
    the float-score max's tie group (equal rationals always round to
    the identical double) is collected and re-broken with Fraction
    arithmetic on the driver — bounded by _TIE_GROUP_CAP, failing
    loudly rather than truncating."""
    from fractions import Fraction

    wt = word_freqs.select(
        "count", _wp_char_split("word").alias("toks")
    ).localCheckpoint()
    alphabet = sorted(
        r["t"]
        for r in wt.select(F.explode("toks").alias("t"))
        .filter(~F.col("t").startswith(_CONT))
        .distinct()
        .collect()
    ) + sorted(
        r["t"]
        for r in wt.select(F.explode("toks").alias("t"))
        .filter(F.col("t").startswith(_CONT))
        .distinct()
        .collect()
    )
    vocab = list(alphabet)
    for _ in range(num_merges):
        tok_counts = (
            wt.select("count", F.explode("toks").alias("t"))
            .groupBy("t")
            .agg(F.sum("count").alias("n_tok"))
        )
        pairs = (
            wt.select(
                "count",
                F.explode(_adjacent_pairs(F.col("toks"))).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("count").alias("n_pair"))
            .filter(F.col("n_pair") >= min_pair_count)
        )
        cand = (
            pairs.join(
                F.broadcast(
                    tok_counts.select(
                        F.col("t").alias("a"), F.col("n_tok").alias("na")
                    )
                ),
                "a",
            )
            .join(
                F.broadcast(
                    tok_counts.select(
                        F.col("t").alias("b"), F.col("n_tok").alias("nb")
                    )
                ),
                "b",
            )
            .withColumn(
                "__s", F.col("n_pair") / (F.col("na") * F.col("nb"))
            )
            # vocab²-bounded small frame; barrier so the max-score agg
            # and the tie-group filter below don't each re-run the
            # corpus-scale pair aggregation
            .localCheckpoint()
        )
        smax = cand.agg(F.max("__s").alias("m")).collect()[0]["m"]
        if smax is None:
            break
        # Exactness: equal rationals always round to the IDENTICAL
        # double (correctly-rounded division is monotone), so every
        # exact-max-score pair sits in the float tie group
        # __s == max(__s) — collect THAT group, however large, and
        # re-break ties with Fraction on the driver. The pre-r9
        # float-ordered .limit(16) could silently exclude the exact
        # best when >16 candidates float-tied at the boundary
        # (plausible with small integer counts).
        scored = (
            cand.filter(F.col("__s") == smax)
            .orderBy(F.desc("n_pair"), F.asc("a"), F.asc("b"))
            .limit(_TIE_GROUP_CAP + 1)
            .collect()
        )
        if len(scored) > _TIE_GROUP_CAP:
            raise AssertionError(
                "wordpiece_train: float tie group exceeds "
                f"{_TIE_GROUP_CAP} pairs; raise _TIE_GROUP_CAP to "
                "keep the exact tie-break guarantee"
            )
        best = min(
            scored,
            key=lambda r: (
                -Fraction(int(r["n_pair"]), int(r["na"]) * int(r["nb"])),
                -int(r["n_pair"]),
                r["a"],
                r["b"],
            ),
        )
        a, b = best["a"], best["b"]
        merged = _merge_product(a, b)
        vocab.append(merged)
        wt = wt.select(
            "count", _apply_merge(F.col("toks"), a, b, merged).alias("toks")
        ).localCheckpoint()
    return vocab


def _vocab_literal(vocab: list[str]) -> str:
    quoted = ", ".join("'" + v.replace("'", "\\'") + "'" for v in vocab)
    return f"array({quoted})"


def wordpiece_encode_expr(
    word_sql: str, vocab: list[str], max_piece_len: int | None = None
) -> str:
    """SQL expression: struct<n_tokens bigint, is_unk boolean> for
    greedy longest-match-first WordPiece encoding of ``word_sql``.

    The fold walks character positions: accumulator (pos, n, unk);
    each step finds the LONGEST vocab piece matching at pos (first
    position unmarked, later positions ``##``-prefixed) via
    array_max over a filtered length sequence; no match → the whole
    word is [UNK] (n_tokens = 1), the standard WordPiece contract.
    Pure expression code — vocabulary as an array literal, a step
    per character, everything inside whole-stage codegen."""
    maxp = max_piece_len or max(
        len(v) - (len(_CONT) if v.startswith(_CONT) else 0) for v in vocab
    )
    vlit = _vocab_literal(vocab)
    piece = (
        f"CASE WHEN acc.pos = 0 THEN substring({word_sql}, 1, L) "
        f"ELSE '{_CONT}' || substring({word_sql}, acc.pos + 1, L) END"
    )
    best = (
        f"array_max(filter(sequence(1, least({maxp}, "
        f"length({word_sql}) - acc.pos)), "
        f"L -> array_contains({vlit}, {piece})))"
    )
    step = (
        f"CASE WHEN acc.unk OR acc.pos >= length({word_sql}) THEN acc "
        f"ELSE element_at(transform(array({best}), best -> "
        f"CASE WHEN best IS NULL THEN named_struct("
        f"'pos', length({word_sql}), 'n', acc.n, 'unk', true) "
        f"ELSE named_struct('pos', acc.pos + best, 'n', acc.n + 1, "
        f"'unk', false) END), 1) END"
    )
    return (
        f"element_at(transform(array(aggregate("
        f"sequence(1, length({word_sql})), "
        f"named_struct('pos', 0, 'n', 0, 'unk', false), "
        f"(acc, i) -> {step})), "
        f"st -> named_struct("
        f"'n_tokens', cast(CASE WHEN st.unk THEN 1 ELSE st.n END as bigint), "
        f"'is_unk', st.unk)), 1)"
    )


def wordpiece_word_tokens(
    word_df: DataFrame, word_col: str, vocab: list[str]
) -> DataFrame:
    """(word, n_tokens, is_unk) for each distinct word under greedy
    longest-match-first encoding."""
    enc = F.expr(wordpiece_encode_expr(word_col, vocab))
    return word_df.select(
        F.col(word_col).alias("word"),
        enc["n_tokens"].alias("n_tokens"),
        enc["is_unk"].alias("is_unk"),
    )


def wordpiece_token_counts(
    df: DataFrame, id_col: str, text_col: str, vocab: list[str]
) -> DataFrame:
    """Per-document WordPiece token counts + UNK-word counts: one
    corpus pass (explode words), greedy encode once per DISTINCT
    word, broadcast word→(n_tokens, is_unk) join back — bpe.
    bpe_token_counts' type/token shape."""
    wpd = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(text_col)).alias("word"),
    )
    lut = wordpiece_word_tokens(wpd.select("word").distinct(), "word", vocab)
    return (
        wpd.join(F.broadcast(lut), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_tokens").cast("long").alias("n_wp_tokens"),
            F.sum(F.col("is_unk").cast("long"))
            .cast("long")
            .alias("n_unk_words"),
        )
    )


def wordpiece_encode_word(word: str, vocab: set[str] | list[str]) -> tuple:
    """Transparent Python reference encoder (tests + the
    TokenCounterFn seam): returns (n_tokens, is_unk). Must match the
    Spark fold exactly."""
    vs = set(vocab)
    maxp = max(
        len(v) - (len(_CONT) if v.startswith(_CONT) else 0) for v in vs
    )
    pos, n = 0, 0
    while pos < len(word):
        found = 0
        for L in range(min(maxp, len(word) - pos), 0, -1):
            piece = word[pos : pos + L]
            if pos > 0:
                piece = _CONT + piece
            if piece in vs:
                found = L
                break
        if not found:
            return 1, True
        pos += found
        n += 1
    return n, False


def wordpiece_token_counter(vocab: list[str]):
    """``TokenCounterFn`` adapter (textops.token_counter seam):
    pandas-side greedy WordPiece encoder, Arrow-batched when wrapped
    by ``token_counter``."""
    import re as _re

    wordre = _re.compile(r"[a-z0-9]+")

    def count_series(s):
        return s.map(
            lambda t: sum(
                wordpiece_encode_word(w, vocab)[0]
                for w in wordre.findall(str(t).lower())
            )
        )

    return count_series
