"""Distributed unigram-LM tokenizer (Kudo, ACL 2018 — the algorithm
behind SentencePiece's default model), trained from scratch on the
corpus. The second from-scratch tokenizer family next to BPE
(operators/bpe.py), so the ``TokenCounterFn`` seam has both of the
two industrially dominant subword algorithms without any external
package.

Scale shape (shared with BPE): nothing ever iterates the corpus —
seeding, EM and encoding all run on the WORD-FREQUENCY table, which
is smaller than the corpus by the type/token ratio. Per-word work is
a Viterbi DP, and here it is a pure JVM-side array fold
(``F.aggregate`` over positions with a broadcast piece→cost map
literal) — zero Python inside the plan, unlike SentencePiece's C++
loop or a pandas-UDF port.

Determinism contract: piece costs are INTEGER millibits
(round(-log2 p · 1000)) and the DP minimizes the combined integer
``cost·64 + n_pieces`` — so the optimum is (min bits, then fewest
pieces), ties in float log-probs cannot exist by construction, and
the whole computation is reproducible bit-for-bit on any engine.
That is also what makes the encoder differentially testable: the
suite query ``unigram_encode_fixed`` re-implements the same integer
DP as unrolled SQL in DuckDB (suite/text_queries.py).

Hard-EM (Viterbi counts) is used instead of full forward-backward
expected counts — the standard simplification (e.g. Morfessor's
Viterbi training); documented divergence from SentencePiece's soft
EM, irrelevant to the scale shape.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# combined-cost packing: dp = total_millibits * _PIECES_SCALE + n_pieces.
# n_pieces per word is bounded by word length << 64; millibit totals are
# ≤ ~50k·64 per word — far inside int64 even stacked with _BIG.
_PIECES_SCALE = 64
_BIG = 10**15


def piece_cost_map(vocab: list[tuple[str, int]]) -> Column:
    """Literal map piece → combined step cost (millibits·64 + 1).
    The vocab is bounded (the kmeans-centroid posture), so a map
    literal in the plan is the broadcast."""
    entries: list[Column] = []
    for piece, millibits in vocab:
        entries.append(F.lit(piece))
        entries.append(F.lit(int(millibits) * _PIECES_SCALE + 1))
    return F.create_map(*entries)


def _dp_final(word: Column, cmap: Column, max_len: int) -> Column:
    """Viterbi DP over word positions as ONE array fold: the
    accumulator after step i holds dp[0..i]; dp[i] = min over piece
    lengths l ≤ max_len of dp[i−l] + cost(substr(i−l+1, l)),
    missing pieces costing _BIG. Returns dp[len(word)] (combined
    integer cost), 0 for the empty word."""
    n = F.length(word)

    def step(acc: Column, i: Column) -> Column:
        cands = F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_len), i)),
            lambda l: F.element_at(acc, (i - l + 1).cast("int"))
            + F.coalesce(
                F.element_at(cmap, word.substr(i - l + 1, l)),
                F.lit(_BIG),
            ),
        )
        return F.concat(acc, F.array(F.array_min(cands)))

    dp = F.aggregate(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        F.array(F.lit(0).cast("long")),
        lambda acc, i: F.when(i <= n, step(acc, i)).otherwise(acc),
    )
    return F.element_at(dp, (n + 1).cast("int"))


def unigram_word_tokens(
    word_df: DataFrame,
    word_col: str,
    vocab: list[tuple[str, int]],
    max_len: int = 4,
) -> DataFrame:
    """Encode each distinct word under a fixed (piece, millibits)
    vocab: returns (word, n_tokens, millibits). Pure JVM fold — the
    per-word optimum is (min total bits, then fewest pieces) by the
    combined-cost construction. Words containing characters outside
    the vocab's single-char closure come back with n_tokens ≥ the
    _BIG sentinel share — callers that can see OOV alphabets should
    extend the vocab's char floor instead of filtering here."""
    w = F.col(word_col)
    dpn = _dp_final(w, piece_cost_map(vocab), max_len)
    # Packing guard (ADVICE r7): n_pieces ≤ word length, so a word of
    # length ≥ _PIECES_SCALE could bleed its piece count into the
    # millibits field and silently wrap n_tokens. For such words fall
    # back to the character count (the char-closure vocab's worst
    # case — exact when no multi-char piece applies, a defined upper
    # bound otherwise, and identical to the pandas seam encoder's
    # guard) and NULL the millibits, which are genuinely unknown.
    ok = F.length(w) < F.lit(_PIECES_SCALE)
    return word_df.select(
        w.alias("word"),
        F.when(ok, (dpn % _PIECES_SCALE).cast("long"))
        .otherwise(F.length(w).cast("long"))
        .alias("n_tokens"),
        F.when(ok, F.floor(dpn / _PIECES_SCALE).cast("long")).alias(
            "millibits"
        ),
    )


def _dp_backtrack(word: Column, cmap: Column, max_len: int) -> Column:
    """Reconstruct the optimal segmentation: forward fold for the dp
    array, then a backward fold choosing, at each position, the
    LONGEST piece length achieving dp[pos] (a pinned tie-break —
    combined costs are integers, so 'achieves' is an exact integer
    equality, never a float comparison). Returns array<string> of
    pieces in order; empty array for the empty word."""
    n = F.length(word)

    def fstep(acc: Column, i: Column) -> Column:
        cands = F.transform(
            F.sequence(F.lit(1), F.least(F.lit(max_len), i)),
            lambda l: F.element_at(acc, (i - l + 1).cast("int"))
            + F.coalesce(
                F.element_at(cmap, word.substr(i - l + 1, l)),
                F.lit(_BIG),
            ),
        )
        return F.concat(acc, F.array(F.array_min(cands)))

    dp = F.aggregate(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        F.array(F.lit(0).cast("long")),
        lambda acc, i: F.when(i <= n, fstep(acc, i)).otherwise(acc),
    )

    def bstep(st: Column, _i: Column) -> Column:
        pos = st["pos"]
        best_l = F.array_max(
            F.filter(
                F.sequence(F.lit(1), F.least(F.lit(max_len), pos)),
                lambda l: (
                    F.element_at(dp, (pos - l + 1).cast("int"))
                    + F.coalesce(
                        F.element_at(cmap, word.substr(pos - l + 1, l)),
                        F.lit(_BIG),
                    )
                )
                == F.element_at(dp, (pos + 1).cast("int")),
            )
        )
        piece = word.substr(pos - best_l + 1, best_l)
        return F.when(
            pos <= 0, st
        ).otherwise(
            F.struct(
                (pos - best_l).alias("pos"),
                F.concat(F.array(piece), st["pieces"]).alias("pieces"),
            )
        )

    final = F.aggregate(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        F.struct(
            n.alias("pos"), F.array().cast("array<string>").alias("pieces")
        ),
        bstep,
    )
    return final["pieces"]


def seed_piece_table(
    word_freqs: DataFrame,
    max_len: int = 4,
    seed_size: int = 32,
) -> DataFrame:
    """Candidate seed pieces: every substring of length 2..max_len of
    every distinct word, scored by occurrence-weighted count, top
    ``seed_size`` kept (count desc, piece asc — deterministic), PLUS
    every single character (the coverage floor that guarantees every
    word segments). Substring explosion fans out ≤ len·max_len per
    DISTINCT word — corpus size never enters. Returns (piece, count).
    """
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(2),
                    F.greatest(
                        F.least(
                            F.lit(max_len), F.length("word") - i + 1
                        ),
                        F.lit(1),
                    ),
                ),
                lambda l: F.col("word").substr(i, l),
            ),
        )
    )
    multi = (
        word_freqs.select("count", F.explode(subs).alias("piece"))
        .filter(F.length("piece") >= 2)
        .groupBy("piece")
        .agg(F.sum("count").alias("count"))
        .orderBy(F.desc("count"), F.asc("piece"))
        .limit(seed_size)
    )
    chars = (
        word_freqs.select(
            "count",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.col("word").substr(i, F.lit(1)),
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("count").alias("count"))
    )
    return multi.unionByName(chars).groupBy("piece").agg(
        F.max("count").alias("count")
    )


def _counts_to_vocab(rows: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """(piece, count) → (piece, millibits) with millibits =
    max(1, round(−log2(count/total)·1000)). Sorted (piece asc) so the
    vocab literal is order-stable."""
    total = sum(c for _, c in rows)
    out = [
        (p, max(1, round(-math.log2(c / total) * 1000)))
        for p, c in rows
    ]
    return sorted(out)


def train_unigram(
    word_freqs: DataFrame,
    max_len: int = 4,
    seed_size: int = 32,
    vocab_size: int = 24,
    em_rounds: int = 3,
) -> list[tuple[str, int]]:
    """Hard-EM unigram-LM training over the (word, count) table.

    Each round: Viterbi-segment every DISTINCT word under the current
    integer-cost vocab (JVM fold), count pieces weighted by word
    frequency (E), re-derive integer millibit costs from the counts
    (M), and prune to ``vocab_size`` multi-char pieces by
    (count desc, piece asc) — single characters are never pruned
    (coverage floor). Driver-side state is the bounded vocab list
    only, exactly like bpe_train's merge list. Fully deterministic:
    integer costs, pinned tie-breaks, no RNG.
    """
    wf = word_freqs.localCheckpoint()
    seed = seed_piece_table(wf, max_len=max_len, seed_size=seed_size)
    vocab = _counts_to_vocab(
        [(r["piece"], r["count"]) for r in seed.collect()]
    )
    for _ in range(em_rounds):
        cmap = piece_cost_map(vocab)
        segged = wf.select(
            "count", _dp_backtrack(F.col("word"), cmap, max_len).alias("pieces")
        )
        counts = (
            segged.select("count", F.explode("pieces").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("count").alias("count"))
        )
        rows = [(r["piece"], r["count"]) for r in counts.collect()]
        got = dict(rows)
        # coverage floor: every single char of the CURRENT vocab
        # survives with count ≥ 1 even when this round's Viterbi
        # never used it standalone (e.g. 'n' fully absorbed into
        # 'scan'/'lumn') — otherwise ad-hoc text containing that
        # char would be unsegmentable under the trained vocab.
        chars = [
            (p, max(got.get(p, 0), 1)) for p, _ in vocab if len(p) == 1
        ]
        multi = sorted(
            [(p, c) for p, c in rows if len(p) > 1],
            key=lambda pc: (-pc[1], pc[0]),
        )[:vocab_size]
        vocab = _counts_to_vocab(chars + multi)
    return vocab


def unigram_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: list[tuple[str, int]],
    max_len: int = 4,
) -> DataFrame:
    """Per-document token counts under a fixed unigram vocab: ONE
    corpus pass (explode words) joined against the broadcast
    word→(n_tokens, millibits) table built from the corpus's own
    distinct words — the same type/token leverage as
    bpe_token_counts. Returns (doc_id, n_words, n_tokens,
    total_millibits)."""
    from bio_lakehouse_spark.operators.textops import words

    wpd = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(text_col)).alias("word"),
    ).filter(F.length("word") > 0)
    lut = unigram_word_tokens(
        wpd.select("word").distinct(), "word", vocab, max_len=max_len
    )
    return (
        wpd.join(F.broadcast(lut), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("millibits").cast("long").alias("total_millibits"),
        )
    )


def unigram_token_counter(
    vocab: list[tuple[str, int]], max_len: int = 4
):
    """``TokenCounterFn`` adapter (textops.token_counter seam): a
    pandas-side Viterbi encoder over the same integer combined costs
    — exact parity with the distributed fold is property-pinned in
    tests/test_unigram_lm.py."""
    import re as _re

    wordre = _re.compile(r"[a-z0-9]+")
    cmap = {p: b * _PIECES_SCALE + 1 for p, b in vocab}

    def encode_word(w: str) -> int:
        n = len(w)
        if n >= _PIECES_SCALE:
            # same packing guard as unigram_word_tokens: n_pieces
            # would bleed into the millibits field. Character count
            # is the exact token count for a char-closure vocab's
            # worst case, and it keeps the counter total-safe.
            return n
        dp = [0] + [None] * n
        for i in range(1, n + 1):
            best = None
            for l in range(1, min(max_len, i) + 1):
                c = cmap.get(w[i - l : i])
                prev = dp[i - l]
                cand = (prev if prev is not None else _BIG) + (
                    c if c is not None else _BIG
                )
                best = cand if best is None else min(best, cand)
            dp[i] = best
        return dp[n] % _PIECES_SCALE

    def count_series(s):
        return s.map(
            lambda t: sum(
                encode_word(w) for w in wordre.findall(str(t).lower())
            )
        )

    return count_series


# The published "pretrained" integer-cost vocab: trained on the
# sf0.001 documents corpus with the defaults above (deterministic —
# integer millibits, pinned tie-breaks), then frozen here so the
# ENCODER can be differentially tested against an independent
# unrolled-DP SQL implementation (suite.text_queries.
# unigram_encode_fixed) and ad-hoc callers get a TokenCounterFn
# without a training pass. Regenerate with tools/train_unigram_v1.py.
PRETRAINED_UNIGRAM_V1: list[tuple[str, int]] = [
    ("a", 4287), ("al", 5607), ("as", 6608),
    ("at", 5640), ("b", 5058), ("c", 5044),
    ("co", 6525), ("d", 4969), ("e", 3795),
    ("er", 5573), ("f", 5621), ("g", 4271),
    ("h", 4618), ("i", 5639), ("in", 4978),
    ("j", 6588), ("k", 5601), ("l", 4296),
    ("lumn", 6525), ("m", 5631), ("mer", 5626),
    ("n", 16458), ("o", 5625), ("or", 4967),
    ("ow", 5026),
    ("p", 6547), ("par", 5587), ("q", 6591),
    ("r", 5050), ("ro", 6591), ("s", 4604),
    ("scan", 6516), ("st", 5048), ("t", 4261),
    ("ta", 6640), ("u", 5604), ("ue", 5579),
    ("v", 5581), ("w", 6528), ("y", 5583),
]
