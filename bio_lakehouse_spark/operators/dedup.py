"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-pipeline dedup at corpus scale. Strategy ladder:

- **exact**: md5 of normalized text, one groupBy — O(n), always first.
- **n-gram Jaccard (blocked)**: exact set similarity inside small
  blocks (language/source) — quadratic per block, exact answer.
- **MinHash + LSH**: the 100 TB path — per-doc signature (k md5-derived
  minhashes), banding → candidate pairs via an equi-join on band
  buckets (shuffle on bucket id, never a cross join), then exact
  Jaccard verification of candidates only. Miss probability per pair
  with jaccard s is (1-s)^k (k single-row bands) — k=16 gives
  1.5e-5 at s=0.5.
- **SimHash**: 32-bit signature whose hamming distance tracks cosine
  similarity of the shingle sets; pairs compared inside blocks via
  xor/bit_count.

All hashes derive from md5 hex strings so any engine (the DuckDB
oracle included) reproduces them bit-for-bit; minhash values compare
lexicographically, which is uniform on hex strings.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.textops import word_ngrams, words

DEFAULT_NUM_HASHES = 16


def exact_dedup_groups(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text
    with the kept (minimum) id and the duplicate count."""
    from bio_lakehouse_spark.operators.textops import fingerprint_exact

    return (
        df.select(
            F.col(id_col), fingerprint_exact(text_col).alias("text_hash")
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingles) — distinct word n-gram sets."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        word_ngrams(words(text_col), n).alias("shingles"),
    )


def _jaccard(a, b):
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(
        F.array_union(a, b)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact blocked pairwise Jaccard: quadratic only inside each
    block (the blocking key bounds the join fan-out; at scale the
    blocks shuffle independently)."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        *block_cols,
        word_ngrams(words(text_col), n).alias("shingles"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    cond = F.col("a.doc_id") < F.col("b.doc_id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    jac = _jaccard(F.col("a.shingles"), F.col("b.shingles"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = DEFAULT_NUM_HASHES
) -> DataFrame:
    """(doc_id, shingles, minhash_0..k-1): minhash_j = MIN over
    shingles of md5('<j>:' || shingle), compared lexicographically.
    Engine-portable (md5 hex is identical everywhere) and exactly
    reproducible by the SQL oracle."""
    sig_cols = [
        F.array_min(
            F.transform(
                F.col("shingles"), lambda s: F.md5(F.concat(F.lit(f"{j}:"), s))
            )
        ).alias(f"mh_{j}")
        for j in range(num_hashes)
    ]
    return sh.select("doc_id", "shingles", *sig_cols)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = DEFAULT_NUM_HASHES,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash LSH candidate generation + exact verification.

    Candidates = pairs sharing ANY of the ``num_hashes`` single-row
    bands, found by exploding (band, value) and self-joining on the
    bucket — an equi-join shuffle keyed on the hash value, the shape
    that survives 100 TB (no cross join anywhere). Candidates then
    get exact Jaccard on their shingle sets; only >= threshold
    survive. Probabilistic recall: P(miss) = (1-s)^num_hashes.
    """
    sh = shingle_sets(df, id_col, text_col, n)
    sig = minhash_signatures(sh, num_hashes)
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"), F.col(f"mh_{j}").alias("value")
            )
            for j in range(num_hashes)
        ]
    )
    exploded = sig.select(
        "doc_id", F.explode(bands).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.value").alias("value"))
    cand = (
        exploded.alias("x")
        .join(
            exploded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.value") == F.col("y.value"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    shingled = sh.select(
        F.col("doc_id"), F.col("shingles")
    )
    verified = (
        cand.join(
            shingled.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "shingles", "sh_a"
            ),
            on="doc_a",
        )
        .join(
            shingled.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "shingles", "sh_b"
            ),
            on="doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def simhash32(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """32-bit SimHash over word n-gram shingles.

    Bit p of the signature is the sign of Σ over shingles of ±1,
    where +1 iff the p-th hex nibble of md5(shingle) has its top bit
    set. Engine-portable for the same reason as minhash: everything
    derives from md5 hex characters.
    """
    sh = shingle_sets(df, id_col, text_col, n)
    hashed = sh.select(
        "doc_id",
        F.transform(F.col("shingles"), lambda s: F.md5(s)).alias("hashes"),
    )
    bit_sums = []
    for p in range(1, 33):
        contrib = F.aggregate(
            F.col("hashes"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                F.substring(h, p, 1).isin(*"89abcdef"), F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        bit_sums.append(
            F.when(contrib > 0, F.lit(2 ** (p - 1)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    total = bit_sums[0]
    for b in bit_sums[1:]:
        total = total + b
    return hashed.select("doc_id", total.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str] = (),
    n: int = 3,
    max_hamming: int = 6,
) -> DataFrame:
    """Blocked SimHash pairs with hamming distance ≤ ``max_hamming``
    (xor + bit_count)."""
    sig = simhash32(df, id_col, text_col, n)
    if block_cols:
        sig = sig.join(
            df.select(F.col(id_col).alias("doc_id"), *block_cols), on="doc_id"
        )
    a, b = sig.alias("a"), sig.alias("b")
    cond = F.col("a.doc_id") < F.col("b.doc_id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
