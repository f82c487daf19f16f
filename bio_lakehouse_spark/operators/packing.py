"""Sequence packing: place documents into fixed-size context windows.

The concat-and-chunk strategy LLM training pipelines use (concatenate
the token stream in a deterministic document order, slice into
ctx-sized chunks): each document's placement is fully determined by
the exclusive running token count before it, so packing is a window
cumsum — no bin-packing search, no driver loop.

Scale shape: packing is inherently sequential *within* a stream, so
the operator shards the corpus first (hash of the id → shard) and
packs each shard independently — shards are the unit of parallelism
exactly as training shards are in practice. The window sorts only
within a shard partition; no global sort, no single-task stage.

Beyond-reference training-pipeline operator (reference has no text
corpus tooling; closest analog is its daily batch chunking of
ingestion files, glue/oura_normalizer.py:98-148).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: Column | str,
    ctx: int = 2048,
    num_shards: int = 8,
    shard_col: Column | None = None,
) -> DataFrame:
    """Assign every document a (shard, chunk) placement.

    Returns one row per document:
      shard         pmod(xxhash64(id), num_shards) — the pack stream
                    (or ``shard_col`` when given, e.g. a cross-engine
                    deterministic ``id % k``)
      doc_id        the document id
      n_tok         the document's token count
      start_off     exclusive cumsum of tokens before it in its shard
                    (order = id ascending, deterministic)
      chunk_first   start_off div ctx — first context window touched
      chunk_last    (start_off + n_tok - 1) div ctx — last window
      n_chunks      windows the document spans

    Empty documents (0 tokens) occupy no window: chunk_last <
    chunk_first and n_chunks = 0.
    """
    shard = (
        shard_col
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards))
    )
    base = df.select(
        shard.alias("shard"),
        F.col(id_col).alias("doc_id"),
        (
            tokens_col
            if isinstance(tokens_col, Column)
            else F.col(tokens_col)
        ).alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = base.withColumn(
        "start_off", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    )
    # greatest(n_tok, 1) keeps the dividend non-negative for empty
    # docs — negative integer division floors in some engines and
    # truncates in others, so the expression stays in the domain
    # where they agree.
    chunk_first = F.expr(f"start_off div {ctx}")
    chunk_last = F.expr(f"(start_off + greatest(n_tok, 1) - 1) div {ctx}")
    return placed.select(
        "shard",
        "doc_id",
        "n_tok",
        "start_off",
        chunk_first.alias("chunk_first"),
        chunk_last.alias("chunk_last"),
        F.when(F.col("n_tok") == 0, F.lit(0))
        .otherwise(chunk_last - chunk_first + 1)
        .alias("n_chunks"),
    )


def chunk_with_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Sliding-window document chunker — the RAG / long-context prep
    step: split each document's token stream into ``chunk_size``-token
    windows advancing by ``stride = chunk_size - overlap``, so
    consecutive chunks share ``overlap`` tokens and every token is
    covered. Chunk count per doc is 1 when n ≤ chunk_size, else
    ceil((n - chunk_size)/stride) + 1 (the standard sliding-window
    formula; the last chunk may be short but never empty).

    Pure per-row array expressions (split → sequence → slice →
    posexplode): zero shuffles, runs at the scan, output rows ≈
    corpus_tokens / stride. Returns (id, chunk_id, start_tok, n_tok,
    chunk_text).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}"
        )
    stride = chunk_size - overlap
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_size)) / F.lit(float(stride))).cast("int")
        + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            (i * stride).alias("start_tok"),
            F.array_join(
                F.slice(w, i * stride + 1, chunk_size), " "
            ).alias("chunk_text"),
            F.least(F.lit(chunk_size), n - i * stride).alias("n_tok"),
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "c")
    ).select(
        id_col,
        "chunk_id",
        F.col("c.start_tok").alias("start_tok"),
        F.col("c.n_tok").alias("n_tok"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def pack_pairs_minimal_padding(
    df: DataFrame,
    id_col: str,
    tokens_col: Column | str,
    n_shards: int = 8,
) -> DataFrame:
    """Paired packing: within each shard, rank documents by token
    count and pair the i-th longest with the i-th shortest. For even
    shard sizes this PROVABLY minimizes the maximum bin load over all
    perfect matchings (sorted two-partition pairing — brute-force-
    verified by the property test); an odd shard leaves the median
    document alone, a heuristic that can be off optimum (e.g.
    [1,1,2]: singling out the 2 would be better), accepted because
    choosing the optimal singleton needs an O(n) search per shard
    that no window expression gives. Padding variance still
    collapses versus arrival-order packing. The multi-item
    generalization (first-fit decreasing) is inherently sequential;
    pairing is the rung of that ladder that stays a pure window
    expression.

    One window per shard (shards are the parallelism unit, as in
    pack_sequences — no global sort). Odd shard counts leave the
    median document alone in its bin (partner id -1). Returns
    (shard, bin_id, long_id, short_id, pair_tok).
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    base = df.select(
        F.col(id_col).alias("doc"),
        t.cast("long").alias("n_tok"),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(
        F.desc("n_tok"), F.asc("doc")
    )
    ranked = base.select(
        "shard",
        "doc",
        "n_tok",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("shard")).alias("n"),
    )
    binned = ranked.select(
        "shard",
        F.least(F.col("r"), F.col("n") - F.col("r") + 1).alias("bin_id"),
        (F.col("r") * 2 <= F.col("n")).alias("is_long"),
        # strictly-lower half = long side; upper half = short side;
        # the exact middle of an odd shard sits alone (is_long false,
        # bin has one member).
        "doc",
        "n_tok",
    )
    return (
        binned.groupBy("shard", "bin_id")
        .agg(
            F.max(F.when(F.col("is_long"), F.col("doc"))).alias("__long"),
            F.max(F.when(~F.col("is_long"), F.col("doc"))).alias("__short"),
            F.sum("n_tok").alias("pair_tok"),
        )
        .select(
            "shard",
            "bin_id",
            # a 1-member bin (odd middle) carries its doc on the
            # short side; promote it to long and mark no partner.
            F.coalesce(F.col("__long"), F.col("__short")).alias("long_id"),
            F.when(F.col("__long").isNull(), F.lit(-1))
            .otherwise(F.coalesce(F.col("__short"), F.lit(-1)))
            .alias("short_id"),
            "pair_tok",
        )
    )
