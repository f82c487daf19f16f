"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Broadcast the (small) query set against the corpus: one scan, no
  shuffle of the corpus, per-partition top-k then global merge.
- ``embedding_neardup_pairs``: blocked pairwise near-dup scan.
- ``ivf_topk``: the scale path — coarse quantization (IVF): assign
  every vector to its nearest centroid (broadcast centroids), probe
  only the ``nprobe`` nearest cells per query. Search cost drops from
  O(N) to O(N · nprobe / ncells) per query; the cell assignment is a
  deterministic argmax so an external oracle can replicate it exactly.

Dot products use fold-left double arithmetic (zip_with + aggregate) —
built-in higher-order functions, JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision via zip_with + left-fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force baseline).

    The query side is broadcast; ranking is a window partitioned by
    query id with a deterministic (cosine desc, neighbor id) order.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.35,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold, blocked to bound
    the quadratic join (at scale: replace the block with LSH buckets —
    same join shape, hashed key)."""
    cols = [F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")]
    if block_col:
        cols.append(F.col(block_col).alias("block"))
    v = df.select(*cols)
    a, b = v.alias("a"), v.alias("b")
    cond = F.col("a.vid") < F.col("b.vid")
    if block_col:
        cond = cond & (F.col("a.block") == F.col("b.block"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            cosine(F.col("a.vec"), F.col("b.vec")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine (argmax with
    deterministic centroid-id tie-break). Centroids broadcast; the
    corpus streams through once."""
    cent = centroids.select(
        F.col(centroid_id), F.col(vec_col).alias("cent_vec")
    )
    scored = corpus.crossJoin(F.broadcast(cent)).select(
        F.col(id_col),
        vec_col,
        centroid_id,
        cosine(F.col(vec_col), F.col("cent_vec")).alias("cent_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("cent_sim"), F.asc(centroid_id)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "cent_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` nearest cells per
    query, exact cosine rank within the probed cells. The
    candidate join is an equi-join on centroid_id — shuffle keyed by
    cell, never a full cross join."""
    assigned = assign_cells(corpus, centroids, id_col, vec_col)
    q_cells = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        .crossJoin(
            F.broadcast(
                centroids.select("centroid_id", F.col(vec_col).alias("cent_vec"))
            )
        )
        .select(
            "query_id",
            "q_vec",
            "centroid_id",
            cosine(F.col("q_vec"), F.col("cent_vec")).alias("cent_sim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("cent_sim"), F.asc("centroid_id")
    )
    probed = (
        q_cells.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )
    cand = probed.join(
        assigned.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            "centroid_id",
        ),
        on="centroid_id",
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
