"""Similarity-search queries over the `embeddings` table.

Brute-force exact top-k (the baseline), IVF coarse-quantized top-k
(the scale path), and blocked cosine near-dup pairs. Dot products are
fold-left double arithmetic in both engines so the oracle reproduces
scores to float precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
)
from bio_lakehouse_spark.suite.registry import load, register

R6 = lambda c: F.round(c, 6)  # noqa: E731

# DuckDB double-precision cosine between two float lists.
_COS = (
    "(list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    " / (sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
    " * sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE)))))"
)


@register(
    "ann_cosine_topk",
    survey=("O4", "F9", "W9"),
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_COS.format(a='q.qv', b='c.embedding')} AS cos_sim
  FROM embeddings c, q
  WHERE c.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, ROUND(cos_sim, 6) AS cos_sim
FROM ranked WHERE rank <= 5
""",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 per query (queries = every 50th
    vector): broadcast query set × one corpus scan, per-partition
    top-k merge via the rank window. The exactness baseline every ANN
    variant is judged against."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    out = cosine_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", "rank", R6(F.col("cos_sim")).alias("cos_sim")
    )


@register(
    "ann_ivf_topk",
    survey=("O4", "F9", "J5"),
    oracle=f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id % 25 = 0
), assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT v.vec_id, v.embedding, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {_COS.format(a='v.embedding', b='cent.cv')} DESC, cent.centroid_id) AS rn
    FROM embeddings v, cent
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0
), probed AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT q.query_id, q.qv, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY {_COS.format(a='q.qv', b='cent.cv')} DESC, cent.centroid_id) AS rn
    FROM q, cent
  ) WHERE rn <= 3
), scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_COS.format(a='p.qv', b='a.embedding')} AS cos_sim
  FROM probed p JOIN assigned a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, ROUND(cos_sim, 6) AS cos_sim
FROM ranked WHERE rank <= 5
""",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: every 25th vector seeds a cell, vectors
    assign to their nearest centroid (broadcast), queries probe the 3
    nearest cells — candidate join is an equi-join on centroid_id, so
    at 100 TB the search cost is nprobe/ncells of brute force and the
    shuffle is keyed, never a cross join. Deterministic pipeline →
    exactly reproduced by the SQL oracle."""
    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    out = ivf_topk(emb, queries, centroids, k=5, nprobe=3)
    return out.select(
        "query_id", "neighbor_id", "rank", R6(F.col("cos_sim")).alias("cos_sim")
    )


@register(
    "embedding_neardup",
    survey=("J6", "F9"),
    oracle=f"""
SELECT vec_a, vec_b, ROUND(cos_raw, 6) AS cos_sim FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         {_COS.format(a='a.embedding', b='b.embedding')} AS cos_raw
  FROM embeddings a JOIN embeddings b
    ON a.vec_id < b.vec_id AND a.label = b.label
) WHERE cos_raw >= 0.35
""",
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked by label (cos ≥ 0.35):
    the semantic-dedup primitive; at scale the label block becomes an
    LSH/IVF bucket with the identical join shape."""
    emb = load(spark, sf_dir, "embeddings")
    out = embedding_neardup_pairs(
        emb, block_col="label", threshold=0.35
    )
    return out.select("vec_a", "vec_b", R6(F.col("cos_sim")).alias("cos_sim"))


@register("kmeans_ivf_centroids", survey=("ST14",), oracle=None)
def kmeans_ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's KMeans (k=8, 3 iterations, deterministic
    init) over the embedding corpus — the iterative-algorithm shape on
    DataFrames and the trainer for real IVF centroids (upgrade path
    from ann_ivf_topk's id-sampled cells). Two shuffles per iteration
    independent of corpus size. Rows-only: iterative, not
    SQL-expressible; pinned against a numpy twin in
    tests/test_streaming_multimodal.py."""
    from bio_lakehouse_spark.operators.similarity import kmeans_lloyd

    emb = load(spark, sf_dir, "embeddings")
    out = kmeans_lloyd(emb, k=8, n_iters=3)
    return out.select(
        "centroid_id",
        F.round(F.element_at("centroid", 1), 6).alias("c0"),
        F.round(F.element_at("centroid", 2), 6).alias("c1"),
        F.round(F.element_at("centroid", 3), 6).alias("c2"),
        "n_members",
    )
