"""Deterministic sampling queries: train/val/test split and
class-balanced downsampling over the documents table.

Both are pure hash-threshold filters (operators/sampling), so the
DuckDB oracle reproduces the EXACT sampled rows — the driver's
value-hash gate verifies the sample membership itself, not just
counts. That is the property that makes these usable as a dataset
contract: any engine that computes md5 identically yields the same
split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.sampling import (
    assign_split,
    balanced_downsample,
    group_sample,
    weighted_sample,
)
from bio_lakehouse_spark.suite.registry import load, register

R6 = lambda c: F.round(c, 6)  # noqa: E731

# DuckDB twin of hash_unit(doc_id, salt): uniform [0,1) from the top
# 60 bits of md5(salt || doc_id).
_U = (
    "(CAST(concat('0x', substr(md5(concat('{salt}', CAST(doc_id AS VARCHAR))),"
    " 1, 15)) AS BIGINT) / {two60!r})"
).format


@register(
    "train_val_test_split",
    survey=("P8", "A1"),
    oracle=f"""
WITH labeled AS (
  SELECT n_chars, lang,
         CASE WHEN {_U(salt='split:', two60=float(1 << 60))} < 0.8 THEN 'train'
              WHEN {_U(salt='split:', two60=float(1 << 60))} < 0.9 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 6) AS avg_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM labeled GROUP BY split
""",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split of the documents corpus, keyed
    on md5(doc_id): content-addressed, so a document's split never
    changes when the corpus grows, is repartitioned, or is re-split
    by a different engine — unlike ``df.sample``'s per-partition RNG.
    The label is a scan-level expression (no shuffle added beyond the
    reporting agg); at 100 TB the split is a free column on write."""
    docs = load(spark, sf_dir, "documents")
    labeled = assign_split(
        docs, F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return labeled.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


@register(
    "balanced_lang_downsample",
    survey=("A1", "J5"),
    oracle=f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
), rates AS (
  SELECT lang, CAST((SELECT MIN(n) FROM counts) AS DOUBLE) / n AS rate
  FROM counts
), sampled AS (
  SELECT d.lang, d.n_chars
  FROM documents d JOIN rates USING (lang)
  WHERE {_U(salt='bal:', two60=float(1 << 60))} < rate
)
SELECT s.lang,
       COUNT(*) AS n_sampled,
       ANY_VALUE(c.n) AS n_total,
       ROUND(AVG(s.n_chars), 6) AS avg_chars
FROM sampled s JOIN counts c USING (lang)
GROUP BY s.lang
""",
)
def balanced_lang_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced corpus: every language hash-downsampled to the
    expected size of the rarest one (rate = min|lang| / |lang|). The
    per-stratum rate table is a handful of rows joined broadcast, so
    the whole operator is one scan + filter — the standard cure for
    language skew in pretraining mixes, shuffle-free at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    sampled = balanced_downsample(docs, F.col("doc_id"), "lang")
    totals = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .join(F.broadcast(totals), "lang")
        .select("lang", "n_sampled", "n_total", "avg_chars")
    )


@register(
    "weighted_doc_sample",
    survey=("O4", "A13"),
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang, n_chars,
         POWER({_U(salt='ws:', two60=float(1 << 60))},
               1.0 / CAST(n_chars AS DOUBLE)) AS sample_key
  FROM documents
)
SELECT doc_id, lang, n_chars, ROUND(sample_key, 6) AS sample_key
FROM scored
ORDER BY sample_key DESC, doc_id
LIMIT 50
""",
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted sample of 50 documents without replacement
    (Efraimidis-Spirakis: keep the largest u^(1/n_chars), u from the
    deterministic md5 hash). Inclusion odds scale with document
    length — the standard long-document upweighting for pretraining
    mixes — and the EXACT membership is reproduced by the oracle.
    Physically a TakeOrderedAndProject (per-partition top-k, no
    global sort shuffle), so the cost at 100 TB is one scan."""
    docs = load(spark, sf_dir, "documents")
    picked = weighted_sample(
        docs, F.col("doc_id"), F.col("n_chars"), k=50
    )
    return picked.select(
        "doc_id", "lang", "n_chars", F.round("sample_key", 6).alias("sample_key")
    )


@register(
    "eval_set_per_lang",
    survey=("W7", "O3"),
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY CAST(concat('0x', substr(md5(concat('gs:',
                    CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
         ) AS rn
  FROM documents
)
SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= 20
""",
)
def eval_set_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out eval set: exactly 20 documents per language, chosen
    as the 20 smallest key-hashes within each language — a guaranteed
    per-class count (rate sampling can't promise that) that stays
    FIXED as the corpus grows, because a new document only enters the
    eval set by hashing below an incumbent. One shuffle on lang; each
    stratum ranks independently."""
    docs = load(spark, sf_dir, "documents")
    picked = group_sample(docs, F.col("doc_id"), ["lang"], k=20)
    return picked.select("doc_id", "lang", "n_chars")


@register(
    "temperature_mixture_sample",
    survey=("A1", "J5"),
    oracle=f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS total,
         SUM(sqrt(CAST(n AS DOUBLE))) AS z
  FROM counts
), rates AS (
  SELECT source, n,
         LEAST(1.0, total * sqrt(CAST(n AS DOUBLE)) / (z * n)) AS rate
  FROM counts, tot
), sampled AS (
  SELECT d.source, d.n_chars, r.rate, r.n
  FROM documents d JOIN rates r USING (source)
  WHERE {_U(salt='temp:', two60=float(1 << 60))} < r.rate
)
SELECT source,
       ANY_VALUE(n) AS n_total,
       COUNT(*) AS n_sampled,
       ROUND(ANY_VALUE(rate), 6) AS mix_rate,
       ROUND(AVG(n_chars), 6) AS avg_chars
FROM sampled GROUP BY source
""",
)
def temperature_mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixture at alpha=0.5 (the
    multilingual-LM upsampling rule: rate_s ∝ n_s^alpha / n_s, so
    rare sources keep everything and dominant sources downsample).
    Content-addressed membership → the oracle reproduces the EXACT
    sampled set, and a document's fate never changes when other
    sources grow. One broadcast rate row per source; the only
    full-data pass is scan + filter."""
    from bio_lakehouse_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    docs = load(spark, sf_dir, "documents")
    sampled = temperature_mixture_sample(
        docs, F.col("doc_id"), "source", alpha=0.5
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    return (
        sampled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.first("mix_rate"), 6).alias("mix_rate"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .join(F.broadcast(totals), "source")
        .select("source", "n_total", "n_sampled", "mix_rate", "avg_chars")
    )


# hash_unit over an ORDER key (the other macros hash doc_id).
_UO = (
    "(CAST(concat('0x', substr(md5(concat('{salt}',"
    " CAST(o_orderkey AS VARCHAR))), 1, 15)) AS BIGINT) / {two60!r})"
).format


@register(
    "target_encode_oof",
    survey=("A1", "F5"),
    oracle=f"""
WITH folded AS (
  SELECT o_orderpriority AS category, o_totalprice AS y,
         CAST(FLOOR({_UO(salt='fold:', two60=float(1 << 60))} * 5) AS INTEGER)
           AS fold
  FROM orders
), per_fold AS (
  SELECT category, fold, SUM(y) AS s, COUNT(*) AS n
  FROM folded GROUP BY 1, 2
), with_tot AS (
  SELECT category, fold, n, s,
         SUM(s) OVER (PARTITION BY category) AS s_cat,
         SUM(n) OVER (PARTITION BY category) AS n_cat
  FROM per_fold
)
SELECT category, fold, n AS n_fold,
       ROUND((s_cat - s) / (n_cat - n), 6) AS enc
FROM with_tot ORDER BY category, fold
""",
)
def target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target (mean) encoding — the leakage-free
    categorical encoder every tabular-ML pipeline ships: each row's
    category is encoded by the target mean computed WITHOUT its own
    fold, enc(c, k) = (Σ_c − Σ_{{c,k}}) / (n_c − n_{{c,k}}).

    Folds are deterministic md5-hash buckets (same contract as the
    split/sampling family), so the oracle reproduces the exact
    encodings. One groupBy over the facts; the out-of-fold arithmetic
    is windows over the |C|×K frame.
    """
    from bio_lakehouse_spark.operators.sampling import hash_unit
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    folded = orders.select(
        F.col("o_orderpriority").alias("category"),
        F.col("o_totalprice").alias("y"),
        F.floor(hash_unit(F.col("o_orderkey"), salt="fold:") * 5)
        .cast("int")
        .alias("fold"),
    )
    per_fold = folded.groupBy("category", "fold").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    wc = Window.partitionBy("category")
    return (
        per_fold.select(
            "category",
            "fold",
            F.col("n").alias("n_fold"),
            # try_divide (r12 ANSI audit): a category whose rows all
            # hash into ONE fold (certain for 1-row rare categories)
            # has no out-of-fold rows — the encoding is undefined →
            # NULL (the consumer's fallback-to-global convention),
            # not a job abort.
            F.round(
                F.try_divide(
                    F.sum("s").over(wc) - F.col("s"),
                    F.sum("n").over(wc) - F.col("n"),
                ),
                6,
            ).alias("enc"),
        )
        .orderBy("category", "fold")
    )


@register(
    "neyman_stratified_sample",
    survey=("A10", "P8"),
    oracle=f"""
WITH strata AS (
  SELECT lang, COUNT(*) AS n_h, STDDEV_SAMP(n_chars) AS sd_h
  FROM documents GROUP BY lang
), alloc AS (
  SELECT lang, n_h, sd_h,
         100.0 * n_h * sd_h / SUM(n_h * sd_h) OVER () AS n_alloc
  FROM strata
), sampled AS (
  SELECT d.lang, COUNT(*) AS n_sampled
  FROM documents d JOIN alloc a USING (lang)
  WHERE {_U(salt='ney:', two60=float(1 << 60))} < a.n_alloc / a.n_h
  GROUP BY d.lang
)
SELECT a.lang, a.n_h, ROUND(a.sd_h, 6) AS sd_h,
       ROUND(a.n_alloc, 6) AS n_alloc,
       COALESCE(s.n_sampled, 0) AS n_sampled
FROM alloc a LEFT JOIN sampled s USING (lang)
ORDER BY a.lang
""",
)
def neyman_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sampling: a 100-row budget is
    split across language strata ∝ N_h·σ_h (minimum-variance
    allocation for estimating mean doc length), then drawn as a
    deterministic hash-threshold filter at rate n_h_alloc/N_h per
    stratum — the variance-optimal upgrade of proportional
    stratified sampling, same reproducible-membership contract as
    the rest of the sampling family. Stats aggregate once and join
    back broadcast; the corpus is never shuffled.
    """
    from bio_lakehouse_spark.operators.sampling import hash_unit
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    strata = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.stddev_samp("n_chars").alias("sd_h"),
    )
    # try_divide (r12 ANSI audit): when EVERY stratum is internally
    # constant (sd_h = 0 for all — think single-template docs), the
    # Neyman denominator Σ n_h·sd_h is exactly 0 and the optimal
    # allocation is undefined → NULL weights, not a job abort.
    alloc = strata.withColumn(
        "n_alloc",
        F.try_divide(
            100.0 * F.col("n_h") * F.col("sd_h"),
            F.sum(F.col("n_h") * F.col("sd_h")).over(
                Window.partitionBy()
            ),
        ),
    )
    sampled = (
        docs.join(F.broadcast(alloc), "lang")
        .filter(
            hash_unit(F.col("doc_id"), salt="ney:")
            < F.col("n_alloc") / F.col("n_h")
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        alloc.join(sampled, "lang", "left")
        .select(
            "lang",
            "n_h",
            F.round("sd_h", 6).alias("sd_h"),
            F.round("n_alloc", 6).alias("n_alloc"),
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
        .orderBy("lang")
    )


_UG = (
    "(CAST(concat('0x', substr(md5(concat('gsplit:',"
    " CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) / {two60!r})"
).format


@register(
    "group_split_no_leakage",
    survey=("P8", "A11"),
    oracle=f"""
WITH assigned AS (
  SELECT user_id,
         CASE WHEN {_UG(two60=float(1 << 60))} < 0.8 THEN 'train'
              ELSE 'test' END AS split,
         value
  FROM events WHERE value IS NOT NULL
), per_split AS (
  SELECT split, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_rows,
         ROUND(AVG(value), 6) AS avg_value
  FROM assigned GROUP BY split
), overlap AS (
  SELECT COUNT(*) AS n_leaked_users FROM (
    SELECT user_id FROM assigned GROUP BY user_id
    HAVING COUNT(DISTINCT split) > 1
  )
)
SELECT p.split, p.n_users, p.n_rows, p.avg_value,
       o.n_leaked_users
FROM per_split p CROSS JOIN overlap o
ORDER BY p.split
""",
)
def group_split_no_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/test split (GroupKFold semantics): the split
    is a function of the GROUP key (user), so no user's rows span
    both sides — the leakage mode a row-level split silently commits
    when rows within a user correlate. The audit column proves it:
    n_leaked_users (users seen in >1 split) is part of the
    hash-gated output and must be 0 by construction."""
    from bio_lakehouse_spark.operators.sampling import hash_unit
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    assigned = ev.select(
        "user_id",
        "value",
        F.when(hash_unit(F.col("user_id"), salt="gsplit:") < 0.8, "train")
        .otherwise("test")
        .alias("split"),
    )
    per_split = assigned.groupBy("split").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_rows"),
        R6(F.avg("value")).alias("avg_value"),
    )
    overlap = (
        assigned.groupBy("user_id")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n_leaked_users"))
    )
    return (
        per_split.crossJoin(F.broadcast(overlap))
        .select("split", "n_users", "n_rows", "avg_value", "n_leaked_users")
        .orderBy("split")
    )


@register(
    "poststratification_weights",
    survey=("A6", "F5"),
    oracle="""
WITH source AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
), tot AS (
  SELECT SUM(n) AS nt, COUNT(*) AS k FROM source
), weights AS (
  SELECT s.lang, s.n,
         s.n * 1.0 / t.nt AS p_source,
         1.0 / t.k AS p_target,
         (1.0 / t.k) / (s.n * 1.0 / t.nt) AS w
  FROM source s CROSS JOIN tot t
)
SELECT lang, n, ROUND(p_source, 6) AS p_source,
       ROUND(p_target, 6) AS p_target, ROUND(w, 6) AS weight,
       ROUND((SELECT SUM(n * w) * SUM(n * w) FROM weights)
             / ((SELECT SUM(n * w * w) FROM weights)
                * (SELECT SUM(n) FROM weights)), 6) AS ess_fraction
FROM weights ORDER BY lang
""",
)
def poststratification_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratification importance weights: reweight each language
    stratum from its corpus share to a uniform target marginal
    (w = p_target/p_source), with Kish's effective-sample-size
    fraction (Σnw)²/(Σnw²·Σn) showing how much statistical power the
    reweighting costs — the survey-statistics primitive behind
    debiasing a skewed training mixture without resampling it. One
    stratum aggregate; everything else is arithmetic over the
    |strata| frame."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    source = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    wall = Window.partitionBy()
    weights = source.select(
        "lang",
        "n",
        (F.col("n") / F.sum("n").over(wall)).alias("p_source"),
        (1.0 / F.count(F.lit(1)).over(wall)).alias("p_target"),
        (
            (1.0 / F.count(F.lit(1)).over(wall))
            / (F.col("n") / F.sum("n").over(wall))
        ).alias("w"),
    )
    ess = (
        F.sum(F.col("n") * F.col("w")).over(wall)
        * F.sum(F.col("n") * F.col("w")).over(wall)
        / (
            F.sum(F.col("n") * F.col("w") * F.col("w")).over(wall)
            * F.sum("n").over(wall)
        )
    )
    return weights.select(
        "lang",
        "n",
        R6(F.col("p_source")).alias("p_source"),
        R6(F.col("p_target")).alias("p_target"),
        R6(F.col("w")).alias("weight"),
        R6(ess).alias("ess_fraction"),
    ).orderBy("lang")


@register(
    "unimax_budget_sample",
    survey=("A1", "A13", "J5"),
    oracle=f"""
WITH lc AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS DOUBLE) AS chars
  FROM documents GROUP BY lang
), s AS (
  SELECT lang, n_docs, chars, 0.35 * chars AS cap,
         ROW_NUMBER() OVER (ORDER BY 0.35 * chars, lang) AS rk,
         SUM(0.35 * chars) OVER (ORDER BY 0.35 * chars, lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumcap,
         SUM(chars) OVER () AS total,
         COUNT(*) OVER () AS L
  FROM lc
), lvl AS (
  SELECT MAX((0.3 * total - (cumcap - cap)) / (L - rk + 1)) AS theta
  FROM s
), q AS (
  SELECT lang, n_docs, chars, LEAST(cap, theta) AS quota,
         LEAST(cap, theta) / chars AS rate
  FROM s, lvl
), sm AS (
  SELECT d.lang, d.n_chars
  FROM documents d JOIN q USING (lang)
  WHERE {_U(salt='unimax:', two60=float(1 << 60))} < q.rate
)
SELECT q.lang, q.n_docs, CAST(q.chars AS BIGINT) AS lang_chars,
       ROUND(q.quota, 6) AS quota_chars, ROUND(q.rate, 6) AS rate,
       CAST(COUNT(sm.n_chars) AS BIGINT) AS n_sampled,
       CAST(COALESCE(SUM(sm.n_chars), 0) AS BIGINT) AS sampled_chars
FROM q LEFT JOIN sm USING (lang)
GROUP BY q.lang, q.n_docs, q.chars, q.quota, q.rate
ORDER BY q.lang
""",
)
def unimax_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023): a 30%-of-corpus
    character budget spread as uniformly as possible across languages
    with a 0.35-epoch per-language cap, via the closed water-filling
    level (operators/sampling.unimax_quotas — no iterative
    redistribution loop). Membership is content-addressed
    (hash_unit), so the oracle reproduces the exact sampled set; the
    gated frame publishes per-language quota, acceptance rate, and
    realized sample size. At 100 TB: quota math on a |langs|-row
    frame, one broadcast join, one scan-level filter."""
    from bio_lakehouse_spark.operators.sampling import (
        sample_by_hash,
        unimax_quotas,
    )

    docs = load(spark, sf_dir, "documents")
    q = unimax_quotas(
        docs, "lang", "n_chars", budget_frac=0.3, max_epochs=0.35
    )
    sampled = sample_by_hash(
        docs.join(F.broadcast(q.select("lang", "rate")), "lang"),
        F.col("doc_id"),
        F.col("rate"),
        salt="unimax:",
    )
    agg = sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("sampled_chars"),
    )
    base = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        q.join(base, "lang")
        .join(agg, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.col("stratum_size").cast("long").alias("lang_chars"),
            R6(F.col("quota")).alias("quota_chars"),
            R6(F.col("rate")).alias("rate"),
            F.coalesce(F.col("n_sampled"), F.lit(0)).alias("n_sampled"),
            F.coalesce(F.col("sampled_chars"), F.lit(0))
            .cast("long")
            .alias("sampled_chars"),
        )
        .orderBy("lang")
    )
