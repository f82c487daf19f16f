"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need samples that are REPRODUCIBLE (same rows
on every run, every engine, any partitioning) and STABLE under
append (a row's split never changes when other rows arrive). Spark's
``df.sample`` / ``sampleBy`` are seeded per-partition, so a
repartition reshuffles the sample — useless as a train/val/test
contract. The fix is content-addressed sampling: map each row's key
through a uniform hash to [0, 1) and compare against fraction
thresholds. No RNG state, no shuffle, fully pushdown-friendly (the
filter runs at the scan), and embarrassingly parallel at 100 TB.

Reference parity: the reference has no sampling operators (its data is
one user's); these are beyond-reference training-pipeline ops in the
BASELINE.json north-star list.

Hash: top 60 bits of ``md5(salt || key)`` (operators/sketches.hash60),
verified to produce the identical bigint in Spark and DuckDB, so the
oracle reproduces the exact sampled set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.sketches import TWO60, hash60


def hash_unit(key: Column, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) double for a key. The 60-bit hash
    is converted to double (IEEE round-to-nearest, identical across
    engines) and divided by 2^60 — an exact power of two."""
    return hash60(F.concat(F.lit(salt), key.cast("string"))) / F.lit(TWO60)


def sample_by_hash(
    df: DataFrame, key: Column, fraction, salt: str = ""
) -> DataFrame:
    """Keep rows whose hash_unit(key) < fraction. ``fraction`` may be
    a literal or a Column (per-row thresholds, e.g. per-stratum rates
    joined in). A pure filter: no shuffle, scan-level pushdown."""
    thr = fraction if isinstance(fraction, Column) else F.lit(float(fraction))
    return df.filter(hash_unit(key, salt) < thr)


def assign_split(
    df: DataFrame,
    key: Column,
    splits: dict[str, float],
    salt: str = "split:",
    out_col: str = "split",
) -> DataFrame:
    """Add a split-label column from cumulative fraction boundaries,
    e.g. ``{"train": 0.8, "val": 0.1, "test": 0.1}``. Fractions must
    sum to 1 (validated). Each key's label is a pure function of the
    key — stable under append, repartition, and engine change."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions sum to {total}, expected 1.0")
    u = hash_unit(key, salt)
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        branch = F.when(u < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    label = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, label)


def weighted_sample(
    df: DataFrame,
    key: Column,
    weight: Column,
    k: int,
    salt: str = "ws:",
    key_out: str = "sample_key",
) -> DataFrame:
    """Weighted sample WITHOUT replacement of size k (Efraimidis &
    Spirakis 2006): score each row u^(1/w) with u = hash_unit(key)
    and keep the k largest scores — inclusion probability is
    proportional to weight, and the randomness is the deterministic
    hash, so the same rows are drawn on every run and engine.

    ``orderBy(desc).limit(k)`` compiles to TakeOrderedAndProject — a
    distributed per-partition top-k merged on the driver, NO global
    sort shuffle — so this holds at 100 TB for small k. Ties (exact
    equal scores) break on the hash itself for cross-engine
    stability.

    Rows with weight ≤ 0 (or null) are EXCLUDED, matching the E&S
    definition (inclusion ∝ weight ⇒ zero weight = never drawn).
    Without the filter a negative weight is a negative exponent:
    u^(1/w) > 1 BEATS every legitimate score and the "impossible"
    rows would deterministically fill the sample (r10)."""
    w_d = weight.cast("double")
    u = hash_unit(key, salt)
    scored = df.filter(w_d > 0).withColumn(
        key_out, F.pow(u, F.lit(1.0) / w_d)
    ).withColumn("__tie", hash60(F.concat(F.lit(salt), key.cast("string"))))
    return (
        scored.orderBy(F.desc(key_out), F.asc("__tie"))
        .limit(k)
        .drop("__tie")
    )


def group_sample(
    df: DataFrame,
    key: Column,
    strata_cols: list[str],
    k: int,
    salt: str = "gs:",
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank rows within
    each stratum by their hash and keep the k smallest. Unlike
    rate-based sampling this guarantees the count (eval sets want
    exactly N per class); the price is one shuffle on the strata key,
    and each stratum sorts independently — no global sort, so 10⁶
    strata spread across executors at 100 TB."""
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy("__h")
    return (
        df.withColumn("__h", hash60(F.concat(F.lit(salt), key.cast("string"))))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__h", "__rn")
    )


def balanced_downsample(
    df: DataFrame,
    key: Column,
    strata_col: str,
    salt: str = "bal:",
) -> DataFrame:
    """Class-balanced downsample: every stratum is hash-sampled at
    rate target/|stratum| where target = size of the smallest
    stratum, so expected per-class counts equalize. The rate table is
    one row per stratum — broadcast, so the only full-data pass is
    the scan + filter; the min() is a tiny two-stage agg.

    Rows with a NULL stratum drop out at the inner rate join (a null
    class has no defined rate); filter or impute the label upstream
    if those rows should participate."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    target = counts.groupBy().agg(F.min("__n").alias("__target"))
    rates = counts.crossJoin(F.broadcast(target)).select(
        strata_col,
        (F.col("__target").cast("double") / F.col("__n")).alias("__rate"),
    )
    return sample_by_hash(
        df.join(F.broadcast(rates), strata_col), key, F.col("__rate"), salt
    ).drop("__rate")


def temperature_mixture_sample(
    df: DataFrame,
    key: Column,
    strata_col: str,
    alpha: float = 0.5,
    total_target: int | None = None,
    salt: str = "temp:",
) -> DataFrame:
    """Temperature-flattened source mixture (the multilingual-LM
    upsampling rule: sampling probability for stratum s ∝ n_s^alpha,
    alpha<1 flattens the source distribution toward uniform — alpha
    0.7 in mBERT, 0.3 in XLM-R). Per-stratum acceptance rate is
    min(1, target·n_s^alpha / (Σ n^alpha · n_s)) with target the
    corpus size (or ``total_target``), applied as a content-addressed
    hash filter — reproducible across runs/engines/partitionings,
    stable membership, no RNG.

    alpha=0.5 routes through sqrt (IEEE correctly-rounded, bit-equal
    across engines); other alphas use pow (libm 1-ulp, still safe —
    acceptance compares a 2^-60-granular hash against the rate, so a
    last-ulp rate wobble flips a row with probability ~1e-16).

    Shape at 100 TB: the rate table is one row per stratum broadcast
    onto the scan; the only full-data pass is scan + filter. Same
    cost envelope as balanced_downsample — including the NULL-stratum
    behavior (dropped at the inner rate join; handle upstream).
    """
    amp = (
        (lambda c: F.sqrt(c)) if alpha == 0.5
        else (lambda c: F.pow(c, F.lit(alpha)))
    )
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.groupBy().agg(
        F.sum("__n").alias("__total"),
        F.sum(amp(F.col("__n").cast("double"))).alias("__z"),
    )
    target = (
        F.lit(float(total_target)) if total_target is not None
        else F.col("__total").cast("double")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        strata_col,
        F.least(
            F.lit(1.0),
            target * amp(F.col("__n").cast("double"))
            / (F.col("__z") * F.col("__n").cast("double")),
        ).alias("mix_rate"),
    )
    return sample_by_hash(
        df.join(F.broadcast(rates), strata_col), key, F.col("mix_rate"), salt
    )


def unimax_quotas(
    df: DataFrame,
    strata_col: str,
    size_col: str,
    budget_frac: float = 0.3,
    max_epochs: float = 0.35,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023): spread a total
    budget (``budget_frac`` of corpus size) as uniformly as possible
    across strata, capping each stratum at ``max_epochs`` passes over
    its own data. The iterative allocate-then-redistribute loop of
    the paper has the closed water-filling form quota_s =
    min(cap_s, θ) with level θ = max_i (B − Σ_{j<i} cap_j)/(L−i+1)
    over caps sorted ascending — one window over the |strata|-row
    frame, no iteration, no driver loop.

    Returns one row per stratum: (strata, stratum_size, cap, quota,
    rate) where rate = quota/size is the acceptance probability a
    content-addressed filter applies downstream."""
    from pyspark.sql import Window

    sizes = df.groupBy(strata_col).agg(
        F.sum(F.col(size_col)).cast("double").alias("__sz")
    )
    cap = (F.lit(float(max_epochs)) * F.col("__sz")).alias("__cap")
    w = Window.orderBy(F.lit(float(max_epochs)) * F.col("__sz"), strata_col)
    wall = Window.partitionBy()
    s = sizes.select(
        strata_col,
        "__sz",
        cap,
        F.row_number().over(w).alias("__rk"),
        F.sum(F.lit(float(max_epochs)) * F.col("__sz")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("__cumcap"),
        F.sum("__sz").over(wall).alias("__total"),
        F.count(F.lit(1)).over(wall).alias("__L"),
    )
    budget = F.lit(float(budget_frac)) * F.col("__total")
    theta = F.max(
        (budget - (F.col("__cumcap") - F.col("__cap")))
        / (F.col("__L") - F.col("__rk") + 1)
    ).over(wall)
    return s.select(
        strata_col,
        F.col("__sz").alias("stratum_size"),
        F.col("__cap").alias("cap"),
        F.least(F.col("__cap"), theta).alias("quota"),
        (F.least(F.col("__cap"), theta) / F.col("__sz")).alias("rate"),
    )
