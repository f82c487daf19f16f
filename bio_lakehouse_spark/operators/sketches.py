"""Probabilistic cardinality sketches — HyperLogLog and KMV/theta —
built from first principles on a cross-engine-deterministic hash.

At 100 TB, exact ``COUNT(DISTINCT)`` is a full shuffle of every
distinct key; a sketch is a fixed-size (here ≤ 2 KB) mergeable state
that answers the same question within a few percent with a map-side
partial aggregate and a tiny exchange. Spark ships HLL++ as
``approx_count_distinct`` (JVM-side, the production default) — but its
register layout is engine-private, so its estimates can't be verified
by an external oracle. These sketches trade a little speed for exact
reproducibility: every step (md5 → 60-bit integer → register index /
rank) is ANSI-SQL-expressible, so DuckDB replicates the estimate
BIT-FOR-BIT and the driver's value-hash gate applies to an
approximate operator — which is normally impossible.

Hash: ``conv(substr(md5(v),1,15),16,10)`` — the top 60 bits of md5 as
a bigint. Verified identical in Spark and DuckDB (including ``bin()``
for the leading-zero rank and exact ``power(2.0, -r)``).

HLL (Flajolet et al. 2007): p index bits → m=2^p registers; register
j keeps the max over hashes of (leading zeros of the remaining
60-p bits) + 1; estimate = α_m·m²/Σ2^-M_j with linear counting
below 2.5m. Duplicate-insensitive by construction, so no pre-distinct
shuffle is needed — the register table is built by one groupBy.

KMV/theta (Beyer et al. 2007): keep the k smallest distinct hashes;
θ = k-th smallest / 2^60; |A| ≈ (k-1)/θ. Set algebra on sketches:
cut both to θ = min(θ_A, θ_B), then |A∩B| ≈ |{common hashes < θ}|/θ —
the sketch intersection the reference-class engines (Druid/Trino
theta sketches) expose, here as a pure DataFrame pipeline.

Reference parity: the reference has exact DISTINCT aggregation only
(ref: dbt models, e.g. models/marts/*.sql COUNT(DISTINCT ...)); the
sketches are the beyond-reference scale path for the same questions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TWO60 = float(1 << 60)


def hash60(col: F.Column) -> F.Column:
    """Top 60 bits of md5 as a non-negative bigint — identical in
    DuckDB via CAST(concat('0x', substr(md5(v),1,15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-(group, register-index) max rank — the MERGEABLE half of
    HLL. Registers merge by element-wise MAX, which is what makes the
    sketch reusable across windows/partitions/streams: persist these
    m-row-per-group frames and any union of groups folds without
    touching raw data (see ``hll_fold`` and rolling_hll_users_7d)."""
    suffix_bits = 60 - p
    shift = 1 << suffix_bits
    # Bit ops, not arithmetic: a 60-bit value doesn't fit a double's
    # 53-bit mantissa, so float division would corrupt boundary
    # indexes; shiftright/& are exact and map to DuckDB's >> / &.
    h = hash60(F.col(value_col))
    return (
        # COUNT(DISTINCT) skips NULLs; without this filter a null
        # value hashes to a null-rank register row that inflates
        # __present and skews the linear-counting branch (r10)
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.shiftright(h, suffix_bits).alias("__idx"),
            h.bitwiseAND(F.lit(shift - 1)).alias("__suffix"),
        )
        .withColumn(
            "__rank",
            F.when(F.col("__suffix") == 0, F.lit(suffix_bits + 1)).otherwise(
                F.lit(suffix_bits) - F.length(F.bin(F.col("__suffix"))) + 1
            ),
        )
        .groupBy(*group_cols, "__idx")
        .agg(F.max("__rank").alias("__maxrank"))
    )


def hll_fold(regs: DataFrame, group_cols: list[str], p: int = 8) -> DataFrame:
    """Fold a (group, __idx, __maxrank) register frame to per-group
    estimates (with linear counting below 2.5m). Both branches round
    to bigint so last-ulp libm ln() differences between engines
    cannot flip the value hash."""
    m = 1 << p
    alpha_m2 = 0.7213 / (1.0 + 1.079 / m) * m * m
    folded = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__maxrank"))).alias("__sum_inv"),
        F.count(F.lit(1)).alias("__present"),
    )
    zeros = F.lit(m) - F.col("__present")
    raw = F.lit(alpha_m2) / (F.col("__sum_inv") + zeros.cast("double"))
    est = F.when(
        # a GLOBAL fold over zero registers (empty/all-null input in
        # the group_cols=[] case) is COUNT(DISTINCT)'s empty answer:
        # 0, not the null that α/(null+m) propagates (r10)
        F.col("__present") == 0, F.lit(0.0)
    ).when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return folded.select(
        *group_cols, F.round(est).cast("long").alias("hll_estimate")
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """Per-group HLL distinct estimate (column ``hll_estimate``,
    bigint). Two narrow shuffles: (group, register) max-rank — at most
    m rows per group survive the map-side partial — then per-group
    register fold. State is m·1 byte regardless of input size."""
    return hll_fold(
        hll_registers(df, group_cols, value_col, p), group_cols, p
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 128,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest DISTINCT hashes, ranked.
    Returns (group..., __h, __rn ≤ k). The distinct is a pre-shuffle
    on (group, value) — same key the exact COUNT(DISTINCT) would
    shuffle — but the sketch then travels as ≤ k rows per group."""
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        # COUNT(DISTINCT) skips NULLs; a surviving null row would
        # hash to a null __h, sort FIRST (asc nulls-first), and
        # occupy a sketch slot — inflating __n and distorting θ (r10)
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col).alias("__v"))
        .distinct()
        .select(*group_cols, hash60(F.col("__v")).alias("__h"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 128,
) -> DataFrame:
    """Per-group KMV distinct estimate: (k-1)/θ when the sketch is
    full, the exact retained count when not (|group| < k ⇒ exact)."""
    sk = kmv_sketch(df, group_cols, value_col, k)
    agg = sk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("__hk"),
    )
    est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(TWO60) / F.col("__hk"))
    return agg.select(
        *group_cols, F.round(est).cast("long").alias("kmv_estimate")
    )


def kmv_set_estimates(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    k: int = 128,
) -> DataFrame:
    """Theta-sketch set algebra between two keyed sets: returns one
    row (theta, est_left, est_right, est_intersection, est_union).

    Both sketches are cut to θ = min(θ_L, θ_R) (θ = 1 when a sketch
    isn't full); below θ every retained hash is an unbiased uniform
    sample of the set, so counts/θ estimate the set sizes. The
    intersection is a ≤k-row self-join — constant cost however large
    the underlying sets are."""
    lsk = kmv_sketch(left, [], value_col, k).select("__h", "__rn")
    rsk = kmv_sketch(right, [], value_col, k).select("__h", "__rn")

    def theta(sk: DataFrame) -> DataFrame:
        return sk.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("hk"),
        ).select(
            F.when(F.col("n") < k, F.lit(TWO60))
            .otherwise(F.col("hk").cast("double"))
            .alias("theta_h"),
        )

    th = (
        theta(lsk)
        .crossJoin(theta(rsk).withColumnRenamed("theta_h", "theta_h_r"))
        .select(F.least("theta_h", "theta_h_r").alias("th"))
    )
    lcut = lsk.crossJoin(F.broadcast(th)).filter(F.col("__h") < F.col("th"))
    rcut = rsk.crossJoin(F.broadcast(th)).filter(F.col("__h") < F.col("th"))
    counts = (
        lcut.select("__h")
        .withColumn("__side", F.lit(1))
        .unionAll(rcut.select("__h").withColumn("__side", F.lit(2)))
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__sides"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_union"),
            F.sum(F.when(F.col("__sides") == 2, 1).otherwise(0)).alias(
                "n_both"
            ),
            F.sum(F.when(F.col("__sides") == 1, 1).otherwise(0)).alias(
                "n_one"
            ),
        )
    )
    lone = lcut.groupBy().agg(F.count(F.lit(1)).alias("n_left"))
    rone = rcut.groupBy().agg(F.count(F.lit(1)).alias("n_right"))
    scale = F.lit(TWO60) / F.col("th")
    return (
        counts.crossJoin(lone)
        .crossJoin(rone)
        .crossJoin(th)
        .select(
            F.round(F.col("th") / F.lit(TWO60), 9).alias("theta"),
            F.round(F.col("n_left") * scale).cast("long").alias("est_left"),
            F.round(F.col("n_right") * scale).cast("long").alias("est_right"),
            F.round(F.col("n_both") * scale)
            .cast("long")
            .alias("est_intersection"),
            F.round(F.col("n_union") * scale).cast("long").alias("est_union"),
        )
    )


def count_min_estimates(
    df: DataFrame,
    value_col: str,
    candidates: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch frequency estimates for a candidate key set
    (heavy-hitter verification — CM completes the sketch family next
    to HLL/KMV/theta/histogram; Cormode & Muthukrishnan 2005).

    Build: d×w counters as (row, bucket, count) rows — the exchange
    carries ≤ d·w rows per partition whatever the input size (same
    bounded-state shape as the HLL register build). Row j's bucket is
    carved from the SAME md5-derived 60-bit hash (bits j·8..j·8+8 for
    w=256), so both engines reproduce the sketch bit-for-bit.
    Estimate: min over the d counters addressed by each candidate key
    — a ≤ d·w broadcast joined onto the (small) candidate set. CM
    never underestimates: est ≥ exact, with overshoot bounded by
    ~2n/w per row at depth-4 union bound.

    Each depth row must address DISJOINT bits of the 60-bit hash or
    the rows stop being independent and the union-bound error
    guarantee quietly degrades — so ``width`` must be a power of two
    and ``depth·log2(width)`` must fit in the 60 hash bits (validated
    here; the per-row shift is log2(width), not a fixed 8)."""
    bits = width.bit_length() - 1
    if width <= 1 or (width & (width - 1)) != 0:
        raise ValueError(
            f"count-min width must be a power of two > 1, got {width}"
        )
    if depth * bits > 60:
        raise ValueError(
            f"depth {depth} x log2(width) {bits} exceeds the 60 "
            "available hash bits; rows would reuse overlapping bits"
        )
    h = hash60(F.col(value_col))
    rows = F.array(*[F.lit(j) for j in range(depth)])
    cm = (
        df.select(h.alias("__h"))
        .select(F.explode(rows).alias("__row"), "__h")
        .select(
            "__row",
            # SQL shiftright accepts a column shift amount; the
            # PySpark builtin requires a literal.
            F.expr(f"shiftright(__h, __row * {bits})")
            .bitwiseAND(F.lit(width - 1))
            .alias("__bucket"),
        )
        .groupBy("__row", "__bucket")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    ch = hash60(F.col(value_col))
    cand = candidates.select(
        value_col,
        *[
            F.shiftright(ch, j * bits)
            .bitwiseAND(F.lit(width - 1))
            .alias(f"__b{j}")
            for j in range(depth)
        ],
    )
    out = cand
    for j in range(depth):
        cmj = F.broadcast(
            cm.filter(F.col("__row") == j).select(
                F.col("__bucket").alias(f"__b{j}"),
                F.col("__cnt").alias(f"__c{j}"),
            )
        )
        out = out.join(cmj, on=f"__b{j}", how="left")
    est = F.least(
        *[F.coalesce(F.col(f"__c{j}"), F.lit(0)) for j in range(depth)]
    )
    return out.select(
        value_col, est.cast("long").alias("cm_estimate")
    )
