"""Quantile-sketch queries: oracle-verified histogram sketch and the
tolerance-gated production ``percentile_approx`` path (A13 at scale).

Two-tier strategy, mirroring the distinct-count family in
``sketch_queries.py``: the deterministic sketch proves the algorithm
and its shuffle bound against an exact DuckDB replica; the built-in
JVM operator (engine-private KLL-style digest, not hash-comparable)
is gated by a tolerance VERDICT column the oracle pins to TRUE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.quantiles import histogram_quantiles
from bio_lakehouse_spark.suite.registry import load, register


@register(
    "quantile_histogram_sketch",
    survey=("A13", "ST6"),
    oracle="""
WITH s AS (
  SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx,
         COUNT(l_extendedprice) AS n
  FROM lineitem
),
h AS (
  SELECT LEAST(CAST(FLOOR((l.l_extendedprice - s.mn)
                          / ((s.mx - s.mn) / CAST(256 AS DOUBLE)))
               AS BIGINT), 255) AS bin,
         COUNT(*) AS cnt
  FROM lineitem l, s
  GROUP BY 1
),
c AS (
  SELECT bin, cnt, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum
  FROM h
),
q AS (
  SELECT UNNEST([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                 CAST(0.99 AS DOUBLE)]) AS prob
)
SELECT q.prob,
       ROUND(s.mn + ((s.mx - s.mn) / CAST(256 AS DOUBLE))
             * (c.bin + (q.prob * s.n - (c.cum - c.cnt)) / c.cnt),
             6) AS est
FROM q, c, s
WHERE c.cum >= q.prob * s.n AND (c.cum - c.cnt) < q.prob * s.n
""",
)
def quantile_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of lineitem extendedprice from a 256-bin equi-width
    histogram (operators/quantiles.py). Every arithmetic step is
    written identically in the oracle — bin floor-division, cumulative
    rank walk, within-bin linear interpolation — so the ESTIMATE
    hash-matches exactly, not just within tolerance. Shuffle bound:
    256 counts per partition cross the exchange regardless of input
    rows."""
    li = load(spark, sf_dir, "lineitem")
    return histogram_quantiles(li, "l_extendedprice", (0.5, 0.9, 0.99), 256)


@register(
    "approx_percentile_production",
    survey=("A13", "ST6"),
    oracle="""
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.9), 6) AS exact_p90,
       TRUE AS approx_within_5pct
FROM orders GROUP BY o_orderpriority
""",
)
def approx_percentile_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION approximate-quantile path: Spark's built-in
    ``percentile_approx`` (JVM Greenwald-Khanna variant, accuracy
    10000). Its summary layout is engine-private, so — as with
    ``approx_distinct_production`` — the query emits the exact
    per-group p90 (interpolating ``percentile``, which DuckDB's
    ``quantile_cont`` reproduces bit-for-bit) next to a tolerance
    VERDICT (|approx − exact| / exact ≤ 5%); the oracle pins the
    verdict TRUE, failing the value-hash gate if the estimator ever
    drifts. At 100 TB the exact column is the one you'd drop — GK
    summaries merge in fixed memory, exact percentile sorts."""
    orders = load(spark, sf_dir, "orders")
    exact = F.percentile("o_totalprice", F.lit(0.9))
    approx = F.percentile_approx("o_totalprice", F.lit(0.9), F.lit(10000))
    return orders.groupBy("o_orderpriority").agg(
        F.round(exact, 6).alias("exact_p90"),
        # try_divide (r12 ANSI audit): a group whose exact p90 is 0
        # (legal for a generic metric, if not for TPC-H prices) has
        # an undefined RELATIVE error — verdict NULL, not a job abort.
        (
            F.try_divide(F.abs(approx - exact), exact) <= 0.05
        ).alias("approx_within_5pct"),
    )


@register(
    "quantile_histogram_by_group",
    survey=("A13", "A10", "ST6"),
    oracle="""
WITH s AS (
  SELECT l_returnflag AS rf, MIN(l_extendedprice) AS mn,
         MAX(l_extendedprice) AS mx, COUNT(l_extendedprice) AS n
  FROM lineitem GROUP BY 1
),
h AS (
  SELECT s.rf,
         LEAST(CAST(FLOOR((l.l_extendedprice - s.mn)
                          / ((s.mx - s.mn) / CAST(128 AS DOUBLE)))
               AS BIGINT), 127) AS bin,
         COUNT(*) AS cnt
  FROM lineitem l JOIN s ON l.l_returnflag = s.rf
  GROUP BY 1, 2
),
c AS (
  SELECT rf, bin, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY rf ORDER BY bin) AS BIGINT) AS cum
  FROM h
),
q AS (
  SELECT UNNEST([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS prob
)
SELECT c.rf AS l_returnflag, q.prob,
       ROUND(s.mn + ((s.mx - s.mn) / CAST(128 AS DOUBLE))
             * (c.bin + (q.prob * s.n - (c.cum - c.cnt)) / c.cnt),
             6) AS est
FROM q, c JOIN s ON c.rf = s.rf
WHERE c.cum >= q.prob * s.n AND (c.cum - c.cnt) < q.prob * s.n
""",
)
def quantile_histogram_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group (returnflag) p50/p95 from 128-bin histograms — the
    realistic at-scale quantile shape: one stats pass and one binning
    pass produce EVERY group's sketch simultaneously (≤ nbins counts
    per group cross the exchange), where per-group exact percentiles
    would sort each group's full data. Same exact-hash oracle
    property as the global sketch; the rank-walk window partitions by
    group so no global sort appears anywhere."""
    li = load(spark, sf_dir, "lineitem")
    return histogram_quantiles(
        li, "l_extendedprice", (0.5, 0.95), 128, by=["l_returnflag"]
    )


@register(
    "mode_median_by_type",
    survey=("A10", "A13"),
    oracle="""
WITH binned AS (
  SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) AS bin, value
  FROM events WHERE value IS NOT NULL
), freq AS (
  SELECT event_type, bin, COUNT(*) AS f FROM binned GROUP BY 1, 2
), mode AS (
  SELECT event_type, bin AS mode_bin, f AS mode_freq FROM (
    SELECT event_type, bin, f,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY f DESC, bin ASC) AS rn
    FROM freq
  ) WHERE rn = 1
), med AS (
  SELECT event_type, QUANTILE_CONT(value, 0.5) AS median, COUNT(*) AS n
  FROM binned GROUP BY event_type
)
SELECT m.event_type, m.mode_bin, m.mode_freq,
       ROUND(d.median, 6) AS median, d.n
FROM mode m JOIN med d USING (event_type)
ORDER BY m.event_type
""",
)
def mode_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value decile-bin, deterministic smallest-
    bin tie-break) + exact interpolated median per event type — the
    two central-tendency measures mean-based rollups miss. Mode is
    max_by over the per-bin frequency frame (map-side combined, no
    window over the facts); median is one exact-percentile aggregate
    with approx_percentile as the 100 TB drop-in.

    Contract (ADVICE r12): NaN and out-of-BIGINT-range values land
    in an explicit NULL bin, so ``mode_bin`` may itself be NULL when
    unbinnable values are STRICTLY the most frequent class — that
    is the honest answer ("the dominant bin is unbinnable"), not an
    error. On a frequency tie the NULL bin always LOSES to any real
    bin (struct ordering ranks a NULL field below every value, and
    the max_by tie-break takes the larger -bin), so NULL never wins
    nondeterministically; pinned in tests/test_edge_hunt_r13.py. The
    double tie-break negation is exact for |bin| ≤ 2^53 — two
    distinct tied bins beyond that cannot arise from a try_cast'd
    BIGINT division by 10 of any double fixture this repo admits."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # Explicit unbinnable guard (r13, fixing the r12 comment's false
    # premise): floor(double) returns LONG with Java-saturating
    # semantics — ±1e300 silently lands in the ±Long.MAX bin and NaN
    # lands in bin 0, POLLUTING the genuine [0,10) class — so the
    # try_cast after it was a no-op and no NULL bin ever existed.
    # Now NaN / out-of-long-range quotients land in an explicit NULL
    # bin (they still count toward the median, which needs no
    # binning); behavior pinned in tests/test_edge_hunt_r13.py.
    q = F.col("value") / 10
    binned = ev.select(
        "event_type",
        F.when(
            ~F.isnan(q) & q.between(-9.2e18, 9.2e18), F.floor(q)
        ).alias("bin"),
        "value",
    )
    freq = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("f")
    )
    mode = freq.groupBy("event_type").agg(
        F.max_by(
            F.struct(F.col("bin").alias("mode_bin"), F.col("f")),
            # tie-break negation in DOUBLE: -(Long.MIN) overflows
            # under ANSI, and a frequency tie between two >2^53 bins
            # is not a realizable fixture concern (r12 sweep).
            F.struct(F.col("f"), -F.col("bin").cast("double")),
        ).alias("_m")
    ).select(
        "event_type",
        F.col("_m.mode_bin").alias("mode_bin"),
        F.col("_m.f").alias("mode_freq"),
    )
    med = binned.groupBy("event_type").agg(
        F.round(F.percentile(F.col("value"), F.lit(0.5)), 6).alias(
            "median"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        mode.join(med, "event_type")
        .select("event_type", "mode_bin", "mode_freq", "median", "n")
        .orderBy("event_type")
    )


@register(
    "weighted_median_discrete",
    survey=("A13", "A10"),
    oracle="""
WITH wv AS (
  SELECT l_returnflag AS flag, l_extendedprice AS v,
         SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT flag, v, w,
         SUM(w) OVER (PARTITION BY flag ORDER BY v) AS cw,
         SUM(w) OVER (PARTITION BY flag) AS tw,
         COUNT(*) OVER (PARTITION BY flag) AS nv
  FROM wv
)
SELECT flag, MIN(v) AS w_median,
       CAST(MIN(tw) AS BIGINT) AS total_weight,
       MIN(nv) AS n_values
FROM cum WHERE 2 * cw >= tw GROUP BY flag ORDER BY flag
""",
)
def weighted_median_discrete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-aware median: the smallest price whose cumulative
    quantity weight reaches half the total — the lower weighted
    median, a DISCRETE contract both engines satisfy bit-exactly (no
    interpolation between engine-ordered neighbors). Duplicate values
    collapse to (value, Σweight) first (map-side combine), so the
    cumulative window runs over distinct values per group, not raw
    rows — at 100 TB that's the difference between a window over the
    value domain and one over the fact table."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    # try_cast (r12 NaN sweep): one NaN quantity aborted the whole
    # weighted median via CAST_OVERFLOW — an undefined weight
    # contributes nothing (NULL, skipped by the sum), same rule as
    # the NULL-bin mode fix above.
    wv = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
    ).agg(
        F.sum(F.col("l_quantity").try_cast("long")).alias("w")
    ).localCheckpoint(eager=False)
    wp = Window.partitionBy("flag").orderBy("v")
    # r13: totals per flag via a tiny groupBy + broadcast join back
    # instead of two whole-partition Window passes (sum + count over
    # an unframed partitionBy("flag") window re-walked every distinct
    # price twice). The lazy checkpoint keeps the (flag, price)
    # aggregation from recomputing for its two consumers. Integer
    # sums — order-insensitive, bit-identical either way.
    totals = wv.groupBy("flag").agg(
        F.sum("w").alias("tw"), F.count(F.lit(1)).alias("nv")
    )
    cum = wv.select(
        "flag",
        "v",
        F.sum("w").over(wp).alias("cw"),
    ).join(F.broadcast(totals), on="flag")
    # cw >= tw - cw, NOT 2*cw >= tw (r12 extreme-value sweep): the
    # doubling overflows BIGINT when the cumulative weight passes
    # half of Long.MAX — algebraically identical for integers, and
    # both sides stay <= tw so nothing can overflow while the sums
    # themselves fit (Σw beyond BIGINT is out of contract, matching
    # the oracle's own CAST(... AS BIGINT)).
    return (
        cum.filter(F.col("cw") >= F.col("tw") - F.col("cw"))
        .groupBy("flag")
        .agg(
            F.min("v").alias("w_median"),
            F.min("tw").alias("total_weight"),
            F.min("nv").alias("n_values"),
        )
        .orderBy("flag")
    )
