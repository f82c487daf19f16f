"""Sketch queries: HLL distinct-count and KMV/theta set algebra.

The rare trick here: APPROXIMATE operators that are still verified by
the driver's exact value-hash gate, because every step of the sketch
(md5 → 60-bit int → register/rank → estimator) is deterministic and
ANSI-SQL-expressible, so the DuckDB oracle reproduces the estimate
bit-for-bit. Each query also carries the exact answer + error column,
so accuracy is visible in the result itself, not just in unit tests.

At 100 TB the production form is ``approx_count_distinct`` (Spark's
JVM HLL++, same math, engine-private registers); these queries prove
out the algorithm and its shuffle shape: the HLL register build sends
at most m=256 rows per group through the exchange regardless of input
size, and the KMV sketch travels as ≤ k rows per set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.sketches import (
    hll_distinct,
    kmv_distinct,
    kmv_set_estimates,
)
from bio_lakehouse_spark.suite.registry import load, register

# DuckDB twin of operators/sketches.hash60 — verified to produce the
# identical bigint as Spark's conv(substr(md5(..),1,15),16,10).
_H60 = "CAST(concat('0x', substr(md5(CAST({v} AS VARCHAR)), 1, 15)) AS BIGINT)"

_P = 8
_M = 1 << _P
_SUFFIX_BITS = 60 - _P
_MASK = (1 << _SUFFIX_BITS) - 1
_ALPHA_M2 = 0.7213 / (1.0 + 1.079 / _M) * _M * _M
_TWO60 = float(1 << 60)


@register(
    "hll_distinct_custkeys",
    survey=("A11", "ST6"),
    oracle=f"""
WITH h AS (
  SELECT o_orderpriority, {_H60.format(v='o_custkey')} AS h60 FROM orders
), ranks AS (
  SELECT o_orderpriority, h60 >> {_SUFFIX_BITS} AS idx,
         MAX(CASE WHEN (h60 & {_MASK}) = 0 THEN {_SUFFIX_BITS + 1}
                  ELSE {_SUFFIX_BITS} - length(bin(h60 & {_MASK})) + 1 END) AS maxrank
  FROM h GROUP BY o_orderpriority, idx
), folded AS (
  SELECT o_orderpriority,
         SUM(power(2.0, -maxrank)) AS sum_inv,
         COUNT(*) AS present
  FROM ranks GROUP BY o_orderpriority
), est AS (
  SELECT o_orderpriority,
         CAST(ROUND(CASE WHEN {_ALPHA_M2!r} / (sum_inv + ({_M} - present)) <= {2.5 * _M!r}
                          AND ({_M} - present) > 0
                     THEN {float(_M)!r} * ln({float(_M)!r} / ({_M} - present))
                     ELSE {_ALPHA_M2!r} / (sum_inv + ({_M} - present)) END) AS BIGINT) AS hll_estimate
  FROM folded
), exact AS (
  SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_distinct
  FROM orders GROUP BY o_orderpriority
)
SELECT est.o_orderpriority, hll_estimate, exact_distinct,
       ROUND(100.0 * abs(hll_estimate - exact_distinct) / exact_distinct, 4) AS err_pct
FROM est JOIN exact USING (o_orderpriority)
""",
)
def hll_distinct_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog (p=8, m=256 registers) distinct-buyer count per
    order priority, next to the exact count and the realized error.
    Duplicate-insensitive, so no pre-distinct shuffle: the register
    table caps the exchange at 256 rows per group whatever the input
    size — the COUNT(DISTINCT) replacement that survives 100 TB."""
    orders = load(spark, sf_dir, "orders")
    est = hll_distinct(orders, ["o_orderpriority"], "o_custkey", p=_P)
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return est.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "hll_estimate",
        "exact_distinct",
        # try_divide (r12 ANSI audit): a group whose key column
        # is entirely NULL has exact_distinct = 0 while rows exist —
        # relative error undefined → NULL, not a job abort.
        F.round(
            F.try_divide(
                100.0
                * F.abs(
                    F.col("hll_estimate") - F.col("exact_distinct")
                ),
                F.col("exact_distinct"),
            ),
            4,
        ).alias("err_pct"),
    )


@register(
    "kmv_distinct_parts",
    survey=("A11",),
    oracle=f"""
WITH d AS (
  SELECT DISTINCT l_returnflag, l_partkey FROM lineitem
), h AS (
  SELECT l_returnflag, {_H60.format(v='l_partkey')} AS h60 FROM d
), sk AS (
  SELECT l_returnflag, h60,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h60) AS rn
  FROM h
), agg AS (
  SELECT l_returnflag, COUNT(*) AS n,
         MAX(CASE WHEN rn = 128 THEN h60 END) AS hk
  FROM sk WHERE rn <= 128 GROUP BY l_returnflag
), est AS (
  SELECT l_returnflag,
         CAST(ROUND(CASE WHEN n < 128 THEN CAST(n AS DOUBLE)
                         ELSE 127.0 * {_TWO60!r} / hk END) AS BIGINT) AS kmv_estimate
  FROM agg
), exact AS (
  SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_distinct
  FROM lineitem GROUP BY l_returnflag
)
SELECT est.l_returnflag, kmv_estimate, exact_distinct,
       ROUND(100.0 * abs(kmv_estimate - exact_distinct) / exact_distinct, 4) AS err_pct
FROM est JOIN exact USING (l_returnflag)
""",
)
def kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k minimum values, k=128) distinct-part estimate per return
    flag vs exact: the k-th smallest hash θ makes the retained set a
    uniform sample, |D| ≈ (k-1)/θ. Falls back to exact when a group
    holds fewer than k distinct values. The sketch state shipped per
    group is 128 longs — 1 KB — at any scale."""
    li = load(spark, sf_dir, "lineitem")
    est = kmv_distinct(li, ["l_returnflag"], "l_partkey", k=128)
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    return est.join(exact, "l_returnflag").select(
        "l_returnflag",
        "kmv_estimate",
        "exact_distinct",
        # try_divide (r12 ANSI audit): all-NULL key group →
        # exact_distinct = 0 → relative error undefined → NULL.
        F.round(
            F.try_divide(
                100.0
                * F.abs(
                    F.col("kmv_estimate") - F.col("exact_distinct")
                ),
                F.col("exact_distinct"),
            ),
            4,
        ).alias("err_pct"),
    )


@register(
    "theta_customer_overlap",
    survey=("SET3", "A11"),
    oracle=f"""
WITH la AS (
  SELECT DISTINCT o_custkey AS v FROM orders WHERE year(o_orderdate) = 1994
), rb AS (
  SELECT DISTINCT o_custkey AS v FROM orders WHERE year(o_orderdate) = 1995
), lsk AS (
  SELECT h60, rn FROM (
    SELECT {_H60.format(v='v')} AS h60,
           ROW_NUMBER() OVER (ORDER BY {_H60.format(v='v')}) AS rn
    FROM la
  ) WHERE rn <= 128
), rsk AS (
  SELECT h60, rn FROM (
    SELECT {_H60.format(v='v')} AS h60,
           ROW_NUMBER() OVER (ORDER BY {_H60.format(v='v')}) AS rn
    FROM rb
  ) WHERE rn <= 128
), lth AS (
  SELECT CASE WHEN COUNT(*) < 128 THEN {_TWO60!r}
              ELSE CAST(MAX(CASE WHEN rn = 128 THEN h60 END) AS DOUBLE) END AS th
  FROM lsk
), rth AS (
  SELECT CASE WHEN COUNT(*) < 128 THEN {_TWO60!r}
              ELSE CAST(MAX(CASE WHEN rn = 128 THEN h60 END) AS DOUBLE) END AS th
  FROM rsk
), th AS (
  SELECT least(lth.th, rth.th) AS th FROM lth, rth
), lcut AS (
  SELECT h60 FROM lsk, th WHERE h60 < th
), rcut AS (
  SELECT h60 FROM rsk, th WHERE h60 < th
), sides AS (
  SELECT h60, COUNT(*) AS n_sides FROM (
    SELECT h60 FROM lcut UNION ALL SELECT h60 FROM rcut
  ) GROUP BY h60
), counts AS (
  SELECT COUNT(*) AS n_union,
         SUM(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS n_both
  FROM sides
), ests AS (
  SELECT ROUND(th.th / {_TWO60!r}, 9) AS theta,
         CAST(ROUND((SELECT COUNT(*) FROM lcut) * {_TWO60!r} / th.th) AS BIGINT) AS est_left,
         CAST(ROUND((SELECT COUNT(*) FROM rcut) * {_TWO60!r} / th.th) AS BIGINT) AS est_right,
         CAST(ROUND(n_both * {_TWO60!r} / th.th) AS BIGINT) AS est_intersection,
         CAST(ROUND(n_union * {_TWO60!r} / th.th) AS BIGINT) AS est_union
  FROM counts, th
), exact AS (
  SELECT (SELECT COUNT(*) FROM la) AS exact_left,
         (SELECT COUNT(*) FROM rb) AS exact_right,
         (SELECT COUNT(*) FROM la JOIN rb USING (v)) AS exact_intersection
)
SELECT theta, est_left, est_right, est_intersection, est_union,
       exact_left, exact_right, exact_intersection
FROM ests, exact
""",
)
def theta_customer_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra: customers who ordered in 1994 vs
    1995 — both sets sketched to k=128 minimum hashes, cut to the
    common θ, and intersected/unioned on the retained hashes. The
    intersection estimate costs a ≤128-row join however large the
    sets; exact counts ride along so the error is auditable. This is
    the Druid/Trino theta-sketch workflow as a pure DataFrame plan."""
    orders = load(spark, sf_dir, "orders")
    left = orders.filter(F.year("o_orderdate") == 1994)
    right = orders.filter(F.year("o_orderdate") == 1995)
    ests = kmv_set_estimates(left, right, "o_custkey", k=128)
    lv = left.select("o_custkey").distinct()
    rv = right.select("o_custkey").distinct()
    exact = (
        lv.groupBy().agg(F.count(F.lit(1)).alias("exact_left"))
        .crossJoin(rv.groupBy().agg(F.count(F.lit(1)).alias("exact_right")))
        .crossJoin(
            lv.join(rv, "o_custkey")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("exact_intersection"))
        )
    )
    return ests.crossJoin(exact)


@register(
    "approx_distinct_production",
    survey=("A11", "ST6"),
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS exact_distinct,
       TRUE AS approx_within_5pct
FROM orders GROUP BY o_orderpriority
""",
)
def approx_distinct_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION approximate-distinct path: Spark's built-in
    `approx_count_distinct` (JVM HLL++, rsd=0.02). Its register
    layout is engine-private so the estimate itself can't be
    hash-compared — instead the query emits a tolerance VERDICT
    (|approx−exact|/exact ≤ 5%, >5× the worst error measured at
    sf0.001-0.1; deterministic per dataset) next to the exact count,
    and the oracle pins that verdict to TRUE: if the estimator ever
    drifts out of tolerance the value-hash gate fails. This is the
    pattern for gating any engine-private approximate operator."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct"),
        # try_divide (r12 ANSI audit): all-NULL key group →
        # countDistinct = 0 → verdict NULL, not a job abort.
        (
            F.try_divide(
                F.abs(
                    F.approx_count_distinct("o_custkey", rsd=0.02)
                    - F.countDistinct("o_custkey")
                ),
                F.countDistinct("o_custkey"),
            )
            <= 0.05
        ).alias("approx_within_5pct"),
    )


_H60 = (
    "CAST(concat('0x', substr(md5(CAST({v} AS VARCHAR)), 1, 15)) AS BIGINT)"
)


@register(
    "cm_heavy_hitters",
    survey=("A13", "A11"),
    oracle=f"""
WITH h AS (
  SELECT {_H60.format(v='o_custkey')} AS hh FROM orders
), cm AS (
  SELECT j.r, (hh >> (j.r * 8)) & 255 AS bucket, COUNT(*) AS c
  FROM h, (SELECT unnest(range(4)) AS r) j
  GROUP BY 1, 2
), exact AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders
  GROUP BY 1 ORDER BY n DESC, o_custkey LIMIT 20
), cand AS (
  SELECT o_custkey, n, {_H60.format(v='o_custkey')} AS hh FROM exact
)
SELECT c.o_custkey,
       CAST(c.n AS BIGINT) AS exact_count,
       CAST(LEAST(c0.c, c1.c, c2.c, c3.c) AS BIGINT) AS cm_estimate,
       LEAST(c0.c, c1.c, c2.c, c3.c) >= c.n AS never_underestimates
FROM cand c
JOIN cm c0 ON c0.r = 0 AND c0.bucket = (c.hh >> 0) & 255
JOIN cm c1 ON c1.r = 1 AND c1.bucket = (c.hh >> 8) & 255
JOIN cm c2 ON c2.r = 2 AND c2.bucket = (c.hh >> 16) & 255
JOIN cm c3 ON c3.r = 3 AND c3.bucket = (c.hh >> 24) & 255
""",
)
def cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy-hitter verification (completes the sketch
    family — Cormode & Muthukrishnan 2005): d=4 × w=256 counters
    carved from the shared md5-derived 60-bit hash, estimates for the
    exact top-20 customers by order count. The oracle reproduces the
    sketch bit-for-bit and pins the one-sided error guarantee
    (cm_estimate ≥ exact on every row)."""
    from bio_lakehouse_spark.operators.sketches import count_min_estimates

    orders = load(spark, sf_dir, "orders")
    exact = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), "o_custkey")
        .limit(20)
    )
    est = count_min_estimates(
        orders, "o_custkey", exact.select("o_custkey"),
        depth=4, width=256,
    )
    return exact.join(est, on="o_custkey").select(
        "o_custkey",
        F.col("exact_count").cast("long").alias("exact_count"),
        "cm_estimate",
        (F.col("cm_estimate") >= F.col("exact_count")).alias(
            "never_underestimates"
        ),
    )


@register(
    "rolling_hll_users_7d",
    survey=("A11", "W2", "A13"),
    oracle=f"""
WITH h AS (
  SELECT CAST(ts AS DATE) AS day, {_H60.format(v='user_id')} AS h60,
         user_id
  FROM events
), regs AS (
  SELECT day, h60 >> {_SUFFIX_BITS} AS idx,
         MAX(CASE WHEN (h60 & {_MASK}) = 0 THEN {_SUFFIX_BITS + 1}
                  ELSE {_SUFFIX_BITS} - length(bin(h60 & {_MASK})) + 1
             END) AS maxrank
  FROM h GROUP BY day, idx
), spine AS (
  SELECT DISTINCT day FROM regs
), cov AS (
  SELECT CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                     INTERVAL 1 DAY)) AS DATE) AS d,
         idx, maxrank
  FROM regs
), merged AS (
  SELECT c.d, c.idx, MAX(c.maxrank) AS maxrank
  FROM cov c JOIN spine s ON s.day = c.d
  GROUP BY c.d, c.idx
), folded AS (
  SELECT d, SUM(power(2.0, -maxrank)) AS sum_inv, COUNT(*) AS present
  FROM merged GROUP BY d
), est AS (
  SELECT d,
         CAST(ROUND(CASE WHEN {_ALPHA_M2!r} / (sum_inv + ({_M} - present)) <= {2.5 * _M!r}
                          AND ({_M} - present) > 0
                     THEN {float(_M)!r} * ln({float(_M)!r} / ({_M} - present))
                     ELSE {_ALPHA_M2!r} / (sum_inv + ({_M} - present)) END) AS BIGINT)
           AS hll_users_7d
  FROM folded
), exact AS (
  SELECT dd AS d, COUNT(DISTINCT u) AS exact_users_7d FROM (
    SELECT CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                       INTERVAL 1 DAY)) AS DATE) AS dd, u
    FROM (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u FROM events)
  ) c JOIN spine s ON s.day = c.dd
  GROUP BY dd
)
SELECT est.d AS date, hll_users_7d, exact_users_7d,
       ROUND(100.0 * abs(hll_users_7d - exact_users_7d) / exact_users_7d, 4)
         AS err_pct
FROM est JOIN exact ON exact.d = est.d
ORDER BY est.d
""",
)
def rolling_hll_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users via HLL REGISTER MERGE — the
    sketch-mergeability property doing real work: daily m=256-row
    register frames merge by element-wise MAX across the window, so
    the rolling state is |days|·m rows whatever the user cardinality.
    The exact twin (rolling_distinct_users_7d) explodes (day, user)
    pairs — linear in distinct users per window; this one is the
    100 TB path, and the query publishes its own realized error
    against the exact answer. Same coverage-explode join shape, but
    on the REGISTER frame."""
    from bio_lakehouse_spark.operators.sketches import hll_fold, hll_registers

    ev = load(spark, sf_dir, "events")
    daily = ev.select(F.to_date("ts").alias("day"), "user_id")
    regs = hll_registers(daily, ["day"], "user_id", p=_P)
    spine = regs.select("day").distinct()
    cov = regs.select(
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias(
            "d"
        ),
        "__idx",
        "__maxrank",
    )
    merged = (
        cov.join(F.broadcast(spine), cov.d == spine.day)
        .groupBy("d", "__idx")
        .agg(F.max("__maxrank").alias("__maxrank"))
    )
    est = hll_fold(merged, ["d"], p=_P).withColumnRenamed(
        "hll_estimate", "hll_users_7d"
    )
    du = ev.select(F.to_date("ts").alias("day"), F.col("user_id").alias("u")).distinct()
    exact = (
        du.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add("day", 6))
            ).alias("d"),
            "u",
        )
        .join(F.broadcast(spine), F.col("d") == F.col("day"))
        .groupBy("d")
        .agg(F.count_distinct("u").alias("exact_users_7d"))
    )
    return (
        est.join(exact, "d")
        .select(
            F.col("d").alias("date"),
            "hll_users_7d",
            "exact_users_7d",
            # try_divide (r12 ANSI audit): a 7-day window with
            # rows but an all-NULL user column → exact 0 → NULL.
            F.round(
                F.try_divide(
                    100.0
                    * F.abs(
                        F.col("hll_users_7d")
                        - F.col("exact_users_7d")
                    ),
                    F.col("exact_users_7d"),
                ),
                4,
            ).alias("err_pct"),
        )
        .orderBy("date")
    )
