"""Relational core: scans, filters, joins, aggregates, sorts, sets.

Covers SURVEY.md §2.1 S7, §2.2 P1/P5-P8, §2.3 J1-J6, §2.4 A1-A13,
§2.6 O1-O4, §2.7 SET1-SET3 on the driver's TPC-H-ish tables. Each
query's docstring cites the reference operator it re-expresses.

Scale notes (100 TB posture):
- dims (region/nation/customer at their SF ratios) are broadcast;
- fact-fact joins shuffle on their keys with AQE handling skew;
- every aggregate is a built-in → map-side partial aggregation;
- filters/projections sit directly on the parquet scan so Catalyst
  pushes them into the reader (verified via ``.explain`` —
  PushedFilters + pruned ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.aggregates import (
    conditional_avg,
    conditional_count,
    percentile_exact,
    sorted_set_join,
)
from bio_lakehouse_spark.operators.joins import (
    anti,
    coalesce_outer_chain,
    semi,
)
from bio_lakehouse_spark.operators.stats import safe_corr
from bio_lakehouse_spark.suite.registry import load, register

R6 = lambda c: F.round(c, 6)  # noqa: E731 — shared float-stability rounding


def events_daily_by_type(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    """Per-day rollup of one event type (building block for J1/J3)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == event_type)
        .groupBy(F.to_date("ts").alias("date"))
        .agg(
            F.count(F.lit(1)).alias(f"{event_type}_n"),
            R6(F.sum("value")).alias(f"{event_type}_value"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    survey=("A1", "F11", "P8", "S7"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 6)                                    AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6)                                    AS avg_qty,
       ROUND(AVG(l_extendedprice), 6)                               AS avg_price,
       ROUND(AVG(l_discount), 6)                                    AS avg_disc,
       COUNT(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: the canonical groupBy-agg with
    derived expressions (reference analog: daily workout rollup A1,
    stg_peloton_workouts.sql:1-13). Filter sits on the scan →
    predicate pushdown; all aggregates map-side combine. The three
    price SUMS reach ~10⁹ magnitude, where 6-decimal rounding cannot
    absorb parallel-vs-serial summation-order noise (~10⁻⁶ absolute —
    caught by the r9 sf0.1 strict sweep); they round to 2 decimals
    (TPC-H's own answer tolerance, same rule as
    gini_concentration_audit's total). Quantity sums and the averages
    stay at 6 (magnitudes 10⁴-10⁵, noise ≤ 10⁻¹⁰)."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        R6(F.sum("l_quantity")).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias(
            "sum_charge"
        ),
        R6(F.avg("l_quantity")).alias("avg_qty"),
        R6(F.avg("l_extendedprice")).alias("avg_price"),
        R6(F.avg("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "top_orders",
    survey=("J4", "O4", "A1"),
    oracle="""
SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped top-k revenue: dim-filtered fact join + topk
    (reference analog: top-5 weeks by readiness, O4). Customer side is
    broadcast; lineitem↔orders shuffles on orderkey."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(
            R6(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "region_nation_rollup",
    survey=("J4", "J5", "A1"),
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       COUNT(*) AS n_customers,
       ROUND(SUM(c.c_acctbal), 6) AS total_acctbal,
       ROUND(AVG(c.c_acctbal), 6) AS avg_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake dim chain rollup — both dims broadcast (J5 posture):
    the fact table never shuffles for dim joins at any scale."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            R6(F.sum("c_acctbal")).alias("total_acctbal"),
            R6(F.avg("c_acctbal")).alias("avg_acctbal"),
        )
    )


@register(
    "events_daily_rollup",
    survey=("A1", "A2", "F9"),
    oracle="""
SELECT CAST(ts AS DATE) AS date,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 6) AS total_value,
       ROUND(AVG(value), 6) AS avg_value,
       ROUND(MAX(value), 6) AS max_value,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT event_type)), ',') AS event_types
FROM events
GROUP BY CAST(ts AS DATE)
""",
)
def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup with a sorted collect_set→array_join — the
    reference's A1 daily workout rollup shape incl. the comma-joined
    category set (sorted: set order is nondeterministic across
    partitions, SURVEY.md §7.4.5)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("date")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        R6(F.sum("value")).alias("total_value"),
        R6(F.avg("value")).alias("avg_value"),
        R6(F.max("value")).alias("max_value"),
        sorted_set_join("event_type").alias("event_types"),
    )


@register(
    "events_weekly_rollup",
    survey=("A5", "F3"),
    oracle="""
SELECT CAST(DATE_TRUNC('week', ts) AS DATE) AS week_start,
       COUNT(*) AS n_events,
       ROUND(AVG(value), 6) AS avg_value,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_days,
       ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 6) AS avg_purchase_value
FROM events
GROUP BY CAST(DATE_TRUNC('week', ts) AS DATE)
""",
)
def events_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly rollup with conditional COUNT/AVG(CASE WHEN ...) —
    the reference's weekly_summary.sql:3-25 (A5); Monday-based week
    truncation on both engines."""
    ev = load(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return ev.groupBy(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        R6(F.avg("value")).alias("avg_value"),
        conditional_count(is_purchase).alias("purchase_days"),
        R6(conditional_avg(is_purchase, "value")).alias("avg_purchase_value"),
    )


@register(
    "bucketed_agg_having",
    survey=("A6", "F6"),
    oracle="""
SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 150000 THEN 'mid'
            ELSE 'low' END AS price_bucket,
       o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(AVG(o_totalprice), 6) AS avg_price
FROM orders
GROUP BY 1, 2
HAVING COUNT(*) >= 5
""",
)
def bucketed_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed group-agg with HAVING (A6 — workout_type_optimization
    .sql:33-48): CASE banding as group key, post-agg count filter."""
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 150000, "mid")
        .otherwise("low")
    )
    return (
        o.groupBy(bucket.alias("price_bucket"), F.col("o_orderpriority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            R6(F.avg("o_totalprice")).alias("avg_price"),
        )
        .filter(F.col("n_orders") >= 5)
    )


@register(
    "corr_aggregate",
    survey=("A7",),
    oracle="""
SELECT l_returnflag,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       COUNT(*) AS n
FROM lineitem
WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
GROUP BY l_returnflag
""",
)
def corr_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORR(x, y) aggregate per segment (A7 —
    readiness_performance_correlation.sql:6-13) with NULL guards (P7)."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    return li.groupBy("l_returnflag").agg(
        # safe_corr (r12 ANSI audit): F.corr raises DIVIDE_BY_ZERO
        # under ANSI on a constant-valued segment.
        R6(safe_corr("l_quantity", "l_extendedprice")).alias("qty_price_corr"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "baseline_stats",
    survey=("A8",),
    oracle="""
SELECT event_type,
       ROUND(AVG(value), 6) AS mean_value,
       ROUND(STDDEV(value), 6) AS std_value,
       COUNT(*) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
GROUP BY event_type
""",
)
def baseline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window AVG/STDDEV baseline (A8 — health_alerts
    handler.py:83-95 alert thresholds); sample stddev on both engines."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    return ev.groupBy("event_type").agg(
        R6(F.avg("value")).alias("mean_value"),
        R6(F.stddev("value")).alias("std_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "distinct_dedup",
    survey=("A11",),
    oracle="""
SELECT user_id, event_type, COUNT(*) AS n_days_active
FROM (
  SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS date FROM events
)
GROUP BY user_id, event_type
""",
)
def distinct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates → per-key distinct-day counts (A11 — the
    reference's `dropDuplicates(["date","meal"])` meal dedup,
    mfp_normalizer.py:113-118)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_type", F.to_date("ts").alias("date"))
        .dropDuplicates()
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_days_active"))
    )


@register(
    "percentile_stats",
    survey=("A13", "A10"),
    oracle="""
SELECT event_type,
       ROUND(QUANTILE_CONT(value, 0.5), 6)  AS p50,
       ROUND(QUANTILE_CONT(value, 0.75), 6) AS p75,
       ROUND(QUANTILE_CONT(value, 0.95), 6) AS p95,
       ROUND(AVG(value), 6) AS mean,
       ROUND(STDDEV(value), 6) AS std,
       COUNT(*) AS n
FROM events GROUP BY event_type
""",
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + grouped descriptive stats
    (A13/A10 — pandas quantile(0.75) in correlation_discovery.py:473).
    Exact `percentile` for oracle parity; at 100 TB swap to
    `percentile_approx` (t-digest) — one-line change."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        R6(percentile_exact("value", 0.5)).alias("p50"),
        R6(percentile_exact("value", 0.75)).alias("p75"),
        R6(percentile_exact("value", 0.95)).alias("p95"),
        R6(F.avg("value")).alias("mean"),
        R6(F.stddev("value")).alias("std"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "rollup_grouping_sets",
    survey=("A12",),
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus) AS INTEGER) AS grouping_level,
       COUNT(*) AS n,
       ROUND(SUM(l_quantity), 6) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — collapses the reference's UNION-ALL
    segment pattern (SET1/A12) into one pass (SURVEY.md §2.4 notes
    `cube`/`rollup` as the idiomatic replacement)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + F.grouping("l_linestatus"))
            .cast("int")
            .alias("grouping_level"),
            F.count(F.lit(1)).alias("n"),
            R6(F.sum("l_quantity")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "grouping_level",
            "n",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "full_outer_coalesce_chain",
    survey=("J1", "J2", "P7"),
    oracle="""
WITH click AS (
  SELECT CAST(ts AS DATE) AS date, COUNT(*) AS click_n, ROUND(SUM(value),6) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY 1
), purchase AS (
  SELECT CAST(ts AS DATE) AS date, COUNT(*) AS purchase_n, ROUND(SUM(value),6) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), error AS (
  SELECT CAST(ts AS DATE) AS date, COUNT(*) AS error_n, ROUND(SUM(value),6) AS error_value
  FROM events WHERE event_type = 'error' GROUP BY 1
), signup AS (
  SELECT CAST(ts AS DATE) AS date, COUNT(*) AS signup_n, ROUND(SUM(value),6) AS signup_value
  FROM events WHERE event_type = 'signup' GROUP BY 1
)
SELECT COALESCE(c.date, p.date, e.date, s.date) AS date,
       c.click_n, c.click_value, p.purchase_n, p.purchase_value,
       e.error_n, e.error_value, s.signup_n, s.signup_value
FROM click c
FULL OUTER JOIN purchase p ON c.date = p.date
FULL OUTER JOIN error e    ON COALESCE(c.date, p.date) = e.date
FULL OUTER JOIN signup s   ON COALESCE(c.date, p.date, e.date) = s.date
""",
)
def full_outer_coalesce_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's gold-rollup join: FULL OUTER chain with a
    COALESCE-accumulated key (J1 — gold_daily_rollup.sql:91-153).
    Spark's named-column join coalesces the key per hop, which is
    exactly what the SQL emulates manually (SURVEY.md §7.4.2)."""
    frames = [
        events_daily_by_type(spark, sf_dir, t)
        for t in ("click", "purchase", "error", "signup")
    ]
    return coalesce_outer_chain(frames, on=["date"], how="full_outer")


@register(
    "next_day_self_join",
    survey=("J3", "W5"),
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS date, ROUND(SUM(value),6) AS total_value
  FROM events GROUP BY 1
)
SELECT a.date, a.total_value,
       b.total_value AS next_day_value,
       ROUND(b.total_value - a.total_value, 6) AS day_over_day_delta
FROM daily a
JOIN daily b ON b.date = a.date + INTERVAL 1 DAY
""",
)
def next_day_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day self-join (J3 — sleep_performance_prediction.sql:25-33
    `b.date = date_add('day', 1, a.date)`). Kept as a literal join to
    pin those semantics; `lead_target` covers the window form the
    reference itself migrated to."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("date")).agg(
        R6(F.sum("value")).alias("total_value")
    )
    a, b = daily.alias("a"), daily.alias("b")
    return a.join(
        b, F.col("b.date") == F.date_add(F.col("a.date"), 1), "inner"
    ).select(
        F.col("a.date").alias("date"),
        F.col("a.total_value").alias("total_value"),
        F.col("b.total_value").alias("next_day_value"),
        R6(F.col("b.total_value") - F.col("a.total_value")).alias(
            "day_over_day_delta"
        ),
    )


@register(
    "left_enrich_join",
    survey=("J5", "F8"),
    oracle="""
SELECT o.o_orderkey, o.o_totalprice,
       c.c_name, c.c_mktsegment,
       n.n_name AS nation
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'O'
""",
)
def left_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-enrichment joins with broadcast dims (J5 —
    training_load.py:75-91 pandas merge re-expressed). At 100 TB the
    orders fact streams through two broadcast hash joins, no shuffle."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .select(
            "o_orderkey",
            "o_totalprice",
            "c_name",
            "c_mktsegment",
            F.col("n_name").alias("nation"),
        )
    )


@register(
    "anti_join_inactive",
    survey=("J6",),
    oracle="""
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    # empty-by-semantics at sf0.01: every fixture customer has orders,
    # so the correct anti-join result IS zero rows (not a vacuous green)
    expect_rows=False,
)
def anti_join_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — customers with no orders (J6; the reference has
    only filter-based exclusion, SURVEY.md notes anti/semi come free)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return anti(c, o, on=["c_custkey"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "semi_join_active",
    survey=("J6",),
    oracle="""
SELECT c.c_custkey, c.c_acctbal
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
)
""",
)
def semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — customers with at least one big order (J6)."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return semi(c, o, on=["c_custkey"]).select("c_custkey", "c_acctbal")


# ---------------------------------------------------------------------------
# §2.6 sorts / top-k, §2.7 sets
# ---------------------------------------------------------------------------


@register(
    "latest_row_top1",
    survey=("O3", "W7"),
    oracle="""
SELECT user_id, event_type AS last_event_type, ROUND(value, 6) AS last_value,
       ts AS last_ts
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def latest_row_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-entity via ROW_NUMBER dedupe (O3+W7 — the
    `ORDER BY date DESC LIMIT 1` briefing pattern generalized per
    user, gold_daily_rollup.sql:43-51). Deterministic tie-break on
    event_id."""
    from bio_lakehouse_spark.operators.windows import dedupe_latest

    ev = load(spark, sf_dir, "events")
    return dedupe_latest(
        ev, keys=["user_id"], order_by=[F.desc("ts"), F.desc("event_id")]
    ).select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        R6(F.col("value")).alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


@register(
    "topk_multi_order",
    survey=("O4", "O2"),
    oracle="""
SELECT user_id, ROUND(SUM(value), 6) AS total_value, COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY total_value DESC, user_id
LIMIT 5
""",
)
def topk_multi_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with multi-column ORDER BY (O4 —
    workout_type_optimization.sql:48). TakeOrderedAndProject in the
    plan: no global sort, k rows per partition then merge."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            R6(F.sum("value")).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(5)
    )


@register(
    "union_all_segments",
    survey=("SET1", "A7"),
    oracle="""
SELECT 'all' AS segment, ROUND(CORR(o_totalprice, c_acctbal), 6) AS price_balance_corr, COUNT(*) AS n
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'high_balance' AS segment, ROUND(CORR(o_totalprice, c_acctbal), 6), COUNT(*)
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_acctbal >= 5000
UNION ALL
SELECT 'low_balance' AS segment, ROUND(CORR(o_totalprice, c_acctbal), 6), COUNT(*)
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey WHERE c.c_acctbal < 0
""",
)
def union_all_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of segment aggregates (SET1 — the All/High/Low
    readiness segments of readiness_performance_correlation.sql)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)

    def seg(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("segment"),
            # safe_corr (r12 ANSI audit): the low/high-balance
            # segments can be single-row or constant → F.corr raises.
            R6(safe_corr("o_totalprice", "c_acctbal")).alias(
                "price_balance_corr"
            ),
            F.count(F.lit(1)).alias("n"),
        ).select("segment", "price_balance_corr", "n")

    return (
        seg("all", joined)
        .unionAll(seg("high_balance", joined.filter(F.col("c_acctbal") >= 5000)))
        .unionAll(seg("low_balance", joined.filter(F.col("c_acctbal") < 0)))
    )


@register(
    "intersect_except_users",
    survey=("SET3",),
    oracle="""
SELECT user_id, 'both' AS cohort FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
)
UNION ALL
SELECT user_id, 'purchase_only' AS cohort FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
)
""",
)
def intersect_except_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT cohorts (SET3 — absent in the reference,
    noted as available; here as first-class set ops)."""
    ev = load(spark, sf_dir, "events")
    purchasers = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    erroring = (
        ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    )
    both = purchasers.intersect(erroring).withColumn("cohort", F.lit("both"))
    only = purchasers.exceptAll(erroring).withColumn(
        "cohort", F.lit("purchase_only")
    )
    return both.unionAll(only)


@register(
    "customer_order_distribution",
    survey=("J5", "A1", "A10"),
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer INCLUDING
    zero-order customers — the left join + COUNT(join-side column)
    idiom (count skips the nulls the outer join manufactures), then a
    histogram of the counts. Two aggs: the first shuffles on custkey,
    the second on the tiny count domain."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "top_supplier_revenue",
    survey=("A1", "O4", "J4"),
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, then the
    top supplier(s) INCLUDING ties — the scalar-subquery max becomes
    a broadcast one-row join (never a global sort for a max). Date
    filter pushes to the scan; revenue is rounded identically on
    both sides before the equality so the tie compare is stable."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("total_revenue")
        )
    )
    mx = rev.groupBy().agg(F.max("total_revenue").alias("mx"))
    return (
        sup.join(rev, sup.s_suppkey == rev.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "parts_supplier_count",
    survey=("J6", "A11", "A1"),
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem
  GROUP BY 1, 2
) ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#1'
  AND ps.ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY 1, 2, 3
""",
)
def parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per part attribute group,
    excluding one brand and negative-balance suppliers. The NOT IN
    becomes a broadcast LEFT ANTI join (the null-safe rewrite that
    NOT IN needs — Spark's anti join has the right semantics when
    the subquery side is non-null); part-supplier pairs come from
    lineitem deduped on the join key first, so the count-distinct
    shuffles pairs, not lineitems."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    sup = load(spark, sf_dir, "supplier")
    ps = (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.lit(1))
        .select("ps_partkey", "ps_suppkey")
    )
    bad = sup.filter(F.col("s_acctbal") < 0.0).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    return (
        ps.join(F.broadcast(bad), "ps_suppkey", "left_anti")
        .join(
            part.filter(F.col("p_brand") != "Brand#1"),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "small_quantity_revenue",
    survey=("J4", "A1", "F11"),
    oracle="""
WITH avgq AS (
  SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN avgq a ON l.l_partkey = a.l_partkey
WHERE l.l_quantity < a.half_avg_qty
""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-half-average-quantity line
    items. The correlated scalar subquery (per-part average) is
    rewritten as an explicit aggregate + equi-join — the form every
    optimizer targets; at scale the per-part average table is small
    relative to lineitem and AQE will broadcast it when it fits.
    The 10⁹-magnitude revenue sum rounds to 2 decimals (summation-
    order ulp noise exceeds 6-decimal precision at sf0.1 — same rule
    as pricing_summary's price sums)."""
    li = load(spark, sf_dir, "lineitem")
    avgq = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    joined = li.join(avgq, "l_partkey").filter(
        F.col("l_quantity") < F.col("half_avg_qty")
    )
    return joined.groupBy().agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
    )


@register(
    "idle_rich_customers",
    survey=("J6", "A8", "A1"),
    oracle="""
WITH thresh AS (
  SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey, COUNT(*) AS numcust,
       ROUND(SUM(c.c_acctbal), 6) AS totacctbal
FROM customer c, thresh t
WHERE c.c_acctbal > t.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY 1
""",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    URGENT order, grouped by nation (every synthetic customer has
    SOME order, so the classic never-ordered predicate is vacuous
    here; the plan shape — scalar avg + NOT EXISTS — is identical).
    The scalar average rides
    in as a broadcast one-row cross join; NOT EXISTS is a LEFT ANTI
    join on custkey — at scale the anti join shuffles both sides on
    the key (or broadcasts, AQE's call); nothing is collected."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .groupBy()
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT")
            .select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
    )


@register(
    "fuzzy_name_match",
    survey=("J6", "F8"),
    # sf0.001 has too few suppliers per nation for any edit-dist≤2
    # pair; rows are guaranteed from the driver's sf0.01 up
    expect_rows_min_sf=0.01,
    oracle="""
SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS edit_dist
FROM supplier a JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
 AND a.s_nationkey = b.s_nationkey
WHERE levenshtein(a.s_name, b.s_name) <= 2
""",
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy match: supplier-name pairs within an
    edit distance of 2, blocked by nation so the quadratic comparison
    is bounded per block (the same blocked-pair shape as
    `dedup_ngram_jaccard` — at scale the block column is the
    candidate key from a cheaper blocking pass). `F.levenshtein` is
    a JVM built-in; both engines implement the standard edit
    distance, so the oracle matches exactly."""
    sup = load(spark, sf_dir, "supplier")
    a, b = sup.alias("a"), sup.alias("b")
    # threshold form: the JVM implementation abandons a pair as soon
    # as the running distance exceeds the bound (returns -1) — O(n·k)
    # per comparison instead of O(n²), the form that matters when the
    # blocked pair count is large.
    dist = F.levenshtein(F.col("a.s_name"), F.col("b.s_name"), 2)
    return (
        a.join(
            b,
            (F.col("a.s_suppkey") < F.col("b.s_suppkey"))
            & (F.col("a.s_nationkey") == F.col("b.s_nationkey")),
        )
        .select(
            F.col("a.s_suppkey").alias("supp_a"),
            F.col("b.s_suppkey").alias("supp_b"),
            dist.alias("edit_dist"),
        )
        .filter(F.col("edit_dist") >= 0)
    )


@register(
    "jaro_winkler_name_pairs",
    survey=("J6", "F8"),
    oracle="""
SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
       ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw_sim
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_type = b.p_type
 AND a.p_partkey < b.p_partkey
WHERE a.p_name <> b.p_name
  AND ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.85
""",
)
def jaro_winkler_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler near-match name pairs — the probabilistic string
    comparator Spark has NO built-in for (DuckDB ships it as
    ``jaro_winkler_similarity``, the oracle), implemented as a pure
    SQL higher-order-function expression in
    functions/strings.py:jaro_winkler_sql: the greedy match state
    rides an ``aggregate`` fold over character positions, floored
    transpositions via ``zip_with``, Winkler prefix boost gated at
    jaro > 0.7 — semantics pinned byte-for-byte against DuckDB on
    8,000 random pairs (tests/test_jaro_winkler.py). JVM-side
    whole-stage codegen throughout, zero Python.

    Complements `fuzzy_name_match` (bounded Levenshtein, same
    blocked-pair shape): edit distance counts operations, JW rewards
    shared prefixes — the comparator Splink/dedupe.io reach for on
    person/product names. Blocked by (brand, type) so the quadratic
    comparison stays per-block; equal names are excluded (exact
    duplicates are `dedup_exact`'s job — this is the NEAR-match
    band), threshold 0.85 on the rounded score keeps both engines'
    boundary decisions identical.

    The fold is evaluated once per DISTINCT NAME PAIR, not per
    blocked pair (the BPE type/token leverage: HOF lambdas are
    interpreted, so the comparator is the expensive term — 4k
    distinct name pairs vs 1.3M blocked pairs at sf0.1, measured
    140 s → ~3 s), then broadcast-joined back onto the pair frame."""
    from bio_lakehouse_spark.functions.strings import jaro_winkler

    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type"
    )
    a, b = part.alias("a"), part.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_type") == F.col("b.p_type"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(F.col("a.p_name") != F.col("b.p_name"))
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            F.col("a.p_name").alias("na"),
            F.col("b.p_name").alias("nb"),
        )
    )
    # localCheckpoint is LOAD-BEARING: without the barrier Catalyst
    # substitutes jw_sim into the >= 0.85 predicate and pushes it
    # BELOW the distinct, running the fold on every blocked pair
    # (measured 120 s at sf0.1 vs ~1 s with the 4k-row barrier).
    distinct_names = pairs.select("na", "nb").distinct().localCheckpoint()
    lut = distinct_names.select(
        "na",
        "nb",
        F.round(jaro_winkler("na", "nb"), 6).alias("jw_sim"),
    ).filter(F.col("jw_sim") >= 0.85)
    return pairs.join(F.broadcast(lut), ["na", "nb"]).select(
        "part_a", "part_b", "jw_sim"
    )


@register(
    "unpivot_order_metrics",
    survey=("SET1", "F9"),
    oracle="""
SELECT o_orderkey, metric, value FROM (
  SELECT o_orderkey,
         unnest(['totalprice', 'custkey']) AS metric,
         unnest([o_totalprice, CAST(o_custkey AS DOUBLE)]) AS value
  FROM orders
) WHERE value IS NOT NULL
""",
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) via `stack` — one scan emits k rows
    per input row with NO shuffle or join (the UNION-ALL-per-column
    melt would scan k times). The long layout is what the profiling
    and discovery layers consume."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'totalprice', o_totalprice,"
            " 'custkey', CAST(o_custkey AS DOUBLE))"
            " AS (metric, value)"
        ),
    ).filter(F.col("value").isNotNull())


def _pagerank_oracle(iters: int = 3, d: str = "0.85") -> str:
    """Unrolled power-iteration PageRank over the symmetrized
    customer-supplier graph — fixed iteration count makes the full
    algorithm (degree normalization, dangling-mass redistribution,
    damping) SQL-expressible, same pattern as the unrolled-Lloyd
    KMeans oracle."""
    parts = [f"""WITH base AS (
  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), e AS (
  SELECT c AS src, s AS dst FROM base
  UNION ALL SELECT s AS src, c AS dst FROM base
), deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
vtx AS (SELECT DISTINCT v FROM
        (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM vtx),
r0 AS (SELECT v, 1.0 / n.n AS r FROM vtx, n)"""]
    for i in range(1, iters + 1):
        parts.append(f""", c{i} AS (
  SELECT e.dst AS v, SUM(r.r / deg.deg) AS insum
  FROM e JOIN r{i-1} r ON r.v = e.src JOIN deg ON deg.src = e.src
  GROUP BY e.dst
), d{i} AS (
  SELECT COALESCE(SUM(r.r), 0) AS dng
  FROM r{i-1} r LEFT JOIN deg ON deg.src = r.v WHERE deg.src IS NULL
), r{i} AS (
  SELECT vtx.v, (1 - {d}) / n.n + {d} * (COALESCE(c.insum, 0)
         + dd.dng / n.n) AS r
  FROM vtx CROSS JOIN n CROSS JOIN d{i} dd LEFT JOIN c{i} c ON c.v = vtx.v
)""")
    parts.append(f"""
SELECT v AS node, ROUND(r, 9) AS rank FROM r{iters}""")
    return "".join(parts)


@register(
    "pagerank_cust_supplier",
    survey=("J4", "A1"),
    oracle=_pagerank_oracle(3),
)
def pagerank_cust_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, damping 0.85, dangling mass
    redistributed) over the symmetrized customer-supplier trade
    graph — entity-importance ranking, the second iterative-graph
    operator after connected_components. One keyed join + one
    partial-aggregated groupBy + a one-row dangling broadcast per
    iteration, lineage checkpoint-truncated; rank mass sums to 1."""
    from bio_lakehouse_spark.operators.graph import pagerank

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    e = base.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        base.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    out = pagerank(e, iters=3, damping=0.85)
    return out.select("node", F.round("rank", 9).alias("rank"))


@register(
    "association_rules_topk",
    survey=("J7", "A6", "O4"),
    oracle="""
WITH lo AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), n_orders AS (
  SELECT COUNT(DISTINCT o) AS n FROM lo
), supp AS (
  SELECT p, COUNT(*) AS s FROM lo GROUP BY p
), pair AS (
  SELECT a.p AS p1, b.p AS p2, COUNT(*) AS s12
  FROM lo a JOIN lo b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
), scored AS (
  SELECT pr.p1, pr.p2, pr.s12,
         pr.s12 * 1.0 / s1.s AS confidence,
         pr.s12 * 1.0 * n.n / (s1.s * s2.s) AS lift
  FROM pair pr
  JOIN supp s1 ON s1.p = pr.p1
  JOIN supp s2 ON s2.p = pr.p2
  CROSS JOIN n_orders n
)
SELECT p1, p2, s12 AS pair_support,
       ROUND(confidence, 6) AS confidence, ROUND(lift, 6) AS lift
FROM scored
ORDER BY ROUND(lift, 9) DESC, p1, p2 LIMIT 20
""",
)
def association_rules_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-ordered parts: support
    ≥ 3 pairs scored by confidence P(p2|p1) and lift
    P(p1,p2)/(P(p1)P(p2)), top-20 by lift with rounded-score tie
    pinning. The per-order self-join fans out as (basket size choose
    2) — bounded by basket size exactly like the trade-graph build —
    and collapses to pair counts map-side; item supports broadcast
    back. The min-support HAVING is what keeps the rule table sparse
    at scale (the a-priori pruning step)."""
    lo = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        # r13: four consumers (n_orders, supp, both self-join sides)
        # each re-ran the scan+distinct exchange — materialize once.
        .localCheckpoint()
    )
    n_orders = lo.agg(F.count_distinct("o").alias("n"))
    supp = lo.groupBy("p").agg(F.count(F.lit(1)).alias("s"))
    a, b = lo.alias("a"), lo.alias("b")
    pair = (
        a.join(b, on=F.col("a.o") == F.col("b.o"))
        .filter(F.col("a.p") < F.col("b.p"))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("s12"))
        .filter(F.col("s12") >= 3)
    )
    s1 = supp.select(F.col("p").alias("p1"), F.col("s").alias("s1"))
    s2 = supp.select(F.col("p").alias("p2"), F.col("s").alias("s2"))
    scored = (
        pair.join(F.broadcast(s1), "p1")
        .join(F.broadcast(s2), "p2")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            F.col("s12").alias("pair_support"),
            (F.col("s12") / F.col("s1")).alias("confidence"),
            (F.col("s12") * F.col("n") / (F.col("s1") * F.col("s2"))).alias(
                "lift"
            ),
        )
    )
    return (
        scored.orderBy(
            F.round("lift", 9).desc(), F.col("p1").asc(), F.col("p2").asc()
        )
        .limit(20)
        .select(
            "p1",
            "p2",
            "pair_support",
            R6(F.col("confidence")).alias("confidence"),
            R6(F.col("lift")).alias("lift"),
        )
    )


@register(
    "join_size_estimate",
    survey=("J4", "A6", "P10"),
    oracle="""
WITH ca AS (
  SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1
), cb AS (
  SELECT c_custkey AS k, COUNT(*) AS c FROM customer GROUP BY 1
), est AS (
  SELECT CAST(SUM(ca.c * cb.c) AS BIGINT) AS predicted_rows,
         COUNT(*) AS n_matching_keys,
         MAX(ca.c * cb.c) AS max_key_contribution
  FROM ca JOIN cb USING (k)
), act AS (
  SELECT COUNT(*) AS actual_rows
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
)
SELECT e.predicted_rows, e.n_matching_keys, e.max_key_contribution,
       a.actual_rows,
       CAST(e.predicted_rows = a.actual_rows AS INTEGER) AS exact_match
FROM est e CROSS JOIN act a
""",
)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality prediction WITHOUT executing the join:
    |A ⋈ B| = Σ_k cA(k)·cB(k) over the per-key count vectors — the
    quantity a cost-based planner estimates from histograms, here
    computed exactly from two key-count aggregates whose frames are
    |keys| rows, not |rows|. The query also runs the real join and
    publishes exact_match=1, plus max_key_contribution — the
    single-key hot spot that predicts skew BEFORE the shuffle (the
    planning companion to skew_profile_keys). At 100 TB this is how
    you price a join and pick salting without paying for it first."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    ca = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    cb = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    est = ca.join(cb, "k").agg(
        F.sum(F.col("ca") * F.col("cb")).alias("predicted_rows"),
        F.count(F.lit(1)).alias("n_matching_keys"),
        F.max(F.col("ca") * F.col("cb")).alias("max_key_contribution"),
    )
    act = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    return est.crossJoin(F.broadcast(act)).select(
        "predicted_rows",
        "n_matching_keys",
        "max_key_contribution",
        "actual_rows",
        (F.col("predicted_rows") == F.col("actual_rows"))
        .cast("int")
        .alias("exact_match"),
    )


def _lpa_oracle(iters: int = 2) -> str:
    """Unrolled synchronous label propagation over the symmetrized
    customer-supplier graph — fixed iterations make the mode-label
    update (count desc, label asc argmax; isolated nodes keep their
    label) fully SQL-expressible, the unrolled-PageRank pattern."""
    parts = ["""WITH base AS (
  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), e AS (
  SELECT c AS src, s AS dst FROM base
  UNION ALL SELECT s AS src, c AS dst FROM base
), vtx AS (SELECT DISTINCT v FROM
        (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)),
l0 AS (SELECT v, v AS lab FROM vtx)"""]
    for i in range(1, iters + 1):
        parts.append(f""", p{i} AS (
  SELECT e.dst AS v, l.lab, COUNT(*) AS cnt
  FROM e JOIN l{i-1} l ON l.v = e.src GROUP BY e.dst, l.lab
), a{i} AS (
  SELECT v, lab,
         ROW_NUMBER() OVER (PARTITION BY v ORDER BY cnt DESC, lab) AS rn
  FROM p{i}
), l{i} AS (
  SELECT l{i-1}.v, COALESCE(a{i}.lab, l{i-1}.lab) AS lab
  FROM l{i-1} LEFT JOIN a{i} ON a{i}.v = l{i-1}.v AND a{i}.rn = 1
)""")
    parts.append(f"""
SELECT v AS node, lab AS community FROM l{iters}""")
    return "".join(parts)


def _modularity_oracle(iters: int = 2) -> str:
    """Newman modularity of the LP communities: reuses _lpa_oracle's
    unrolled CTE chain verbatim, then Q's per-community decomposition
    e_c/m − (d_c/2m)² over the undirected edge set."""
    lpa = _lpa_oracle(iters)
    chain = lpa[: lpa.rindex("\nSELECT v AS node")]
    return chain + f""", lab AS (
  SELECT v, lab FROM l{iters}
), mm AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM base
), ec AS (
  SELECT la.lab AS community, CAST(COUNT(*) AS DOUBLE) AS e_in
  FROM base
  JOIN lab la ON la.v = base.c
  JOIN lab lb ON lb.v = base.s
  WHERE la.lab = lb.lab
  GROUP BY 1
), deg AS (
  SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY 1
), dc AS (
  SELECT lab.lab AS community,
         CAST(COUNT(*) AS BIGINT) AS n_nodes,
         SUM(deg.d) AS d_c
  FROM deg JOIN lab ON lab.v = deg.v GROUP BY 1
)
SELECT dc.community,
       dc.n_nodes,
       CAST(COALESCE(ec.e_in, 0.0) AS BIGINT) AS e_in,
       ROUND(COALESCE(ec.e_in, 0.0) / m
             - (dc.d_c / (2.0 * m)) * (dc.d_c / (2.0 * m)), 6) + 0.0
         AS q_contribution
FROM dc LEFT JOIN ec USING (community), mm
"""


@register(
    "label_propagation_communities",
    survey=("J4", "A1", "W7"),
    oracle=_lpa_oracle(2),
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (2
    rounds, mode label with smaller-label tie-break) over the
    symmetrized customer-supplier trade graph — groups entities that
    trade with the same counterparties. Deterministic by
    construction, verified end-to-end against the unrolled SQL; per
    round one keyed join + one partial-agg count + a node-partitioned
    argmax window (operators/graph.label_propagation)."""
    from bio_lakehouse_spark.operators.graph import label_propagation

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    e = base.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        base.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    return label_propagation(e, iters=2)


def _kcore_oracle(k: int = 3, iters: int = 3) -> str:
    """Unrolled fixed-round k-core peeling over the symmetrized
    customer-supplier graph (the LPA/PageRank unroll pattern)."""
    parts = ["""WITH base AS (
  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), e0 AS (
  SELECT c AS src, s AS dst FROM base
  UNION ALL SELECT s AS src, c AS dst FROM base
)"""]
    for i in range(1, iters + 1):
        parts.append(f""", d{i} AS (
  SELECT src, COUNT(*) AS deg FROM e{i-1} GROUP BY src
), kp{i} AS (SELECT src FROM d{i} WHERE deg >= {k}),
e{i} AS (
  SELECT e.src, e.dst FROM e{i-1} e
  JOIN kp{i} a ON a.src = e.src
  JOIN kp{i} b ON b.src = e.dst
)""")
    parts.append(f"""
SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
FROM e{iters} GROUP BY src""")
    return "".join(parts)


@register(
    "kcore_trade_graph",
    survey=("J4", "A1", "J6"),
    oracle=_kcore_oracle(3, 3),
)
def kcore_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the symmetrized customer-supplier graph after 3
    peeling rounds — the noise trim (drop entities with < 3 stable
    trading partners) that precedes community/importance analysis.
    Deterministic fixed-round peeling verified against the unrolled
    SQL; per round one degree aggregate + two semi-joins
    (operators/graph.kcore_prune)."""
    from bio_lakehouse_spark.operators.graph import kcore_prune

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    e = base.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        base.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    out = kcore_prune(e, k=3, iters=3)
    return out.select("node", F.col("degree").cast("long"))


@register(
    "bloom_prune_join",
    survey=("J4", "A1"),
    oracle="""
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1
""",
)
def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned join (operators/joins.bloom_filter_build/
    bloom_prune): the selective dim side's join keys pack into an
    8 KB one-row Bloom filter; the fact side is pruned by a pure
    scan-level bit test BEFORE the join — at cluster scale, before
    its SHUFFLE, cutting shuffled rows to selectivity + ~1.6% FP
    when the dim is too large to broadcast outright. The oracle is
    the PLAIN join: a Bloom prune is result-transparent (no false
    negatives; false positives die in the real join), so equality
    against the unpruned SQL is exactly the correctness contract.
    Locally the final join broadcasts anyway; the operator's value is
    the fact-fact case where only the 8 KB filter fits everywhere."""
    from bio_lakehouse_spark.operators.joins import (
        bloom_filter_build,
        bloom_prune,
    )

    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    bloom = bloom_filter_build(cust, "c_custkey")
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    pruned = bloom_prune(orders, "o_custkey", bloom)
    joined = pruned.join(F.broadcast(cust),
                         pruned["o_custkey"] == cust["c_custkey"])
    return joined.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long").alias("total_cents"),
    )


@register(
    "pareto_skyline_parts",
    survey=("O4", "J7"),
    oracle="""
SELECT p.p_partkey, p.p_retailprice AS price, p.p_size AS size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
""",
)
def pareto_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: parts not dominated on
    (cheaper price, larger size) — the multi-objective shortlist
    operator (Börzsönyi et al. ICDE'01) that relational engines ship
    as SKYLINE OF. The quadratic NOT-EXISTS definitional form is the
    oracle; the engine computes it via per-distinct-price max-size
    aggregates plus a two-level prefix max (dense_ids partition-
    offset style — see operators.aggregates.skyline_2d), so there is
    no self-join and no global window anywhere in the plan."""
    from bio_lakehouse_spark.operators.aggregates import skyline_2d

    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    out = skyline_2d(part, "p_retailprice", "p_size")
    return out.select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
    )


# Fellegi–Sunter field weights as shared decimal literals (m/u priors
# m=(.9,.85,.95), u=(.3,.05,.01)): agreement weight ln(m/u),
# disagreement ln((1−m)/(1−u)). The SAME literal text feeds F.expr and
# the oracle — and the whole sum is CAST to DOUBLE because Spark SQL
# parses bare decimal literals as DecimalType while DuckDB parses them
# as DOUBLE; without the cast the driver hashes Decimal('5.441180')
# against 5.44118 (r07 hash-red).
_FS_SCORE_SQL = (
    "CAST((case when g1 then 1.0986122886681098 else -1.9459101490553132 end)"
    " + (case when g2 then 2.833213344056216 else -1.845826690498331 end)"
    " + (case when g3 then 4.553876891600541 else -2.9856819377004893 end)"
    " AS DOUBLE)"
)

_FS_DECISION_SQL = (
    "case when score >= 4.0 then 'link' "
    "when score >= 0.0 then 'possible' else 'nonlink' end"
)

# Adaptive-blocking reference population: at or below this customer
# count the derived knobs are exactly the documented baseline
# (band width 100, suffix length 2).
_FS_NREF = 2000

# The prm CTE mirrors _fs_adaptive_knobs exactly (same breakpoints,
# same IEEE log/ceil arithmetic), so oracle parity holds at EVERY
# scale factor, not just the ones where the derivation lands on the
# (100, 2) baseline. Shared by both FS oracles.
_FS_PRM_CTE = f"""
WITH prm AS (
  SELECT CASE WHEN COUNT(*) <= {_FS_NREF} THEN 100.0
              ELSE 100.0 / power(2.0, ceil(log2(COUNT(*) / {_FS_NREF}.0)))
         END AS bw,
         CASE WHEN COUNT(*) <= {_FS_NREF} THEN 2
              ELSE 2 + CAST(ceil(log10(COUNT(*) / {_FS_NREF}.0)) AS INT)
         END AS sl
  FROM customer
)"""


def _fs_adaptive_knobs(cust) -> tuple[float, int]:
    """Derive the two blocking knobs from the entity-dimension
    cardinality so per-block population stays ~constant as N grows
    (VERDICT r8 #7 — the 'production knob' now turns itself):

    - acctbal band width halves each time N doubles past _FS_NREF
      (block size ∝ N·width, so width ∝ 1/N keeps it flat);
    - name-suffix length grows one character per 10× N past _FS_NREF
      (TPC-H names end in digits — each char divides block size ~10×).

    One bounded driver-side action (a 1-row count of the entity
    DIMENSION — metadata-grade at any scale); returning plain Python
    literals keeps the blocking columns constant-foldable so both
    rules still compile to pure equi-keyed hash joins
    (test_entity_resolution_blocking_is_keyed_hash_join). Recall
    trade is the standard blocking one and is unchanged in kind:
    narrower bands drop cross-block near-matches; the g2 comparison
    radius (±100) is part of the MATCH definition and never scales."""
    import math

    n = cust.count()
    ratio = n / float(_FS_NREF)
    k = max(0, math.ceil(math.log2(ratio))) if ratio > 1.0 else 0
    slen = 2 + (max(0, math.ceil(math.log10(ratio))) if ratio > 1.0 else 0)
    return 100.0 / (2**k), slen


def _fs_blocked_pairs(cust, bal_width: float, suffix_len: int):
    """Candidate pairs from the two Splink-style restrictive blocking
    rules (nation × acctbal band, nation × name-suffix × segment),
    DISTINCT-unioned on the pair key, with the (g1, g2, g3)
    agreement vector. Shared by entity_resolution_fs and
    fs_em_priors_audit so the blocking cannot drift between scoring
    and training."""
    rec = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.expr(f"floor(c_acctbal / {bal_width!r})").alias("bal_band"),
        F.expr(f"right(c_name, {suffix_len})").alias("suffix"),
    )
    a, b = rec.alias("a"), rec.alias("b")
    pair_cols = [
        F.col("a.c_custkey").alias("ka"),
        F.col("b.c_custkey").alias("kb"),
        (F.col("a.c_mktsegment") == F.col("b.c_mktsegment")).alias("g1"),
        (F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal")) < 100.0).alias(
            "g2"
        ),
        (F.col("a.suffix") == F.col("b.suffix")).alias("g3"),
    ]
    rule1 = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.bal_band") == F.col("b.bal_band"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(*pair_cols)
    rule2 = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.suffix") == F.col("b.suffix"))
        & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(*pair_cols)
    # g1/g2/g3 are functions of (ka, kb), so the pair-key dedupe is
    # exact — same DISTINCT-union the oracle's UNION performs.
    return rule1.unionByName(rule2).dropDuplicates(["ka", "kb"])


@register(
    "entity_resolution_fs",
    survey=("J6", "F8", "P10"),
    oracle=_FS_PRM_CTE
    + f""", rec AS (
  SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment,
         floor(c_acctbal / bw) AS bal_band,
         right(c_name, sl) AS suffix
  FROM customer, prm
), pairs AS (
  SELECT DISTINCT a.c_custkey AS ka, b.c_custkey AS kb,
         a.c_mktsegment = b.c_mktsegment AS g1,
         abs(a.c_acctbal - b.c_acctbal) < 100.0 AS g2,
         a.suffix = b.suffix AS g3
  FROM rec a JOIN rec b
    ON a.c_nationkey = b.c_nationkey
   AND a.bal_band = b.bal_band
   AND a.c_custkey < b.c_custkey
  UNION
  SELECT DISTINCT a.c_custkey AS ka, b.c_custkey AS kb,
         a.c_mktsegment = b.c_mktsegment AS g1,
         abs(a.c_acctbal - b.c_acctbal) < 100.0 AS g2,
         a.suffix = b.suffix AS g3
  FROM rec a JOIN rec b
    ON a.c_nationkey = b.c_nationkey
   AND a.suffix = b.suffix
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
), scored AS (
  SELECT {_FS_SCORE_SQL} AS score FROM pairs
), classed AS (
  SELECT score, {_FS_DECISION_SQL} AS decision FROM scored
)
SELECT decision, COUNT(*) AS n_pairs,
       ROUND(AVG(score), 6) AS avg_weight,
       ROUND(MIN(score), 6) AS min_weight,
       ROUND(MAX(score), 6) AS max_weight
FROM classed GROUP BY decision ORDER BY decision
""",
)
def entity_resolution_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage, Fellegi–Sunter style (JASA'69;
    the model behind Splink/dedupe.io): candidate pairs from a UNION
    of two RESTRICTIVE blocking rules (Splink's multi-rule blocking),
    a boolean agreement vector per pair (segment, acctbal proximity,
    name suffix), and per-field log-likelihood match weights ln(m/u)
    / ln((1−m)/(1−u)) summed into a match score, classified
    link / possible / nonlink.

    Blocking rules: (1) nation × acctbal band; (2) nation ×
    name-suffix × segment — the DISTINCT union of both (standard
    Splink multi-rule blocking). r9: the band width and suffix
    length are DERIVED from the entity-dimension cardinality
    (`_fs_adaptive_knobs` — width halves per doubling of N past
    _FS_NREF, suffix gains a character per 10×), so per-block
    population stays ~constant as N grows instead of being a
    documentation-only production knob. The ORACLE derives the same
    knobs in SQL (_FS_PRM_CTE — same breakpoints, same IEEE
    log/ceil), so cross-engine parity holds at every SF: verified at
    sf0.001/0.01 (baseline regime, width 100 — matching the g2
    comparison radius — suffix 2) AND at sf0.1 where the derivation
    moves to (12.5, 3). The probe's `fs_linkage_adaptive` op records
    the knob values and candidate-pair counts at 16× entities.

    Upgrade of `fuzzy_name_match`'s deterministic edit-distance rule:
    same blocked-pair shape, probabilistic decision layer. The m/u
    priors are fixed literals; `fs_em_priors_audit` learns them from
    the SAME `_fs_blocked_pairs` frame."""
    cust = load(spark, sf_dir, "customer")
    bal_w, slen = _fs_adaptive_knobs(cust)
    pairs = _fs_blocked_pairs(cust, bal_w, slen)
    scored = pairs.select(F.expr(_FS_SCORE_SQL).alias("score"))
    classed = scored.withColumn("decision", F.expr(_FS_DECISION_SQL))
    return (
        classed.groupBy("decision")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("score"), 6).alias("avg_weight"),
            F.round(F.min("score"), 6).alias("min_weight"),
            F.round(F.max("score"), 6).alias("max_weight"),
        )
        .orderBy("decision")
    )


def _hits_oracle(iters: int = 3) -> str:
    """Unrolled HITS over the directed customer→supplier trade graph
    — fixed iteration count makes the mutual update + L2
    normalizations SQL-expressible, same pattern as the unrolled
    PageRank/Lloyd oracles."""
    parts = ["""WITH base AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), hub0 AS (SELECT DISTINCT c AS v, 1.0 AS h FROM base)"""]
    for i in range(1, iters + 1):
        parts.append(f""", ar{i} AS (
  SELECT b.s AS v, SUM(h.h) AS a
  FROM base b JOIN hub{i-1} h ON h.v = b.c GROUP BY b.s
), az{i} AS (SELECT SQRT(SUM(a * a)) AS z FROM ar{i}),
auth{i} AS (SELECT v, a / z AS a FROM ar{i}, az{i}),
hr{i} AS (
  SELECT b.c AS v, SUM(a.a) AS h
  FROM base b JOIN auth{i} a ON a.v = b.s GROUP BY b.c
), hz{i} AS (SELECT SQRT(SUM(h * h)) AS z FROM hr{i}),
hub{i} AS (SELECT v, h / z AS h FROM hr{i}, hz{i})""")
    parts.append(f"""
SELECT 'hub' AS role, v AS node, ROUND(h, 9) AS score FROM hub{iters}
UNION ALL
SELECT 'auth' AS role, v AS node, ROUND(a, 9) AS score FROM auth{iters}""")
    return "".join(parts)


@register(
    "hits_hubs_authorities",
    survey=("J4", "A1"),
    oracle=_hits_oracle(3),
)
def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (3 mutual power iterations, L2-normalized) over the
    DIRECTED customer→supplier trade graph: customers score as hubs
    (order from authoritative suppliers), suppliers as authorities
    (supply to strong hubs). Per iteration one keyed join + one
    partial-aggregated groupBy per side, norms as one-row broadcast
    stats, lineage checkpoint-truncated (operators/graph.hits)."""
    from bio_lakehouse_spark.operators.graph import hits

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
    )
    out = hits(e, iters=3)
    return out.select("role", F.col("v").alias("node"), F.round("score", 9).alias("score"))


@register(
    "als_rank1_audit",
    survey=("J4", "ST14", "A1"),
    oracle="""
WITH ratings AS (
  SELECT o_custkey AS c, l_partkey AS p, SUM(l_quantity) AS r
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), u1 AS (
  SELECT c, SUM(r * 1.0) / SUM(1.0 * 1.0) AS uv FROM ratings GROUP BY c
), v1 AS (
  SELECT p, SUM(r * u1.uv) / SUM(u1.uv * u1.uv) AS vv
  FROM ratings JOIN u1 USING (c) GROUP BY p
), u2 AS (
  SELECT c, SUM(r * v1.vv) / SUM(v1.vv * v1.vv) AS uv
  FROM ratings JOIN v1 USING (p) GROUP BY c
), v2 AS (
  SELECT p, SUM(r * u2.uv) / SUM(u2.uv * u2.uv) AS vv
  FROM ratings JOIN u2 USING (c) GROUP BY p
), pred AS (
  SELECT r, u2.uv * v2.vv AS pr
  FROM ratings JOIN u2 USING (c) JOIN v2 USING (p)
), un AS (SELECT SUM(uv * uv) AS u2n FROM u2),
vn AS (SELECT SUM(vv * vv) AS v2n FROM v2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_ratings,
       ROUND(SQRT(AVG((r - pr) * (r - pr))), 6) AS rmse,
       ROUND(un.u2n, 6) AS u_sq_norm,
       ROUND(vn.v2n, 6) AS v_sq_norm
FROM pred, un, vn GROUP BY un.u2n, vn.v2n
""",
)
def als_rank1_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 alternating least squares over the sparse
    customer×part quantity matrix — the recommender-system factor
    primitive in its distributed shape: each half-step is ONE keyed
    join (ratings ⋈ the frozen factor) + ONE partial-aggregated
    groupBy on the other side's key, exactly how large-scale ALS
    alternates (u ← Σrv/Σv², v ← Σru/Σu² over OBSERVED entries
    only; the sparse matrix is never densified). Two full
    alternations from the deterministic v≡1 init, then training RMSE
    and factor norms — every half-step certified by the unrolled
    oracle. Higher rank replaces the scalar divisions with per-key
    d×d Cramer solves (ridge_normal_equation_audit's treatment);
    the join/aggregate skeleton is identical."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    ratings = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .agg(F.sum("l_quantity").alias("r"))
        .localCheckpoint()
    )
    def v_from(u_df):
        return (
            ratings.join(u_df, "c")
            .groupBy("p")
            .agg(
                # try_divide (r12 ANSI audit): if every rater of a
                # product carries factor exactly 0 (all-zero ratings
                # zero the init step), the normal equation is
                # singular — NULL factor, not a job abort.
                F.try_divide(
                    F.sum(F.col("r") * F.col("uv")),
                    F.sum(F.col("uv") * F.col("uv")),
                ).alias("vv")
            )
            .localCheckpoint()
        )

    def u_from(v_df):
        return (
            ratings.join(v_df, "p")
            .groupBy("c")
            .agg(
                F.try_divide(
                    F.sum(F.col("r") * F.col("vv")),
                    F.sum(F.col("vv") * F.col("vv")),
                ).alias("uv")
            )
            .localCheckpoint()
        )

    # exactly the oracle's half-step sequence: u1 → v1 → u2 → v2,
    # predicting with the LAST COMPLETED pair (u2, v2)
    u = ratings.groupBy("c").agg(
        (F.sum(F.col("r") * 1.0) / F.sum(F.lit(1.0) * 1.0)).alias("uv")
    ).localCheckpoint()
    v = v_from(u)
    u = u_from(v)
    v = v_from(u)
    pred = ratings.join(u, "c").join(v, "p")
    un = F.broadcast(u.agg(F.sum(F.col("uv") * F.col("uv")).alias("u2n")))
    vn = F.broadcast(v.agg(F.sum(F.col("vv") * F.col("vv")).alias("v2n")))
    err = F.col("r") - F.col("uv") * F.col("vv")
    return (
        pred.crossJoin(un)
        .crossJoin(vn)
        .groupBy("u2n", "v2n")
        .agg(
            F.count(F.lit(1)).alias("n_ratings"),
            R6(F.sqrt(F.avg(err * err))).alias("rmse"),
        )
        .select(
            "n_ratings",
            "rmse",
            R6(F.col("u2n")).alias("u_sq_norm"),
            R6(F.col("v2n")).alias("v_sq_norm"),
        )
    )


_FS_PAIRS_CTE = _FS_PRM_CTE + """, rec AS (
  SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment,
         floor(c_acctbal / bw) AS bal_band,
         right(c_name, sl) AS suffix
  FROM customer, prm
), pairs AS (
  SELECT DISTINCT a.c_custkey AS ka, b.c_custkey AS kb,
         a.c_mktsegment = b.c_mktsegment AS g1,
         abs(a.c_acctbal - b.c_acctbal) < 100.0 AS g2,
         a.suffix = b.suffix AS g3
  FROM rec a JOIN rec b
    ON a.c_nationkey = b.c_nationkey
   AND a.bal_band = b.bal_band
   AND a.c_custkey < b.c_custkey
  UNION
  SELECT DISTINCT a.c_custkey AS ka, b.c_custkey AS kb,
         a.c_mktsegment = b.c_mktsegment AS g1,
         abs(a.c_acctbal - b.c_acctbal) < 100.0 AS g2,
         a.suffix = b.suffix AS g3
  FROM rec a JOIN rec b
    ON a.c_nationkey = b.c_nationkey
   AND a.suffix = b.suffix
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
)"""


def _fs_em_oracle(iters: int = 3) -> str:
    """Unrolled-SQL twin of the Fellegi-Sunter EM: the candidate
    pairs collapse to their 8 agreement PATTERNS once, then each EM
    iteration is one CTE over that tiny frame carrying the
    (p, m_k, u_k) scalars through a GROUP BY."""

    def _prod(which: str) -> str:
        return " * ".join(
            f"(CASE WHEN g{k} THEN {which}{k} ELSE 1.0 - {which}{k} END)"
            for k in (1, 2, 3)
        )

    sql = _FS_PAIRS_CTE + """, pat AS (
  SELECT g1, g2, g3, CAST(COUNT(*) AS DOUBLE) AS c
  FROM pairs GROUP BY g1, g2, g3
), i0 AS (
  SELECT 0.1 AS p, 0.9 AS m1, 0.9 AS m2, 0.9 AS m3,
         0.1 AS u1, 0.1 AS u2, 0.1 AS u3
)"""
    prev = "i0"
    for k in range(1, iters + 1):
        terms = []
        for j in (1, 2, 3):
            terms.append(
                f"SUM(c * g * CASE WHEN g{j} THEN 1.0 ELSE 0.0 END)"
                f" / SUM(c * g) AS m{j}"
            )
        for j in (1, 2, 3):
            terms.append(
                f"SUM(c * (1.0 - g) * CASE WHEN g{j} THEN 1.0 ELSE 0.0 END)"
                f" / SUM(c * (1.0 - g)) AS u{j}"
            )
        sql += f""", i{k} AS (
  SELECT SUM(c * g) / SUM(c) AS p, {', '.join(terms)}
  FROM (
    SELECT w.g1, w.g2, w.g3, w.c, w.wm / (w.wm + w.wu) AS g
    FROM (SELECT pat.g1, pat.g2, pat.g3, pat.c,
                 p * {_prod('m')} AS wm,
                 (1.0 - p) * {_prod('u')} AS wu
          FROM pat, {prev}) w) e
)"""
        prev = f"i{k}"
    sql += f"""
SELECT CAST((SELECT SUM(c) FROM pat) AS BIGINT) AS n_pairs,
       ROUND(p, 6) AS p_match,
       ROUND(m1, 6) AS m1, ROUND(m2, 6) AS m2, ROUND(m3, 6) AS m3,
       ROUND(u1, 6) AS u1, ROUND(u2, 6) AS u2, ROUND(u3, 6) AS u3
FROM {prev}
"""
    return sql


@register(
    "fs_em_priors_audit",
    survey=("J6", "ST10", "P10"),
    oracle=_fs_em_oracle(),
)
def fs_em_priors_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EM pass `entity_resolution_fs`'s docstring promises —
    Splink's core training loop, differentially certified: learn the
    Fellegi-Sunter (p, m_k, u_k) parameters from the SAME blocked
    candidate pairs by 3 unrolled EM iterations over the agreement-
    PATTERN frame. The corpus-scale work is the pair generation +
    one (g1,g2,g3) GROUP BY — after that the pattern frame has at
    most 2³ = 8 rows, and every EM step (E: posterior match weight
    per pattern under a naive-Bayes product; M: closed-form weighted
    shares) is one aggregate over it with the parameter row riding
    broadcast. The oracle unrolls identical CTE arithmetic, so the
    whole EM trajectory is cross-engine certified. At 100 TB the
    pattern collapse is what makes linkage training tractable: EM
    never revisits pairs, only the 8-row sufficient statistics.
    r9: candidate pairs come from the SHARED `_fs_blocked_pairs`
    (same adaptive knobs as entity_resolution_fs — training and
    scoring can never see different blocking)."""
    cust = load(spark, sf_dir, "customer")
    bal_w, slen = _fs_adaptive_knobs(cust)
    pat = (
        _fs_blocked_pairs(cust, bal_w, slen)
        .groupBy("g1", "g2", "g3")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )

    def prod(prefix: str):
        out = F.lit(1.0)
        for k in (1, 2, 3):
            pk = F.col(f"{prefix}{k}")
            out = out * F.when(F.col(f"g{k}"), pk).otherwise(1.0 - pk)
        return out

    params = spark.range(1).select(
        F.lit(0.1).alias("p"),
        *[F.lit(0.9).alias(f"m{k}") for k in (1, 2, 3)],
        *[F.lit(0.1).alias(f"u{k}") for k in (1, 2, 3)],
    )
    for _ in range(3):
        # try_divide throughout the EM step (r12 ANSI audit): once an
        # m/u parameter reaches an exact 0/1 bound (possible under
        # degenerate blocking — a field no weighted pair agrees on),
        # the posterior can collapse to exactly 0 or 1 for every
        # pattern, zeroing Σc·g or Σc·(1−g) in the NEXT M-step — an
        # EM-collapse 0/0 that ANSI turns into a job abort. NULL
        # parameters surface the collapse instead.
        e = pat.crossJoin(F.broadcast(params)).select(
            "g1", "g2", "g3", "c",
            F.try_divide(
                F.col("p") * prod("m"),
                F.col("p") * prod("m")
                + (1.0 - F.col("p")) * prod("u"),
            ).alias("g"),
        )
        aggs = [
            F.try_divide(
                F.sum(F.col("c") * F.col("g")), F.sum("c")
            ).alias("p")
        ]
        for j in (1, 2, 3):
            xj = F.when(F.col(f"g{j}"), 1.0).otherwise(0.0)
            aggs.append(
                F.try_divide(
                    F.sum(F.col("c") * F.col("g") * xj),
                    F.sum(F.col("c") * F.col("g")),
                ).alias(f"m{j}")
            )
        for j in (1, 2, 3):
            xj = F.when(F.col(f"g{j}"), 1.0).otherwise(0.0)
            aggs.append(
                F.try_divide(
                    F.sum(F.col("c") * (1.0 - F.col("g")) * xj),
                    F.sum(F.col("c") * (1.0 - F.col("g"))),
                ).alias(f"u{j}")
            )
        params = e.agg(*aggs)
    total = pat.agg(F.sum("c").cast("long").alias("n_pairs"))
    return (
        total.crossJoin(F.broadcast(params))
        .select(
            "n_pairs",
            R6(F.col("p")).alias("p_match"),
            R6(F.col("m1")).alias("m1"),
            R6(F.col("m2")).alias("m2"),
            R6(F.col("m3")).alias("m3"),
            R6(F.col("u1")).alias("u1"),
            R6(F.col("u2")).alias("u2"),
            R6(F.col("u3")).alias("u3"),
        )
    )


@register(
    "k_anonymity_audit",
    survey=("P10", "A6", "F6"),
    oracle="""
WITH g AS (
  SELECT c_nationkey, floor(c_acctbal / 1000.0) AS bal_band,
         COUNT(*) AS k,
         COUNT(DISTINCT c_mktsegment) AS l
  FROM customer
  GROUP BY 1, 2
), banded AS (
  SELECT CASE WHEN k = 1 THEN '1'
              WHEN k < 5 THEN '2-4'
              WHEN k < 10 THEN '5-9'
              ELSE '10+' END AS k_band,
         k, l
  FROM g
)
SELECT k_band,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MIN(l) AS BIGINT) AS min_l,
       ROUND(AVG(l), 6) AS avg_l
FROM banded GROUP BY k_band ORDER BY k_band
""",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit — the privacy gate a training
    corpus passes before release (the re-identification companion of
    the PII scanners, pii_column_scan / pii_redaction): group rows
    by the quasi-identifier tuple (nation, 1000-wide balance band),
    k = group size (rows in a QI group of size 1 are singled out),
    l = distinct sensitive values (market segment) per group
    (a group where everyone shares the sensitive value leaks it even
    at high k). Reports the k-band histogram with group/row counts
    and the worst-case l per band. ONE groupBy at the QI grain +
    ONE 4-row rollup — at 100 TB the QI aggregation is the only
    corpus-scale pass, and generalization (widening the bands until
    min_k clears policy) just re-runs it."""
    cust = load(spark, sf_dir, "customer")
    g = cust.groupBy(
        "c_nationkey",
        F.expr("floor(c_acctbal / 1000.0)").alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("k"),
        F.count_distinct("c_mktsegment").alias("l"),
    )
    banded = g.select(
        F.when(F.col("k") == 1, "1")
        .when(F.col("k") < 5, "2-4")
        .when(F.col("k") < 10, "5-9")
        .otherwise("10+")
        .alias("k_band"),
        "k",
        "l",
    )
    return (
        banded.groupBy("k_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("k").cast("long").alias("n_rows"),
            F.min("k").cast("long").alias("min_k"),
            F.min("l").cast("long").alias("min_l"),
            R6(F.avg("l")).alias("avg_l"),
        )
        .orderBy("k_band")
    )

@register(
    "community_modularity_audit",
    survey=("J4", "A1", "F11"),
    oracle=_modularity_oracle(2),
)
def community_modularity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity decomposition of the LP communities — the
    quality score community detection is judged by (Q = Σ_c e_c/m −
    (d_c/2m)², one term per community): certifies not just WHERE the
    labels land (label_propagation_communities) but that the
    partition's edge bookkeeping — internal-edge counts, degree
    volumes, the m normalization — is exact. Three keyed joins
    against the label table + two community-grain aggregates; the
    edge set is scanned twice (e_c and degrees), everything else is
    community-sized. The oracle reuses the unrolled-LPA CTE chain
    verbatim and layers the same decomposition on top."""
    from bio_lakehouse_spark.operators.graph import label_propagation

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
        # the edge list feeds LP (2 rounds = 4 scans) plus the e_c and
        # degree passes — materialize once instead of re-running the
        # orders⋈lineitem join six times
        .localCheckpoint()
    )
    e = base.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        base.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    lab = label_propagation(e, iters=2).select(
        F.col("node").alias("v"), F.col("community").alias("lab")
    ).localCheckpoint()
    m = base.agg(F.count(F.lit(1)).cast("double").alias("m"))
    ec = (
        base.join(
            lab.select(F.col("v").alias("c"), F.col("lab").alias("lab_a")),
            "c",
        )
        .join(
            lab.select(F.col("v").alias("s"), F.col("lab").alias("lab_b")),
            "s",
        )
        .filter(F.col("lab_a") == F.col("lab_b"))
        .groupBy(F.col("lab_a").alias("community"))
        .agg(F.count(F.lit(1)).cast("double").alias("e_in"))
    )
    deg = e.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("double").alias("d")
    )
    dc = (
        deg.join(lab, "v")
        .groupBy(F.col("lab").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("d").alias("d_c"),
        )
    )
    half = F.col("d_c") / (2.0 * F.col("m"))
    return (
        dc.join(ec, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            F.coalesce(F.col("e_in"), F.lit(0.0))
            .cast("long")
            .alias("e_in"),
            (
                R6(
                    F.coalesce(F.col("e_in"), F.lit(0.0)) / F.col("m")
                    - half * half
                )
                + F.lit(0.0)  # normalize IEEE -0.0 (strict contract)
            ).alias("q_contribution"),
        )
    )


@register(
    "degree_assortativity",
    survey=("J4", "A1", "ST1"),
    oracle="""
WITH base AS (
  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), e AS (
  SELECT c AS src, s AS dst FROM base
  UNION ALL SELECT s AS src, c AS dst FROM base
), deg AS (
  SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS d FROM e GROUP BY 1
), pairs AS (
  SELECT da.d AS x, db.d AS y
  FROM e JOIN deg da ON da.v = e.src JOIN deg db ON db.v = e.dst
), m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM pairs
)
SELECT CAST(n AS BIGINT) AS n_edge_ends,
       ROUND((sxy - sx * sy / n)
             / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
         AS assortativity
FROM m
""",
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the customer-supplier trade graph
    (Newman 2002) — the Pearson correlation of endpoint degrees over
    edge ends, the one-number answer to "do hubs trade with hubs or
    with the periphery?" (bipartite trade graphs are typically
    DISassortative: big buyers spread across many small suppliers).
    Plan: one degree aggregate, two keyed joins attaching endpoint
    degrees, one moment rollup — the correlation is computed from
    raw sums with the same expression tree on both engines (never
    the builtin corr(), whose internal algorithm differs between
    engines at the last bit). Completes the graph-metric family
    (modularity = partition quality; assortativity = mixing
    structure)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
        .localCheckpoint()
    )
    e = base.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        base.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    deg = e.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("double").alias("d")
    )
    pairs = (
        e.join(
            deg.select(F.col("v").alias("src"), F.col("d").alias("x")),
            "src",
        )
        .join(
            deg.select(F.col("v").alias("dst"), F.col("d").alias("y")),
            "dst",
        )
        .select("x", "y")
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    # Clamped try_divide (r12 ANSI audit): a REGULAR graph (every
    # node the same degree — cycles, perfect matchings, the k-regular
    # cores real bipartite data produces) zeroes both degree
    # variances → ANSI crash; and the closed-form variance can land
    # an ulp NEGATIVE on constant input, where the product of two
    # tiny negatives is a spurious positive denominator — clamp each
    # variance at 0 first so the degenerate case is NULL (networkx
    # returns NaN for the same graphs), never noise-valued.
    vx = F.greatest(
        F.col("sxx") - F.col("sx") * F.col("sx") / n, F.lit(0.0)
    )
    vy = F.greatest(
        F.col("syy") - F.col("sy") * F.col("sy") / n, F.lit(0.0)
    )
    r = F.try_divide(
        F.col("sxy") - F.col("sx") * F.col("sy") / n,
        F.sqrt(vx * vy),
    )
    return m.select(
        n.cast("long").alias("n_edge_ends"),
        R6(r).alias("assortativity"),
    )


@register(
    "markov_next_event_accuracy",
    survey=("W4", "A6", "ST14"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_type
  FROM events
), trans AS (
  SELECT event_type AS prev, next_type
  FROM seq WHERE next_type IS NOT NULL
), counts AS (
  SELECT prev, next_type, COUNT(*) AS c
  FROM trans GROUP BY 1, 2
), model AS (
  SELECT prev, next_type AS predicted
  FROM (
    SELECT prev, next_type,
           ROW_NUMBER() OVER (
             PARTITION BY prev ORDER BY c DESC, next_type
           ) AS rn
    FROM counts) WHERE rn = 1
)
SELECT t.prev,
       m.predicted,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       ROUND(AVG(CASE WHEN t.next_type = m.predicted
                      THEN 1.0 ELSE 0.0 END), 6) AS hit_rate
FROM trans t JOIN model m USING (prev)
GROUP BY t.prev, m.predicted ORDER BY t.prev
""",
)
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction accuracy of the first-order Markov
    model — the eval half of `event_transition_matrix` (which
    certifies the transition probabilities; this certifies the
    argmax DECISION rule and its realized hit rate per state):
    per-user ordered transitions, the mode next-event per previous
    event (ties broken lexicographically), and the fraction of
    transitions the rule gets right. In-sample by construction —
    the standard Markov-baseline readout a session-recommendation
    eval quotes before anything learned; the out-of-fold discipline
    lives in `target_encode_oof`/`group_split_no_leakage`. One
    window pass for transitions, a (state × state)-bounded count
    frame, a broadcast model join back."""
    ev = load(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lead("event_type")
        .over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        )
        .alias("next_type"),
    )
    trans = seq.filter(F.col("next_type").isNotNull()).select(
        F.col("event_type").alias("prev"), "next_type"
    )
    counts = trans.groupBy("prev", "next_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    model = (
        counts.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("prev").orderBy(
                    F.desc("c"), F.asc("next_type")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("prev", F.col("next_type").alias("predicted"))
    )
    return (
        trans.join(F.broadcast(model), "prev")
        .groupBy("prev", "predicted")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_transitions"),
            R6(
                F.avg(
                    F.when(
                        F.col("next_type") == F.col("predicted"), 1.0
                    ).otherwise(0.0)
                )
            ).alias("hit_rate"),
        )
        .select("prev", "predicted", "n_transitions", "hit_rate")
        .orderBy("prev")
    )


@register(
    "gini_concentration_audit",
    survey=("A6", "W9", "F11"),
    oracle="""
WITH rev AS (
  SELECT o_custkey, SUM(o_totalprice) AS r
  FROM orders GROUP BY 1
), ranked AS (
  SELECT r,
         ROW_NUMBER() OVER (ORDER BY r, o_custkey) AS i,
         COUNT(*) OVER () AS n,
         SUM(r) OVER () AS total
  FROM rev
)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       ROUND(MAX(total), 2) AS total_revenue,
       ROUND(2.0 * SUM(i * r) / (MAX(n) * MAX(total))
             - (MAX(n) + 1.0) / MAX(n), 6) AS gini,
       ROUND(SUM(CASE WHEN i > n - CAST(CEIL(0.1 * n) AS BIGINT)
                      THEN r ELSE 0 END) / MAX(total), 6)
         AS top10pct_share
FROM ranked
""",
)
def gini_concentration_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient + top-decile share of customer revenue — the
    concentration readout a curation pipeline runs on SOURCE token
    counts before fixing mixture weights (a corpus where 10% of
    sources carry 90% of tokens needs `domain_mixture_weights`'
    reweighting; same math, classic revenue framing here): Gini via
    the rank formula 2Σi·xᵢ/(nΣx) − (n+1)/n over ascending revenue,
    deterministic tie-break by key. One entity-grain aggregate, then
    the global rank via `windows.global_row_number` (range-partition
    → per-partition row_number → broadcast partition offsets — the
    dense_ids technique ntile_rank_quintiles already uses): identical
    ranks to a bare `row_number() OVER (ORDER BY r, o_custkey)` but
    no single-task sort of the whole customer dimension — the last
    scale-killer pattern VERDICT r8 flagged. (r, o_custkey) is a
    total order because o_custkey is the groupBy key."""
    from bio_lakehouse_spark.operators.windows import global_row_number

    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("r")
    )
    ranked = global_row_number(
        rev, ("r", "o_custkey"), rank_name="i", assume_unique=True
    ).select("r", "i")
    # totals read the ranked frame (barriered inside dense_ids), not
    # `rev` — ONE scan+aggregate of orders total, vs three in the
    # unbarriered formulation
    totals = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("r").alias("total"),
    )
    return (
        ranked.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            F.round(F.max("total"), 2).alias("total_revenue"),
            # try_divide on the Σr denominators (r12 ANSI audit):
            # Gini/top-share are undefined when TOTAL revenue is 0
            # (all-zero amounts are legal for a generic measure even
            # if TPC-H prices are positive) → NULL, not a job abort.
            # max(n) needs no guard: a row exists ⇒ n ≥ 1.
            R6(
                F.try_divide(
                    2.0 * F.sum(F.col("i") * F.col("r")),
                    F.max("n") * F.max("total"),
                )
                - (F.max("n") + 1.0) / F.max("n")
            ).alias("gini"),
            R6(
                F.try_divide(
                    F.sum(
                        F.when(
                            F.col("i")
                            > F.col("n") - F.ceil(0.1 * F.col("n")),
                            F.col("r"),
                        ).otherwise(0.0)
                    ),
                    F.max("total"),
                )
            ).alias("top10pct_share"),
        )
    )


@register(
    "hill_tail_index",
    survey=("A13", "W9", "ST7"),
    oracle="""
WITH rev AS (
  SELECT o_custkey, SUM(o_totalprice) AS r
  FROM orders GROUP BY 1
), ranked AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r DESC, o_custkey) AS i,
         COUNT(*) OVER () AS n
  FROM rev
), k AS (
  SELECT CAST(CEIL(0.05 * MAX(n)) AS BIGINT) AS kk FROM ranked
), thresh AS (
  SELECT r AS xk1 FROM ranked, k WHERE i = kk + 1
)
SELECT CAST((SELECT kk FROM k) AS BIGINT) AS k_top,
       ROUND((SELECT xk1 FROM thresh), 2) AS threshold,
       ROUND((SELECT kk FROM k)
             / SUM(LN(r / (SELECT xk1 FROM thresh))), 6) AS hill_alpha
FROM ranked, k WHERE i <= kk
""",
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index on customer revenue —
    the heavy-tail diagnostic completing the power-law trio
    (`zipf_slope_audit` fits ranks, `heaps_law_audit` fits growth,
    this fits the TAIL: α̂ = k / Σᵢ≤k ln(x₍ᵢ₎/x₍k+1₎) over the top
    5% order statistics). α ≤ 2 means infinite variance — the
    regime where mean-based capacity planning and uniform sampling
    both break, and the knob that says whether `salted_skew_agg` /
    temperature sampling are needed. One entity-grain aggregate,
    then the descending global rank via `windows.global_row_number`
    over the negated revenue (range-partition + per-partition
    row_number + broadcast offsets — no single-task sort of the
    customer dimension; VERDICT r8's last scale-killer pattern),
    then a k-row sum; the threshold order statistic rounds to 2
    decimals (absolute magnitude; the index itself to 6)."""
    from bio_lakehouse_spark.operators.windows import global_row_number

    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("r")
    )
    # rank DESC by revenue: ascending rank over (-r, o_custkey); the
    # key ends in the groupBy PK, so it is a total order
    ranked = global_row_number(
        rev.withColumn("__negr", -F.col("r")),
        ("__negr", "o_custkey"),
        rank_name="i",
        assume_unique=True,
    ).select("r", "i")
    # k = ceil(0.05 n) as a broadcast 1-row frame — no driver-side
    # count() action mid-query, the whole pipeline stays one lazy
    # plan (the ranked frame itself is barriered inside dense_ids,
    # so its three consumers share one scan+sort)
    kf = ranked.agg(F.count(F.lit(1)).alias("__cnt")).select(
        # ceil(0.05 n) integer-exact: (n + 19) div 20 — never through
        # a float 0.05 multiply whose rounding could bump the ceil
        F.expr("(__cnt + 19) div 20").cast("long").alias("kk")
    )
    wk = ranked.crossJoin(F.broadcast(kf))
    xk1 = wk.filter(F.col("i") == F.col("kk") + 1).select(
        F.col("r").alias("xk1")
    )
    return (
        wk.filter(F.col("i") <= F.col("kk"))
        .crossJoin(F.broadcast(xk1))
        .agg(
            F.max("kk").alias("k_top"),
            F.round(F.max("xk1"), 2).alias("threshold"),
            # try_divide twice (r12 ANSI audit): if every top-k value
            # TIES the threshold x_{k+1} (discrete amounts do this),
            # Σ log(r/x_{k+1}) is exactly 0 — the Hill estimator is
            # undefined (infinite α) → NULL; and a zero threshold
            # (all-zero amounts) zeroes the inner ratio's divisor.
            R6(
                F.try_divide(
                    F.max("kk").cast("double"),
                    F.sum(
                        F.log(F.try_divide(F.col("r"), F.col("xk1")))
                    ),
                )
            ).alias("hill_alpha"),
        )
    )
