"""Window-function queries (SURVEY.md §2.5 W1-W12).

The reference's analytical heart: rolling frames over a daily series.
Here the series is per-user daily event value — i.e. the windows are
PARTITIONed BY user_id, which is the 100 TB posture (SURVEY.md
§7.1.5): no global sort, each entity's series windows independently.
Global (single-series) variants appear only where the reference
semantics are inherently single-entity (CTL/ATL/TSB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.windows import (
    ema_exact,
    ema_rolling_approx,
    forward_fill,
    lag_delta,
    lead_col,
    rolling_col,
    rolling_corr,
)
from bio_lakehouse_spark.suite.registry import load, register

R6 = lambda c: F.round(c, 6)  # noqa: E731

# Shared oracle CTE: per-user daily series.
_USER_DAILY_CTE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS date,
         ROUND(SUM(value), 6) AS daily_value,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id, CAST(ts AS DATE)
)
"""


def user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily rollup — input series for the window queries."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id", F.to_date("ts").alias("date")).agg(
        R6(F.sum("value")).alias("daily_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "rolling_avg_windows",
    survey=("W2", "W3"),
    oracle=_USER_DAILY_CTE
    + """
SELECT user_id, date, daily_value,
       ROUND(AVG(daily_value) OVER w7, 6) AS avg_7d,
       ROUND(AVG(daily_value) OVER w3, 6) AS avg_3d,
       ROUND(SUM(daily_value) OVER w7, 6) AS sum_7d,
       CAST(SUM(n_events) OVER w3 AS BIGINT) AS events_3d
FROM daily
WINDOW w7 AS (PARTITION BY user_id ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       w3 AS (PARTITION BY user_id ORDER BY date ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def rolling_avg_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3/7-row averages and sums (W2/W3 — dashboard_30day
    .sql:22-27, feature_readiness_daily.sql:60-78), partitioned per
    user."""
    d = user_daily(spark, sf_dir)
    p = ["user_id"]
    return d.select(
        "user_id",
        "date",
        "daily_value",
        R6(rolling_col("avg", "daily_value", "date", 6, 0, p)).alias("avg_7d"),
        R6(rolling_col("avg", "daily_value", "date", 2, 0, p)).alias("avg_3d"),
        R6(rolling_col("sum", "daily_value", "date", 6, 0, p)).alias("sum_7d"),
        rolling_col("sum", "n_events", "date", 2, 0, p).alias("events_3d"),
    )


@register(
    "lag_lead_deltas",
    survey=("W4", "W5"),
    oracle=_USER_DAILY_CTE
    + """
SELECT user_id, date, daily_value,
       ROUND(daily_value - LAG(daily_value, 1) OVER w, 6) AS delta_1d,
       ROUND((daily_value - LAG(daily_value, 2) OVER w) / 2.0, 6) AS slope_3d,
       ROUND(LEAD(daily_value, 1) OVER w, 6) AS next_day_value
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY date)
""",
)
def lag_lead_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG deltas, 3-day slope `(x - LAG(x,2))/2`, LEAD target (W4/W5
    — energy_state.sql:54-55, feature_readiness_daily.sql:64,95,98)."""
    d = user_daily(spark, sf_dir)
    p = ["user_id"]
    return d.select(
        "user_id",
        "date",
        "daily_value",
        R6(lag_delta("daily_value", "date", 1, p)).alias("delta_1d"),
        R6(lag_delta("daily_value", "date", 2, p) / 2.0).alias("slope_3d"),
        R6(lead_col("daily_value", "date", 1, p)).alias("next_day_value"),
    )


@register(
    "baseline_excluding_current",
    survey=("W6", "ST15"),
    oracle=_USER_DAILY_CTE
    + """
SELECT user_id, date, daily_value,
       ROUND(AVG(daily_value) OVER wb, 6) AS baseline_7d,
       CASE WHEN daily_value > 1.1 * AVG(daily_value) OVER wb THEN 1 ELSE 0 END AS above_baseline
FROM daily
WINDOW wb AS (PARTITION BY user_id ORDER BY date ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
""",
)
def baseline_excluding_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excluding-current-row baseline + 1.1× threshold flag (W6+ST15 —
    feature_readiness_daily.sql:91-92, training_load.py:93-101)."""
    d = user_daily(spark, sf_dir)
    baseline = rolling_col("avg", "daily_value", "date", 7, -1, ["user_id"])
    return d.select(
        "user_id",
        "date",
        "daily_value",
        R6(baseline).alias("baseline_7d"),
        F.when(F.col("daily_value") > 1.1 * baseline, 1)
        .otherwise(0)
        .alias("above_baseline"),
    )


@register(
    "forward_fill_gaps",
    survey=("W1", "W8"),
    oracle="""
SELECT event_id, user_id, ts,
       ROUND(LAST_VALUE(sparse_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled_value
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN value >= 50 THEN value END AS sparse_value
  FROM events
)
""",
)
def forward_fill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill via LAST(x, ignorenulls) over an unbounded-preceding
    frame (W1/W8 — glue/bio_etl_utils.py:163-189 and the LAST_VALUE
    IGNORE NULLS dedupe in gold_daily_rollup.sql:35-41). Sparse column
    synthesized by nulling values < 50; tie-broken by event_id."""
    ev = load(spark, sf_dir, "events").withColumn(
        "sparse_value", F.when(F.col("value") >= 50, F.col("value"))
    )
    order = [F.col("ts"), F.col("event_id")]
    w = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        R6(F.last("sparse_value", ignorenulls=True).over(w)).alias(
            "filled_value"
        ),
    )


@register(
    "ntile_rank_quintiles",
    survey=("W9", "A13"),
    oracle="""
WITH totals AS (
  SELECT user_id, ROUND(SUM(value), 6) AS total_value
  FROM events GROUP BY user_id
)
SELECT user_id, total_value,
       CAST(NTILE(5) OVER (ORDER BY total_value, user_id) AS INTEGER) AS quintile,
       CAST(RANK() OVER (ORDER BY total_value DESC) AS INTEGER) AS value_rank
FROM totals
""",
)
def ntile_rank_quintiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quintiles + RANK (W9 — pandas qcut quintiles in
    timing_correlation.py:79-84 re-expressed as ranking). NTILE
    ordering is made deterministic with a user_id tie-break.

    Both rankings are GLOBAL by semantics, but neither uses a bare
    global window (which would sort every user total in ONE task —
    the straggler this repo's dense_ids exists to avoid). The global
    position comes from `aggregates.dense_ids` (range-partition +
    per-partition rank + broadcast offsets); NTILE's bucket is then
    the closed form over (pos, n) — the first n%5 buckets take
    ⌈n/5⌉ rows, the rest ⌊n/5⌋ — and RANK-with-ties over DESC
    total_value is n − max_position(tie group), a keyed groupBy +
    join. Bit-identical to the window semantics (the DuckDB oracle
    runs native NTILE/RANK)."""
    from bio_lakehouse_spark.operators.aggregates import dense_ids

    ev = load(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(R6(F.sum("value")).alias("total_value"))
    pos = dense_ids(
        totals, ("total_value", "user_id"), id_name="__pos",
        assume_unique=True,  # user_id is the groupBy key — a PK
    )
    n_df = totals.agg(F.count(F.lit(1)).alias("__n"))
    pos = pos.crossJoin(F.broadcast(n_df))
    big = F.expr("__n div 5") + 1  # ⌈n/5⌉ when n%5>0; unused otherwise
    rem = F.expr("__n % 5")
    in_big = F.col("__pos") < rem * big
    quintile = (
        F.when(in_big, F.expr("__pos") / big)
        .otherwise(rem + (F.col("__pos") - rem * big) / F.expr("__n div 5"))
        .cast("int")
        + 1
    )
    tie_max = pos.groupBy(F.col("total_value").alias("__tv")).agg(
        F.max("__pos").alias("__maxpos")
    )
    return (
        pos.join(
            tie_max, pos["total_value"] == tie_max["__tv"]
        )
        .select(
            "user_id",
            "total_value",
            quintile.alias("quintile"),
            (F.col("__n") - F.col("__maxpos")).cast("int").alias("value_rank"),
        )
    )


@register(
    "rolling_corr_14d",
    survey=("W12",),
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS date,
         SUM(CASE WHEN event_type = 'click' THEN value ELSE 0 END) AS click_value,
         SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS purchase_value
  FROM events GROUP BY 1
)
SELECT date,
       ROUND(CORR(click_value, purchase_value) OVER (
         ORDER BY date ROWS BETWEEN 13 PRECEDING AND CURRENT ROW), 6) AS corr_14d
FROM daily
""",
)
def rolling_corr_14d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day rolling Pearson r between two daily series (W12 —
    experiments/analyzer.py:366-375). Single global series here by
    construction (matches the reference's one-user scope); the helper
    takes partition keys for the scaled form."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("date")).agg(
        F.sum(F.when(F.col("event_type") == "click", F.col("value")).otherwise(0.0)).alias("click_value"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)).alias("purchase_value"),
    )
    return daily.select(
        "date",
        R6(rolling_corr("click_value", "purchase_value", "date", 13)).alias(
            "corr_14d"
        ),
    )


@register(
    "ema_ctl_atl_tsb",
    survey=("W10", "ST9"),
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS date, SUM(value) AS load
  FROM events GROUP BY 1
)
SELECT date,
       ROUND(AVG(load) OVER (ORDER BY date ROWS BETWEEN 41 PRECEDING AND CURRENT ROW), 6) AS ctl_42,
       ROUND(AVG(load) OVER (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)  AS atl_7,
       ROUND(AVG(load) OVER (ORDER BY date ROWS BETWEEN 41 PRECEDING AND CURRENT ROW)
           - AVG(load) OVER (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)  AS tsb
FROM daily
""",
)
def ema_ctl_atl_tsb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTL/ATL/TSB in the reference's *SQL-layer semantics*: flat
    rolling averages approximating the EMA (W10 variant (a) —
    feature_readiness_daily.sql:70-78; the approximation its NL layer
    documents). The exact-ewm variant is `ema_exact_series`."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("date")).agg(
        F.sum("value").alias("load")
    )
    ctl = ema_rolling_approx("load", "date", 42)
    atl = ema_rolling_approx("load", "date", 7)
    return daily.select(
        "date",
        R6(ctl).alias("ctl_42"),
        R6(atl).alias("atl_7"),
        R6(ctl - atl).alias("tsb"),
    )


@register(
    "ema_exact_series",
    survey=("W10", "ST9"),
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS date, ROUND(SUM(value), 6) AS load
  FROM events GROUP BY 1, 2
), prefixed AS (
  SELECT user_id, date, load,
         LIST(load) OVER (PARTITION BY user_id ORDER BY date
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
  FROM daily
)
SELECT user_id, date, load,
       LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(prefix) + 1),
               i -> CASE WHEN i = 1
                         THEN prefix[i] * POWER(1 - 2.0/8.0, LEN(prefix) - 1)
                         ELSE prefix[i] * (2.0/8.0) * POWER(1 - 2.0/8.0, LEN(prefix) - i)
                    END)) AS ema_7
FROM prefixed
""",
)
def ema_exact_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True span-7 EMA, `pandas.ewm(span=7, adjust=False)` semantics
    (W10 variant (b) — insights/training_load.py:21-23), computed per
    user with Arrow-batched applyInPandas (no native Spark EMA
    window). Oracle: closed form ema_t = (1-a)^t·x₀ + a·Σ(1-a)^(t-i)·xᵢ
    over the prefix list."""
    ev = load(spark, sf_dir, "events")
    # input series rounded BEFORE the EMA: both engines then run the
    # identical closed form over bit-identical doubles, so even
    # exact-boundary values round the same way.
    daily = ev.groupBy("user_id", F.to_date("ts").alias("date")).agg(
        R6(F.sum("value")).alias("load")
    )
    out = ema_exact(
        daily,
        value_col="load",
        order_col="date",
        span=7,
        out_col="ema_7",
        partition_by=["user_id"],
        # closed_form: bit-reproducible by the oracle's identical
        # expression (the ewm recurrence differs at ~1e-12, which
        # flips rounding on boundary values).
        method="closed_form",
    )
    # No final rounding: with the input series rounded and the same
    # closed-form fold on both sides, ema_7 is bit-identical in both
    # engines; rounding would *introduce* divergence on exact-.5
    # boundary values (Spark HALF_UPs the shortest-decimal repr,
    # DuckDB rounds the binary-exact value).
    return out.select("user_id", "date", "load", "ema_7")


@register(
    "funnel_view_click_purchase",
    survey=("A1", "J5", "A11"),
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click_after_view,
       (SELECT COUNT(*) FROM p) AS n_purchase_after_click,
       ROUND((SELECT COUNT(*) FROM p) * 1.0
             / nullif((SELECT COUNT(*) FROM v), 0), 6) AS view_to_purchase_rate
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that first qualifying
    click — the strict-ordering semantics a naive per-type count
    gets wrong. Three per-user aggs chained on the same user_id key,
    so the exchanges reuse one partitioning; each stage's output is
    one row per surviving user (monotonically shrinking), and the
    final counts are scalar aggs. No window over the raw stream, no
    self-join of events with events."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    nv = v.groupBy().agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.groupBy().agg(F.count(F.lit(1)).alias("n_click_after_view"))
    np_ = p.groupBy().agg(F.count(F.lit(1)).alias("n_purchase_after_click"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_view",
            "n_click_after_view",
            "n_purchase_after_click",
            F.round(
                F.col("n_purchase_after_click")
                / F.nullif(F.col("n_view"), F.lit(0)),
                6,
            ).alias("view_to_purchase_rate"),
        )
    )


@register(
    "cohort_weekly_retention",
    survey=("A5", "A11", "J5"),
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
  FROM events
), mat AS (
  SELECT f.cohort_week,
         CAST(datediff('day', f.cohort_week, a.act_week) / 7 AS INTEGER) AS week_offset,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM activity a JOIN firsts f USING (user_id)
  GROUP BY 1, 2
), sizes AS (
  SELECT cohort_week, n_active AS cohort_size FROM mat WHERE week_offset = 0
)
SELECT m.cohort_week, m.week_offset, m.n_active, s.cohort_size,
       ROUND(m.n_active * 1.0 / s.cohort_size, 6) AS retention
FROM mat m JOIN sizes s USING (cohort_week)
WHERE m.week_offset <= 8
""",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by the week of their
    first event; each cell is how many are still active N weeks
    later, as a fraction of the cohort. Two aggs and one join, all
    keyed on user_id (one partitioning reused), then a tiny
    cohort-week matrix — the cohort_size join input is one row per
    (cohort, offset) so it broadcasts. The week-8 cap bounds output,
    not work."""
    ev = load(spark, sf_dir, "events")
    wk = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    firsts = ev.groupBy("user_id").agg(wk(F.min("ts")).alias("cohort_week"))
    activity = ev.select(
        "user_id", wk(F.col("ts")).alias("act_week")
    ).distinct()
    mat = (
        activity.join(firsts, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    sizes = mat.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return (
        mat.join(F.broadcast(sizes), "cohort_week")
        .filter(F.col("week_offset") <= 8)
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )


@register(
    "pivot_event_type_daily",
    survey=("A12", "A1"),
    oracle="""
SELECT CAST(ts AS DATE) AS day,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       ROUND(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS error_rate
FROM events
GROUP BY 1
""",
)
def pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: daily event counts with one column per event
    type plus an error-rate. Uses `groupBy().pivot(values=...)` WITH
    the value list pinned — omitting it triggers an extra distinct
    scan just to discover columns, and makes the output schema
    data-dependent (a deploy hazard: a new event type silently
    changes the table). Compiles to the same single two-stage
    conditional aggregation the SQL CASE form does."""
    ev = load(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.select(F.col("ts").cast("date").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )
    total = sum((F.col(k) for k in kinds[1:]), F.col(kinds[0]))
    return wide.select(
        "day",
        *kinds,
        # try_divide (r13 all-NULL sweep): a day whose every
        # event_type is NULL pivots to all-zero kind counts — the
        # rate over the known kinds is undefined (NULL), not an
        # ANSI DIVIDE_BY_ZERO abort.
        F.round(F.try_divide(F.col("error"), total), 6).alias(
            "error_rate"
        ),
    )


@register(
    "event_transition_matrix",
    survey=("W4", "A1"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, event_type, n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
FROM pairs
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: P(next type | current type). One lag window per user
    (ordered on (ts, event_id) — the unique tiebreak matters: equal
    timestamps otherwise make the lag nondeterministic and
    engine-dependent), then a 25-cell aggregate; the row-normalizing
    window runs on that tiny matrix, not the stream."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wnorm = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wnorm), 6).alias("p"),
    )


@register(
    "activity_streaks",
    survey=("W4", "A5", "A11"),
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), grp AS (
  SELECT user_id, day,
         CAST(day - CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY day
         ) AS INTEGER) AS DATE) AS island
  FROM days
)
SELECT user_id,
       MIN(day) AS streak_start,
       MAX(day) AS streak_end,
       COUNT(*) AS streak_days
FROM grp GROUP BY user_id, island
HAVING COUNT(*) >= 2
""",
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's runs of CONSECUTIVE active days,
    via the classic day − row_number() island key (consecutive days
    share it; any gap shifts it). One per-user window + one groupBy
    on the same user_id partitioning; streaks ≥ 2 days reported with
    start/end/length. The retention-adjacent pattern every activity
    warehouse needs and naive date math gets wrong."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return (
        grp.groupBy("user_id", "island")
        .agg(
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .filter(F.col("streak_days") >= 2)
        .drop("island")
    )


@register(
    "cumulative_reach_daily",
    survey=("W2", "A11", "A1"),
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events
  GROUP BY user_id
), news AS (
  SELECT first_day AS day, COUNT(*) AS new_users FROM firsts GROUP BY 1
), actives AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY 1
)
SELECT a.day, a.dau, COALESCE(n.new_users, 0) AS new_users,
       CAST(SUM(COALESCE(n.new_users, 0)) OVER (
         ORDER BY a.day ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS cumulative_reach
FROM actives a LEFT JOIN news n ON a.day = n.day
""",
)
def cumulative_reach_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT user count (cumulative reach) per day. Spark
    has no COUNT(DISTINCT) over a running window — and at scale
    nobody should run one: the standard rewrite assigns each user
    their FIRST active day (one agg), so the running sum of
    first-appearances IS the running distinct count. DAU rides along
    from a per-day distinct. The final cumsum window is global but
    runs over one row per day — driver-trivial however many events."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    news = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    actives = ev.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        actives.join(news, "day", "left")
        .select(
            "day",
            "dau",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .withColumn("cumulative_reach", F.sum("new_users").over(w))
    )


@register(
    "hopping_window_counts",
    survey=("A1", "W2"),
    oracle="""
WITH g AS (
  SELECT event_type,
         unnest([
           CAST(to_timestamp(floor(epoch(ts) / 300) * 300) AS TIMESTAMP)
             - INTERVAL 5 MINUTE,
           CAST(to_timestamp(floor(epoch(ts) / 300) * 300) AS TIMESTAMP)
         ]) AS win_start
  FROM events
)
SELECT win_start, win_start + INTERVAL 10 MINUTE AS win_end,
       event_type, COUNT(*) AS n_events
FROM g GROUP BY 1, 2, 3
""",
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows via Spark's native `window()` — 10-
    minute windows every 5 minutes, so each event lands in exactly
    two. The same expression works unchanged under readStream with a
    watermark (that's the point of the built-in); the oracle unrolls
    the two covering windows per event explicitly. Window assignment
    is a narrow map — the only shuffle is the (window, type) agg."""
    ev = load(spark, sf_dir, "events")
    out = ev.groupBy(
        F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return out.select(
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        "event_type",
        "n_events",
    )


@register(
    "session_window_native",
    survey=("A1", "W4"),
    oracle="""
WITH seq AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), isl AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING
         ) AS session_no
  FROM seq
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM isl GROUP BY user_id, session_no
""",
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's NATIVE `session_window()` (30-
    minute inactivity gap) — the built-in twin of the suite's manual
    lag-island `sessionize_gap30` and of the streaming stateful
    sessionizer: one operator, mergeable session state, usable verbatim
    under readStream. Session end is last-event + gap by definition;
    the oracle rebuilds identical sessions with the lag/cumsum island
    method."""
    ev = load(spark, sf_dir, "events")
    out = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


@register(
    "topn_per_group_rank",
    survey=("W9", "O4", "J4"),
    oracle="""
WITH ranked AS (
  SELECT c.c_mktsegment, o.o_orderkey,
         ROUND(o.o_totalprice, 6) AS o_totalprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY o.o_totalprice DESC, o.o_orderkey
         ) AS INTEGER) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment, o_orderkey, o_totalprice, rn
FROM ranked WHERE rn <= 3
""",
)
def topn_per_group_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per market segment — the canonical
    distributed top-N-per-group: ROW_NUMBER over PARTITION BY
    segment with a deterministic (price DESC, orderkey) tie-break,
    then rn ≤ 3. Each group ranks independently across executors (no
    global sort, unlike ORDER BY+LIMIT top-k), and Spark pushes the
    rn ≤ 3 filter into the window via its rank-limit optimization so
    per-partition state stays at k rows."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            "o_orderkey",
            R6(F.col("o_totalprice")).alias("o_totalprice"),
            "rn",
        )
    )


@register(
    "rank_functions_full",
    survey=("W9",),
    oracle="""
WITH totals AS (
  SELECT event_type, user_id, ROUND(SUM(value), 6) AS total_value
  FROM events GROUP BY event_type, user_id
)
SELECT event_type, user_id, total_value,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
       CAST(DENSE_RANK() OVER (PARTITION BY event_type ORDER BY total_value) AS INTEGER) AS drank,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cdist
FROM totals
WINDOW w AS (PARTITION BY event_type ORDER BY total_value, user_id)
""",
)
def rank_functions_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family (W9): row_number / dense_rank /
    percent_rank / cume_dist per event_type partition — every window
    carries the partition key, so rank computation distributes by
    group (no global sort). dense_rank runs over the ROUNDED total so
    cross-engine float noise can't split a tie class."""
    ev = load(spark, sf_dir, "events")
    totals = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 6).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy("total_value", "user_id")
    wd = Window.partitionBy("event_type").orderBy("total_value")
    return totals.select(
        "event_type",
        "user_id",
        "total_value",
        F.row_number().over(w).alias("rn"),
        F.dense_rank().over(wd).alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "interpolate_daily_gaps",
    survey=("W1", "W8", "F3"),
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, ROUND(AVG(value), 6) AS v
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), observed AS (
  SELECT * FROM daily WHERE date_part('day', day) % 3 <> 0
), span AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily
), scaffold AS (
  SELECT t.event_type, gs.day
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM span) gs
), g AS (
  -- micro-units: interpolate on round(v*1e6) so the rounded blend
  -- sits at exactly-representable .5 ties both engines round alike
  -- (rounding the raw blend to 6 decimals hits NON-representable
  -- decimal ties — frac=1/2 gaps force them — where engine ROUNDs
  -- disagree).
  SELECT s.event_type, s.day, ROUND(o.v * 1e6) AS vm
  FROM scaffold s LEFT JOIN observed o USING (event_type, day)
), w AS (
  SELECT event_type, day, vm,
    last_value(vm IGNORE NULLS) OVER wb AS pv,
    last_value(CASE WHEN vm IS NOT NULL THEN day END IGNORE NULLS) OVER wb AS pt,
    first_value(vm IGNORE NULLS) OVER wf AS nv,
    first_value(CASE WHEN vm IS NOT NULL THEN day END IGNORE NULLS) OVER wf AS nt
  FROM g
  WINDOW
    wb AS (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, day,
       ROUND(CASE WHEN vm IS NOT NULL THEN vm
                  WHEN pv IS NOT NULL AND nv IS NOT NULL
                  THEN pv + (nv - pv) * ((day - pt)::DOUBLE / (nt - pt))
             END) / 1e6 AS v_interp,
       (vm IS NULL) AS was_gap
FROM w
""",
)
def interpolate_daily_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a gappy per-type daily series (days
    divisible by 3 withheld as the gap fixture): date scaffold via
    sequence+explode, then `operators.windows.interpolate_linear` —
    two frame-bounded ignore-nulls windows on one partitioned sort,
    exact linear blend by date distance, boundaries left NULL. The
    two-sided sibling of `forward_fill_gaps`. Interpolation runs in
    integer micro-units (round(v·1e6)) so the final rounding happens
    at exactly-representable .5 ties, which every engine rounds the
    same way — rounding the raw blend to 6 decimals lands on
    NON-representable decimal ties (frac=1/2 gaps force them) where
    Spark's and DuckDB's ROUND disagree by 1e-6."""
    from bio_lakehouse_spark.operators.windows import interpolate_linear

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )
    observed = daily.filter(F.dayofmonth("day") % 3 != 0).select(
        "event_type", "day", F.round(F.col("v") * 1e6).alias("vm")
    )
    span = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    days = span.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    scaffold = ev.select("event_type").distinct().crossJoin(
        F.broadcast(days)
    )
    g = scaffold.join(observed, ["event_type", "day"], "left")
    out = interpolate_linear(g, "day", "vm", ["event_type"])
    return out.select(
        "event_type",
        "day",
        (F.round(F.col("vm_interp")) / 1e6).alias("v_interp"),
        F.col("vm").isNull().alias("was_gap"),
    )


@register(
    "rolling_7d_range_window",
    survey=("W2", "W3"),
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, ROUND(SUM(value), 6) AS v
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY user_id, CAST(ts AS DATE)
)
SELECT user_id, day,
       ROUND(SUM(v) OVER (PARTITION BY user_id
             ORDER BY CAST(day - DATE '1970-01-01' AS BIGINT)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS sum_7d,
       CAST(COUNT(*) OVER (PARTITION BY user_id
             ORDER BY CAST(day - DATE '1970-01-01' AS BIGINT)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS INTEGER)
         AS days_present_7d
FROM daily
""",
)
def rolling_7d_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True 7-DAY rolling window via a RANGE frame on epoch-day —
    NOT a 7-ROW frame: per-user daily series have missing days, and
    a rows-frame silently reaches further back in calendar time
    across every gap (the subtle bug the reference's global daily
    grain never exposes, but any per-entity series hits). The frame
    is value-based, so only rows within 6 calendar days aggregate,
    and `days_present_7d` exposes the observed-day count a correct
    average would divide by."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 6).alias("v"))
    )
    epoch_day = F.datediff(F.col("day"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_day)
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "user_id",
        "day",
        F.round(F.sum("v").over(w), 6).alias("sum_7d"),
        F.count(F.lit(1)).over(w).cast("int").alias("days_present_7d"),
    )


@register(
    "rolling_distinct_users_7d",
    survey=("W2", "A11"),
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u FROM events
), spine AS (
  SELECT DISTINCT d FROM du
), cov AS (
  SELECT CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
                                     INTERVAL 1 DAY)) AS DATE) AS dd, u
  FROM du
)
SELECT s.d AS date, COUNT(DISTINCT c.u) AS users_7d
FROM cov c JOIN spine s ON s.d = c.dd
GROUP BY s.d ORDER BY s.d
""",
)
def rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the windowed
    COUNT(DISTINCT) Spark windows can't express directly.

    Shape: raw events collapse to distinct (day, user) FIRST (the
    only full-data pass), then each pair explodes to the ≤7 future
    days it covers — a fixed ×7 linear blow-up of the small daily
    frame that turns the range join into a plain shuffle aggregate;
    no nested-loop join, no per-day rescan. The day spine join is
    broadcast. At any horizon the cost is |active-pairs| × window
    days, independent of raw event volume.
    """
    ev = load(spark, sf_dir, "events")
    du = ev.select(
        F.to_date("ts").alias("d"), F.col("user_id").alias("u")
    ).distinct()
    spine = du.select("d").distinct()
    cov = du.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias(
            "dd"
        ),
        "u",
    )
    return (
        cov.join(F.broadcast(spine), cov.dd == spine.d)
        .groupBy(F.col("d").alias("date"))
        .agg(F.count_distinct("u").alias("users_7d"))
        .orderBy("date")
    )


@register(
    "attribution_last_touch",
    survey=("J7", "W8", "A1"),
    oracle="""
WITH stream AS (
  SELECT user_id, ts, event_type, value,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts
  FROM events WHERE event_type IN ('click', 'purchase')
), carried AS (
  SELECT user_id, ts, event_type, value,
         LAST_VALUE(click_ts IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_type
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_click_ts
  FROM stream
), conv AS (
  SELECT CASE WHEN last_click_ts IS NOT NULL
               AND ts - last_click_ts <= INTERVAL 72 HOUR
              THEN CAST(last_click_ts AS DATE) END AS click_date,
         value
  FROM carried WHERE event_type = 'purchase'
)
SELECT COALESCE(CAST(click_date AS VARCHAR), 'direct') AS touch,
       COUNT(*) AS n_conversions,
       ROUND(SUM(value), 6) AS attributed_value
FROM conv GROUP BY 1 ORDER BY 1
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution with a 72-hour lookback:
    every purchase credits the user's most recent preceding click
    (else 'direct'), aggregated to attributed conversions + value per
    click date.

    Zero-join shape (the asof_last_purchase idiom): clicks and
    purchases interleave in ONE per-user ordered stream, the carried
    click timestamp is a LAST_VALUE-ignore-nulls window, and the
    72-hour attribution window is a row-local filter — no self-join,
    no range join, one shuffle on user_id.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    stream = ev.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.when(F.col("event_type") == "click", F.col("ts")).alias(
            "click_ts"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = stream.withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    conv = carried.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("last_click_ts").isNotNull()
            & (
                F.unix_micros("ts") - F.unix_micros("last_click_ts")
                <= 72 * 3600 * 1_000_000
            ),
            F.to_date("last_click_ts"),
        ).alias("click_date"),
        "value",
    )
    return (
        conv.groupBy(
            F.coalesce(
                F.col("click_date").cast("string"), F.lit("direct")
            ).alias("touch")
        )
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            R6(F.sum("value")).alias("attributed_value"),
        )
        .orderBy("touch")
    )


@register(
    "session_top_paths",
    survey=("W4", "W7", "A11"),
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
), first3 AS (
  SELECT user_id,
         STRING_AGG(event_type, '>' ORDER BY rn) AS path
  FROM ordered WHERE rn <= 3 GROUP BY user_id
)
SELECT path, COUNT(*) AS n_users
FROM first3 GROUP BY path
ORDER BY n_users DESC, path LIMIT 15
""",
)
def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top opening paths: each user's first three events concatenated
    in time order (event_id tie-break), counted across users — the
    Sankey/path-mining primitive product analytics builds on. One
    rank window partitioned by user, one ordered string aggregate,
    one count; nothing touches more than 3 rows per user after the
    rank filter."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s.event_type,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        first3.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(15)
    )


@register(
    "funnel_latency_percentiles",
    survey=("W5", "A13", "J7"),
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > v.t1
  GROUP BY e.user_id
), lat AS (
  SELECT (EPOCH_US(t2) - EPOCH_US(v.t1)) / 1000000.0 AS sec
  FROM p JOIN v USING (user_id)
)
SELECT COUNT(*) AS n_converted,
       ROUND(QUANTILE_CONT(sec, 0.5), 6) AS p50_sec,
       ROUND(QUANTILE_CONT(sec, 0.9), 6) AS p90_sec,
       ROUND(AVG(sec), 6) AS mean_sec
FROM lat
""",
)
def funnel_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the view→purchase funnel:
    per-user first view and first subsequent purchase (two keyed
    min-aggregates — no ordered window over raw events), latency
    percentiles exact here with approx_percentile as the stated
    100 TB drop-in."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.first("t1").alias("t1"))
    )
    # microsecond arithmetic: second-granularity casts truncate
    # sub-second parts differently per engine and shift the percentiles
    lat = p.select(
        (
            (F.unix_micros("t2") - F.unix_micros("t1")) / 1000000.0
        ).alias("sec")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        R6(F.percentile("sec", F.lit(0.5))).alias("p50_sec"),
        R6(F.percentile("sec", F.lit(0.9))).alias("p90_sec"),
        R6(F.avg("sec")).alias("mean_sec"),
    )


@register(
    "rolling_median_7d",
    survey=("W2", "A13"),
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, ROUND(SUM(value), 6) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), pre AS (
  SELECT user_id, day, v,
         LIST(v) OVER (PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS win
  FROM daily
)
SELECT user_id, day, v,
       LIST_SORT(win)[CAST(CEIL(LEN(win) / 2.0) AS INTEGER)] AS med_7d,
       LEN(win) AS n_win
FROM pre ORDER BY user_id, day
""",
)
def rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-row median of the per-user daily series — the
    robust rolling baseline Spark has no native window aggregate for.
    Contract: the DISCRETE median (lower-middle element of the sorted
    window, 1-based ceil(n/2)) so both engines pick the same element
    bit-exactly, no interpolation ambiguity. The window carries ≤7
    elements per row (bounded collect — nothing like a full-series
    materialization); input values pre-rounded so the sort order
    can't flip on float noise."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(R6(F.sum("value")).alias("v"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    pre = daily.withColumn("win", F.collect_list("v").over(w))
    return pre.select(
        "user_id",
        "day",
        "v",
        F.element_at(
            F.array_sort("win"),
            F.ceil(F.size("win") / 2.0).cast("int"),
        ).alias("med_7d"),
        F.size("win").cast("long").alias("n_win"),
    ).orderBy("user_id", "day")


@register(
    "attribution_linear_multitouch",
    survey=("J7", "A1", "W2"),
    oracle="""
WITH clicks AS (
  SELECT user_id, ts AS click_ts, CAST(ts AS DATE) AS click_date
  FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT event_id, user_id, ts AS p_ts, value
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
), touches AS (
  SELECT p.event_id, p.value, c.click_date,
         COUNT(*) OVER (PARTITION BY p.event_id) AS n_touches
  FROM purchases p JOIN clicks c
    ON c.user_id = p.user_id
   AND c.click_ts < p.p_ts
   AND c.click_ts >= p.p_ts - INTERVAL 72 HOUR
)
SELECT click_date AS touch_date,
       ROUND(SUM(value / n_touches), 6) AS attributed_value,
       COUNT(*) AS n_touch_credits
FROM touches GROUP BY click_date ORDER BY click_date
""",
)
def attribution_linear_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the 72 h
    lookback shares the purchase's value equally (value/n_touches) —
    the many-to-many sibling of attribution_last_touch. The
    click×purchase join is per-user AND time-banded, so fan-out is
    bounded by clicks-per-user-per-72h (the interval-join bound);
    touch counts come from one window over the matched pairs, never
    a re-join."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.to_date("ts").alias("click_date"),
    )
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select("event_id", "user_id", F.col("ts").alias("p_ts"), "value")
    touches = (
        purchases.join(clicks, "user_id")
        .filter(
            (F.col("click_ts") < F.col("p_ts"))
            & (
                F.unix_micros("click_ts")
                >= F.unix_micros("p_ts") - 72 * 3600 * 1_000_000
            )
        )
        .withColumn(
            "n_touches",
            F.count(F.lit(1)).over(Window.partitionBy("event_id")),
        )
    )
    return (
        touches.groupBy(F.col("click_date").alias("touch_date"))
        .agg(
            R6(F.sum(F.col("value") / F.col("n_touches"))).alias(
                "attributed_value"
            ),
            F.count(F.lit(1)).alias("n_touch_credits"),
        )
        .orderBy("touch_date")
    )


@register(
    "event_pattern_error_recovery",
    survey=("W4", "W7", "J3"),
    oracle="""
WITH ev AS (
  SELECT user_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type,
         LEAD(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS next_ts
  FROM events
), err AS (
  SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY rn) AS island
  FROM ev WHERE event_type = 'error'
), runs AS (
  SELECT user_id, island,
         COUNT(*) AS n_errors,
         MIN(ts) AS first_error_ts,
         MAX(ts) AS last_error_ts,
         -- NULL-faithful arg_max: DuckDB's arg_max SKIPS rows whose
         -- arg is NULL, so an error run ending the stream (no next
         -- event, LEAD=NULL at max rn) would silently fall back to an
         -- INTERIOR island event ('error') — found by the r9 sf0.1
         -- strict sweep. Coalescing the arg BEFORE arg_max keeps the
         -- max-rn row authoritative; '' / the 1900 sentinel reproduce
         -- Spark's NULL semantics ('' next_type, recovered=false).
         arg_max(COALESCE(next_type, ''), rn) AS next_type,
         arg_max(COALESCE(next_ts, TIMESTAMP '1900-01-01'), rn) AS next_ts
  FROM err GROUP BY 1, 2
)
SELECT user_id, CAST(n_errors AS BIGINT) AS n_errors,
       first_error_ts, last_error_ts,
       COALESCE(next_type, '') AS next_type,
       COALESCE(next_type = 'purchase'
                AND epoch(next_ts) - epoch(last_error_ts) <= 1800,
                FALSE) AS recovered
FROM runs WHERE n_errors >= 3
""",
)
def event_pattern_error_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern over the event stream:
    runs of ≥3 CONSECUTIVE error events per user (the gaps-and-
    islands rn-difference technique — no self-join), each flagged
    `recovered` when the immediately following event is a purchase
    within 30 minutes of the last error (PATTERN (E{3,} P) AS
    strict-next semantics). Everything is per-user windows + one
    partial-aggregated groupBy; the next-event fields ride along via
    LEAD before grouping, so no join back to the stream is needed."""
    ev = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.row_number().over(wu).alias("rn"),
        F.lead("event_type").over(wu).alias("next_type"),
        F.lead("ts").over(wu).alias("next_ts"),
    )
    we = Window.partitionBy("user_id").orderBy("rn")
    err = base.filter(F.col("event_type") == "error").withColumn(
        "island", F.col("rn") - F.row_number().over(we)
    )
    runs = err.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("n_errors"),
        F.min("ts").alias("first_error_ts"),
        F.max("ts").alias("last_error_ts"),
        F.max_by("next_type", "rn").alias("next_type"),
        F.max_by("next_ts", "rn").alias("next_ts"),
    )
    recovered = F.coalesce(
        (F.col("next_type") == "purchase")
        & (
            F.unix_timestamp("next_ts") - F.unix_timestamp("last_error_ts")
            <= 1800
        ),
        F.lit(False),
    )
    return runs.filter(F.col("n_errors") >= 3).select(
        "user_id",
        F.col("n_errors").cast("long").alias("n_errors"),
        "first_error_ts",
        "last_error_ts",
        F.coalesce("next_type", F.lit("")).alias("next_type"),
        recovered.alias("recovered"),
    )


_MARKOV_CHANNELS = ("view", "click", "signup", "error")
_MARKOV_ITERS = 16


def _markov_oracle() -> str:
    """Unrolled-SQL twin of the Markov removal-effect attribution:
    journey transitions (one window pass), then per scenario (base +
    one per removed channel) a fixed-count value iteration toward the
    absorbing 'conv'/'drop' states — both engines run the SAME 16
    truncated steps, so the comparison is exact regardless of
    convergence rate."""
    sql = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d, ts, event_id, event_type
  FROM events
), ord AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, d
                               ORDER BY ts, event_id) AS rn
  FROM ev
), cut AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' THEN rn END)
              OVER (PARTITION BY user_id, d) AS prn
  FROM ord
), kept AS (
  SELECT user_id, d, rn,
         CASE WHEN event_type = 'purchase' THEN 'conv'
              ELSE event_type END AS s
  FROM cut WHERE rn <= COALESCE(prn, 1000000)
), nx AS (
  SELECT user_id, d, rn, s,
         LEAD(s) OVER (PARTITION BY user_id, d ORDER BY rn) AS ns
  FROM kept
), edges AS (
  SELECT 'start' AS i, s AS j FROM nx WHERE rn = 1
  UNION ALL
  SELECT s AS i, COALESCE(ns, 'drop') AS j FROM nx WHERE s <> 'conv'
), trc AS (
  SELECT i, j, COUNT(*) AS c FROM edges GROUP BY 1, 2
), tr AS (
  SELECT i, j, c * 1.0 / SUM(c) OVER (PARTITION BY i) AS p FROM trc
)"""
    scens = ("base",) + _MARKOV_CHANNELS
    for sc in scens:
        sql += f""", tr_{sc} AS (
  SELECT i, CASE WHEN '{sc}' <> 'base' AND j = '{sc}' THEN 'drop'
                 ELSE j END AS j2, SUM(p) AS p
  FROM tr GROUP BY 1, 2
), v_{sc}_0 AS (
  SELECT 'conv' AS s, 1.0 AS val UNION ALL SELECT 'drop', 0.0
)"""
        for k in range(1, _MARKOV_ITERS + 1):
            sql += f""", v_{sc}_{k} AS (
  SELECT i AS s, SUM(p * COALESCE(v.val, 0.0)) AS val
  FROM tr_{sc} t LEFT JOIN v_{sc}_{k - 1} v ON v.s = t.j2
  GROUP BY i
  UNION ALL SELECT 'conv', 1.0 UNION ALL SELECT 'drop', 0.0
)"""
    k = _MARKOV_ITERS
    removed = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS channel, val AS p_removed FROM v_{c}_{k}"
        f" WHERE s = 'start'"
        for c in _MARKOV_CHANNELS
    )
    sql += f""", base_p AS (
  SELECT val AS pb FROM v_base_{k} WHERE s = 'start'
), removed AS (
{removed}
), scored AS (
  SELECT channel, pb, p_removed, (pb - p_removed) / pb AS eff
  FROM removed, base_p
)
SELECT channel, ROUND(pb, 6) AS p_base, ROUND(p_removed, 6) AS p_removed,
       ROUND(eff, 6) AS removal_effect,
       ROUND(eff / SUM(eff) OVER (), 6) AS attribution_share
FROM scored
"""
    return sql


@register(
    "markov_attribution_removal",
    survey=("W5", "J4", "ST11"),
    oracle=_markov_oracle(),
)
def markov_attribution_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain attribution by removal effect (Anderl et al.'16
    — the data-driven upgrade of last-touch/linear): build the
    journey transition matrix from per-(user, day) event paths cut at
    first purchase (ONE entity-partitioned window pass over the
    facts), then for the base chain and each channel-removed chain
    (transitions into the channel redirected to the 'drop' absorber)
    compute the start→conversion absorption probability by a FIXED
    16-step value iteration over the tiny (scenario × state) frame —
    all five scenarios iterate together in one frame, each step a
    ≤40-row join, lineage checkpoint-truncated. Removal effects are
    normalized into attribution shares. The data-sized work is one
    window + one groupBy; the iteration cost is independent of
    corpus size. Both engines truncate at the same step count, so
    the oracle match is exact regardless of convergence."""
    ev = load(spark, sf_dir, "events")
    wj = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", F.to_date("ts").alias("d"), "ts", "event_id",
        "event_type",
    ).withColumn("rn", F.row_number().over(wj))
    cut = ordered.withColumn(
        "prn",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        ).over(Window.partitionBy("user_id", "d")),
    )
    kept = cut.where(
        F.col("rn") <= F.coalesce(F.col("prn"), F.lit(1000000))
    ).select(
        "user_id", "d", "rn",
        F.when(F.col("event_type") == "purchase", "conv")
        .otherwise(F.col("event_type"))
        .alias("s"),
    )
    nx = kept.withColumn(
        "ns",
        F.lead("s").over(Window.partitionBy("user_id", "d").orderBy("rn")),
    )
    edges = nx.where(F.col("rn") == 1).select(
        F.lit("start").alias("i"), F.col("s").alias("j")
    ).unionAll(
        nx.where(F.col("s") != "conv").select(
            F.col("s").alias("i"),
            F.coalesce("ns", F.lit("drop")).alias("j"),
        )
    )
    trc = edges.groupBy("i", "j").agg(F.count(F.lit(1)).alias("c"))
    tr = trc.select(
        "i", "j",
        (F.col("c") * 1.0 / F.sum("c").over(Window.partitionBy("i")))
        .alias("p"),
    )
    scen = F.explode(
        F.array(*[F.lit(s) for s in ("base",) + _MARKOV_CHANNELS])
    ).alias("scenario")
    tr_all = (
        tr.select("*", scen)
        .select(
            "scenario", "i",
            F.when(
                (F.col("scenario") != "base")
                & (F.col("j") == F.col("scenario")),
                "drop",
            ).otherwise(F.col("j")).alias("j2"),
            "p",
        )
        .groupBy("scenario", "i", "j2")
        .agg(F.sum("p").alias("p"))
        .localCheckpoint()
    )
    terminals = (
        tr_all.select("scenario")
        .distinct()
        .select(
            "scenario",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("conv").alias("s"), F.lit(1.0).alias("val")
                    ),
                    F.struct(
                        F.lit("drop").alias("s"), F.lit(0.0).alias("val")
                    ),
                )
            ).alias("t"),
        )
        .select("scenario", "t.s", "t.val")
        .localCheckpoint()
    )
    v = terminals
    for it in range(_MARKOV_ITERS):
        stepped = (
            tr_all.join(
                v,
                (tr_all["scenario"] == v["scenario"])
                & (v["s"] == tr_all["j2"]),
                "left",
            )
            .groupBy(tr_all["scenario"].alias("scenario"), F.col("i"))
            .agg(
                F.sum(
                    F.col("p") * F.coalesce(F.col("val"), F.lit(0.0))
                ).alias("val")
            )
            .select("scenario", F.col("i").alias("s"), "val")
        )
        v = stepped.unionByName(terminals)
        # The frame is ≤ (scenarios × states) rows; an EAGER checkpoint
        # per step costs a whole job each (measured: 12.3 s for 16).
        # Truncate lineage every 4th step instead — plan depth stays
        # bounded, job count drops 4× (12.3 s → ~4 s at sf0.1).
        if it % 4 == 3:
            v = v.localCheckpoint()
    starts = v.where(F.col("s") == "start")
    base_p = F.broadcast(
        starts.where(F.col("scenario") == "base").select(
            F.col("val").alias("pb")
        )
    )
    scored = (
        starts.where(F.col("scenario") != "base")
        .select(F.col("scenario").alias("channel"),
                F.col("val").alias("p_removed"))
        .crossJoin(base_p)
        # try_divide twice (r12 ANSI audit): a journey graph with NO
        # start→conversion path has base probability pb = 0 (removal
        # effect undefined), and if removing any channel changes
        # nothing (all eff = 0) the attribution shares divide by a
        # zero total — both → NULL, not a job abort.
        .withColumn(
            "eff",
            F.try_divide(
                F.col("pb") - F.col("p_removed"), F.col("pb")
            ),
        )
    )
    tot = F.broadcast(scored.agg(F.sum("eff").alias("tot_eff")))
    return scored.crossJoin(tot).select(
        "channel",
        R6(F.col("pb")).alias("p_base"),
        R6(F.col("p_removed")).alias("p_removed"),
        R6(F.col("eff")).alias("removal_effect"),
        R6(F.try_divide(F.col("eff"), F.col("tot_eff"))).alias(
            "attribution_share"
        ),
    )


@register(
    "frequent_event_trigrams",
    survey=("W5", "O4", "A11"),
    oracle="""
WITH ord AS (
  SELECT user_id, CAST(ts AS DATE) AS d, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn
  FROM events
), tri AS (
  SELECT user_id, d, event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM ord
  WINDOW w AS (PARTITION BY user_id, d ORDER BY rn)
), counted AS (
  SELECT e1, e2, e3, COUNT(*) AS n_occurrences,
         COUNT(DISTINCT user_id) AS n_users
  FROM tri WHERE e3 IS NOT NULL
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_occurrences DESC,
                               e1, e2, e3) AS rnk
  FROM counted
)
SELECT e1, e2, e3, n_occurrences, CAST(n_users AS BIGINT) AS n_users,
       CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 10 ORDER BY rnk
""",
)
def frequent_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent consecutive event-type trigrams within
    per-(user, day) journeys — the PrefixSpan-style sequence-mining
    primitive behind path analysis, one level deeper than
    event_transition_matrix's bigrams. ONE entity-partitioned window
    pass emits the trigram stream (no self-joins; the classic
    sequence-pair join explodes quadratically), then a
    map-side-combined count and a top-k over the bounded
    (|event types|³) trigram frame."""
    ev = load(spark, sf_dir, "events")
    wj = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", F.to_date("ts").alias("d"), "ts", "event_id",
        "event_type",
    ).withColumn("rn", F.row_number().over(wj))
    ws = Window.partitionBy("user_id", "d").orderBy("rn")
    tri = ordered.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(ws).alias("e2"),
        F.lead("event_type", 2).over(ws).alias("e3"),
    ).where(F.col("e3").isNotNull())
    counted = tri.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
    )
    wr = Window.orderBy(
        F.col("n_occurrences").desc(),
        F.col("e1").asc(),
        F.col("e2").asc(),
        F.col("e3").asc(),
    )
    return (
        counted.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= 10)
        .orderBy("rnk")
    )
