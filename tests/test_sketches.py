"""Accuracy and algebraic-property tests for the cardinality sketches
(operators/sketches). The hash is deterministic, so these are exact
regression bounds, not flaky statistical tests.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.sketches import (
    hll_distinct,
    kmv_distinct,
    kmv_set_estimates,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(100_000).select(
        F.col("id"), (F.col("id") % 4).alias("g")
    )


def test_hll_duplicate_insensitive(spark, ids):
    """HLL registers are max-merged, so feeding every row twice must
    yield the IDENTICAL estimate — the property that lets the sketch
    skip the pre-distinct shuffle entirely."""
    once = hll_distinct(ids, ["g"], "id").collect()
    twice = hll_distinct(ids.unionAll(ids), ["g"], "id").collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


def test_hll_error_within_bound(spark, ids):
    """p=8 → theoretical σ ≈ 1.04/√256 = 6.5%; assert every group
    (25k distinct each) lands within 3σ."""
    est = {r.g: r.hll_estimate for r in hll_distinct(ids, ["g"], "id").collect()}
    for g, e in est.items():
        assert abs(e - 25_000) / 25_000 < 0.20, (g, e)


def test_hll_linear_counting_small_groups(spark):
    """Below 2.5m the estimator switches to linear counting, which is
    near-exact for tiny sets."""
    small = spark.range(40).select(F.lit("a").alias("g"), "id")
    [row] = hll_distinct(small, ["g"], "id").collect()
    assert abs(row.hll_estimate - 40) <= 2


def test_kmv_exact_below_k(spark):
    """A group with fewer than k distinct values must return the exact
    count (the sketch isn't full, θ stays 1)."""
    df = spark.range(50).select(F.lit("a").alias("g"), "id")
    [row] = kmv_distinct(df, ["g"], "id", k=128).collect()
    assert row.kmv_estimate == 50


def test_kmv_error_within_bound(spark, ids):
    """k=128 → σ ≈ 1/√(k-2) ≈ 8.9%; assert within 3σ per group."""
    est = {
        r.g: r.kmv_estimate
        for r in kmv_distinct(ids, ["g"], "id", k=128).collect()
    }
    for g, e in est.items():
        assert abs(e - 25_000) / 25_000 < 0.27, (g, e)


def test_theta_intersection_known_overlap(spark):
    """Sets 0..60k and 40k..100k: |∩| = 20k, |∪| = 100k. k=512 →
    σ ≈ 4.4%; the intersection estimate is noisier (fewer retained
    hashes land in it), so allow 20%."""
    left = spark.range(0, 60_000).select(F.col("id").alias("v"))
    right = spark.range(40_000, 100_000).select(F.col("id").alias("v"))
    [row] = kmv_set_estimates(left, right, "v", k=512).collect()
    assert abs(row.est_left - 60_000) / 60_000 < 0.15
    assert abs(row.est_right - 60_000) / 60_000 < 0.15
    assert abs(row.est_intersection - 20_000) / 20_000 < 0.20
    assert abs(row.est_union - 100_000) / 100_000 < 0.15


def test_histogram_quantile_error_bounded_by_bin_width(spark):
    """The histogram estimate can be off by at most one bin width of
    the value range (deterministic bound, not statistical): verify
    against the exact percentile on a skewed (quadratic) series."""
    from bio_lakehouse_spark.operators.quantiles import histogram_quantiles

    df = spark.range(10_000).select((F.col("id") * F.col("id")).cast("double").alias("v"))
    nbins = 256
    rng = 9999.0**2
    est = {r.prob: r.est for r in histogram_quantiles(df, "v", (0.1, 0.5, 0.9, 0.99), nbins).collect()}
    exact = df.agg(*[F.percentile("v", F.lit(p)).alias(str(p)) for p in (0.1, 0.5, 0.9, 0.99)]).first()
    assert set(est) == {0.1, 0.5, 0.9, 0.99}
    for p in (0.1, 0.5, 0.9, 0.99):
        assert abs(est[p] - exact[str(p)]) <= rng / nbins + 1e-6, (p, est[p], exact[str(p)])


def test_histogram_quantile_duplicate_scaling_invariant(spark):
    """Bin counts scale linearly under duplication, so the estimate is
    unchanged when every row appears twice — the property that makes
    the sketch mergeable across partitions."""
    from bio_lakehouse_spark.operators.quantiles import histogram_quantiles

    df = spark.range(5_000).select(F.col("id").cast("double").alias("v"))
    once = sorted(map(tuple, histogram_quantiles(df, "v", (0.5, 0.9), 64).collect()))
    twice = sorted(map(tuple, histogram_quantiles(df.unionAll(df), "v", (0.5, 0.9), 64).collect()))
    assert once == twice


def test_histogram_quantile_edge_probs_and_degenerate_range(spark):
    """r10 edge fixes: prob=0.0 used to return NO row (the
    containing-bin filter `cum - cnt < 0` can never hold), and a
    constant column null-binned every row through the zero-width
    division. Now: p=0 → first non-empty bin's left edge, p=1 → max,
    constant column → the constant at every probability, and the
    grouped path keeps a degenerate group independent of the others."""
    from bio_lakehouse_spark.operators.quantiles import histogram_quantiles

    df = spark.range(1, 1001).select(F.col("id").cast("double").alias("v"))
    est = {
        r.prob: r.est
        for r in histogram_quantiles(df, "v", (0.0, 1.0), 64).collect()
    }
    assert set(est) == {0.0, 1.0}
    assert est[0.0] == 1.0  # left edge of the first bin = min
    assert est[1.0] == 1000.0  # exact max

    const = spark.range(100).select(F.lit(42.5).alias("v"))
    est_c = {
        r.prob: r.est
        for r in histogram_quantiles(
            const, "v", (0.0, 0.5, 1.0), 64
        ).collect()
    }
    assert est_c == {0.0: 42.5, 0.5: 42.5, 1.0: 42.5}

    # grouped: one degenerate group next to a normal one
    g = spark.createDataFrame(
        [("a", 7.0)] * 10 + [("b", float(i)) for i in range(1, 101)],
        "g string, v double",
    )
    rows = histogram_quantiles(g, "v", (0.5,), 64, by=("g",)).collect()
    got = {(r.g, r.prob): r.est for r in rows}
    assert got[("a", 0.5)] == 7.0
    assert abs(got[("b", 0.5)] - 50.0) <= 100.0 / 64 + 1e-6


def test_histogram_quantile_ignores_nulls(spark):
    """r11 (ADVICE r10): nulls in the measured column must not reach
    the histogram — n = count(c) already excludes them, so a
    nulls-first bin inflated `cum` and biased every quantile low; in
    the degenerate-range branch the otherwise(0) routed them into
    bin 0. The estimates must equal those from the pre-filtered
    frame, and an all-null group simply yields no rows."""
    from bio_lakehouse_spark.operators.quantiles import histogram_quantiles

    base = spark.range(1, 1001).select(F.col("id").cast("double").alias("v"))
    nulls = spark.range(500).select(F.lit(None).cast("double").alias("v"))
    polluted = base.unionAll(nulls)
    probs = (0.0, 0.25, 0.5, 0.9, 1.0)
    clean = {r.prob: r.est for r in histogram_quantiles(base, "v", probs, 64).collect()}
    dirty = {r.prob: r.est for r in histogram_quantiles(polluted, "v", probs, 64).collect()}
    assert dirty == clean

    # degenerate range + nulls: the constant at every probability
    const = spark.range(50).select(F.lit(9.5).alias("v")).unionAll(nulls)
    est_c = {r.prob: r.est for r in histogram_quantiles(const, "v", (0.0, 0.5, 1.0), 64).collect()}
    assert est_c == {0.0: 9.5, 0.5: 9.5, 1.0: 9.5}

    # grouped: an all-null group produces no estimate rows, and does
    # not disturb its neighbors
    g = spark.createDataFrame(
        [("a", None)] * 5 + [("b", float(i)) for i in range(1, 101)],
        "g string, v double",
    )
    rows = histogram_quantiles(g, "v", (0.5,), 64, by=("g",)).collect()
    assert {r.g for r in rows} == {"b"}
    assert abs(rows[0].est - 50.0) <= 100.0 / 64 + 1e-6


def test_count_min_one_sided_error_random(spark):
    """CM guarantee on adversarially-collapsed key space: estimates
    never underestimate, never exceed the stream length, and are
    exact when the candidate's buckets hold no colliding keys."""
    import collections
    import random

    from bio_lakehouse_spark.operators.sketches import count_min_estimates

    rng = random.Random(17)
    keys = [str(rng.randrange(40)) for _ in range(3000)]
    exact = collections.Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], schema="v string")
    cand = spark.createDataFrame(
        [(k,) for k in exact], schema="v string"
    )
    got = {
        r["v"]: r["cm_estimate"]
        for r in count_min_estimates(df, "v", cand, depth=4,
                                     width=64).collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert got[k] >= n, (k, got[k], n)
        assert got[k] <= len(keys)
    # depth-4 min over 64 buckets on 40 keys: most estimates exact
    exact_frac = sum(got[k] == n for k, n in exact.items()) / len(exact)
    assert exact_frac > 0.5


def test_sketches_skip_nulls_like_count_distinct(spark):
    """r10: COUNT(DISTINCT) null semantics. A null value used to (a)
    create a null-rank HLL register row, inflating __present and
    skewing the linear-counting branch, and (b) survive KMV's
    distinct, hash to a null __h, sort FIRST, and occupy a sketch
    slot. Both sketches must now estimate identically with and
    without null rows mixed in."""
    from bio_lakehouse_spark.operators.quantiles import histogram_quantiles  # noqa: F401
    from bio_lakehouse_spark.operators.sketches import (
        hll_distinct,
        kmv_distinct,
    )

    vals = [(str(i),) for i in range(300)]
    clean = spark.createDataFrame(vals, "v string")
    dirty = spark.createDataFrame(
        vals + [(None,)] * 50, "v string"
    )

    h_clean = hll_distinct(clean, [], "v").first()["hll_estimate"]
    h_dirty = hll_distinct(dirty, [], "v").first()["hll_estimate"]
    assert h_clean == h_dirty

    k_clean = kmv_distinct(clean, [], "v", k=64).first()["kmv_estimate"]
    k_dirty = kmv_distinct(dirty, [], "v", k=64).first()["kmv_estimate"]
    assert k_clean == k_dirty

    # all-null input, GLOBAL aggregate: COUNT(DISTINCT)'s empty
    # answer is one row of 0 (HLL used to propagate a null estimate)
    all_null = spark.createDataFrame([(None,)] * 5, "v string")
    assert hll_distinct(all_null, [], "v").first()["hll_estimate"] == 0
    assert kmv_distinct(all_null, [], "v").first()["kmv_estimate"] == 0
    # grouped: null-only groups vanish, like per-group COUNT(DISTINCT)
    mixed = spark.createDataFrame(
        [("a", "x"), ("b", None)], "g string, v string"
    )
    got = {r.g: r.hll_estimate for r in
           hll_distinct(mixed, ["g"], "v").collect()}
    assert got == {"a": 1}
