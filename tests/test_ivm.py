"""Incremental view maintenance ≡ full recompute, on randomized
bases and deltas including deletes and multi-touch keys."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.ivm import (
    agg_view_delta,
    agg_view_refresh,
    join_view_delta,
)

RNG = np.random.default_rng(11)


def _rows(n, keyspace):
    return [
        (int(RNG.integers(0, keyspace)), float(RNG.normal(100, 20)))
        for _ in range(n)
    ]


def test_join_view_delta_equals_full_recompute(spark):
    a0 = spark.createDataFrame(_rows(200, 30), "k int, va double")
    da = spark.createDataFrame(_rows(25, 30), "k int, va double")
    b0 = spark.createDataFrame(_rows(150, 30), "k int, vb double")
    db = spark.createDataFrame(_rows(20, 30), "k int, vb double")

    old_view = a0.join(b0, "k")
    new_view = a0.unionByName(da).join(b0.unionByName(db), "k")
    delta = join_view_delta(a0, da, b0, db, ["k"])

    got = old_view.unionByName(delta).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("va") + F.sum("vb"), 6).alias("s")
    )
    want = new_view.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("va") + F.sum("vb"), 6).alias("s")
    )
    gd = {r["k"]: (r["n"], r["s"]) for r in got.collect()}
    wd = {r["k"]: (r["n"], r["s"]) for r in want.collect()}
    assert gd.keys() == wd.keys()
    for k in wd:
        assert gd[k][0] == wd[k][0], k
        assert gd[k][1] == pytest.approx(wd[k][1], rel=1e-9)


def test_agg_view_refresh_with_deletes_equals_recompute(spark):
    base = _rows(300, 12)
    dels = [base[i] for i in RNG.choice(len(base), 40, replace=False)]
    ins = _rows(30, 12)

    bdf = spark.createDataFrame(
        [(k, v, 1) for k, v in base], "k int, x double, __w int"
    )
    view = agg_view_delta(bdf, ["k"], ["x"])

    delta = spark.createDataFrame(
        [(k, v, -1) for k, v in dels] + [(k, v, 1) for k, v in ins],
        "k int, x double, __w int",
    )
    refreshed = agg_view_refresh(view, delta, ["k"], ["x"])

    from collections import Counter

    multiset = Counter(base)
    for d in dels:
        multiset[d] -= 1
    for i in ins:
        multiset[i] += 1
    want = {}
    for (k, v), c in multiset.items():
        if c <= 0:
            continue
        n, s = want.get(k, (0, 0.0))
        want[k] = (n + c, s + c * v)

    got = {
        r["k"]: (r["__cnt"], r["__sum_x"]) for r in refreshed.collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-9)


def test_agg_view_refresh_tombstones_emptied_groups(spark):
    bdf = spark.createDataFrame(
        [(1, 5.0, 1), (1, 7.0, 1), (2, 3.0, 1)], "k int, x double, __w int"
    )
    view = agg_view_delta(bdf, ["k"], ["x"])
    # delete everything in group 1
    delta = spark.createDataFrame(
        [(1, 5.0, -1), (1, 7.0, -1)], "k int, x double, __w int"
    )
    refreshed = agg_view_refresh(view, delta, ["k"], ["x"])
    rows = {r["k"]: r for r in refreshed.collect()}
    assert set(rows) == {2}
    assert rows[2]["__cnt"] == 1 and rows[2]["__sum_x"] == 3.0
