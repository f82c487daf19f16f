"""Brute-force cross-checks for the round-7 widening operators:
skyline_2d (Pareto frontier), kaplan_meier (product-limit survival),
bfs_distances (multi-source frontier BFS) — adversarial smalls the
sf-fixture oracles can't isolate: dominance ties, duplicate frontier
points, absorbing-zero survival, unreachable / directed-only nodes.
"""

from __future__ import annotations

from itertools import product

import numpy as np
import pytest

from bio_lakehouse_spark.operators.aggregates import skyline_2d
from bio_lakehouse_spark.operators.graph import bfs_distances
from bio_lakehouse_spark.operators.stats import kaplan_meier

RNG = np.random.default_rng(11)


# ---------------------------------------------------------------------------
# skyline_2d
# ---------------------------------------------------------------------------


def _brute_skyline(pts):
    """Definitional quadratic skyline: minimize x, maximize y."""
    out = []
    for i, (xi, yi) in enumerate(pts):
        dominated = any(
            xj <= xi and yj >= yi and (xj < xi or yj > yi)
            for j, (xj, yj) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((xi, yi))
    return sorted(out)


def _run_skyline(spark, pts):
    df = spark.createDataFrame(
        [(i, float(x), int(y)) for i, (x, y) in enumerate(pts)],
        "id long, x double, y long",
    )
    got = skyline_2d(df, "x", "y").collect()
    return sorted((r["x"], r["y"]) for r in got)


def test_skyline_matches_bruteforce_random(spark):
    pts = [
        (float(RNG.integers(0, 20)), int(RNG.integers(0, 20)))
        for _ in range(200)
    ]
    assert _run_skyline(spark, pts) == _brute_skyline(pts)


def test_skyline_ties_and_duplicates(spark):
    # duplicate frontier points are ALL kept; same-x worse-y and
    # same-y worse-x are both dominated
    pts = [(1.0, 10), (1.0, 10), (1.0, 9), (2.0, 10), (0.5, 1), (3.0, 11)]
    assert _run_skyline(spark, pts) == _brute_skyline(pts)
    assert _brute_skyline(pts).count((1.0, 10)) == 2


def test_skyline_grid_exhaustive(spark):
    # every (x, y) pair on a 5×5 grid exactly once: the frontier is
    # the single corner point (min x, max y)
    pts = [(float(x), y) for x, y in product(range(5), range(5))]
    assert _run_skyline(spark, pts) == [(0.0, 4)]


def test_skyline_monotone_chain_all_kept(spark):
    # strictly increasing x with strictly increasing y: nobody is
    # dominated (bigger y costs more x)
    pts = [(float(i), i) for i in range(12)]
    assert _run_skyline(spark, pts) == _brute_skyline(pts) == sorted(pts)


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------


def _brute_km(obs):
    """Textbook KM: obs = [(duration, event)]."""
    total = len(obs)
    times = sorted({t for t, _ in obs})
    s, out = 1.0, []
    for t in times:
        d = sum(1 for td, e in obs if td == t and e == 1)
        c = sum(1 for td, e in obs if td == t and e == 0)
        n_risk = sum(1 for td, _ in obs if td >= t)
        assert n_risk <= total
        if d:
            s *= 1.0 - d / n_risk
            out.append((t, d, c, n_risk, s))
    return out


def _run_km(spark, obs):
    df = spark.createDataFrame(
        [(int(t), int(e)) for t, e in obs], "t long, ev int"
    )
    rows = kaplan_meier(df, "t", "ev").orderBy("duration").collect()
    return [
        (
            r["duration"],
            r["n_events"],
            r["n_censored"],
            r["n_risk"],
            r["survival"],
        )
        for r in rows
    ]


def test_km_classic_example(spark):
    # Klein & Moeschberger-style small set: ties of events and
    # censorings at the same time
    obs = [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0), (5, 1), (5, 1), (6, 0)]
    got = _run_km(spark, obs)
    want = _brute_km(obs)
    assert [g[:4] for g in got] == [w[:4] for w in want]
    for g, w in zip(got, want):
        assert g[4] == pytest.approx(w[4], abs=1e-9)


def test_km_absorbing_zero(spark):
    # everyone dies at the last event time: survival hits exactly 0
    # (the ln(0) guard path)
    obs = [(1, 1), (2, 1), (3, 1)]
    got = _run_km(spark, obs)
    assert got[-1][4] == 0.0
    want = _brute_km(obs)
    for g, w in zip(got, want):
        assert g[4] == pytest.approx(w[4], abs=1e-9)


def test_km_all_censored_is_empty(spark):
    got = _run_km(spark, [(1, 0), (2, 0)])
    assert got == []


def test_km_random_matches_bruteforce(spark):
    obs = [
        (int(RNG.integers(1, 15)), int(RNG.integers(0, 2)))
        for _ in range(120)
    ]
    got = _run_km(spark, obs)
    want = _brute_km(obs)
    assert [g[:4] for g in got] == [w[:4] for w in want]
    for g, w in zip(got, want):
        assert g[4] == pytest.approx(w[4], abs=1e-9)


# ---------------------------------------------------------------------------
# bfs_distances
# ---------------------------------------------------------------------------


def _brute_bfs(edges, sources, max_hops):
    dist = {s: 0 for s in sources}
    frontier = set(sources)
    for h in range(1, max_hops + 1):
        nxt = {
            v
            for u, v in edges
            if u in frontier and v not in dist
        }
        for v in nxt:
            dist[v] = h
        frontier = nxt
    return sorted(dist.items())


def _run_bfs(spark, edges, sources, max_hops):
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )
    s = spark.createDataFrame([(int(v),) for v in sources], "v long")
    rows = bfs_distances(e, s, max_hops=max_hops).collect()
    return sorted((r["node"], r["dist"]) for r in rows)


def test_bfs_directed_chain_and_unreachable(spark):
    # 0→1→2→3→4 plus isolated 9: distances follow the direction,
    # nothing beyond max_hops, 9 never appears
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (8, 9)]
    got = _run_bfs(spark, edges, [0], max_hops=3)
    assert got == [(0, 0), (1, 1), (2, 2), (3, 3)]


def test_bfs_multi_source_takes_nearest(spark):
    edges = [(0, 1), (1, 2), (2, 3), (5, 3)]
    got = _run_bfs(spark, edges, [0, 5], max_hops=4)
    assert dict(got)[3] == 1  # via 5, not the 3-hop path via 0


def test_bfs_random_matches_bruteforce(spark):
    n = 40
    edges = sorted(
        {
            (int(RNG.integers(0, n)), int(RNG.integers(0, n)))
            for _ in range(120)
        }
    )
    sources = [0, 1]
    for h in (1, 3):
        assert _run_bfs(spark, edges, sources, h) == _brute_bfs(
            edges, sources, h
        )
