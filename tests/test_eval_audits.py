"""Method-level tests for the evaluation/survival helpers
(operators/stats.auc_rank_sum, logrank_two_groups): known-answer
properties and brute-force parity on synthetic frames — the oracle
harness certifies the fixture queries cross-engine; these pin the
math itself on adversarial inputs (perfect/inverted separators, heavy
ties, all-censored tails)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.stats import (
    auc_rank_sum,
    logrank_two_groups,
)


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "s double, y int")
    return auc_rank_sum(df, F.col("s"), F.col("y") == 1).first()


def test_auc_perfect_and_inverted_separators(spark):
    rows = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    assert _auc(spark, rows)["auc"] == pytest.approx(1.0)
    inv = [(-s, y) for s, y in rows]
    assert _auc(spark, inv)["auc"] == pytest.approx(0.0)


def test_auc_equals_pair_counting_under_ties(spark):
    rng = np.random.default_rng(3)
    scores = rng.integers(0, 7, size=300).astype(float)  # heavy ties
    labels = (rng.random(300) < 0.4).astype(int)
    if labels.sum() in (0, 300):  # degenerate draw guard
        labels[0], labels[1] = 0, 1
    got = _auc(
        spark, [(float(s), int(y)) for s, y in zip(scores, labels)]
    )
    pos, neg = scores[labels == 1], scores[labels == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert got["auc"] == pytest.approx(want, rel=1e-12)
    assert got["gini"] == pytest.approx(2 * want - 1, rel=1e-9)
    assert got["n1"] == int(labels.sum())


def test_logrank_matches_bruteforce(spark):
    rng = np.random.default_rng(9)
    n = 240
    g = (rng.random(n) < 0.5).astype(int)
    # group 1 churns faster
    t = np.ceil(rng.exponential(scale=np.where(g == 1, 20, 35))).astype(int)
    ev = (rng.random(n) < 0.75).astype(int)
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(g, ev, t)],
        "g int, ev int, t int",
    )
    got = logrank_two_groups(df).first()

    o1 = e1 = v = 0.0
    for td in sorted(set(t[ev == 1])):
        at_risk = t >= td
        nn, n1 = int(at_risk.sum()), int((at_risk & (g == 1)).sum())
        d = int(((t == td) & (ev == 1)).sum())
        d1 = int(((t == td) & (ev == 1) & (g == 1)).sum())
        o1 += d1
        e1 += d * n1 / nn
        if nn > 1:
            v += d * (n1 / nn) * (1 - n1 / nn) * (nn - d) / (nn - 1)
    chi = (o1 - e1) ** 2 / v
    assert got["obs_events_g1"] == int(o1)
    assert got["exp_events_g1"] == pytest.approx(e1, rel=1e-12)
    assert got["logrank_chi2"] == pytest.approx(chi, rel=1e-9)
    assert chi > 3.84  # the built-in effect is detected at α=0.05


def test_logrank_identical_groups_is_null(spark):
    # same survival in both groups → O ≈ E, tiny χ²
    rows = []
    for i in range(200):
        rows.append((i % 2, 1 if i % 3 else 0, (i * 7) % 50 + 1))
    df = spark.createDataFrame(rows, "g int, ev int, t int")
    got = logrank_two_groups(df).first()
    assert got["logrank_chi2"] < 3.84
