"""functions/strings.py jaro_winkler: the Spark HOF expression must
match (a) a transparent Python reference implementation on random
strings and (b) DuckDB's ``jaro_winkler_similarity`` builtin — the
oracle engine — on the same pairs. The reference makes the pinned
semantics readable (clamped window, floored transpositions, 0.7
boost gate); the DuckDB leg proves the oracle contract directly.
"""

from __future__ import annotations

import random

import pytest

from bio_lakehouse_spark.functions.strings import jaro_winkler


def jw_ref(s1: str, s2: str) -> float:
    """Readable reference: DuckDB's exact algorithm."""
    L1, L2 = len(s1), len(s2)
    if L1 == 0 or L2 == 0:
        return 0.0
    w = max(max(L1, L2) // 2 - 1, 0)
    used = [False] * L2
    m1, js = [], []
    for i, c in enumerate(s1):
        for j in range(max(0, i - w), min(L2 - 1, i + w) + 1):
            if not used[j] and s2[j] == c:
                used[j] = True
                m1.append(c)
                js.append(j)
                break
    m = len(m1)
    if m == 0:
        return 0.0
    s2c = [s2[j] for j in sorted(js)]
    t = sum(a != b for a, b in zip(m1, s2c)) // 2  # floored
    jaro = (m / L1 + m / L2 + (m - t) / m) / 3.0
    if jaro <= 0.7:  # Winkler boost gated
        return jaro
    prefix = 0
    for x, y in zip(s1[:4], s2[:4]):
        if x != y:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1 - jaro)


CASES = [
    ("dwayne", "duane"),
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("", ""),
    ("", "a"),
    ("a", "a"),  # clamped window: single equal chars DO match
    ("ab", "ba"),
    ("Supplier#000000001", "Supplier#000000010"),
    ("abacecce", "bcbeea"),  # floored-transposition case
]


def _random_pairs(n: int, seed: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    alpha = "abcdefg#0123 "
    return [
        (
            "".join(rng.choices(alpha, k=rng.randint(0, 12))),
            "".join(rng.choices(alpha, k=rng.randint(0, 12))),
        )
        for _ in range(n)
    ]


def test_reference_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    for a, b in CASES + _random_pairs(4000, seed=11):
        got = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(got - jw_ref(a, b)) < 1e-12, (a, b)


def test_spark_expression_matches_reference(spark):
    pairs = CASES + _random_pairs(1500, seed=23)
    df = spark.createDataFrame(pairs, "s1 string, s2 string")
    rows = df.select(
        "s1", "s2", jaro_winkler("s1", "s2").alias("jw")
    ).collect()
    assert len(rows) == len(pairs)
    for r in rows:
        assert abs(r["jw"] - jw_ref(r["s1"], r["s2"])) < 1e-12, (
            r["s1"],
            r["s2"],
        )


def test_known_values(spark):
    df = spark.createDataFrame(
        [("martha", "marhta"), ("dixon", "dicksonx")], "s1 string, s2 string"
    )
    got = [
        r["jw"]
        for r in df.select(jaro_winkler("s1", "s2").alias("jw")).collect()
    ]
    assert got[0] == pytest.approx(0.9611111111111111, abs=1e-12)
    assert got[1] == pytest.approx(0.8133333333333332, abs=1e-12)


def test_no_python_udf_in_plan(spark):
    """The whole comparator is JVM-side expression code."""
    df = spark.createDataFrame([("ab", "ba")], "s1 string, s2 string")
    plan = (
        df.select(jaro_winkler("s1", "s2").alias("jw"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
