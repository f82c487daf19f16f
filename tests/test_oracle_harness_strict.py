"""Pin the oracle-harness bug classes from VERDICT r7: the two r07
driver reds (Decimal-vs-float dtype, signed-zero repr) passed the
local gate because compare() coerced floats at 1e-9 and exempted
Decimal from the dtype-family check. These tests prove each class now
fails locally — if someone relaxes the harness, these go red first.

Pure pandas — no SparkSession needed.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from tests.oracle_harness import compare


def test_decimal_vs_float_family_caught():
    """entity_resolution_fs r07 red: Spark DecimalType column vs
    DuckDB DOUBLE — numerically identical, repr-different."""
    spark_df = pd.DataFrame({"avg_weight": [Decimal("5.441180")]})
    oracle_df = pd.DataFrame({"avg_weight": [5.44118]})
    problems = compare(spark_df, oracle_df)
    assert problems, "Decimal-vs-float split must fail even non-strict"
    assert any("dtype family" in p and "decimal" in p for p in problems)


def test_decimal_vs_decimal_passes():
    a = pd.DataFrame({"x": [Decimal("1.50"), None]})
    b = pd.DataFrame({"x": [Decimal("1.50"), None]})
    assert compare(a, b, strict=True) == []


def test_signed_zero_caught_in_strict():
    """cox_ph_newton_audit r07 red: Spark 0.0 vs DuckDB -0.0 — equal
    under ==, repr-different under the driver's value hash."""
    spark_df = pd.DataFrame({"score_u": [0.0]})
    oracle_df = pd.DataFrame({"score_u": [-0.0]})
    assert compare(spark_df, oracle_df) == [], "tolerance compare passes"
    problems = compare(spark_df, oracle_df, strict=True)
    assert problems and any("repr" in p for p in problems)


def test_int_vs_float_family_still_caught():
    """The r04 class (DuckDB HUGEINT sum → float64) stays covered."""
    spark_df = pd.DataFrame({"n": [5]})
    oracle_df = pd.DataFrame({"n": [5.0]})
    problems = compare(spark_df, oracle_df)
    assert any("dtype family" in p for p in problems)


def test_identical_frames_pass_strict():
    df = pd.DataFrame(
        {"k": ["a", "b"], "v": [1.25, float("nan")], "n": [1, 2]}
    )
    assert compare(df.copy(), df.copy(), strict=True) == []


def test_last_ulp_float_diff_caught_only_in_strict():
    """A float pair inside the 1e-9 tolerance but with different reprs
    (different bit patterns) passes the tolerance gate and fails
    strict — exactly the driver's behavior."""
    a = 0.1 + 0.2          # 0.30000000000000004
    b = 0.3                # repr '0.3'
    spark_df = pd.DataFrame({"v": [a]})
    oracle_df = pd.DataFrame({"v": [b]})
    assert compare(spark_df, oracle_df) == []
    assert compare(spark_df, oracle_df, strict=True)


def test_vacuity_gate_is_sf_scoped():
    """r10: three selective queries (fuzzy_name_match,
    nation_pair_volume, sole_returned_supplier) are rightly EMPTY at
    sf0.001 but guaranteed rows at the driver's sf0.01 — the vacuity
    gate must enforce expect_rows only at SFs >= the query's
    expect_rows_min_sf, or the cross-SF sweep reports false FAILs."""
    from bio_lakehouse_spark.suite import REGISTRY
    from tests.oracle_harness import run_sf

    assert run_sf("/root/testdata/sf0.001") == 0.001
    assert run_sf("/root/testdata/sf0.01/") == 0.01
    assert run_sf("/some/custom/fixtures") == 0.01  # unknown → gate ON

    for name in ("fuzzy_name_match", "nation_pair_volume",
                 "sole_returned_supplier"):
        spec = REGISTRY[name]
        assert spec.expect_rows and spec.expect_rows_min_sf == 0.01
        # gate OFF below the bound, ON at and above it
        assert run_sf("/root/testdata/sf0.001") < spec.expect_rows_min_sf
        assert run_sf("/root/testdata/sf0.01") >= spec.expect_rows_min_sf
        assert run_sf("/root/testdata/sf0.1") >= spec.expect_rows_min_sf
    # the default keeps every other query's gate ON at every SF
    assert REGISTRY["pricing_summary"].expect_rows_min_sf == 0.0


def test_strict_sweep_classifies_dead_harness_as_error(monkeypatch):
    """ADVICE r9: a sweep subprocess that dies with NO per-query
    output (JVM OOM-kill, import error) must surface as ERROR and a
    failing exit code — not be laundered into ORACLE_HEAVY_TIMEOUT
    (which never fails the sweep) with the remainder re-queued."""
    import subprocess
    import sys
    import types

    sys.path.insert(0, "tools")
    import importlib

    strict_sweep = importlib.import_module("strict_sweep")

    def dead_run(cmd, **kw):
        return types.SimpleNamespace(
            returncode=137, stdout="", stderr="Killed"
        )

    monkeypatch.setattr(subprocess, "run", dead_run)
    passed, failed, detail, broken = strict_sweep._run(
        ["q1", "q2"], "/tmp/sf", timeout=5
    )
    assert passed == set() and failed == set()
    assert "exited 137" in broken and "Killed" in broken


def test_strict_sweep_timeout_is_not_error(monkeypatch):
    """A genuine per-query timeout keeps the heavy-oracle
    classification path (broken stays empty)."""
    import subprocess
    import sys

    sys.path.insert(0, "tools")
    import importlib

    strict_sweep = importlib.import_module("strict_sweep")

    def timeout_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, 5, output="pass q1\n")

    monkeypatch.setattr(subprocess, "run", timeout_run)
    passed, failed, detail, broken = strict_sweep._run(
        ["q1", "q2"], "/tmp/sf", timeout=5
    )
    assert passed == {"q1"} and broken == ""
