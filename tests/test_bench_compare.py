"""Bench adjudication contention-proofing (VERDICT r10 #1).

The calib-normalization rule has a proven blind spot: under sustained
host contention the burst calib probe slips into scheduler gaps while
long shuffle-heavy queries eat the full slowdown, so norm_ratio > 1.1
false-verdicts "code". The intra-query run-spread distribution is the
discriminator (idle p90 ≈ 1.5 / ~1% of queries > 2×; the driver's
contended r10 run: p90 1.89 / 9.4% > 2×). These tests pin the spread
statistic, every extraction path, the verdict precedence, and —
against the repo's own recorded artifacts — that the r10 false-"code"
case now adjudicates as contended_host.

No SparkSession needed: pure-JSON logic.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))
sys.path.insert(0, ROOT)

from bench_compare import (  # noqa: E402
    CALIB_DRIFT_CONTENDED,
    SPREAD_FRAC_GT2_CONTENDED,
    SPREAD_P90_CONTENDED,
    calib_drift,
    compare,
    spread_stats,
)


def _doc(value, calib, queries, **extra):
    d = {"value": value, "calib_sec": calib, "queries": dict(queries)}
    d.update(extra)
    return d


IDLE_RUNS = {f"q{i}": [1.0, 1.1] for i in range(20)}
# 4/20 queries > 2× spread (20% ≥ the 5% threshold) and p90 2.6:
# the signature of stalls hitting runs of the same query unevenly.
CONTENDED_RUNS = dict(
    IDLE_RUNS, **{f"q{i}": [3.0, 7.8, 4.1] for i in range(16, 20)}
)


def test_run_spread_stats_idle_vs_contended():
    from bench import run_spread_stats

    idle = run_spread_stats(IDLE_RUNS)
    hot = run_spread_stats(CONTENDED_RUNS)
    assert idle["p90"] == pytest.approx(1.1, abs=0.01)
    assert idle["frac_gt2"] == 0.0
    assert hot["p90"] >= 2.0
    assert hot["frac_gt2"] == 0.2
    assert hot["n"] == 20
    # empty / degenerate inputs
    assert run_spread_stats({}) is None
    assert run_spread_stats({"q": []}) is None
    assert run_spread_stats({"q": [0.0, 1.0]}) is None


def test_spread_extraction_paths(tmp_path):
    # 1. stamped run_spread block wins
    d = {"run_spread": {"p90": 2.5, "frac_gt2": 0.3}, "runs": IDLE_RUNS}
    assert spread_stats(d) == {"p90": 2.5, "frac_gt2": 0.3}
    # 2. flattened stdout keys
    d = {"run_spread_p90": 1.4, "run_spread_frac_gt2": 0.02}
    assert spread_stats(d) == {"p90": 1.4, "frac_gt2": 0.02}
    # 3. recompute from raw runs
    got = spread_stats({"runs": CONTENDED_RUNS})
    assert got["frac_gt2"] == 0.2
    # 4. driver BENCH line → detail_file next to it
    detail = {"runs": CONTENDED_RUNS}
    (tmp_path / "detail.json").write_text(json.dumps(detail))
    doc = {"detail_file": "detail.json", "__dir__": str(tmp_path)}
    assert spread_stats(doc)["frac_gt2"] == 0.2
    # missing detail file → None, not a crash
    doc = {"detail_file": "nope.json", "__dir__": str(tmp_path)}
    assert spread_stats(doc) is None
    assert spread_stats({}) is None


def test_verdicts_code_host_contended():
    q_old = {f"q{i}": 1.0 for i in range(20)}
    q_slow = {f"q{i}": 2.0 for i in range(20)}
    idle = {"run_spread": {"p90": 1.3, "frac_gt2": 0.0}}
    hot = {"run_spread": {"p90": 2.2, "frac_gt2": 0.2}}

    # genuine regression on an idle host: code
    out = compare(
        _doc(20.0, 0.6, q_old, **idle), _doc(40.0, 0.6, q_slow, **idle)
    )
    assert out["verdict"] == "code"
    assert out["norm_ratio"] == pytest.approx(2.0)

    # same move, but the NEW run is contended: unadjudicable
    out = compare(
        _doc(20.0, 0.6, q_old, **idle), _doc(40.0, 0.674, q_slow, **hot)
    )
    assert out["verdict"] == "contended_host"
    assert out["contended_side"] == "new"
    assert out["spread_new"]["p90"] == 2.2

    # contended OLD side blocks a phantom "speedup" claim too
    out = compare(
        _doc(40.0, 0.6, q_slow, **hot), _doc(20.0, 0.6, q_old, **idle)
    )
    assert out["verdict"] == "contended_host"
    assert out["contended_side"] == "old"

    # host-speed move fully explained by calib: host
    out = compare(
        _doc(20.0, 0.6, q_old, **idle),
        _doc(30.0, 0.9, {k: v * 1.5 for k, v in q_old.items()}, **idle),
    )
    assert out["verdict"] == "host"

    # no calib on either side and no spread: the old warning path
    out = compare({"value": 20.0, "queries": q_old},
                  {"value": 40.0, "queries": q_slow})
    assert out["verdict"] == "unadjudicable_no_calib"

    # frac_gt2 alone trips it (p90 can sit under 1.8 while 9% of
    # queries blow past 2× — the driver's actual r10 shape)
    sneaky = {"run_spread": {"p90": 1.7, "frac_gt2": 0.09}}
    out = compare(
        _doc(20.0, 0.6, q_old, **idle), _doc(40.0, 0.6, q_slow, **sneaky)
    )
    assert out["verdict"] == "contended_host"
    assert SPREAD_P90_CONTENDED > 1.7
    assert SPREAD_FRAC_GT2_CONTENDED <= 0.09


def test_calib_drift_third_signal():
    """r11 third pass, r12 split: drift is computed over the
    mid-suite TIMELINE probes only (the start calib is a cold-JIT
    min-of-5 sitting a structural ~1.6x above the warm floor —
    mixing it flagged a spotless run, drift 1.628 with a 0.441-0.488
    timeline); the r11 control-run incident (start 2.341 over ~0.65
    probes) is still caught, by the ANCHOR ratio, because a
    contended start window corrupts the normalization anchor even
    when the suite body ran clean."""
    from tools.bench_compare import CALIB_ANCHOR_SUSPECT, calib_anchor_ratio

    # stamped value wins only when no timeline is recorded (r11 docs)
    assert calib_drift({"calib_drift": 3.6}) == 3.6
    doc = {
        "calib_sec": 2.341,
        "calib_timeline": [
            {"calib_sec": 0.705}, {"calib_sec": 0.644},
            {"calib_sec": 0.709}, {"calib_sec": 0.658},
        ],
    }
    # body drift: timeline-only, flat → clean
    assert calib_drift(doc) == pytest.approx(0.709 / 0.644, abs=0.001)
    # anchor: start probe 3.6x the warm floor → suspect → contended
    assert calib_anchor_ratio(doc) == pytest.approx(
        2.341 / 0.644, abs=0.001
    )
    assert calib_anchor_ratio(doc) >= CALIB_ANCHOR_SUSPECT
    # the structural cold/warm offset alone must NOT flag (measured
    # clean run: start 0.718 over timeline 0.441-0.488)
    clean = {
        "calib_sec": 0.718,
        "calib_timeline": [
            {"calib_sec": 0.463}, {"calib_sec": 0.471},
            {"calib_sec": 0.441}, {"calib_sec": 0.488},
        ],
    }
    assert calib_drift(clean) < 1.5
    assert calib_anchor_ratio(clean) < CALIB_ANCHOR_SUSPECT
    assert calib_drift({}) is None

    q = {f"q{i}": 1.0 for i in range(20)}
    idle = {"run_spread": {"p90": 1.3, "frac_gt2": 0.0},
            "calib_drift": 1.1}
    drifty = {"run_spread": {"p90": 1.3, "frac_gt2": 0.0},
              "calib_drift": 2.4}
    out = compare(
        _doc(20.0, 0.6, q, **idle),
        _doc(40.0, 0.6, {k: 2.0 for k in q}, **drifty),
    )
    assert out["verdict"] == "contended_host"
    assert out["contended_side"] == "new"
    assert out["calib_drift_new"] == 2.4
    assert CALIB_DRIFT_CONTENDED <= 2.4


def test_r10_false_code_case_now_contended():
    """The motivating incident, re-adjudicated from the repo's own
    recorded artifacts: builder ledger (idle, same code) vs the
    driver's contended BENCH_r10 used to verdict 'code' at
    norm_ratio 2.22; it must now come back contended_host."""
    ledger = os.path.join(ROOT, "bench_detail.json")
    bench10 = os.path.join(ROOT, "BENCH_r10.json")
    detail10 = os.path.join(ROOT, "bench_out", "detail_r10.json")
    if not (os.path.exists(ledger) and os.path.exists(bench10)
            and os.path.exists(detail10)):
        pytest.skip("r10 artifacts not present")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "bench_compare.py"),
         ledger, bench10],
        capture_output=True, text=True, check=True,
    )
    out = json.loads(proc.stdout)
    assert out["verdict"] == "contended_host"
    assert out["contended_side"] == "new"
    assert out["spread_old"]["p90"] < SPREAD_P90_CONTENDED
    assert out["norm_ratio"] > 1.1  # would have been a false "code"


# ---------------------------------------------------------------- #
# Outlier re-run pass (VERDICT r12 #3): one contention burst parked
# on a single query must be absorbable after the main suite.
# ---------------------------------------------------------------- #


def test_outlier_selection_r12_incident():
    """The motivating case: rolling_hll_users_7d recorded 22.1 s in
    BENCH_r12 against a 0.79 s tracked ledger entry — it must be
    selected; pagerank at 6.4 s vs 4.2 s (1.5×) must not."""
    import bench

    led = {"rolling_hll_users_7d": 0.79, "pagerank_cust_supplier": 4.2}
    sel = bench.select_outliers(
        {"rolling_hll_users_7d": 22.1, "pagerank_cust_supplier": 6.4},
        led,
    )
    assert sel == [("rolling_hll_users_7d", 22.1)]


def test_outlier_selection_guards():
    """Sub-50ms ledger entries, <0.5 s absolute excess, None timings
    and unledgered queries never trigger; the cap keeps the worst
    excesses first."""
    import bench

    led = {"tiny": 0.01, "small": 0.2, "big": 2.0}
    assert bench.select_outliers(
        {"tiny": 1.0, "small": 0.65, "unknown": 50.0, "none": None},
        led,
    ) == []  # tiny: ledger < 50ms; small: excess 0.45 < 0.5s
    t = {f"q{i}": float(10 + i) for i in range(12)}
    le = {f"q{i}": 1.0 for i in range(12)}
    sel = bench.select_outliers(t, le)
    assert len(sel) == bench._OUTLIER_MAX_RERUNS
    assert sel[0] == ("q11", 21.0)


def test_tracked_ledger_sf_gate():
    """An sf0.01 iteration run must not compare against the sf0.1
    ledger (and vice versa)."""
    import bench

    if not os.path.exists(os.path.join(ROOT, "bench_detail.json")):
        pytest.skip("no tracked ledger")
    assert bench._tracked_ledger(0.1)  # ledger is recorded at sf0.1
    assert bench._tracked_ledger(0.01) == {}
