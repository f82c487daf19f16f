"""Products-layer tests, mirroring the reference's test patterns
(SURVEY §5): numeric-property tests for the what-if simulator and
training-load math, pure-logic units for NL-JSON parsing / FHIR /
XML / REST transforms, and mocked-engine style checks against the bio
views built from the fixture pipeline.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bio_lakehouse_spark.products import numerics
from bio_lakehouse_spark.products.nl_sql import (
    NLToSQLEngine,
    parse_llm_json,
    stub_llm,
)
from bio_lakehouse_spark.products.whatif import (
    DayPlan,
    Scenario,
    WhatIfSimulator,
    classify_energy,
    overtraining_penalty,
)

BIO_ROOT = "/root/repo/.fixtures/bio"


# -- numerics ---------------------------------------------------------------


def test_linregress_matches_closed_form():
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 10, 200)
    y = 3.0 * x + 2.0 + rng.normal(0, 0.5, 200)
    r = numerics.linregress(x, y)
    assert abs(r["slope"] - 3.0) < 0.05
    assert abs(r["intercept"] - 2.0) < 0.3
    assert r["r"] > 0.99
    assert r["p"] < 1e-6


def test_t_sf_known_values():
    # t=2.0, df=10 → sf ≈ 0.03669 (published t-table value)
    assert abs(numerics._t_sf(2.0, 10) - 0.03669) < 1e-3
    # symmetric: sf(0) = 0.5
    assert abs(numerics._t_sf(0.0, 5) - 0.5) < 1e-9


def test_lowess_smooths_monotone():
    x = np.linspace(0, 10, 50)
    y = 2 * x + np.sin(x)
    fit = numerics.lowess(x, y, frac=0.5)
    assert fit.shape == x.shape
    # smoother should track the trend within the sine amplitude
    assert np.abs(fit - 2 * x).max() < 1.5
    # tiny n falls back to the linear fit
    small = numerics.lowess(np.array([0, 1, 2.0]), np.array([0, 2, 4.0]))
    assert np.allclose(small, [0, 2, 4], atol=1e-9)


def test_mutual_information_orders_dependence():
    rng = np.random.RandomState(1)
    x = rng.uniform(0, 1, 500)
    dependent = numerics.mutual_information(x, 2 * x + 0.01 * rng.normal(size=500))
    independent = numerics.mutual_information(x, rng.uniform(0, 1, 500))
    assert dependent > independent + 0.5


def test_select_features_drops_collinear_and_leaky():
    rng = np.random.RandomState(2)
    a = rng.uniform(0, 1, 300)
    b = a + rng.normal(0, 0.01, 300)  # collinear with a
    c = rng.uniform(0, 1, 300)
    y = a + 0.5 * c
    X = np.column_stack([a, b, c, y])
    names = ["a", "b", "c", "target_leak"]
    chosen = numerics.select_features(
        X, y, names, top_k=2, exclude=("target_leak",)
    )
    assert "target_leak" not in chosen
    assert not ({"a", "b"} <= set(chosen))  # one of the twins dropped
    assert "c" in chosen


def test_walk_forward_cv_beats_noise_baseline():
    rng = np.random.RandomState(3)
    n = 80
    x = rng.uniform(0, 10, (n, 2))
    y = 3 * x[:, 0] - 2 * x[:, 1] + rng.normal(0, 0.1, n)
    res = numerics.walk_forward_cv(x, y, min_train=30, test_window=7)
    assert res["n_folds"] >= 5
    assert res["mae"] < res["naive_mae"]  # the model must beat naive here
    assert res["r2"] > 0.9


# -- what-if simulator (property tests, ref tests/test_what_if.py) ----------


@pytest.fixture(scope="module")
def simulator(spark):
    from bio_lakehouse_spark.bio import views as V
    from bio_lakehouse_spark.bio.gold import build_gold

    gold = build_gold(spark, f"{BIO_ROOT}/silver")["gold_daily_rollup"]
    return WhatIfSimulator(
        sleep_prediction=V.sleep_performance_prediction(gold),
        workout_type_opt=V.workout_type_optimization(gold),
        dashboard=V.dashboard_30day(gold),
        training_load=V.training_load_daily(gold),
    )


def test_whatif_rest_beats_high_intensity(simulator):
    rest = simulator.simulate(Scenario(80, "rest", "none", 0))
    hard = simulator.simulate(Scenario(80, "cycling", "high", 5))
    assert rest.predicted_readiness >= hard.predicted_readiness


def test_whatif_high_sleep_beats_low_sleep(simulator):
    hi = simulator.simulate(Scenario(95, "cycling", "moderate", 1))
    lo = simulator.simulate(Scenario(40, "cycling", "moderate", 1))
    if simulator.regression["valid"] and simulator.regression["slope"] > 0:
        assert hi.predicted_readiness > lo.predicted_readiness


def test_whatif_clamped_to_0_100(simulator):
    for sleep in (0, 100):
        for days in (0, 15):
            r = simulator.simulate(Scenario(sleep, "cycling", "high", days))
            assert 0.0 <= r.predicted_readiness <= 100.0


def test_penalty_escalates():
    vals = [overtraining_penalty(d) for d in range(10)]
    assert vals[:3] == [0.0, 0.0, 0.0]
    assert all(b <= a for a, b in zip(vals, vals[1:]))  # monotone down
    assert overtraining_penalty(5) == -7.0
    assert overtraining_penalty(7) == -12.0


def test_energy_classification_bands():
    assert classify_energy(90, 90) == "peak"
    assert classify_energy(86, 81) == "high"
    assert classify_energy(75, 70) == "moderate"
    assert classify_energy(55, 40) == "low"
    assert classify_energy(30, 90) == "recovery_needed"


def test_multi_day_cascade(simulator):
    plans = [DayPlan(i, 80, "cycling", "high") for i in range(5)]
    proj = simulator.simulate_multi_day(plans)
    assert [p["consecutive_workout_days"] for p in proj] == [1, 2, 3, 4, 5]
    # monotone streak penalty: day 5 prediction ≤ day 1 prediction
    assert proj[-1]["predicted_readiness"] <= proj[0]["predicted_readiness"]
    # rest day resets the streak
    plans[2] = DayPlan(2, 80, "rest", "none")
    proj2 = simulator.simulate_multi_day(plans)
    assert proj2[2]["consecutive_workout_days"] == 0
    assert proj2[3]["consecutive_workout_days"] == 1
    # confidence widens with horizon
    w0 = proj[0]["confidence_range"][1] - proj[0]["confidence_range"][0]
    w4 = proj[4]["confidence_range"][1] - proj[4]["confidence_range"][0]
    assert w4 >= w0
    # an intensity-'none' day is a skipped workout: zero TSS, even for
    # a non-rest type (ref what_if.py:436-443)
    assert proj2[2]["estimated_tss"] == 0.0
    from bio_lakehouse_spark.products.whatif import estimate_tss, summarize_plan
    assert estimate_tss("cycling", "none") == 0.0
    assert estimate_tss("cycling", "high") == 110.0
    assert estimate_tss("rest", "high") == 0.0
    # every projection carries the deterministic coaching line, and the
    # plan summary reflects the trend band
    assert all(p["recommendation"] for p in proj)
    s = summarize_plan(proj)
    assert "5-day plan" in s and "CTL moves" in s
    assert summarize_plan([]) == "No days planned."


# -- alerts -----------------------------------------------------------------


def test_alerts_on_fixture_gold(spark):
    from bio_lakehouse_spark.bio import views as V
    from bio_lakehouse_spark.bio.gold import build_gold
    from bio_lakehouse_spark.products.alerts import check_alerts, publish_alerts

    gold = build_gold(spark, f"{BIO_ROOT}/silver")["gold_daily_rollup"]
    risk = V.overtraining_risk(gold)
    alerts = check_alerts(gold, risk)
    assert isinstance(alerts, list)
    for a in alerts:
        assert {"condition", "message", "severity"} <= set(a)
    seen = {}
    publish_alerts(alerts, sink=lambda s, b: seen.update(s=s, b=b))
    assert "Health Alert" in seen["s"]


# -- NL-to-SQL --------------------------------------------------------------


@pytest.mark.parametrize(
    "raw",
    [
        '{"sql": "SELECT 1", "confidence": 0.9}',
        '```json\n{"sql": "SELECT 1", "confidence": 0.9}\n```',
        '```\n{"sql": "SELECT 1", "confidence": 0.9}\n```',
        'Sure! Here you go: {"sql": "SELECT 1", "confidence": 0.9} hope that helps',
    ],
)
def test_parse_llm_json_variants(raw):
    assert parse_llm_json(raw)["sql"] == "SELECT 1"


def test_parse_llm_json_garbage_raises():
    with pytest.raises(ValueError):
        parse_llm_json("no json here at all")


def test_nl_to_sql_end_to_end(spark):
    from bio_lakehouse_spark.bio.gold import build_gold, stg_sleep
    from bio_lakehouse_spark.bio.views import register_views
    from bio_lakehouse_spark.engine import QueryEngine

    gold = build_gold(spark, f"{BIO_ROOT}/silver")["gold_daily_rollup"]
    sleep_silver = spark.read.parquet(f"{BIO_ROOT}/silver/oura_daily_sleep")
    register_views(spark, gold, stg_sleep(sleep_silver))

    q = "How many days of data do I have?"
    canned = {
        q: json.dumps(
            {
                "sql": "SELECT COUNT(*) AS n_days FROM gold_daily_rollup",
                "explanation": "count of gold rows",
                "assumptions": [],
                "confidence": 0.9,
            }
        ),
        "drop it": json.dumps({"sql": "DROP TABLE gold_daily_rollup",
                               "confidence": 0.9}),
    }
    nl = NLToSQLEngine(engine=QueryEngine(spark), llm=stub_llm(canned))
    res = nl.ask(q)
    assert res.error is None
    assert res.row_count == 1
    assert int(res.data.iloc[0, 0]) == 150
    assert "n_days: 150" in res.answer
    # schema DDL injection reaches the prompt
    assert "gold_daily_rollup" in nl.system_prompt()
    # the gate blocks non-SELECT from the LLM
    blocked = nl.ask("drop it")
    assert blocked.error is not None and "SELECT" in blocked.error


# -- XML parser (S10) -------------------------------------------------------


def test_healthkit_parser_properties(tmp_path):
    """Differential property test for the streaming XML parser: random
    Record streams vs an independent pure-Python model of the
    reference semantics (document-order last/mean policies, SpO2
    fraction→pct on the AGGREGATE, mindfulness minutes additive over
    start→end intervals, since-filter)."""
    from collections import defaultdict

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bio_lakehouse_spark.sources.xml_source import parse_export

    day_st = st.sampled_from(
        ["2025-05-30", "2025-06-01", "2025-06-02", "2025-06-03"]
    )
    rec_st = st.one_of(
        st.tuples(
            st.just("rhr"), day_st,
            st.floats(40, 90, allow_nan=False),
        ),
        st.tuples(
            st.just("spo2"), day_st,
            st.floats(0.9, 0.999, allow_nan=False),
        ),
        st.tuples(
            st.just("mind"), day_st,
            st.integers(min_value=1, max_value=59),  # minutes
        ),
    )

    @settings(max_examples=25, deadline=None)
    @given(records=st.lists(rec_st, min_size=0, max_size=30))
    def run(records):
        since = "2025-06-01"
        parts = ["<HealthData>"]
        for j, (kind, day, val) in enumerate(records):
            if kind == "rhr":
                parts.append(
                    f'<Record type="HKQuantityTypeIdentifierRestingHeartRate"'
                    f' value="{val}" unit="count/min"'
                    f' startDate="{day} 07:{j:02d}:00 -0500"/>'
                )
            elif kind == "spo2":
                parts.append(
                    f'<Record type="HKQuantityTypeIdentifierOxygenSaturation"'
                    f' value="{val}" unit="%"'
                    f' startDate="{day} 07:{j:02d}:00 -0500"/>'
                )
            else:
                parts.append(
                    f'<Record type="HKCategoryTypeIdentifierMindfulSession"'
                    f' startDate="{day} 06:00:00 -0500"'
                    f' endDate="{day} 06:{val:02d}:00 -0500"/>'
                )
        parts.append("</HealthData>")
        p = tmp_path / "prop_export.xml"
        p.write_text("\n".join(parts))
        parsed = parse_export(p, since=since)

        # independent model
        rhr = defaultdict(list)
        spo2 = defaultdict(list)
        mind = defaultdict(lambda: [0.0, 0])
        for kind, day, val in records:
            if day < since:
                continue
            if kind == "rhr":
                rhr[day].append(val)
            elif kind == "spo2":
                spo2[day].append(val)
            else:
                mind[day][0] += float(val)
                mind[day][1] += 1

        got_v = {r["date"]: r for r in parsed["daily_vitals"]}
        assert set(got_v) == set(rhr) | set(spo2)
        for day, row in got_v.items():
            if day in rhr:
                assert row["resting_heart_rate_bpm"] == round(
                    rhr[day][-1], 2
                )  # document-order last
            else:
                assert row["resting_heart_rate_bpm"] is None
            if day in spo2:
                m = sum(spo2[day]) / len(spo2[day])
                assert row["blood_oxygen_pct"] == round(m * 100, 1)
            else:
                assert row["blood_oxygen_pct"] is None
        got_m = {r["date"]: r for r in parsed["mindfulness"]}
        assert set(got_m) == set(mind)
        for day, (dur, n) in mind.items():
            assert got_m[day]["duration_minutes"] == round(dur, 1)
            assert got_m[day]["session_count"] == n
        # the since-filter never leaks: no pre-cutoff days anywhere
        for sub in parsed.values():
            assert all(r["date"] >= since for r in sub)

    run()


def test_healthkit_xml_parser(tmp_path):
    from bio_lakehouse_spark.sources.xml_source import (
        normalize_workout_type,
        parse_export,
        write_bronze_csvs,
    )

    assert (
        normalize_workout_type("HKWorkoutActivityTypeFunctionalStrengthTraining")
        == "functional_strength_training"
    )
    xml = """<HealthData>
      <Record type="HKQuantityTypeIdentifierRestingHeartRate" value="52"
              unit="count/min" startDate="2025-06-01 07:00:00 -0500"/>
      <Record type="HKQuantityTypeIdentifierRestingHeartRate" value="55"
              unit="count/min" startDate="2025-06-01 22:00:00 -0500"/>
      <Record type="HKQuantityTypeIdentifierOxygenSaturation" value="0.97"
              unit="%" startDate="2025-06-01 07:00:00 -0500"/>
      <Record type="HKQuantityTypeIdentifierOxygenSaturation" value="0.99"
              unit="%" startDate="2025-06-01 08:00:00 -0500"/>
      <Record type="HKQuantityTypeIdentifierBodyMass" value="80"
              unit="kg" startDate="2025-06-01 07:00:00 -0500"
              sourceName="Hume Pod"/>
      <Record type="HKQuantityTypeIdentifierBodyFatPercentage" value="0.185"
              unit="%" startDate="2025-06-01 07:00:00 -0500"/>
      <Record type="HKCategoryTypeIdentifierMindfulSession"
              startDate="2025-06-01 06:00:00 -0500"
              endDate="2025-06-01 06:12:30 -0500"/>
      <Record type="HKCategoryTypeIdentifierMindfulSession"
              startDate="2025-06-01 21:00:00 -0500"
              endDate="2025-06-01 21:10:00 -0500"/>
      <Record type="HKQuantityTypeIdentifierRestingHeartRate" value="48"
              unit="count/min" startDate="2025-05-01 07:00:00 -0500"/>
      <Workout workoutActivityType="HKWorkoutActivityTypeRunning"
               duration="42.5" totalDistance="5" totalDistanceUnit="km"
               sourceName="Apple Watch"
               startDate="2025-06-01 18:00:00 -0500"
               endDate="2025-06-01 18:45:00 -0500">
        <WorkoutStatistics type="HKQuantityTypeIdentifierHeartRate"
                           average="152.4"/>
        <WorkoutStatistics
            type="HKQuantityTypeIdentifierActiveEnergyBurned" sum="401.7"/>
      </Workout>
      <Workout workoutActivityType="HKWorkoutActivityTypeCycling"
               duration="30" sourceName="Peloton App"
               startDate="2025-06-02 18:00:00 -0500"
               endDate="2025-06-02 18:30:00 -0500"/>
    </HealthData>"""
    p = tmp_path / "export.xml"
    p.write_text(xml)
    parsed = parse_export(p, since="2025-06-01")
    vit = parsed["daily_vitals"]
    assert len(vit) == 1  # the May record is filtered by --since
    assert vit[0]["resting_heart_rate_bpm"] == 55  # "last" policy
    assert vit[0]["blood_oxygen_pct"] == 98.0  # "mean" + fraction→pct
    b = parsed["body"][0]
    assert b["weight_lbs"] == round(80 * 2.20462, 1)  # ref 1-dp rounding
    assert b["body_fat_pct"] == 18.5  # fraction → pct
    assert b["device_name"] == "Hume Pod"
    # Mindfulness comes from MindfulSession Records (start→end), not
    # from any workout heuristic (ref parse :360-368)
    m = parsed["mindfulness"][0]
    assert m["duration_minutes"] == 22.5 and m["session_count"] == 2
    assert len(parsed["workouts"]) == 1  # Peloton filtered at parse
    w = parsed["workouts"][0]
    assert w["workout_type"] == "running"
    assert w["distance_mi"] == round(5 * 0.621371, 2)
    assert w["avg_heart_rate"] == 152  # WorkoutStatistics average
    assert w["calories_burned"] == 402  # ActiveEnergyBurned fallback
    assert w["start_time"] == "2025-06-01T18:00:00-05:00"
    counts = write_bronze_csvs(parsed, tmp_path / "bronze")
    assert counts["daily_vitals"] == 1
    assert (tmp_path / "bronze/healthkit/daily_vitals/year=2025/month=06"
            / "day=01/daily_vitals.csv").exists()


# -- REST source (S11): fake client → landing zone → normalizer -------------


def test_rest_source_feeds_normalizer(spark, tmp_path):
    from bio_lakehouse_spark.bio.silver import normalize_oura_readiness
    from bio_lakehouse_spark.sources.rest_source import (
        fake_oura_client,
        ingest,
        parse_json_payload,
    )

    counts = ingest(fake_oura_client(), tmp_path, "2025-06-01", "2025-06-10")
    assert counts == {"readiness": 10, "sleep": 10, "activity": 10}
    # ref layout: daily<type>.csv per day partition (handler.py:40-63)
    assert (tmp_path / "oura/readiness/year=2025/month=06/day=03"
            / "dailyreadiness.csv").exists()
    df = normalize_oura_readiness(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 10
    assert all(r["score"] is not None for r in rows)
    assert parse_json_payload('{"a": 1}') == [{"a": 1}]
    assert parse_json_payload('[{"a": 1}, {"a": 2}]') == [{"a": 1}, {"a": 2}]


def test_rest_source_fault_isolation_and_pagination(tmp_path):
    from bio_lakehouse_spark.sources.rest_source import (
        fake_oura_client,
        paginate,
        process_date_range,
    )

    real = fake_oura_client()

    # one endpoint's auth failure must not block the others
    # (ref handler.py:115-127); auth errors are not retried
    calls = {"readiness": 0}

    def flaky(endpoint, start, end):
        if endpoint == "readiness":
            calls["readiness"] += 1
            raise ValueError("401 Unauthorized")
        if endpoint == "sleep":
            return []
        return real(endpoint, start, end)

    results = {r["type"]: r for r in
               process_date_range(flaky, tmp_path, "2025-06-01", "2025-06-03")}
    assert results["readiness"]["status"] == "auth_error"
    assert calls["readiness"] == 1  # permanent error: single attempt
    assert results["sleep"] == {
        "type": "sleep", "status": "no_data", "records": 0}
    assert results["activity"]["status"] == "success"
    assert results["activity"]["records"] == 3

    # r11 (ADVICE r10): an explicit "day": null used to put a None
    # key in the per-day map and crash day.split('-'), flipping the
    # whole endpoint to 'error' AFTER some per-day files were
    # written. Null/malformed days now fall back to the start date.
    def nullday(endpoint, start, end):
        if endpoint != "activity":
            return []
        return [
            {"day": None, "score": "1"},
            {"day": "junk-day", "score": "2"},
            {"day": "2025-06-02", "score": "3"},
        ]

    land2 = tmp_path / "nullday"
    res2 = {r["type"]: r for r in
            process_date_range(nullday, land2, "2025-06-01", "2025-06-03")}
    assert res2["activity"]["status"] == "success"
    assert res2["activity"]["records"] == 3
    # null + malformed days land under the start-date partition
    assert (land2 / "oura/activity/year=2025/month=06/day=01"
            / "dailyactivity.csv").exists()
    assert (land2 / "oura/activity/year=2025/month=06/day=02"
            / "dailyactivity.csv").exists()

    # next_token pagination drains every page (ref oura_client.py:38-70)
    pages = [([{"day": "2025-06-01"}], "t1"),
             ([{"day": "2025-06-02"}], "t2"),
             ([{"day": "2025-06-03"}], None)]

    def fetch_page(endpoint, start, end, token):
        idx = {None: 0, "t1": 1, "t2": 2}[token]
        return pages[idx]

    got = paginate(fetch_page, "activity", "2025-06-01", "2025-06-03")
    assert [r["day"] for r in got] == ["2025-06-01", "2025-06-02", "2025-06-03"]


# -- FHIR (S16) -------------------------------------------------------------


def test_fhir_bundle(spark):
    from bio_lakehouse_spark.bio.gold import build_gold
    from bio_lakehouse_spark.products import fhir

    gold = build_gold(spark, f"{BIO_ROOT}/silver")["gold_daily_rollup"]
    bundle = fhir.build_bundle(gold.limit(5))
    assert bundle["resourceType"] == "Bundle"
    assert bundle["entry"][0]["resource"]["resourceType"] == "Patient"
    obs = [e["resource"] for e in bundle["entry"][1:]]
    assert obs, "expected at least one observation"
    for o in obs[:10]:
        fhir.validate_observation(o)
        assert o["code"]["coding"][0]["system"] == "http://loinc.org"
    # deterministic ids: same inputs, same uuid
    a = fhir.deterministic_fhir_id("s", "heart_rate", "2025-06-01")
    b = fhir.deterministic_fhir_id("s", "heart_rate", "2025-06-01")
    c = fhir.deterministic_fhir_id("s", "heart_rate", "2025-06-02")
    assert a == b != c
    with pytest.raises(ValueError, match="missing required"):
        fhir.validate_observation({"resourceType": "Observation"})


def test_morning_briefing_fresh_and_stale(spark, tmp_path):
    """Morning briefing (ref lambda/morning_briefing/handler.py):
    fresh gold → 4+ numbered bullets with vitals, energy guidance,
    workout recommendation and TSS context; stale gold → the
    DATA STALE alert; discovery runs table feeds bullet 5."""
    from bio_lakehouse_spark.bio.gold import build_gold
    from bio_lakehouse_spark.products import briefing, discovery

    gold = build_gold(spark, f"{BIO_ROOT}/silver")["gold_daily_rollup"]
    latest = gold.agg(F.max("date")).collect()[0][0]

    # Fresh: as_of the day after the newest gold row.
    import datetime

    as_of = (
        datetime.date.fromisoformat(str(latest)[:10])
        + datetime.timedelta(days=1)
    ).isoformat()
    # Persisted-runs table with one finding (the fixture gold has no
    # significant non-trivial correlation, so plant the payload the
    # discover() sink writes — same schema).
    payload = json.dumps(
        {
            "run_date": as_of,
            "correlations": [
                {"metric_a": "sleep_score", "metric_b": "readiness_score",
                 "lag": 1, "rho": 0.62, "strength": "strong"}
            ],
        }
    )
    runs = spark.createDataFrame(
        [(as_of, 150, payload)],
        schema="run_date string, total_rows long, payload string",
    )
    # discover()'s own sink writes the identical schema — round-trip it.
    run_path = str(tmp_path / "runs")
    discovery.discover(
        gold, ["readiness_score", "sleep_score", "total_output_kj"],
        run_date=as_of, persist_path=run_path,
    )
    assert spark.read.parquet(run_path).columns == runs.columns
    date_str, bullets = briefing.build_briefing(
        gold, as_of=as_of, discovery_runs=runs
    )
    assert date_str == str(latest)
    assert len(bullets) >= 4
    assert bullets[0].startswith("Readiness ")
    assert "RHR" in bullets[0] and "HRV" in bullets[0]
    assert bullets[1].startswith("Energy: ")
    assert bullets[2].startswith("Workout: ")
    assert any(b.startswith("Yesterday's TSS") for b in bullets)
    assert any(b.startswith("Discovery: ") for b in bullets)

    text = briefing.render_briefing(date_str, bullets, as_of=as_of)
    assert "Morning Briefing" in text and "1. " in text
    out = briefing.publish_briefing(text, tmp_path / "briefing.txt")
    assert "bio-optimization" in open(out).read()

    # Stale: as_of far past the newest row → alert, not a briefing.
    date_str, bullets = briefing.build_briefing(gold, as_of="2030-01-01")
    assert any("DATA STALE" in b for b in bullets)
    assert "Action needed" in bullets[1]
    assert "STALE DATA" in briefing.render_briefing(date_str, bullets)


def test_energy_guidance_states_and_trend():
    from bio_lakehouse_spark.products.briefing import energy_guidance

    got = energy_guidance(
        {"energy_state": "peak", "readiness_score": 92, "sleep_score": 90,
         "hrv_balance": 80, "readiness_delta": 6, "sleep_delta": 0,
         "readiness_3day_avg": 88}
    )
    assert "All systems go" in got
    assert "readiness up +6" in got
    assert "ride the wave" in got
    got = energy_guidance(
        {"energy_state": "recovery_needed", "readiness_score": 40,
         "sleep_score": 45, "readiness_delta": -8, "sleep_delta": -6,
         "readiness_3day_avg": 50}
    )
    assert "Rest day recommended" in got
    assert "readiness down -8" in got and "sleep down -6" in got
    assert "prioritize recovery" in got


def test_gbm_beats_ridge_on_nonlinear_signal():
    """Planted step×interaction signal: GBM (axis-aligned splits) must
    beat ridge under identical walk-forward folds, and the full-data
    GBM importances must concentrate on the two true features."""
    rng = np.random.RandomState(3)
    n = 160
    X = rng.uniform(0, 1, (n, 4))
    y = (
        10.0 * (X[:, 0] > 0.5)
        + 6.0 * (X[:, 1] > 0.3) * (X[:, 0] > 0.5)
        + rng.normal(0, 0.3, n)
    )
    zoo = numerics.model_zoo_cv(
        X, y, ["a", "b", "noise1", "noise2"],
        min_train=60, test_window=10,
    )
    assert zoo["models"]["gbm"]["mae"] < zoo["models"]["ridge"]["mae"]
    assert zoo["models"]["gbm"]["mae"] < zoo["models"]["gbm"]["naive_mae"]
    assert zoo["best_model"] == "gbm"
    imp = dict(zoo["importances"])
    assert imp["a"] + imp["b"] > 0.9
    assert imp["a"] > imp["noise1"] and imp["b"] > imp["noise2"]


def test_elastic_net_recovers_sparse_coefficients():
    rng = np.random.RandomState(4)
    n = 200
    X = rng.normal(0, 1, (n, 5))
    y = 3.0 * X[:, 0] - 2.0 * X[:, 2] + rng.normal(0, 0.1, n)
    w = numerics.elastic_net_cd(X, y, alpha=0.01, l1_ratio=0.5)
    assert w[0] == pytest.approx(3.0, abs=0.2)
    assert w[2] == pytest.approx(-2.0, abs=0.2)
    assert abs(w[1]) < 0.1 and abs(w[3]) < 0.1 and abs(w[4]) < 0.1
    pred = X @ w[:-1] + w[-1]
    assert float(np.abs(pred - y).mean()) < 0.3


def test_gbm_fit_predict_reduces_training_error():
    rng = np.random.RandomState(5)
    X = rng.uniform(-2, 2, (120, 2))
    y = np.sin(X[:, 0] * 2) * 3 + X[:, 1] ** 2
    m = numerics.gbm_fit(X, y, n_estimators=80, max_depth=3,
                         min_samples_leaf=5)
    mae = float(np.abs(numerics.gbm_predict(m, X) - y).mean())
    base = float(np.abs(y - y.mean()).mean())
    assert mae < base / 4
    assert sum(m["importances"]) == pytest.approx(1.0)


def test_lowess_reproduces_exact_line():
    """Local LINEAR regression reproduces a linear function exactly,
    whatever the tricube weights — a sharp value gate for ST8."""
    x = np.arange(50, dtype=float)
    y = 2.5 * x - 7.0
    fit = numerics.lowess(x, y, frac=0.4)
    assert np.allclose(fit, y, atol=1e-8)


def test_walk_forward_cv_model_dispatch_matches_ridge_default():
    rng = np.random.RandomState(6)
    X = rng.normal(0, 1, (80, 3))
    y = X @ np.array([1.0, -2.0, 0.5]) + rng.normal(0, 0.2, 80)
    a = numerics.walk_forward_cv(X, y, min_train=30, test_window=7)
    b = numerics.walk_forward_cv(X, y, min_train=30, test_window=7,
                                 model="ridge")
    assert a["mae"] == b["mae"]
    en = numerics.walk_forward_cv(X, y, min_train=30, test_window=7,
                                  model="elastic_net")
    assert en["mae"] < en["naive_mae"]


def test_model_zoo_report_on_fixture_gold(spark):
    """The reference trainer's model comparison (naive + ridge +
    elastic_net + gbm, walk-forward) on the fixture feature table —
    every model produces a finite MAE, the report names a best model,
    and importances cover the feature set (ref models/
    readiness_predictor/train.py:95-464)."""
    from bio_lakehouse_spark.bio.gold import build_gold

    feat = (
        build_gold(spark, f"{BIO_ROOT}/silver")["feature_readiness_daily"]
        .filter(F.col("next_day_readiness").isNotNull())
        .orderBy("date")
    )
    names = ["readiness_score", "sleep_score", "hrv_ms", "tss",
             "readiness_7d_avg", "sleep_score_3d_avg"]
    pdf = feat.select(*names, "next_day_readiness").toPandas()
    X = pdf[names].to_numpy(dtype=float)
    y = pdf["next_day_readiness"].to_numpy(dtype=float)
    zoo = numerics.model_zoo_cv(X, y, names, min_train=60, test_window=14)
    for name, m in zoo["models"].items():
        assert m["mae"] is not None and np.isfinite(m["mae"]), name
        assert m["n_folds"] >= 3
    assert zoo["best_model"] in zoo["models"]
    imp = dict(zoo["importances"])
    assert set(imp) == set(names)
    assert all(v >= 0 for v in imp.values())


def test_mi_audit_query_matches_numerics(spark):
    """The SQL-expressible MI audit must equal
    numerics.mutual_information on the same daily pairs — pinning the
    np.histogram2d binning semantics the SQL mirrors."""
    from bio_lakehouse_spark.suite.registry import REGISTRY, load

    sf = "/root/testdata/sf0.01"
    got = REGISTRY["mutual_information_audit"].fn(spark, sf).collect()[0]
    daily = (
        load(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("date"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("x"),
            F.round(F.sum("value"), 6).alias("y"),
        )
        .toPandas()
    )
    expect = numerics.mutual_information(
        daily["x"].to_numpy(), daily["y"].to_numpy(), bins=8
    )
    assert got["mi"] == pytest.approx(expect, abs=1e-6)
    assert got["n_days"] == len(daily)


def test_redact_pii_patterns(spark):
    from bio_lakehouse_spark.operators.textops import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.co.uk or call (555) 123-4567, "
             "ssn 123-45-6789, host 10.0.255.7 end")],
        schema="id long, t string",
    )
    red = redact_pii("t")
    row = df.select(
        red["n_email"].alias("e"), red["n_phone"].alias("p"),
        red["n_ssn"].alias("s"), red["n_ipv4"].alias("ip"),
        red["redacted"].alias("r"),
    ).collect()[0]
    assert (row["e"], row["p"], row["s"], row["ip"]) == (1, 1, 1, 1)
    assert "<EMAIL>" in row["r"] and "<PHONE>" in row["r"]
    assert "<SSN>" in row["r"] and "<IP>" in row["r"]
    assert "a.b+c@" not in row["r"] and "123-45-6789" not in row["r"]
    assert row["r"].startswith("mail ") and row["r"].endswith(" end")


def test_ingestion_routing_and_header_validation(tmp_path):
    """Ingestion-trigger parity (ref lambda/ingestion_trigger): source
    detection by path prefix, header validation under the SYNC'd
    snake_case rule, drift alert with cooldown, arrival debounce."""
    from bio_lakehouse_spark.products import pipeline as P

    p = tmp_path / "peloton" / "workouts.csv"
    p.parent.mkdir(parents=True)
    p.write_text(
        "Workout Timestamp,Fitness Discipline,Total Output,"
        "Calories Burned,New Mystery Col\n2025-01-01,cycling,100,300,x\n"
    )
    assert P.detect_source(str(p)) == "peloton"
    assert P.detect_source("/x/unknown.csv") == "unknown"

    alerts = []
    check = P.validate_csv_headers(
        p, "peloton", alert_sink=lambda s, b: alerts.append(s), now=1000.0
    )
    assert check["valid"]  # all expected headers present
    assert check["unexpected_headers"] == ["new_mystery_col"]
    assert alerts == ["Schema drift detected: peloton"]
    # cooldown: second validation within 6h does not re-alert
    P.validate_csv_headers(
        p, "peloton", alert_sink=lambda s, b: alerts.append(s), now=2000.0
    )
    assert len(alerts) == 1

    # routing verdicts: ingest, then debounced skip
    r1 = P.route_file(p, now=3000.0)
    assert r1["action"] == "ingest" and r1["source"] == "peloton"
    r2 = P.route_file(p, now=3100.0)
    assert r2 == {"action": "skip", "reason": "recently_processed",
                  "source": "peloton"}
    # missing required header → invalid
    bad = tmp_path / "peloton" / "bad.csv"
    bad.write_text("Workout Timestamp,Fitness Discipline\n2025,x\n")
    r3 = P.route_file(bad, now=9000.0)
    assert r3["action"] == "skip" and r3["reason"] == "invalid_headers"
    assert "total_output" in r3["validation"]["missing_headers"]


def test_run_daily_pipeline_end_to_end(spark, tmp_path):
    """Orchestrator parity (ref lambda/pipeline_orchestrator): silver →
    gold → views → briefing chained with per-stage status; a failed
    stage stops the chain with failed status."""
    from bio_lakehouse_spark.products import pipeline as P

    res = P.run_daily_pipeline(
        spark,
        bronze_root=f"{BIO_ROOT}/bronze",
        silver_root=str(tmp_path / "silver"),
        gold_root=str(tmp_path / "gold"),
        briefing_path=str(tmp_path / "briefing.txt"),
        as_of="2030-01-01",  # stale vs fixture → briefing still builds
    )
    assert res["status"] == "complete", res
    assert [s["stage"] for s in res["stages"]] == [
        "silver", "gold", "views", "briefing"
    ]
    assert all(s["ok"] for s in res["stages"])
    assert "DATA STALE" in open(tmp_path / "briefing.txt").read()

    # broken bronze → silver stage fails, chain stops
    res2 = P.run_daily_pipeline(
        spark,
        bronze_root=str(tmp_path / "nonexistent"),
        silver_root=str(tmp_path / "s2"),
    )
    assert res2["status"] == "failed"
    assert res2["failed_stage"] == "silver"
    assert len(res2["stages"]) == 1


def test_check_pipeline_health(spark):
    from bio_lakehouse_spark.products.pipeline import check_pipeline_health

    # as_of pinned one day after the fixture's newest data → healthy.
    import datetime

    silver = f"{BIO_ROOT}/silver"
    latest = spark.read.parquet(f"{silver}/oura_daily_readiness").agg(
        F.max("day")
    ).collect()[0][0]
    fresh = (
        datetime.date.fromisoformat(str(latest)[:10])
        + datetime.timedelta(days=1)
    ).isoformat()
    res = check_pipeline_health(spark, silver, as_of=fresh)
    assert res["healthy"], res["stale_tables"]
    assert res["tables"]["silver.oura_daily_readiness"]["rows"] > 0
    # far-future as_of → everything dated goes stale
    res2 = check_pipeline_health(spark, silver, as_of="2031-01-01")
    assert not res2["healthy"]
    assert "silver.oura_daily_readiness" in res2["stale_tables"]


def _alert_gold(spark, rhr_last=55.0, hrv_last=60.0, readiness=None):
    """30 normal days (RHR 55±~1, HRV 60±~2) then a final day whose
    vitals/readiness the test controls — the crafted-frame pattern of
    the reference's per-condition alert tests (ref tests/
    test_health_alerts.py:56-181)."""
    import datetime

    rows = []
    d0 = datetime.date(2025, 6, 1)
    for i in range(30):
        rows.append((
            (d0 + datetime.timedelta(days=i)).isoformat(),
            55.0 + (i % 3) - 1,          # rhr: 54/55/56
            60.0 + (i % 5) - 2,          # hrv: 58..62
            80.0,
        ))
    rs = readiness or [80.0, 80.0, 80.0]
    for j, r in enumerate(rs):
        rows.append((
            (d0 + datetime.timedelta(days=30 + j)).isoformat(),
            rhr_last if j == len(rs) - 1 else 55.0,
            hrv_last if j == len(rs) - 1 else 60.0,
            r,
        ))
    return spark.createDataFrame(
        rows,
        schema="date string, resting_heart_rate_bpm double, "
               "hrv_ms double, readiness_score double",
    )


def _risk(spark, level="low_risk"):
    return spark.createDataFrame(
        [("2025-07-03", level)],
        schema="date string, overtraining_risk string",
    )


@pytest.mark.heavy  # 49 s
def test_alert_conditions_trigger_individually(spark):
    from bio_lakehouse_spark.products.alerts import check_alerts

    # Elevated RHR: final-day RHR far above the 30-day norm.
    a = check_alerts(_alert_gold(spark, rhr_last=70.0), _risk(spark))
    assert [x["condition"] for x in a] == ["Elevated Resting Heart Rate"]
    assert a[0]["severity"] == "warning" and "70 bpm" in a[0]["message"]

    # Depressed HRV.
    a = check_alerts(_alert_gold(spark, hrv_last=40.0), _risk(spark))
    assert [x["condition"] for x in a] == ["Depressed HRV"]

    # High overtraining risk → critical.
    a = check_alerts(_alert_gold(spark), _risk(spark, "high_risk"))
    assert [x["condition"] for x in a] == ["High Overtraining Risk"]
    assert a[0]["severity"] == "critical"

    # Readiness declining 3 days in a row → info.
    a = check_alerts(
        _alert_gold(spark, readiness=[85.0, 75.0, 65.0]), _risk(spark)
    )
    assert [x["condition"] for x in a] == ["Readiness Declining"]
    assert "85 -> 75 -> 65" in a[0]["message"]

    # All normal → no alerts.
    assert check_alerts(_alert_gold(spark), _risk(spark)) == []

    # Multiple conditions can stack.
    a = check_alerts(
        _alert_gold(spark, rhr_last=70.0, hrv_last=40.0,
                    readiness=[85.0, 75.0, 65.0]),
        _risk(spark, "high_risk"),
    )
    assert {x["condition"] for x in a} == {
        "Elevated Resting Heart Rate", "Depressed HRV",
        "High Overtraining Risk", "Readiness Declining",
    }


def test_route_file_semicolon_and_real_bronze(tmp_path):
    """Semicolon-delimited files sniff correctly (ref test_ingestion
    semicolon detection), and the real bronze fixtures route as
    valid ingests for their sources."""
    from bio_lakehouse_spark.products import pipeline as P

    p = tmp_path / "oura" / "readiness" / "data.csv"
    p.parent.mkdir(parents=True)
    p.write_text("id;day;score;timestamp\n1;2025-01-01;80;t\n")
    r = P.route_file(p, now=50_000.0)
    assert r["action"] == "ingest" and r["source"] == "oura/readiness"
    assert r["validation"]["header_count"] == 4

    import glob

    real = sorted(glob.glob(f"{BIO_ROOT}/bronze/oura/readiness/**/*.csv",
                            recursive=True))[:1]
    assert real
    r2 = P.route_file(real[0], now=60_000.0)
    assert r2["action"] == "ingest", r2


def test_ridge_audit_matches_closed_form(spark, sf_dir):
    """The SQL-expressible 2×2 centered normal equations in
    ridge_normal_equation_audit must equal numerics.ridge_closed_form
    (raw X + unpenalized intercept column) — the intercept-unpenalized
    ridge separates into centered slopes + mean-recovered intercept."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bio_lakehouse_spark.suite.registry import REGISTRY, load

    row = (
        REGISTRY["ridge_normal_equation_audit"].fn(spark, sf_dir)
        .collect()[0]
    )
    d = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("date"))
        .agg(
            F.round(F.sum("value"), 6).alias("total_value"),
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            "n_events", "avg_value",
            F.lead("total_value").over(Window.orderBy("date")).alias("y"),
        )
        .filter(F.col("y").isNotNull())
        .toPandas()
    )
    X = d[["n_events", "avg_value"]].to_numpy(dtype=float)
    y = d["y"].to_numpy(dtype=float)
    beta = numerics.ridge_closed_form(X, y, alpha=1.0)
    assert row["n"] == len(d)
    assert row["beta_n_events"] == pytest.approx(beta[0], abs=2e-6)
    assert row["beta_avg_value"] == pytest.approx(beta[1], abs=2e-6)
    assert row["intercept"] == pytest.approx(beta[2], abs=2e-6)


def test_distributed_lowess_exact_line(spark, tmp_path):
    """Property: tricube-weighted local LINEAR fit reproduces exactly
    linear data, whatever the weights — the distributed
    lowess_daily_trend must return fit == value on a linear daily
    series (same invariant test_lowess_reproduces_exact_line pins for
    the numpy smoother)."""
    from pyspark.sql import functions as F

    from bio_lakehouse_spark.suite.registry import REGISTRY

    days = spark.range(40).select(
        F.col("id").alias("event_id"),
        (F.lit(100000) + F.col("id")).alias("user_id"),
        F.lit("view").alias("event_type"),
        F.to_timestamp(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int"))
        ).alias("ts"),
        (2.0 * F.col("id") + 5.0).alias("value"),
    )
    days.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = REGISTRY["lowess_daily_trend"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 40
    for r in out:
        assert r["lowess_fit"] == pytest.approx(r["daily_value"], abs=1e-5)


def test_preclose_check_lists_tiers():
    """tools/preclose_check.py --list must run standalone and report
    both tiers (the round-close stale-green gate; git-commit-time
    based so a fresh checkout doesn't flag the whole registry)."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "preclose_check.py"),
         "--list"],
        capture_output=True, text=True, timeout=300, cwd=root,
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "tier0_never_green:" in out.stdout
    assert "tier1_module_changed:" in out.stdout
