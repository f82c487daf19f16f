"""Golden differential: the bio gold tables + all 11 analytics views
computed two independent ways over the same silver parquet —
(a) our DataFrame implementations (bio.gold / bio.views) and
(b) DuckDB running near-verbatim translations of the reference's dbt
SQL (models/gold/*.sql, models/features/*.sql, models/analytics/*.sql;
dialect edits: TRY(CAST)→TRY_CAST, day_of_week→isodow,
LAST_VALUE IGNORE NULLS→max_by(col, reading_seq) FILTER, set
aggregates sorted).

Any drift in join semantics, window frames, banding edges, or null
handling shows up as a value mismatch.
"""

from __future__ import annotations

import duckdb
import pytest

from bio_lakehouse_spark.bio.silver import SILVER_TABLES
from tests.oracle_harness import compare

BIO_ROOT = "/root/repo/.fixtures/bio"

_SAFE_DATE = (
    "COALESCE(TRY_CAST({d} AS DATE), "
    "CAST(try_strptime({d}, '%Y-%m-%d %H:%M:%S') AS DATE))"
)

GOLD_SQL = """
CREATE OR REPLACE TEMP TABLE gold_oracle AS
WITH readiness AS (
  SELECT day AS date, score AS readiness_score,
         contributors_hrv_balance AS hrv_balance_score,
         contributors_resting_heart_rate AS resting_hr_score,
         contributors_previous_night AS previous_night_score,
         contributors_recovery_index AS recovery_index_score,
         temperature_deviation
  FROM sv_oura_daily_readiness
), sleep AS (
  SELECT day AS date, score AS sleep_score,
         contributors_deep_sleep AS deep_sleep_score,
         contributors_rem_sleep AS rem_sleep_score,
         contributors_efficiency AS sleep_efficiency_score,
         contributors_total_sleep AS total_sleep_score
  FROM sv_oura_daily_sleep
), activity AS (
  SELECT day AS date, score AS activity_score, active_calories, steps,
         total_calories
  FROM sv_oura_daily_activity
), peloton AS (
  SELECT strftime(workout_date, '%Y-%m-%d') AS date,
         COUNT(*) AS workout_count,
         SUM(total_output_kj) AS total_output_kj,
         SUM(calories_burned) AS peloton_calories,
         AVG(avg_watts) AS avg_watts,
         MAX(avg_heartrate) AS max_avg_hr,
         AVG(output_per_minute) AS avg_output_per_minute,
         string_agg(DISTINCT workout_category, ',' ORDER BY workout_category) AS workout_categories,
         SUM(length_minutes) AS total_workout_minutes,
         string_agg(DISTINCT fitness_discipline, ',' ORDER BY fitness_discipline) AS disciplines
  FROM sv_peloton_workouts GROUP BY 1
), hk_vitals_deduped AS (
  SELECT date,
         max_by(resting_heart_rate_bpm, reading_seq)
           FILTER (WHERE resting_heart_rate_bpm IS NOT NULL) AS resting_heart_rate_bpm,
         max_by(hrv_ms, reading_seq) FILTER (WHERE hrv_ms IS NOT NULL) AS hrv_ms,
         max_by(vo2_max, reading_seq) FILTER (WHERE vo2_max IS NOT NULL) AS vo2_max,
         AVG(blood_oxygen_pct) AS blood_oxygen_pct,
         AVG(respiratory_rate) AS respiratory_rate
  FROM sv_healthkit_daily_vitals GROUP BY date
), hk_workouts AS (
  SELECT date, COUNT(*) AS hk_workout_count,
         SUM(calories_burned) AS hk_calories,
         SUM(duration_minutes) AS hk_workout_minutes,
         string_agg(DISTINCT workout_category, ',' ORDER BY workout_category) AS hk_workout_categories,
         string_agg(DISTINCT workout_type, ',' ORDER BY workout_type) AS hk_workout_types
  FROM sv_healthkit_workouts GROUP BY date
), hk_body_deduped AS (
  SELECT date,
         max_by(weight_lbs, reading_seq) FILTER (WHERE weight_lbs IS NOT NULL) AS weight_lbs,
         max_by(body_fat_pct, reading_seq) FILTER (WHERE body_fat_pct IS NOT NULL) AS body_fat_pct,
         max_by(bmi, reading_seq) FILTER (WHERE bmi IS NOT NULL) AS bmi,
         max_by(lean_body_mass_lbs, reading_seq) FILTER (WHERE lean_body_mass_lbs IS NOT NULL) AS lean_body_mass_lbs
  FROM sv_healthkit_body GROUP BY date
), hk_mindfulness AS (
  SELECT date, SUM(duration_minutes) AS mindfulness_minutes,
         SUM(session_count) AS mindfulness_session_count
  FROM sv_healthkit_mindfulness GROUP BY date
), nutrition AS (
  SELECT date, calories AS daily_calories, protein_g,
         carbohydrates_g AS carbs_g, fat_g, fiber_g, sugar_g, sodium_mg,
         protein_pct, carb_pct, fat_pct, meal_count
  FROM sv_mfp_daily_nutrition
), joined AS (
  SELECT COALESCE(r.date, s.date, a.date, p.date, v.date) AS date,
         r.readiness_score, r.hrv_balance_score, r.resting_hr_score,
         r.previous_night_score, r.recovery_index_score,
         r.temperature_deviation,
         s.sleep_score, s.deep_sleep_score, s.rem_sleep_score,
         s.sleep_efficiency_score, s.total_sleep_score,
         a.activity_score, a.active_calories, a.steps, a.total_calories,
         p.workout_count, p.total_output_kj, p.peloton_calories,
         p.avg_watts, p.max_avg_hr, p.avg_output_per_minute,
         p.workout_categories, p.total_workout_minutes, p.disciplines,
         v.resting_heart_rate_bpm, v.hrv_ms, v.vo2_max,
         v.blood_oxygen_pct, v.respiratory_rate,
         hw.hk_workout_count, hw.hk_calories, hw.hk_workout_minutes,
         hw.hk_workout_categories, hw.hk_workout_types,
         b.weight_lbs, b.body_fat_pct, b.bmi, b.lean_body_mass_lbs,
         m.mindfulness_minutes, m.mindfulness_session_count,
         n.daily_calories, n.protein_g, n.carbs_g, n.fat_g, n.fiber_g,
         n.sugar_g, n.sodium_mg, n.protein_pct, n.carb_pct, n.fat_pct,
         n.meal_count
  FROM readiness r
  FULL OUTER JOIN sleep s ON r.date = s.date
  FULL OUTER JOIN activity a ON COALESCE(r.date, s.date) = a.date
  FULL OUTER JOIN peloton p ON COALESCE(r.date, s.date, a.date) = p.date
  FULL OUTER JOIN hk_vitals_deduped v
    ON COALESCE(r.date, s.date, a.date, p.date) = v.date
  LEFT JOIN hk_workouts hw
    ON COALESCE(r.date, s.date, a.date, p.date, v.date) = hw.date
  LEFT JOIN hk_body_deduped b
    ON COALESCE(r.date, s.date, a.date, p.date, v.date) = b.date
  LEFT JOIN hk_mindfulness m
    ON COALESCE(r.date, s.date, a.date, p.date, v.date) = m.date
  LEFT JOIN nutrition n
    ON COALESCE(r.date, s.date, a.date, p.date, v.date) = n.date
)
SELECT *,
  CASE WHEN readiness_score IS NOT NULL AND readiness_score > 0
            AND total_output_kj IS NOT NULL
       THEN ROUND(CAST(total_output_kj AS DOUBLE) / readiness_score, 2)
  END AS readiness_to_output_ratio,
  CASE WHEN readiness_score IS NOT NULL AND sleep_score IS NOT NULL
       THEN ROUND(readiness_score * 0.6 + sleep_score * 0.4, 1)
       ELSE CAST(COALESCE(readiness_score, sleep_score) AS DOUBLE)
  END AS combined_wellness_score,
  COALESCE(workout_count, 0) + COALESCE(hk_workout_count, 0) AS total_workout_count,
  CAST(COALESCE(peloton_calories, 0) + COALESCE(hk_calories, 0)
       AS BIGINT) AS total_calories_all_sources,
  COALESCE(total_workout_minutes, 0) + COALESCE(hk_workout_minutes, 0) AS total_workout_minutes_all,
  COALESCE(workout_count, 0) + COALESCE(hk_workout_count, 0) > 0 AS had_workout,
  CASE WHEN readiness_score IS NOT NULL AND sleep_score IS NOT NULL
            AND mindfulness_minutes IS NOT NULL AND mindfulness_minutes > 0
       THEN LEAST(ROUND(readiness_score * 0.6 + sleep_score * 0.4
                        + LEAST(mindfulness_minutes / 10.0, 3.0), 1), 100.0)
       WHEN readiness_score IS NOT NULL AND sleep_score IS NOT NULL
       THEN ROUND(readiness_score * 0.6 + sleep_score * 0.4, 1)
       ELSE CAST(COALESCE(readiness_score, sleep_score) AS DOUBLE)
  END AS mindfulness_adjusted_wellness,
  CASE WHEN protein_g IS NOT NULL AND weight_lbs IS NOT NULL AND weight_lbs > 0
       THEN ROUND(CAST(protein_g AS DOUBLE) / weight_lbs, 2)
  END AS protein_per_lb,
  SUBSTRING(date, 1, 4) AS year,
  SUBSTRING(date, 6, 2) AS month
FROM joined
WHERE date IS NOT NULL
"""

_TSS = """
CASE
  WHEN had_workout = false THEN 0.0
  WHEN total_output_kj IS NOT NULL AND total_output_kj > 0
    THEN LEAST(300.0, total_output_kj * COALESCE(max_avg_hr, 140) / 600.0)
  WHEN peloton_calories IS NOT NULL AND peloton_calories > 0
       AND total_workout_minutes IS NOT NULL AND total_workout_minutes > 0
    THEN LEAST(300.0, peloton_calories * total_workout_minutes / 150.0)
  WHEN active_calories IS NOT NULL AND active_calories > 0
       AND total_workout_minutes IS NOT NULL AND total_workout_minutes > 0
    THEN LEAST(300.0, active_calories * total_workout_minutes / 450.0)
  WHEN hk_calories IS NOT NULL AND hk_calories > 0
       AND hk_workout_minutes IS NOT NULL AND hk_workout_minutes > 0
    THEN LEAST(300.0, hk_calories * hk_workout_minutes / 450.0)
  WHEN active_calories IS NOT NULL AND active_calories > 0
    THEN LEAST(200.0, active_calories / 12.0)
  ELSE 0.0
END
"""

FEATURES_SQL = f"""
WITH with_tss AS (
  SELECT *, {_TSS} AS tss FROM gold_oracle WHERE date IS NOT NULL
), with_features AS (
  SELECT date, readiness_score, sleep_score,
    CAST(deep_sleep_score AS DOUBLE) AS deep_sleep_score,
    CAST(rem_sleep_score AS DOUBLE) AS rem_sleep_score,
    CAST(total_sleep_score AS DOUBLE) AS total_sleep_score,
    CAST(hrv_balance_score AS DOUBLE) AS hrv_balance_score,
    CAST(resting_heart_rate_bpm AS DOUBLE) AS resting_hr,
    CAST(hrv_ms AS DOUBLE) AS hrv_ms,
    CASE WHEN had_workout = true THEN 1 ELSE 0 END AS had_workout,
    tss,
    AVG(readiness_score) OVER (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS readiness_7d_avg,
    AVG(sleep_score) OVER (ORDER BY date ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sleep_score_3d_avg,
    (readiness_score - LAG(readiness_score, 2) OVER (ORDER BY date)) / 2.0 AS readiness_3d_slope,
    SUM(tss) OVER (ORDER BY date ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS cumulative_tss_3d,
    SUM(tss) OVER (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS cumulative_tss_7d,
    AVG(tss) OVER (ORDER BY date ROWS BETWEEN 41 PRECEDING AND CURRENT ROW) AS ctl,
    AVG(tss) OVER (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS atl,
    AVG(tss) OVER (ORDER BY date ROWS BETWEEN 41 PRECEDING AND CURRENT ROW)
      - AVG(tss) OVER (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS tsb,
    CAST(isodow({_SAFE_DATE.format(d='date')}) AS INTEGER) AS day_of_week,
    CAST(SUM(CASE WHEN had_workout = true THEN 1 ELSE 0 END)
      OVER (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS workouts_last_7d,
    AVG(sleep_score) OVER (ORDER BY date ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING) AS sleep_baseline_14d,
    sleep_score - AVG(sleep_score) OVER (ORDER BY date ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING) AS sleep_deficit_daily,
    CAST(hrv_ms AS DOUBLE) - LAG(CAST(hrv_ms AS DOUBLE), 2) OVER (ORDER BY date) AS hrv_2day_change,
    LEAD(readiness_score, 1) OVER (ORDER BY date) AS next_day_readiness
  FROM with_tss
)
SELECT *,
  SUM(sleep_deficit_daily) OVER (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sleep_debt_7d,
  CASE WHEN hrv_2day_change > 10 THEN 'rising'
       WHEN hrv_2day_change < -10 THEN 'falling'
       ELSE 'stable' END AS hrv_velocity_flag
FROM with_features
WHERE readiness_score IS NOT NULL
"""

RECOVERY_SQL = """
WITH daily AS (
  SELECT date, readiness_score, sleep_score,
    COALESCE(workout_count, 0) + COALESCE(hk_workout_count, 0) AS total_workouts,
    COALESCE(total_workout_minutes, 0) + COALESCE(hk_workout_minutes, 0) AS total_minutes,
    CAST(COALESCE(peloton_calories, 0) + COALESCE(hk_calories, 0) AS BIGINT) AS total_calories,
    total_output_kj, max_avg_hr,
    CASE WHEN had_workout = true THEN 1 ELSE 0 END AS had_workout,
    LEAD(readiness_score, 1) OVER (ORDER BY date) AS readiness_d1,
    LEAD(readiness_score, 2) OVER (ORDER BY date) AS readiness_d2,
    LEAD(readiness_score, 3) OVER (ORDER BY date) AS readiness_d3,
    LEAD(sleep_score, 1) OVER (ORDER BY date) AS sleep_d1,
    LEAD(sleep_score, 2) OVER (ORDER BY date) AS sleep_d2,
    LAG(readiness_score, 1) OVER (ORDER BY date) AS readiness_prev,
    AVG(readiness_score) OVER (ORDER BY date ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS readiness_7d_baseline
  FROM gold_oracle WHERE date IS NOT NULL
)
SELECT date AS workout_date,
  readiness_score AS workout_day_readiness,
  sleep_score AS workout_day_sleep,
  total_workouts, total_minutes, total_calories, total_output_kj,
  max_avg_hr, readiness_7d_baseline,
  CASE WHEN total_output_kj >= 300 OR total_calories >= 400 OR total_minutes >= 60 THEN 'high'
       WHEN total_output_kj >= 150 OR total_calories >= 200 OR total_minutes >= 30 THEN 'moderate'
       ELSE 'light' END AS intensity,
  readiness_d1, readiness_d2, readiness_d3, sleep_d1, sleep_d2,
  readiness_d1 - readiness_score AS readiness_delta_d1,
  readiness_d2 - readiness_score AS readiness_delta_d2,
  readiness_d3 - readiness_score AS readiness_delta_d3,
  CASE WHEN readiness_d1 >= readiness_7d_baseline THEN 1
       WHEN readiness_d2 >= readiness_7d_baseline THEN 2
       WHEN readiness_d3 >= readiness_7d_baseline THEN 3
  END AS days_to_recover
FROM daily
WHERE had_workout = 1 AND readiness_score IS NOT NULL
"""

VIEW_SQLS = {
    "dashboard_30day": """
SELECT date, readiness_score, sleep_score, activity_score,
  combined_wellness_score, workout_count, total_output_kj,
  total_workout_minutes, avg_watts, max_avg_hr,
  readiness_to_output_ratio, had_workout, steps, active_calories,
  peloton_calories, disciplines, hk_workout_types,
  AVG(readiness_score) OVER w7 AS readiness_7day_avg,
  AVG(sleep_score) OVER w7 AS sleep_7day_avg,
  AVG(total_output_kj) OVER w7 AS output_7day_avg,
  AVG(readiness_score) OVER w30 AS readiness_30day_avg,
  AVG(sleep_score) OVER w30 AS sleep_30day_avg
FROM gold_oracle
WINDOW w7 AS (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       w30 AS (ORDER BY date ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
""",
    "energy_state": """
SELECT date, readiness_score, sleep_score,
  CAST(hrv_balance_score AS INTEGER) AS hrv_balance,
  activity_score, combined_wellness_score, had_workout, workout_count,
  total_output_kj, avg_watts, disciplines,
  CASE WHEN readiness_score >= 85 AND sleep_score >= 88 AND CAST(hrv_balance_score AS INTEGER) >= 75 THEN 'peak'
       WHEN readiness_score >= 85 AND sleep_score >= 80 THEN 'high'
       WHEN readiness_score >= 70 AND sleep_score >= 65 THEN 'moderate'
       WHEN readiness_score >= 50 THEN 'low'
       ELSE 'recovery_needed' END AS energy_state,
  CASE WHEN readiness_score >= 85 AND sleep_score >= 88 AND CAST(hrv_balance_score AS INTEGER) >= 75
         THEN '125% Energy -- Peak state. Go all out: HIIT, Tabata, hard cycling, or high-stakes interview prep.'
       WHEN readiness_score >= 85 AND sleep_score >= 80
         THEN 'High energy. Great for hard cycling, bootcamp, or deep technical study sessions.'
       WHEN readiness_score >= 70 AND sleep_score >= 65
         THEN 'Moderate energy. Good for endurance rides, strength training, or steady interview prep.'
       WHEN readiness_score >= 50
         THEN 'Low energy. Stick to yoga, stretching, or light walk. Avoid draining meetings.'
       ELSE 'Recovery needed. Rest day or gentle meditation. No high-pressure activities.' END AS guidance,
  CASE WHEN readiness_to_output_ratio > 4.0 THEN 'overreaching'
       WHEN readiness_to_output_ratio >= 2.5 THEN 'high_performance'
       WHEN readiness_to_output_ratio >= 1.5 THEN 'moderate'
       WHEN readiness_to_output_ratio > 0 THEN 'undertrained'
       ELSE 'no_workout' END AS output_zone,
  readiness_to_output_ratio,
  AVG(readiness_score) OVER w3 AS readiness_3day_avg,
  AVG(sleep_score) OVER w3 AS sleep_3day_avg,
  readiness_score - LAG(readiness_score, 1) OVER wd AS readiness_delta,
  sleep_score - LAG(sleep_score, 1) OVER wd AS sleep_delta
FROM gold_oracle
WHERE readiness_score IS NOT NULL
WINDOW w3 AS (ORDER BY date ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
       wd AS (ORDER BY date)
""",
    "weekly_summary": f"""
WITH weekly AS (
  SELECT date_trunc('week', {_SAFE_DATE.format(d='date')}) AS week_start,
    AVG(readiness_score) AS avg_readiness,
    AVG(sleep_score) AS avg_sleep,
    AVG(combined_wellness_score) AS avg_wellness,
    SUM(total_output_kj) AS weekly_output_kj,
    SUM(peloton_calories) AS weekly_calories,
    COUNT(CASE WHEN had_workout = true THEN 1 END) AS workout_days,
    AVG(CASE WHEN had_workout = true THEN avg_watts END) AS avg_watts,
    AVG(CASE WHEN had_workout = true THEN max_avg_hr END) AS avg_max_hr,
    SUM(steps) AS weekly_steps,
    SUM(active_calories) AS weekly_active_cal
  FROM gold_oracle
  WHERE readiness_score IS NOT NULL
  GROUP BY 1
)
SELECT CAST(week_start AS DATE) AS week_start,
  ROUND(avg_readiness, 1) AS avg_readiness,
  ROUND(avg_sleep, 1) AS avg_sleep,
  ROUND(avg_wellness, 1) AS avg_wellness,
  ROUND(weekly_output_kj, 1) AS weekly_output_kj,
  CAST(weekly_calories AS BIGINT) AS weekly_calories, workout_days,
  ROUND(avg_watts, 1) AS avg_watts,
  ROUND(avg_max_hr, 0) AS avg_max_hr,
  CAST(weekly_steps AS BIGINT) AS weekly_steps,
  CAST(weekly_active_cal AS BIGINT) AS weekly_active_cal,
  ROUND(avg_readiness - LAG(avg_readiness) OVER w, 1) AS readiness_change,
  ROUND(avg_sleep - LAG(avg_sleep) OVER w, 1) AS sleep_change,
  ROUND(weekly_output_kj - LAG(weekly_output_kj) OVER w, 1) AS output_change,
  workout_days - LAG(workout_days) OVER w AS workout_days_change,
  CASE WHEN avg_readiness > LAG(avg_readiness) OVER w AND weekly_output_kj > LAG(weekly_output_kj) OVER w THEN 'improving'
       WHEN avg_readiness < LAG(avg_readiness) OVER w AND weekly_output_kj < LAG(weekly_output_kj) OVER w THEN 'declining'
       WHEN avg_readiness < LAG(avg_readiness) OVER w AND weekly_output_kj > LAG(weekly_output_kj) OVER w THEN 'overreaching'
       WHEN avg_readiness > LAG(avg_readiness) OVER w AND weekly_output_kj < LAG(weekly_output_kj) OVER w THEN 'recovering'
       ELSE 'stable' END AS trend
FROM weekly
WINDOW w AS (ORDER BY week_start)
""",
    "overtraining_risk": """
SELECT date, readiness_score, sleep_score,
  CAST(hrv_balance_score AS INTEGER) AS hrv_balance,
  combined_wellness_score, total_output_kj, workout_count, disciplines,
  readiness_to_output_ratio,
  readiness_score - AVG(readiness_score) OVER (ORDER BY date ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS readiness_vs_3day,
  CAST(SUM(CASE WHEN had_workout = true THEN 1 ELSE 0 END) OVER w3 AS BIGINT) AS workouts_last_3_days,
  CASE WHEN readiness_score < 65
            AND readiness_score < LAG(readiness_score, 1) OVER wd
            AND readiness_score < LAG(readiness_score, 2) OVER wd THEN 'high_risk'
       WHEN readiness_score < 70
            AND SUM(CASE WHEN had_workout = true THEN 1 ELSE 0 END) OVER w3 >= 3 THEN 'moderate_risk'
       WHEN readiness_to_output_ratio > 4.0 THEN 'moderate_risk'
       ELSE 'low_risk' END AS overtraining_risk,
  CASE WHEN readiness_score < 65
            AND readiness_score < LAG(readiness_score, 1) OVER wd
            AND readiness_score < LAG(readiness_score, 2) OVER wd
         THEN 'Readiness declining 3+ days in a row and below 65. Take a rest day.'
       WHEN readiness_score < 70
            AND SUM(CASE WHEN had_workout = true THEN 1 ELSE 0 END) OVER w3 >= 3
         THEN 'Low readiness with 3 consecutive workout days. Schedule recovery.'
       WHEN readiness_to_output_ratio > 4.0
         THEN 'Output-to-readiness ratio is very high. You pushed hard despite low recovery.'
       ELSE 'Recovery looks good. Train as planned.' END AS risk_guidance
FROM gold_oracle
WHERE readiness_score IS NOT NULL
WINDOW w3 AS (ORDER BY date ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
       wd AS (ORDER BY date)
""",
    "readiness_performance_correlation": """
SELECT 'All Days' AS segment, COUNT(*) AS sample_size,
  ROUND(CORR(readiness_score, total_output_kj), 3) AS readiness_output_corr,
  ROUND(CORR(sleep_score, total_output_kj), 3) AS sleep_output_corr,
  ROUND(CORR(CAST(hrv_balance_score AS DOUBLE), total_output_kj), 3) AS hrv_output_corr,
  ROUND(CORR(sleep_score, readiness_score), 3) AS sleep_readiness_corr,
  ROUND(AVG(readiness_score), 1) AS avg_readiness,
  ROUND(AVG(sleep_score), 1) AS avg_sleep,
  ROUND(AVG(total_output_kj), 1) AS avg_output_kj,
  ROUND(AVG(avg_watts), 1) AS avg_watts
FROM gold_oracle
WHERE had_workout = true AND total_output_kj > 0 AND readiness_score IS NOT NULL
UNION ALL
SELECT 'High Readiness (85+)', COUNT(*),
  ROUND(CORR(readiness_score, total_output_kj), 3),
  ROUND(CORR(sleep_score, total_output_kj), 3),
  ROUND(CORR(CAST(hrv_balance_score AS DOUBLE), total_output_kj), 3),
  ROUND(CORR(sleep_score, readiness_score), 3),
  ROUND(AVG(readiness_score), 1), ROUND(AVG(sleep_score), 1),
  ROUND(AVG(total_output_kj), 1), ROUND(AVG(avg_watts), 1)
FROM gold_oracle
WHERE had_workout = true AND total_output_kj > 0 AND readiness_score >= 85
UNION ALL
SELECT 'Low Readiness (<70)', COUNT(*),
  ROUND(CORR(readiness_score, total_output_kj), 3),
  ROUND(CORR(sleep_score, total_output_kj), 3),
  ROUND(CORR(CAST(hrv_balance_score AS DOUBLE), total_output_kj), 3),
  ROUND(CORR(sleep_score, readiness_score), 3),
  ROUND(AVG(readiness_score), 1), ROUND(AVG(sleep_score), 1),
  ROUND(AVG(total_output_kj), 1), ROUND(AVG(avg_watts), 1)
FROM gold_oracle
WHERE had_workout = true AND total_output_kj > 0 AND readiness_score < 70
""",
    "sleep_performance_prediction": f"""
SELECT a.date AS sleep_date, b.date AS performance_date,
  a.sleep_score AS prev_night_sleep,
  CASE WHEN a.sleep_score >= 88 THEN 'Excellent (88+)'
       WHEN a.sleep_score >= 75 THEN 'Good (75-87)'
       WHEN a.sleep_score >= 60 THEN 'Fair (60-74)'
       ELSE 'Poor (<60)' END AS sleep_quality,
  b.readiness_score AS next_day_readiness,
  b.total_output_kj AS next_day_output,
  b.avg_watts AS next_day_avg_watts,
  b.had_workout AS next_day_worked_out,
  b.disciplines AS next_day_disciplines,
  b.combined_wellness_score AS next_day_wellness,
  CASE WHEN a.sleep_score > 0
       THEN ROUND(CAST(b.readiness_score AS DOUBLE) / a.sleep_score, 2)
  END AS sleep_to_readiness_ratio
FROM gold_oracle a
JOIN gold_oracle b
  ON {_SAFE_DATE.format(d='b.date')} = {_SAFE_DATE.format(d='a.date')} + INTERVAL 1 DAY
WHERE a.sleep_score IS NOT NULL AND b.readiness_score IS NOT NULL
""",
    "temperature_trends": """
SELECT date AS day,
  CAST(temperature_deviation AS DOUBLE) AS temp_deviation,
  CAST(temperature_deviation AS DOUBLE)
    - LAG(CAST(temperature_deviation AS DOUBLE), 1) OVER wd AS temp_trend_deviation,
  AVG(CAST(temperature_deviation AS DOUBLE)) OVER w7 AS temp_dev_7day_avg,
  CASE WHEN ABS(CAST(temperature_deviation AS DOUBLE)) > 0.5 THEN 'elevated'
       WHEN ABS(CAST(temperature_deviation AS DOUBLE)) > 0.3 THEN 'mild'
       ELSE 'normal' END AS temp_status,
  readiness_score
FROM gold_oracle
WHERE temperature_deviation IS NOT NULL
WINDOW wd AS (ORDER BY date),
       w7 AS (ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    "training_load_daily": f"""
SELECT date, had_workout, total_output_kj, total_workout_minutes,
  max_avg_hr, peloton_calories, active_calories, hk_calories,
  hk_workout_minutes, {_TSS} AS tss
FROM gold_oracle
""",
    "workout_recommendations": """
SELECT date, readiness_score, sleep_score, combined_wellness_score,
  AVG(readiness_score) OVER (ORDER BY date ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS readiness_3day_avg,
  CASE WHEN readiness_score >= 85 AND sleep_score >= 80 THEN 'high_intensity'
       WHEN readiness_score >= 70 AND sleep_score >= 65 THEN 'moderate_intensity'
       WHEN readiness_score >= 50 THEN 'low_intensity'
       ELSE 'rest_day' END AS recommended_intensity,
  CASE WHEN readiness_score >= 85 AND sleep_score >= 80 THEN 'Great recovery! Go for a hard cycling or bootcamp session.'
       WHEN readiness_score >= 70 AND sleep_score >= 65 THEN 'Decent recovery. Moderate ride or strength training recommended.'
       WHEN readiness_score >= 50 THEN 'Below average recovery. Stick to yoga, stretching, or light walk.'
       ELSE 'Poor recovery. Consider a rest day or gentle meditation.' END AS recommendation_text,
  LAG(total_output_kj, 1) OVER wd AS prev_day_output_kj,
  LAG(workout_count, 1) OVER wd AS prev_day_workout_count,
  LAG(total_workout_minutes, 1) OVER wd AS prev_day_workout_mins
FROM gold_oracle
WINDOW wd AS (ORDER BY date)
""",
    "workout_type_optimization": """
WITH workout_days AS (
  SELECT date, readiness_score, sleep_score,
    CASE WHEN readiness_score >= 85 THEN 'High (85+)'
         WHEN readiness_score >= 70 THEN 'Medium (70-84)'
         ELSE 'Low (<70)' END AS readiness_bucket,
    CASE WHEN disciplines LIKE '%Cycling%' THEN 'Cycling'
         WHEN disciplines LIKE '%Strength%' OR hk_workout_types LIKE '%strength%' THEN 'Strength'
         WHEN hk_workout_types LIKE '%walking%' OR hk_workout_types LIKE '%hiking%' THEN 'Walking'
         WHEN hk_workout_types LIKE '%running%' OR disciplines LIKE '%Bootcamp%' OR hk_workout_types LIKE '%high_intensity%' THEN 'Cardio'
         WHEN disciplines LIKE '%Yoga%' OR disciplines LIKE '%Stretching%' OR disciplines LIKE '%Meditation%'
              OR hk_workout_types LIKE '%yoga%' OR hk_workout_types LIKE '%flexibility%' OR hk_workout_types LIKE '%pilates%' THEN 'Recovery'
         ELSE COALESCE(NULLIF(disciplines, ''), hk_workout_types, 'Other') END AS workout_type,
    total_output_kj, avg_watts, total_workout_minutes, peloton_calories,
    max_avg_hr, readiness_to_output_ratio
  FROM gold_oracle
  WHERE had_workout = true AND readiness_score IS NOT NULL
)
SELECT readiness_bucket, workout_type, COUNT(*) AS sample_days,
  ROUND(AVG(total_output_kj), 1) AS avg_output_kj,
  ROUND(AVG(avg_watts), 1) AS avg_watts,
  ROUND(AVG(peloton_calories), 0) AS avg_calories,
  ROUND(AVG(total_workout_minutes), 0) AS avg_duration_min,
  ROUND(AVG(max_avg_hr), 0) AS avg_max_hr,
  ROUND(AVG(readiness_to_output_ratio), 2) AS avg_ratio,
  ROUND(AVG(readiness_score), 1) AS avg_readiness_in_bucket,
  ROUND(AVG(sleep_score), 1) AS avg_sleep_in_bucket
FROM workout_days
GROUP BY readiness_bucket, workout_type
HAVING COUNT(*) >= 2
""",
    "sleep_architecture": """
SELECT s.date AS day, g.sleep_score,
  s.deep_sleep_score AS deep_sleep, s.rem_sleep_score AS rem_sleep
FROM (
  SELECT day AS date, score AS sleep_score,
         contributors_deep_sleep AS deep_sleep_score,
         contributors_rem_sleep AS rem_sleep_score
  FROM sv_oura_daily_sleep
) s
JOIN gold_oracle g ON s.date = g.date
WHERE s.deep_sleep_score IS NOT NULL OR s.rem_sleep_score IS NOT NULL
""",
}


@pytest.fixture(scope="module")
def bio(spark):
    """Build (once) bronze fixtures → silver parquet → gold DFs, plus a
    DuckDB connection with silver views + its own gold_oracle table."""
    from bio_lakehouse_spark.bio.fixtures import generate_bronze
    from bio_lakehouse_spark.bio.gold import build_gold
    from bio_lakehouse_spark.bio.silver import run_silver
    from pathlib import Path

    generate_bronze(f"{BIO_ROOT}/bronze")
    if not Path(f"{BIO_ROOT}/silver/mfp_daily_nutrition").exists():
        run_silver(spark, f"{BIO_ROOT}/bronze", f"{BIO_ROOT}/silver")
    gold = build_gold(spark, f"{BIO_ROOT}/silver")

    con = duckdb.connect()
    for t in SILVER_TABLES:
        con.execute(
            f"CREATE VIEW sv_{t} AS SELECT * FROM "
            f"read_parquet('{BIO_ROOT}/silver/{t}/**/*.parquet', "
            f"hive_partitioning=false)"
        )
    con.execute(GOLD_SQL)
    return {"gold": gold, "con": con, "spark": spark}


def test_gold_daily_rollup_golden(bio):
    sdf = bio["gold"]["gold_daily_rollup"].toPandas()
    odf = bio["con"].execute("SELECT * FROM gold_oracle").fetchdf()
    problems = compare(sdf, odf)
    assert not problems, problems


def test_feature_readiness_daily_golden(bio):
    sdf = bio["gold"]["feature_readiness_daily"].toPandas()
    odf = bio["con"].execute(FEATURES_SQL).fetchdf()
    problems = compare(sdf, odf)
    assert not problems, problems


def test_workout_recovery_windows_golden(bio):
    sdf = bio["gold"]["workout_recovery_windows"].toPandas()
    odf = bio["con"].execute(RECOVERY_SQL).fetchdf()
    problems = compare(sdf, odf)
    assert not problems, problems


@pytest.mark.parametrize("name", sorted(VIEW_SQLS))
def test_view_golden(bio, name):
    from bio_lakehouse_spark.bio import views as V
    from bio_lakehouse_spark.bio.gold import stg_sleep

    gold = bio["gold"]["gold_daily_rollup"]
    if name == "sleep_architecture":
        silver_sleep = bio["spark"].read.parquet(
            f"{BIO_ROOT}/silver/oura_daily_sleep"
        )
        sdf = V.sleep_architecture(gold, stg_sleep(silver_sleep)).toPandas()
    else:
        sdf = V.VIEWS[name](gold).toPandas()
    odf = bio["con"].execute(VIEW_SQLS[name]).fetchdf()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_gold_data_constraints(spark):
    """The reference's dbt data test (tests/
    assert_readiness_score_range.sql) plus the implicit score-range
    contracts, run through the one-scan constraint checker on the
    fixture gold — every rule must hold on every row."""
    from bio_lakehouse_spark.bio.gold import build_gold
    from bio_lakehouse_spark.operators.profiling import check_constraints

    gold = build_gold(spark, f"{BIO_ROOT}/silver")["gold_daily_rollup"]
    rules = [
        ("readiness_0_100",
         "readiness_score IS NULL OR (readiness_score >= 0 AND readiness_score <= 100)"),
        ("sleep_0_100",
         "sleep_score IS NULL OR (sleep_score >= 0 AND sleep_score <= 100)"),
        ("date_not_null", "date IS NOT NULL"),
        ("calories_non_negative",
         "total_calories_all_sources IS NULL OR total_calories_all_sources >= 0"),
        ("workout_flag_consistent",
         "NOT had_workout OR total_workout_count > 0"),
    ]
    res = {r["constraint"]: r for r in check_constraints(gold, rules).collect()}
    for name in [n for n, _ in rules]:
        assert res[name]["passed"], (name, res[name]["n_violations"])
    assert res["date_not_null"]["n_rows"] == 150
