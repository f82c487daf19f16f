"""Streaming mSPRT monitor (streaming/monitor.py): the continuously
republished always-valid trajectory must equal the batch computation
over all events (stream ≡ batch), survive mid-day batch splits, and
be replay-idempotent via the batch_id guard."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bio_lakehouse_spark.operators.stats import msprt_two_sample
from bio_lakehouse_spark.streaming.monitor import (
    daily_arm_sums,
    stream_msprt_monitor,
)

SCHEMA = "event_id long, ts string, event_type string, value double"


def _events():
    rows = []
    eid = 0
    for d in range(1, 21):
        for i in range(30):
            for arm, eff in (("click", 1.5), ("view", 0.0)):
                eid += 1
                rows.append(
                    (
                        eid,
                        f"2024-01-{d:02d} 12:{i:02d}:00",
                        arm,
                        10.0 + eff + math.sin(d * 3.1 + i),
                    )
                )
        # noise arm the monitor must ignore
        eid += 1
        rows.append((eid, f"2024-01-{d:02d} 13:00:00", "error", 99.0))
    return rows


def _run(spark, landing, state, out, ckpt):
    q = stream_msprt_monitor(
        spark,
        landing_dir=str(landing),
        state_dir=str(state),
        out_dir=str(out),
        checkpoint_dir=str(ckpt),
        schema=SCHEMA,
    )
    q.awaitTermination(120)


def test_stream_equals_batch_and_replay_is_idempotent(spark, tmp_path):
    rows = _events()
    # split MID-day so per-day sums must merge across batches
    c1, c2 = rows[: len(rows) // 3 + 7], rows[len(rows) // 3 + 7 :]

    landing = tmp_path / "landing"
    landing.mkdir()
    state, out = tmp_path / "state", tmp_path / "out"

    def land(chunk, name):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).json(str(landing / name))

    land(c1, "c1")
    _run(spark, landing / "c*", state, out, tmp_path / "ckptA")
    n_state_1 = spark.read.parquet(str(state)).count()
    assert n_state_1 > 0

    # replay: fresh checkpoint, same files → same batch content under
    # the same batch_id; the anti-join guard must keep state unchanged
    _run(spark, landing / "c*", state, out, tmp_path / "ckptB")
    assert spark.read.parquet(str(state)).count() == n_state_1

    # more data arrives; the original checkpoint picks it up as a new
    # batch and the republished trajectory covers everything
    land(c2, "c2")
    _run(spark, landing / "c*", state, out, tmp_path / "ckptA")

    got = {
        r["date"].isoformat(): r
        for r in spark.read.parquet(str(out)).collect()
    }
    all_ev = spark.createDataFrame(rows, SCHEMA)
    want = {
        r["date"].isoformat(): r
        for r in msprt_two_sample(daily_arm_sums(all_ev)).collect()
    }
    # every day lands 30 rows per arm, so all 20 days are in the trajectory
    assert set(got) == set(want) and len(want) == 20
    for k, w in want.items():
        g = got[k]
        assert g["n_treat"] == w["n_treat"] and g["n_ctrl"] == w["n_ctrl"]
        for c in ("theta", "log_lambda", "p_always_valid"):
            assert g[c] == pytest.approx(w[c], rel=1e-9)
    # the persistent effect must be detected by the end
    last = want[max(want)]
    assert last["p_always_valid"] < 1e-3


def test_arm_filter_ignores_other_event_types(spark):
    ev = spark.createDataFrame(_events(), SCHEMA)
    sums = daily_arm_sums(ev)
    row = sums.where(F.col("date") == F.lit("2024-01-05").cast("date")).first()
    assert row["nx"] == 30 and row["ny"] == 30  # 'error' rows excluded
