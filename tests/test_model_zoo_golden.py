"""Golden-file gate for model_zoo_cv_daily (VERDICT r6 #4).

The registry's ONE query without a DuckDB oracle: GBM greedy tree
induction and ElasticNet coordinate descent have no closed form an
oracle could replicate, so the driver records a rows-only check. This
gate pins the actual numbers locally instead: the solvers are fully
deterministic (no RNG anywhere in products/numerics.py — greedy
splits + coordinate descent + fixed fold boundaries), so fold-level
MAE/RMSE/naive-baseline metrics at a fixed SF are exact constants.
Any drift in the feature build, fold split, or a solver regression
fails here with a numeric diff, which CORRECTNESS_r{N}.json's
rows-only row could never catch.

Golden regeneration (only after an INTENTIONAL semantic change):
run the query at sf0.001 + sf0.01 and rewrite
tests/golden/model_zoo_cv_daily.json.
"""

from __future__ import annotations

import json
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "model_zoo_cv_daily.json")
# Relative tolerance for metric drift: the computation is
# deterministic, but float reassociation across numpy/BLAS versions
# can wiggle the last bits; 1e-6 relative is far below any real
# solver regression and far above representation noise.
RTOL = 1e-6


def test_model_zoo_matches_golden(spark):
    from bio_lakehouse_spark.suite import REGISTRY

    with open(GOLDEN) as f:
        golden = json.load(f)
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                        "/root/testdata/sf0.001")
    key = os.path.basename(sf.rstrip("/"))
    assert key in golden, f"no golden pinned for {key}"
    got = sorted(
        (r.asDict() for r in
         REGISTRY["model_zoo_cv_daily"].fn(spark, sf).collect()),
        key=lambda r: r["model"],
    )
    want = sorted(golden[key], key=lambda r: r["model"])
    assert [r["model"] for r in got] == [r["model"] for r in want]
    for g, w in zip(got, want):
        assert g["n_folds"] == w["n_folds"], g["model"]
        assert g["is_best"] == w["is_best"], g["model"]
        for m in ("mae", "rmse", "naive_mae"):
            rel = abs(g[m] - w[m]) / max(1.0, abs(w[m]))
            assert rel <= RTOL, (
                f"{g['model']}.{m} drifted: got {g[m]} want {w[m]} "
                f"(rel {rel:.2e})"
            )


def test_zoo_match_flips_on_a_real_defect(spark):
    """model_zoo_ridge_audit's zoo_match boolean is a live tripwire,
    not decoration: verify the 1e-5 relative tolerance (a) accepts
    the genuine numpy zoo path, and (b) rejects the smallest realistic
    fold-machinery defect (an off-by-one fold boundary), which moves
    the aggregate MAE orders of magnitude past the tolerance."""
    import numpy as np

    from bio_lakehouse_spark.products.numerics import walk_forward_cv
    from bio_lakehouse_spark.suite import REGISTRY

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                        "/root/testdata/sf0.001")
    row = REGISTRY["model_zoo_ridge_audit"].fn(spark, sf).collect()[0]
    assert row.zoo_match is True

    # Rebuild the audit's quantized features and re-run the zoo with a
    # perturbed fold protocol — the audit's comparison must reject it.
    from pyspark.sql import functions as F
    from bio_lakehouse_spark.suite.registry import load

    daily = (
        load(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("date"))
        .agg(
            F.round(F.sum("value"), 6).alias("total_value"),
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("date")
        .toPandas()
    )
    y = daily["total_value"].shift(-1).to_numpy(dtype=float)[:-1]
    X = daily[["total_value", "n_events", "avg_value"]].to_numpy(
        dtype=float
    )[:-1]
    bad = walk_forward_cv(X, y, min_train=11, test_window=5,
                          model="ridge")
    good = walk_forward_cv(X, y, min_train=10, test_window=5,
                           model="ridge")
    assert np.isclose(good["mae"], row.mae, rtol=1e-5)
    assert not np.isclose(bad["mae"], row.mae, rtol=1e-5)
