"""Differential test: every registered query vs its DuckDB oracle.

This is the local replica of the driver's t2 correctness gate, run at
sf0.001 by default (fast); the harness script runs sf0.01/sf0.1 on
demand.
"""

from __future__ import annotations

import pytest

from bio_lakehouse_spark.suite import REGISTRY
from tests.oracle_harness import compare, run_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only check, mirrors the driver
        return
    odf = run_oracle(spec.oracle, sf_dir)
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"
