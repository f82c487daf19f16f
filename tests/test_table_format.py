"""Table-format backend facade: the SAME test body runs against the
versioned-parquet backend (always) and the Delta backend (auto-skip
where delta-spark is absent — this sandbox ships no Delta jars; on a
real deployment both halves run)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bio_lakehouse_spark.sources.table_format import (
    DeltaBackend,
    ParquetBackend,
    delta_available,
    resolve_backend,
)


@pytest.fixture(scope="module")
def spark():
    from bio_lakehouse_spark.session import get_spark

    s = get_spark("table-format-tests", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def backends(spark):
    yield ParquetBackend(spark)
    if delta_available(spark):
        yield DeltaBackend(spark)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _run_snapshot_time_travel(spark, be, root):
    path = os.path.join(root, f"snap_{be.name}")
    c1 = be.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), path)
    c2 = be.write_snapshot(_df(spark, [(1, "a2"), (3, "c")]), path)
    assert c2.version > c1.version
    assert c2.rows == 2
    latest = {r["k"]: r["v"] for r in be.read(path).collect()}
    assert latest == {1: "a2", 3: "c"}
    old = {r["k"]: r["v"] for r in be.read(path, version=c1.version).collect()}
    assert old == {1: "a", 2: "b"}


def _run_merge(spark, be, root):
    path = os.path.join(root, f"merge_{be.name}")
    be.merge(path, _df(spark, [(1, "a"), (2, "b")]), ["k"])
    be.merge(path, _df(spark, [(2, "B"), (3, "c")]), ["k"])
    got = {r["k"]: r["v"] for r in be.read_merged(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def _run_schema_evolution(spark, be, root):
    path = os.path.join(root, f"evolve_{be.name}")
    be.append_evolved(path, _df(spark, [(1, "a")]))
    wider = spark.createDataFrame([(2, "b", 9.5)], "k int, v string, w double")
    be.append_evolved(path, wider)
    out = be.read_evolved(path)
    assert set(out.columns) == {"k", "v", "w"}
    rows = {r["k"]: (r["v"], r["w"]) for r in out.collect()}
    assert rows[1] == ("a", None)
    assert rows[2] == ("b", 9.5)


def _run_compact_vacuum(spark, be, root):
    """Maintenance parity: after compaction and old-version vacuum the
    LATEST snapshot must read back bit-identical (the two backends
    differ in mechanism — rename-CAS file rewrite + count-based
    version pruning vs OPTIMIZE + time-based VACUUM — but not in the
    reader-visible contract)."""
    path = os.path.join(root, f"maint_{be.name}")
    be.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), path)
    be.write_snapshot(_df(spark, [(1, "a2"), (2, "b2"), (3, "c")]), path)
    be.write_snapshot(_df(spark, [(4, "d"), (5, "e")]), path)
    before = {r["k"]: r["v"] for r in be.read(path).collect()}
    be.compact(path, [])
    be.vacuum(path, keep_last=1)
    after = {r["k"]: r["v"] for r in be.read(path).collect()}
    assert after == before == {4: "d", 5: "e"}


_CASES = [
    _run_snapshot_time_travel,
    _run_merge,
    _run_schema_evolution,
    _run_compact_vacuum,
]


@pytest.mark.parametrize(
    "case", _CASES, ids=lambda f: f.__name__.lstrip("_"),
)
def test_parquet_backend(spark, tmp_path, case):
    case(spark, ParquetBackend(spark), str(tmp_path))


@pytest.mark.parametrize(
    "case", _CASES, ids=lambda f: f.__name__.lstrip("_"),
)
def test_delta_backend(spark, tmp_path, case):
    pytest.importorskip("delta")
    if not delta_available(spark):
        pytest.skip("delta-spark importable but JVM classes absent")
    case(spark, DeltaBackend(spark), str(tmp_path))


def test_resolve_backend_default_and_override(spark):
    from bio_lakehouse_spark.sources.table_format import iceberg_available

    be = resolve_backend(spark)
    # In this sandbox that's parquet; with format jars, delta/iceberg.
    if delta_available(spark):
        assert be.name == "delta"
    elif iceberg_available(spark):
        assert be.name == "iceberg"
    else:
        assert be.name == "parquet"
    assert resolve_backend(spark, prefer="parquet").name == "parquet"
    if not delta_available(spark):
        with pytest.raises(RuntimeError):
            resolve_backend(spark, prefer="delta")


@pytest.mark.parametrize(
    "case", _CASES, ids=lambda f: f.__name__.lstrip("_"),
)
def test_iceberg_backend(spark, tmp_path, case):
    from bio_lakehouse_spark.sources.table_format import (
        IcebergBackend,
        iceberg_available,
    )

    if not iceberg_available(spark):
        pytest.skip("no iceberg runtime/catalog on this session")
    case(spark, IcebergBackend(spark), str(tmp_path))


def test_iceberg_unavailable_is_loud(spark):
    from bio_lakehouse_spark.sources.table_format import iceberg_available

    if iceberg_available(spark):
        pytest.skip("iceberg present — unavailable branch untestable")
    with pytest.raises(RuntimeError):
        resolve_backend(spark, prefer="iceberg")
