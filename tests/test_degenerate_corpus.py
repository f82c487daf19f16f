"""The degenerate-corpus regression net (r12).

The r11/r12 ANSI audits proved the failure mode by inspection; this
module proves it by EXECUTION: synthesize an sf_dir where every table
is maximally degenerate — constant series, single-class labels,
all-tied values, zero revenue, all-zero embeddings, empty/identical
documents, a one-day event history — and run EVERY registry query
against it. Under Spark 4's default ANSI mode each of these inputs
used to abort real queries (16 DIVIDE_BY_ZERO aborts, two
sequence(1,0) array-index aborts, a driver-side KeyError and an
IndexError were found by this sweep's first run); the contract now is
that a degenerate group yields NULL statistics or fewer rows, never a
job abort.

The fixture intentionally mirrors the driver tables' exact physical
schemas (see TESTDATA.md) so ``suite.registry.load`` treats it as a
normal sf_dir.
"""

from __future__ import annotations

import pytest

# ~34 min of full-registry sweeps: heavy tier (conftest two-tier note).
pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module")
def degen_sf(tmp_path_factory):
    """Maximally-degenerate twin of the driver's sf tables."""
    duckdb = pytest.importorskip("duckdb")
    out = tmp_path_factory.mktemp("degen_sf")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    queries = {
        "region": f"SELECT r_regionkey, r_name FROM read_parquet('{src}/region.parquet') LIMIT 1",
        "nation": f"SELECT n_nationkey, n_name, n_regionkey FROM read_parquet('{src}/nation.parquet') LIMIT 1",
        # constant balances, one segment, identical names
        "customer": f"""SELECT c_custkey, 'AAAA BBBB' AS c_name,
            (SELECT MIN(n_nationkey) FROM read_parquet('{src}/nation.parquet')) AS c_nationkey,
            0.0::DOUBLE AS c_acctbal, 'BUILDING' AS c_mktsegment
            FROM read_parquet('{src}/customer.parquet') LIMIT 4""",
        "supplier": f"""SELECT s_suppkey, 'SUPP' AS s_name,
            (SELECT MIN(n_nationkey) FROM read_parquet('{src}/nation.parquet')) AS s_nationkey,
            0.0::DOUBLE AS s_acctbal
            FROM read_parquet('{src}/supplier.parquet') LIMIT 2""",
        "part": f"""SELECT p_partkey, 'part one' AS p_name, 'B#1' AS p_brand,
            'PROMO X' AS p_type, 1 AS p_size, 0.0::DOUBLE AS p_retailprice
            FROM read_parquet('{src}/part.parquet') LIMIT 2""",
        # ONE day, zero totals, one priority, one customer
        "orders": f"""SELECT o_orderkey,
            (SELECT MIN(c_custkey) FROM read_parquet('{src}/customer.parquet')) AS o_custkey,
            'O' AS o_orderstatus, 0.0::DOUBLE AS o_totalprice,
            (SELECT MIN(o_orderdate) FROM read_parquet('{src}/orders.parquet')) AS o_orderdate,
            '1-URGENT' AS o_orderpriority
            FROM read_parquet('{src}/orders.parquet') LIMIT 6""",
        # single returnflag class, constant qty, zero prices, one date
        "lineitem": f"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
            1.0::DOUBLE AS l_quantity, 0.0::DOUBLE AS l_extendedprice,
            0.0::DOUBLE AS l_discount, 0.0::DOUBLE AS l_tax,
            'R' AS l_returnflag, 'F' AS l_linestatus,
            (SELECT MIN(l_shipdate) FROM read_parquet('{src}/lineitem.parquet')) AS l_shipdate
            FROM (SELECT * FROM read_parquet('{src}/lineitem.parquet')
                  WHERE l_orderkey IN (SELECT o_orderkey FROM read_parquet('{src}/orders.parquet') LIMIT 6)) LIMIT 8""",
        # single event_type (empty test arms!), zero value, one user,
        # ONE timestamp (one-day series: lag/acf/changepoint n=1)
        "events": f"""SELECT event_id,
            (SELECT MIN(ts) FROM read_parquet('{src}/events.parquet')) AS ts,
            (SELECT MIN(user_id) FROM read_parquet('{src}/events.parquet')) AS user_id,
            'click' AS event_type, 0.0::DOUBLE AS value, '{{}}' AS props
            FROM read_parquet('{src}/events.parquet') LIMIT 10""",
        # identical tiny texts + one empty + a one-word doc
        "documents": f"""SELECT doc_id,
            CASE WHEN doc_id % 4 = 0 THEN ''
                 WHEN doc_id % 4 = 1 THEN 'aaa'
                 ELSE 'aaa aaa aaa' END AS text,
            'en' AS lang, 'web' AS source,
            CASE WHEN doc_id % 4 = 0 THEN 0
                 WHEN doc_id % 4 = 1 THEN 3 ELSE 11 END::BIGINT AS n_chars
            FROM read_parquet('{src}/documents.parquet') LIMIT 4""",
        # all-zero embeddings (zero norms), single label
        "embeddings": f"""SELECT vec_id,
            CAST(list_transform(embedding, x -> 0.0::FLOAT) AS FLOAT[]) AS embedding,
            0 AS label
            FROM read_parquet('{src}/embeddings.parquet') LIMIT 4""",
    }
    for t, sql in queries.items():
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    return str(out)


def test_every_registry_query_survives_degenerate_corpus(spark, degen_sf):
    """No registry query may ABORT on degenerate-but-valid data: one
    flat series / empty arm / zero vector in a 100 TB per-entity scan
    used to kill the whole job at hour 5. NULL statistics and empty
    results are fine; exceptions are not (the deliberate raise_error
    contracts — ragged PQ codebooks, interval misuse — are not
    reachable from a well-formed sf_dir)."""
    from bio_lakehouse_spark.suite import REGISTRY

    failures: list[tuple[str, str]] = []
    for name, entry in REGISTRY.items():
        try:
            entry.fn(spark, degen_sf).collect()
        except Exception as exc:  # noqa: BLE001 — collected for the report
            first = f"{type(exc).__name__}: {exc}".splitlines()[0][:160]
            failures.append((name, first))
    assert not failures, (
        f"{len(failures)} queries aborted on the degenerate corpus:\n"
        + "\n".join(f"  {n}: {m}" for n, m in failures)
    )


@pytest.fixture(scope="module")
def extreme_sf(tmp_path_factory):
    """Extreme-MAGNITUDE twin: values at the edges of double range
    (±1e300, 1e-300), counts near the top of what BIGINT-summable
    contracts admit, saturating discounts, huge-norm embeddings.
    Deliberately IN-contract everywhere a typed gate exists — prices
    fit decimal(18,2), Σquantity fits BIGINT — because those gates
    failing loud on garbage is by design (SCALE.md §r11); what must
    NOT abort is arithmetic on extreme-but-valid doubles."""
    duckdb = pytest.importorskip("duckdb")
    out = tmp_path_factory.mktemp("extreme_sf")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    queries = {
        "region": f"SELECT r_regionkey, r_name FROM read_parquet('{src}/region.parquet') LIMIT 2",
        "nation": f"SELECT n_nationkey, n_name, n_regionkey FROM read_parquet('{src}/nation.parquet') LIMIT 3",
        "customer": f"""SELECT c_custkey, c_name, c_nationkey,
            CASE WHEN c_custkey % 2 = 0 THEN 1e300 ELSE -1e300 END::DOUBLE AS c_acctbal,
            c_mktsegment FROM read_parquet('{src}/customer.parquet') LIMIT 6""",
        "supplier": f"SELECT s_suppkey, s_name, s_nationkey, 1e300::DOUBLE AS s_acctbal FROM read_parquet('{src}/supplier.parquet') LIMIT 3",
        "part": f"SELECT p_partkey, p_name, p_brand, p_type, p_size, 1e300::DOUBLE AS p_retailprice FROM read_parquet('{src}/part.parquet') LIMIT 3",
        # prices stay inside decimal(18,2): the profiler's typed cast
        # failing on 1e300 is the data-quality gate, not a bug
        "orders": f"""SELECT o_orderkey, o_custkey, o_orderstatus,
            CASE WHEN o_orderkey % 2 = 0 THEN 1e15 ELSE 1e-300 END::DOUBLE AS o_totalprice,
            o_orderdate, o_orderpriority FROM read_parquet('{src}/orders.parquet') LIMIT 8""",
        # quantities large but BIGINT-summable (weighted-median's
        # documented contract, matching the oracle's CAST AS BIGINT)
        "lineitem": f"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
            1e15::DOUBLE AS l_quantity, 1e300::DOUBLE AS l_extendedprice,
            0.99::DOUBLE AS l_discount, 0.99::DOUBLE AS l_tax,
            l_returnflag, l_linestatus, l_shipdate
            FROM (SELECT * FROM read_parquet('{src}/lineitem.parquet')
                  WHERE l_orderkey IN (SELECT o_orderkey FROM read_parquet('{src}/orders.parquet') LIMIT 8)) LIMIT 12""",
        # the wild-sensor case: one value stream spanning ±1e300
        "events": f"""SELECT event_id, ts, user_id, event_type,
            CASE WHEN event_id % 3 = 0 THEN 1e300
                 WHEN event_id % 3 = 1 THEN -1e300 ELSE 1e-300 END::DOUBLE AS value,
            props FROM read_parquet('{src}/events.parquet') LIMIT 20""",
        "documents": f"""SELECT doc_id, repeat('zzzz ', 200) AS text, lang, source,
            1000::BIGINT AS n_chars FROM read_parquet('{src}/documents.parquet') LIMIT 4""",
        "embeddings": f"""SELECT vec_id,
            CAST(list_transform(embedding, x -> (CASE WHEN vec_id % 2 = 0 THEN 1e30 ELSE -1e30 END)::FLOAT) AS FLOAT[]) AS embedding,
            label FROM read_parquet('{src}/embeddings.parquet') LIMIT 4""",
    }
    for t, sql in queries.items():
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    return str(out)


def test_every_registry_query_survives_extreme_corpus(spark, extreme_sf):
    """The overflow complement of the degenerate sweep: ANSI also
    ABORTS on long/decimal overflow, and a grep for '/' can't see
    those. First run found three: floor(value/10) cast BIGINT on a
    ±1e300 stream (mode bins), the 2*cw doubling in the weighted
    median passing Long.MAX/2, and the profiler's decimal gate (kept
    — in-contract fixture). Typed-cast gates stay fail-loud; extreme
    VALID doubles must flow through as ±inf/NULL, never abort."""
    from bio_lakehouse_spark.suite import REGISTRY

    failures: list[tuple[str, str]] = []
    for name, entry in REGISTRY.items():
        try:
            entry.fn(spark, extreme_sf).collect()
        except Exception as exc:  # noqa: BLE001 — collected for the report
            first = f"{type(exc).__name__}: {exc}".splitlines()[0][:160]
            failures.append((name, first))
    assert not failures, (
        f"{len(failures)} queries aborted on the extreme corpus:\n"
        + "\n".join(f"  {n}: {m}" for n, m in failures)
    )


def test_bio_pipeline_survives_degenerate_bronze(spark, tmp_path):
    """The parity layer's turn (r12): generate_bronze(degenerate=True)
    swaps the fixture RNG for a constant shim — every day the same
    readiness score, the same workout, the same macros; zero variance
    everywhere, no nulls — and the FULL pipeline must run: 9 silver
    normalizers → 3 gold tables → all 11 analytics views. Without the
    r12 safe_corr fix the correlation view crashed here (F.corr
    raises on constant series under ANSI); this pins the whole layer,
    not just that view."""
    from bio_lakehouse_spark.bio import views as V
    from bio_lakehouse_spark.bio.fixtures import generate_bronze
    from bio_lakehouse_spark.bio.gold import build_gold, stg_sleep
    from bio_lakehouse_spark.bio.silver import run_silver

    root = str(tmp_path / "bio_degen")
    generate_bronze(f"{root}/bronze", degenerate=True)
    run_silver(spark, f"{root}/bronze", f"{root}/silver")
    gold = build_gold(spark, f"{root}/silver")
    rollup = gold["gold_daily_rollup"]
    assert rollup.count() > 0

    failures: list[tuple[str, str]] = []
    for name, df in gold.items():
        if name == "gold_daily_rollup":
            continue
        try:
            df.collect()
        except Exception as exc:  # noqa: BLE001
            failures.append((f"gold:{name}", str(exc).splitlines()[0][:160]))
    for name, fn in V.VIEWS.items():
        try:
            fn(rollup).collect()
        except Exception as exc:  # noqa: BLE001
            failures.append((f"view:{name}", str(exc).splitlines()[0][:160]))
    try:
        ss = spark.read.parquet(f"{root}/silver/oura_daily_sleep")
        V.sleep_architecture(rollup, stg_sleep(ss)).collect()
    except Exception as exc:  # noqa: BLE001
        failures.append(
            ("view:sleep_architecture", str(exc).splitlines()[0][:160])
        )
    # The product layer too: all 13 insight analyzers must REPORT on
    # degenerate data, not crash (first run found the timing-
    # correlation analyzer int(NaN)-aborting when qcut collapses on
    # constant workout output).
    from bio_lakehouse_spark.products.insights import default_analyzers

    analyzers = default_analyzers(
        spark,
        rollup,
        silver_root=f"{root}/silver",
        recovery_windows=gold.get("workout_recovery_windows"),
    )
    assert len(analyzers) == 13
    for a in analyzers:
        try:
            a.analyze()
        except Exception as exc:  # noqa: BLE001
            failures.append(
                (
                    f"analyzer:{type(a).__name__}",
                    str(exc).splitlines()[0][:160],
                )
            )
    assert not failures, (
        f"{len(failures)} bio stages aborted on degenerate bronze:\n"
        + "\n".join(f"  {n}: {m}" for n, m in failures)
    )


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    """Fully-EMPTY twin: every table 0 rows with the real schemas.
    Distinct from the degenerate corpus (degenerate-but-present data)
    — this is the upstream-config-error case."""
    duckdb = pytest.importorskip("duckdb")
    out = tmp_path_factory.mktemp("empty_sf")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') "
            f"LIMIT 0) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(out)


# The classified empty-source failure set (r12 sweep, named-error
# contracts added r13): feeders/sinks/replays that derive artifacts
# from the source and re-read them. On a fully-empty SOURCE TABLE
# they fail LOUD — by contract — but with EmptySourceTableError, not
# a raw PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA / INVALID_ARRAY_INDEX
# traceback. Everything else must run clean (301/308 in the r12
# ad-hoc sweep; the permanent net now enforces both halves).
_EMPTY_SOURCE_FAIL_LOUD = {
    "binary_file_decode_scan",
    "ann_ivf_indexed",
    "pca_power_iteration_audit",
    "partitioned_sink_pruned_read",
    "orc_sink_pruned_read",
    "msprt_streaming_replay",
    "stream_dedup_ingest_replay",
}


def test_every_registry_query_on_empty_corpus(spark, empty_sf):
    """The empty-corpus net, permanent as of r13: a 0-row source must
    yield an empty/NULL result everywhere EXCEPT the seven classified
    artifact-deriving queries, which must raise the NAMED
    EmptySourceTableError — never a raw engine traceback."""
    from bio_lakehouse_spark.suite import REGISTRY
    from bio_lakehouse_spark.suite.registry import EmptySourceTableError

    failures: list[tuple[str, str]] = []
    for name, entry in REGISTRY.items():
        try:
            entry.fn(spark, empty_sf).collect()
        except EmptySourceTableError:
            if name not in _EMPTY_SOURCE_FAIL_LOUD:
                failures.append(
                    (name, "unexpected EmptySourceTableError")
                )
            continue
        except Exception as exc:  # noqa: BLE001 — collected for report
            first = f"{type(exc).__name__}: {exc}".splitlines()[0][:160]
            failures.append((name, first))
            continue
        if name in _EMPTY_SOURCE_FAIL_LOUD:
            failures.append(
                (name, "expected EmptySourceTableError, ran clean")
            )
    assert not failures, (
        f"{len(failures)} queries broke the empty-corpus contract:\n"
        + "\n".join(f"  {n}: {m}" for n, m in failures)
    )


@pytest.fixture(scope="module")
def noref_sf(tmp_path_factory):
    """Empty-REFERENCE-SLICE twin (the ADVICE r12 shape,
    generalized): every table normal, but every doc_id shifted up by
    1000 so the doc_id<100 training/reference slices several LM/text
    queries depend on are empty while the corpus itself is not —
    unreachable from both the empty net (no corpus either) and the
    degenerate net (its doc_ids start at 0). First run found the KN
    bigram model's 0/0 ANSI abort on t = v = 0."""
    duckdb = pytest.importorskip("duckdb")
    out = tmp_path_factory.mktemp("noref_sf")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        f"COPY (SELECT doc_id + 1000 AS doc_id, text, lang, source, "
        f"n_chars FROM read_parquet('{src}/documents.parquet')) "
        f"TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    return str(out)


def test_every_registry_query_survives_noref_corpus(spark, noref_sf):
    """An empty reference/training slice must yield NULL scores (an
    undefined model scores nothing), never a job abort. Exception by
    contract: binary_file_decode_scan's fixture slice (doc_id < 64)
    is empty here, so its named EmptySourceTableError is the correct
    loud failure."""
    from bio_lakehouse_spark.suite import REGISTRY
    from bio_lakehouse_spark.suite.registry import EmptySourceTableError

    failures: list[tuple[str, str]] = []
    for name, entry in REGISTRY.items():
        try:
            entry.fn(spark, noref_sf).collect()
        except EmptySourceTableError:
            if name != "binary_file_decode_scan":
                failures.append((name, "unexpected EmptySourceTableError"))
        except Exception as exc:  # noqa: BLE001 — collected for report
            first = f"{type(exc).__name__}: {exc}".splitlines()[0][:160]
            failures.append((name, first))
    assert not failures, (
        f"{len(failures)} queries aborted on the no-reference corpus:\n"
        + "\n".join(f"  {n}: {m}" for n, m in failures)
    )


@pytest.fixture(scope="module")
def nan_sf(tmp_path_factory):
    """NaN-laced twin: NaN is a LEGAL double in parquet, Spark orders
    it ABOVE every number (non-IEEE, so `NaN >= x` filters PASS it),
    and ANSI raises on NaN→integral casts — three behaviors a
    zeros-or-extremes fixture cannot reach. NaNs are MIXED with real
    values so every query still has a working majority of rows."""
    duckdb = pytest.importorskip("duckdb")
    out = tmp_path_factory.mktemp("nan_sf")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    queries = {
        "region": f"SELECT * FROM read_parquet('{src}/region.parquet')",
        "nation": f"SELECT * FROM read_parquet('{src}/nation.parquet')",
        "customer": f"""SELECT c_custkey, c_name, c_nationkey,
            CASE WHEN c_custkey % 3 = 0 THEN 'NaN'::DOUBLE ELSE c_acctbal END AS c_acctbal,
            c_mktsegment FROM read_parquet('{src}/customer.parquet') LIMIT 20""",
        "supplier": f"SELECT * FROM read_parquet('{src}/supplier.parquet') LIMIT 5",
        "part": f"SELECT * FROM read_parquet('{src}/part.parquet') LIMIT 10",
        "orders": f"""SELECT o_orderkey, o_custkey, o_orderstatus,
            CASE WHEN o_orderkey % 3 = 0 THEN 'NaN'::DOUBLE ELSE o_totalprice END AS o_totalprice,
            o_orderdate, o_orderpriority FROM read_parquet('{src}/orders.parquet') LIMIT 30""",
        "lineitem": f"""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
            CASE WHEN l_linenumber % 2 = 0 THEN 'NaN'::DOUBLE ELSE l_quantity END AS l_quantity,
            CASE WHEN l_orderkey % 3 = 0 THEN 'NaN'::DOUBLE ELSE l_extendedprice END AS l_extendedprice,
            l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{src}/lineitem.parquet') LIMIT 60""",
        "events": f"""SELECT event_id, ts, user_id, event_type,
            CASE WHEN event_id % 4 = 0 THEN 'NaN'::DOUBLE ELSE value END AS value,
            props FROM read_parquet('{src}/events.parquet') LIMIT 60""",
        "documents": f"SELECT * FROM read_parquet('{src}/documents.parquet') LIMIT 8",
        "embeddings": f"""SELECT vec_id,
            CAST(list_transform(embedding, x -> CASE WHEN vec_id % 3 = 0 THEN 'NaN'::FLOAT ELSE x END) AS FLOAT[]) AS embedding,
            label FROM read_parquet('{src}/embeddings.parquet') LIMIT 8""",
    }
    for t, sql in queries.items():
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    return str(out)


@pytest.fixture(scope="module")
def allnull_sf(tmp_path_factory):
    """All-NULL-PAYLOAD twin: rows present, keys/join columns real,
    every payload column (measures, text, categorical types,
    embeddings, names) NULL — the misconfigured-upstream shape the
    empty net (0 rows) and the degenerate net (values present) both
    miss. First run found five real aborts: bytes(None) in both
    multimodal UDTF generators, an all-zero pivot total divided
    under ANSI, float(None) on an all-NULL binseg gain, and a
    NULL-label point matching no centroid under a 0-index."""
    duckdb = pytest.importorskip("duckdb")
    out = tmp_path_factory.mktemp("allnull_sf")
    src = "/root/testdata/sf0.001"
    con = duckdb.connect()
    queries = {
        "region": f"SELECT r_regionkey, NULL::VARCHAR AS r_name FROM read_parquet('{src}/region.parquet')",
        "nation": f"SELECT n_nationkey, NULL::VARCHAR AS n_name, n_regionkey FROM read_parquet('{src}/nation.parquet')",
        "customer": f"SELECT c_custkey, NULL::VARCHAR AS c_name, c_nationkey, NULL::DOUBLE AS c_acctbal, NULL::VARCHAR AS c_mktsegment FROM read_parquet('{src}/customer.parquet') LIMIT 20",
        "supplier": f"SELECT s_suppkey, NULL::VARCHAR AS s_name, s_nationkey, NULL::DOUBLE AS s_acctbal FROM read_parquet('{src}/supplier.parquet') LIMIT 5",
        "part": f"SELECT p_partkey, NULL::VARCHAR AS p_name, NULL::VARCHAR AS p_brand, NULL::VARCHAR AS p_type, NULL::INT AS p_size, NULL::DOUBLE AS p_retailprice FROM read_parquet('{src}/part.parquet') LIMIT 10",
        "orders": f"SELECT o_orderkey, o_custkey, NULL::VARCHAR AS o_orderstatus, NULL::DOUBLE AS o_totalprice, o_orderdate, NULL::VARCHAR AS o_orderpriority FROM read_parquet('{src}/orders.parquet') LIMIT 30",
        "lineitem": f"SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, NULL::DOUBLE AS l_quantity, NULL::DOUBLE AS l_extendedprice, NULL::DOUBLE AS l_discount, NULL::DOUBLE AS l_tax, NULL::VARCHAR AS l_returnflag, NULL::VARCHAR AS l_linestatus, l_shipdate FROM read_parquet('{src}/lineitem.parquet') LIMIT 60",
        "events": f"SELECT event_id, ts, user_id, NULL::VARCHAR AS event_type, NULL::DOUBLE AS value, NULL::VARCHAR AS props FROM read_parquet('{src}/events.parquet') LIMIT 60",
        "documents": f"SELECT doc_id, NULL::VARCHAR AS text, NULL::VARCHAR AS lang, NULL::VARCHAR AS source, NULL::BIGINT AS n_chars FROM read_parquet('{src}/documents.parquet') LIMIT 8",
        "embeddings": f"SELECT vec_id, NULL::FLOAT[] AS embedding, NULL::INT AS label FROM read_parquet('{src}/embeddings.parquet') LIMIT 8",
    }
    for t, sql in queries.items():
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    return str(out)


def test_every_registry_query_survives_allnull_corpus(spark, allnull_sf):
    """No registry query may ABORT on all-NULL payloads: NULL
    statistics, empty results, and dropped NULL-payload rows are all
    fine; exceptions are not. Exception by contract:
    pca_power_iteration_audit — an all-NULL embedding column yields
    NO covariance data at all, which is the empty-source class, and
    its named EmptySourceTableError (not a raw traceback) is the
    correct loud failure."""
    from bio_lakehouse_spark.suite import REGISTRY
    from bio_lakehouse_spark.suite.registry import EmptySourceTableError

    failures: list[tuple[str, str]] = []
    for name, entry in REGISTRY.items():
        try:
            entry.fn(spark, allnull_sf).collect()
        except EmptySourceTableError:
            if name != "pca_power_iteration_audit":
                failures.append((name, "unexpected EmptySourceTableError"))
        except Exception as exc:  # noqa: BLE001 — collected for report
            first = f"{type(exc).__name__}: {exc}".splitlines()[0][:160]
            failures.append((name, first))
    assert not failures, (
        f"{len(failures)} queries aborted on the all-NULL corpus:\n"
        + "\n".join(f"  {n}: {m}" for n, m in failures)
    )


def test_every_registry_query_survives_nan_corpus(spark, nan_sf):
    """First run found two aborts: Benford's `NaN >= 1` filter leak
    (Spark sorts NaN above numbers) landing digit 0 → divide-by-zero,
    and the weighted median's quantity cast hitting ANSI
    CAST_OVERFLOW on one NaN weight. NaN rows may yield NaN/NULL
    outputs or be excluded; they must never abort the job."""
    from bio_lakehouse_spark.suite import REGISTRY

    failures: list[tuple[str, str]] = []
    for name, entry in REGISTRY.items():
        try:
            entry.fn(spark, nan_sf).collect()
        except Exception as exc:  # noqa: BLE001 — collected for the report
            first = f"{type(exc).__name__}: {exc}".splitlines()[0][:160]
            failures.append((name, first))
    assert not failures, (
        f"{len(failures)} queries aborted on the NaN corpus:\n"
        + "\n".join(f"  {n}: {m}" for n, m in failures)
    )
