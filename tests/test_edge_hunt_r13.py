"""Edge-hunt round 4 (r13).

Targets the surfaces VERDICT r12 #6 named as still-unswept — the SQL
facade's cache/log edges, sources/files.py listing edges,
products/render.py spec-building — plus the two ADVICE r12 items
(the unigram tercile INVALID_INDEX_OF_ZERO and the mode tie-break
contract) and named-error wrappers for the empty-source-table
failure class the r12 empty-corpus sweep identified.
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------- #
# ADVICE r12 #1 (medium): unigram_lm_quality all-NULL score list.
# ---------------------------------------------------------------- #


@pytest.fixture(scope="module")
def no_ref_docs_sf(tmp_path_factory):
    """documents where NO doc_id < 100: the reference slice is empty,
    so the LM denominator is NULL, every mean_nll is NULL, and the
    tercile collect_list is EMPTY while the scored side is NOT —
    Catalyst's empty-relation propagation can't rescue the cut
    subquery (which is why the r12 empty-corpus sweep, whose tables
    were fully empty, never reached this abort)."""
    duckdb = pytest.importorskip("duckdb")
    out = tmp_path_factory.mktemp("no_ref_sf")
    con = duckdb.connect()
    con.execute(
        f"""COPY (
            SELECT (100 + i)::BIGINT AS doc_id,
                   'aaa bbb ccc' AS text,
                   'en' AS lang, 'web' AS source, 11::BIGINT AS n_chars
            FROM range(4) t(i)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)"""
    )
    return str(out)


def test_unigram_lm_quality_survives_all_null_scores(spark, no_ref_docs_sf):
    """ADVICE r12: try_element_at does NOT suppress index 0 — only
    out-of-bounds — so the r12 guard still aborted on an all-NULL
    mean_nll corpus. The index itself is now nullif'd to NULL; with
    NULL cuts every doc lands in 'tail' and nothing aborts."""
    from bio_lakehouse_spark.suite import REGISTRY

    rows = REGISTRY["unigram_lm_quality"].fn(spark, no_ref_docs_sf).collect()
    assert len(rows) == 4
    assert all(r["bucket"] == "tail" for r in rows)
    assert all(r["mean_nll"] is None for r in rows)


# ---------------------------------------------------------------- #
# ADVICE r12 #2 (low): mode_median_by_type NULL-bin mode contract.
# ---------------------------------------------------------------- #


def test_mode_null_bin_contract(spark, tmp_path):
    """The NULL bin (NaN or out-of-BIGINT-range value) wins the mode
    ONLY when strictly most frequent; on a frequency tie it loses to
    every real bin, and real-bin ties break to the smaller bin — the
    documented deterministic contract. Also pins the r13 fix of the
    r12 false premise: floor(double) saturates (never NULL), and NaN
    used to floor to 0, polluting the genuine [0,10) bin's count."""
    from bio_lakehouse_spark.suite import REGISTRY

    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    # 'dom': 3 out-of-range + 2 in bin 1 → NULL wins (strictly more).
    # 'tie': 2 out-of-range + 2 in bin 1 → real bin 1 wins the tie.
    # 'two': 2 in bin 3 + 2 in bin 7 → smaller real bin 3 wins.
    con.execute(
        f"""COPY (
            SELECT * FROM (VALUES
              (1, TIMESTAMP '2024-01-01', 1, 'dom', 1e300, '{{}}'),
              (2, TIMESTAMP '2024-01-01', 1, 'dom', 1e300, '{{}}'),
              (3, TIMESTAMP '2024-01-01', 1, 'dom', -1e300, '{{}}'),
              (4, TIMESTAMP '2024-01-01', 1, 'dom', 12.0, '{{}}'),
              (5, TIMESTAMP '2024-01-01', 1, 'dom', 13.0, '{{}}'),
              (6, TIMESTAMP '2024-01-01', 1, 'tie', 1e300, '{{}}'),
              (7, TIMESTAMP '2024-01-01', 1, 'tie', -1e300, '{{}}'),
              (8, TIMESTAMP '2024-01-01', 1, 'tie', 12.0, '{{}}'),
              (9, TIMESTAMP '2024-01-01', 1, 'tie', 13.0, '{{}}'),
              (10, TIMESTAMP '2024-01-01', 1, 'two', 31.0, '{{}}'),
              (11, TIMESTAMP '2024-01-01', 1, 'two', 32.0, '{{}}'),
              (12, TIMESTAMP '2024-01-01', 1, 'two', 71.0, '{{}}'),
              (13, TIMESTAMP '2024-01-01', 1, 'two', 72.0, '{{}}'),
              (14, TIMESTAMP '2024-01-01', 1, 'nan', 'NaN'::DOUBLE, '{{}}'),
              (15, TIMESTAMP '2024-01-01', 1, 'nan', 'NaN'::DOUBLE, '{{}}'),
              (16, TIMESTAMP '2024-01-01', 1, 'nan', 5.0, '{{}}')
            ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{tmp_path}/events.parquet' (FORMAT PARQUET)"""
    )
    rows = {
        r["event_type"]: r
        for r in REGISTRY["mode_median_by_type"].fn(spark, str(tmp_path)).collect()
    }
    assert rows["dom"]["mode_bin"] is None and rows["dom"]["mode_freq"] == 3
    assert rows["tie"]["mode_bin"] == 1 and rows["tie"]["mode_freq"] == 2
    assert rows["two"]["mode_bin"] == 3 and rows["two"]["mode_freq"] == 2
    # NaN must NOT floor into bin 0: it joins the NULL bin, which
    # here is strictly dominant (2 NaN vs one value in bin 0).
    assert rows["nan"]["mode_bin"] is None and rows["nan"]["mode_freq"] == 2


# ---------------------------------------------------------------- #
# engine/facade.py cache/log edges (VERDICT r12 #6).
# ---------------------------------------------------------------- #


def test_facade_use_cache_false_refreshes_entry(spark):
    """use_cache=False bypasses the probe but still REFRESHES the
    entry (the reference's force-refresh semantics): a later cached
    call returns the refreshed handle, not the stale one."""
    from bio_lakehouse_spark.engine.facade import QueryEngine

    eng = QueryEngine(spark, cache_ttl_s=600.0)
    a = eng.execute("SELECT 7 AS x")
    b = eng.execute("SELECT 7 AS x", use_cache=False)
    assert b is not a
    assert eng.execute("SELECT 7 AS x") is b


def test_facade_failed_query_not_cached(spark):
    """A query that raises at execution never poisons the cache: the
    same text re-executes (and can succeed once the table exists)."""
    from bio_lakehouse_spark.engine.facade import QueryEngine

    eng = QueryEngine(spark, cache_ttl_s=600.0)
    sql = "SELECT * FROM facade_r13_probe"
    with pytest.raises(Exception):
        eng.execute(sql)
    spark.range(3).createOrReplaceTempView("facade_r13_probe")
    try:
        assert eng.execute(sql).count() == 3
    finally:
        spark.catalog.dropTempView("facade_r13_probe")


def test_facade_cache_key_is_textual(spark):
    """The cache key is md5 of the exact text (the reference's
    contract): whitespace-differing but semantically identical SQL
    occupies distinct entries."""
    from bio_lakehouse_spark.engine.facade import QueryEngine

    eng = QueryEngine(spark, cache_ttl_s=600.0)
    a = eng.execute("SELECT 1 AS one")
    b = eng.execute("SELECT  1 AS one")
    assert a is not b


def test_facade_invalidate_cache(spark):
    from bio_lakehouse_spark.engine.facade import QueryEngine

    eng = QueryEngine(spark, cache_ttl_s=600.0)
    a = eng.execute("SELECT 2 AS two")
    eng.invalidate_cache()
    assert eng.execute("SELECT 2 AS two") is not a


def test_facade_gate_blocks_empty_and_set_and_show(spark):
    """Empty/whitespace/comment-only statements and session-mutating
    commands (SET, SHOW, EXPLAIN) are all refused — SET especially:
    an untrusted source must not flip session confs (ANSI off, AQE
    off) through the read-only facade."""
    from bio_lakehouse_spark.engine.facade import (
        QueryEngine,
        UnsafeSqlError,
    )

    eng = QueryEngine(spark)
    for sql in (
        "",
        "   ",
        "-- just a comment",
        "/* unterminated",
        "SET spark.sql.ansi.enabled=false",
        "SHOW TABLES",
        "EXPLAIN SELECT 1",
    ):
        with pytest.raises(UnsafeSqlError):
            eng.execute(sql)


def test_facade_error_row_logged_for_runtime_failure(spark, tmp_path):
    """A statement that passes the gate but fails at execution still
    writes a success=False log row carrying the engine's error text
    (the gate-blocked path was already pinned; this is the other
    failure leg of S15)."""
    from bio_lakehouse_spark.engine.facade import QueryEngine

    log = str(tmp_path / "qlog_r13")
    eng = QueryEngine(spark, log_path=log)
    with pytest.raises(Exception):
        eng.execute("SELECT * FROM table_that_does_not_exist_r13")
    rows = spark.read.parquet(log).collect()
    assert len(rows) == 1
    assert rows[0]["success"] is False
    assert rows[0]["n_rows"] == -1
    assert "table_that_does_not_exist_r13" in rows[0]["error"].lower() or (
        rows[0]["error"] != ""
    )


def test_facade_schema_cache_is_engine_lifetime(spark):
    """get_schema snapshots the catalog ONCE per engine (S9's
    documented lifetime cache): a view created afterwards is invisible
    to the old engine and visible to a fresh one."""
    from bio_lakehouse_spark.engine.facade import QueryEngine

    eng = QueryEngine(spark)
    eng.get_schema()
    spark.range(1).createOrReplaceTempView("schema_cache_probe_r13")
    try:
        assert "schema_cache_probe_r13" not in eng.get_schema()
        assert "schema_cache_probe_r13" in QueryEngine(spark).get_schema()
    finally:
        spark.catalog.dropTempView("schema_cache_probe_r13")


# ---------------------------------------------------------------- #
# sources/files.py listing edges (VERDICT r12 #6).
# ---------------------------------------------------------------- #


def test_latest_file_mtime_tie_breaks_by_path(tmp_path):
    """Equal mtimes (same-second exports are routine on FAT/S3-backed
    mounts) must resolve deterministically: lexicographically last
    path wins."""
    import os

    from bio_lakehouse_spark.sources.files import latest_file

    t = 1_700_000_000
    for name in ("export_b.csv", "export_c.csv", "export_a.csv"):
        p = tmp_path / name
        p.write_text("x\n")
        os.utime(p, (t, t))
    assert latest_file(tmp_path, "export_*.csv").endswith("export_c.csv")


def test_list_files_missing_root_and_nested(tmp_path):
    """A missing root lists as empty (so latest_file gives the NAMED
    FileNotFoundError, not an OS traceback), and listing is recursive
    + path-sorted."""
    from bio_lakehouse_spark.sources.files import latest_file, list_files

    assert list_files(tmp_path / "does_not_exist") == []
    with pytest.raises(FileNotFoundError):
        latest_file(tmp_path / "does_not_exist")
    (tmp_path / "sub" / "deeper").mkdir(parents=True)
    (tmp_path / "sub" / "deeper" / "b.csv").write_text("1\n")
    (tmp_path / "a.csv").write_text("1\n")
    got = list_files(tmp_path, "*.csv")
    assert [p.split("/")[-1] for p in got] == ["a.csv", "b.csv"]


# ---------------------------------------------------------------- #
# products/render.py spec-building edges (VERDICT r12 #6).
# ---------------------------------------------------------------- #


def _mk_result(name, narrative, stats=None, caveats=None, data=None):
    from bio_lakehouse_spark.products.insights import InsightResult

    return InsightResult(
        name=name,
        narrative=narrative,
        statistics=stats or {},
        caveats=caveats or [],
        data=data,
    )


def test_plot_spec_edges():
    """Spec-building never raises on missing/degenerate inputs: bad x,
    no surviving y columns, unknown kind, empty frame, and a
    single-point threshold chart (no 2-point line possible) all
    degrade to None or a threshold-less figure."""
    import pandas as pd

    from bio_lakehouse_spark.products.render import plot_spec_to_plotly

    df = pd.DataFrame({"day": ["2024-01-01"], "v": [1.0]})
    assert plot_spec_to_plotly({"kind": "table"}, df) is None
    assert plot_spec_to_plotly({"kind": "line", "x": "nope", "y": "v"}, df) is None
    assert plot_spec_to_plotly({"kind": "line", "x": "day", "y": ["zz"]}, df) is None
    assert plot_spec_to_plotly({"kind": "sunburst", "x": "day", "y": "v"}, df) is None
    assert plot_spec_to_plotly({"kind": "line", "x": "day", "y": "v"}, None) is None
    assert (
        plot_spec_to_plotly({"kind": "line", "x": "day", "y": "v"}, df.iloc[:0])
        is None
    )
    fig = plot_spec_to_plotly(
        {"kind": "scatter+threshold", "x": "day", "y": "v", "threshold": 2.0},
        df,
    )
    assert fig is not None and len(fig["data"]) == 1  # no 1-pt line
    # NaN cells serialize as None (JSON-safe), never the string 'nan'
    df2 = pd.DataFrame({"day": ["d1", "d2"], "v": [1.0, float("nan")]})
    fig2 = plot_spec_to_plotly({"kind": "line", "x": "day", "y": "v"}, df2)
    assert fig2["data"][0]["y"] == [1.0, None]


def test_render_weekly_html_escapes_script_breakout():
    """A narrative (or caveat) containing '</script><script>' must
    come out autoescaped, and the figure-JSON block's '</' sequences
    are backslash-escaped — neither path can close the script tag."""
    from bio_lakehouse_spark.products.render import render_weekly_html

    import pandas as pd

    evil = "</script><script>alert(1)</script>"
    html = render_weekly_html(
        "2024-W01",
        [
            _mk_result(
                "probe",
                evil,
                stats={"k": 1.23456789, "d": {"a": 1}},
                caveats=[evil],
                data=pd.DataFrame({"day": ["d1", "d2"], "v": [1.0, 2.0]}),
            )
        ],
        specs={"probe": {"kind": "line", "x": "day", "y": "v",
                         "title": evil}},
    )
    assert "<script>alert(1)</script>" not in html
    assert "1.235" in html  # float stat formatted %.4g
    assert "[1 entries]" in html  # dict stat summarized
    # the chart title rides inside the JSON block — '</' must be
    # escaped there so it cannot terminate the surrounding <script>
    assert "<\\/script>" in html
