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
