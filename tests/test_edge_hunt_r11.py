"""Round-11 library edge-hunt pins (VERDICT r10 #6): the operator
surfaces r10's third pass didn't reach — similarity PQ paths, packing
edge cases — in the style that found the weighted_sample and
sketch-null bugs. Each test pins either a fixed bug or a verified
edge contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _l2sq(u, v):
    return sum((a - b) * (a - b) for a, b in zip(u, v))


def test_pq_adc_small_codebook_lut_stride(spark):
    """r11 FIX: pq_adc_topk indexed the query LUT as s*k + j with the
    ``k`` PARAMETER — when the codebook holds k' < k codewords per
    subspace (pq_codebook_sampled's limit(k) on a small corpus),
    every s >= 1 lookup landed in the wrong LUT region or past the
    end (element_at → NULL, dist → NULL), silently. The stride now
    derives from the LUT itself. Verify exact ADC distances against
    a driver-side recompute on a 6-vector corpus with k'=6 < k=8."""
    from bio_lakehouse_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebook_sampled,
        pq_encode,
    )

    dim, m, k_param = 8, 2, 8
    vecs = [
        (i, [float((i * 7 + j * 3) % 11) for j in range(dim)])
        for i in range(6)
    ]
    corpus = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    cb = pq_codebook_sampled(
        corpus, m=m, k=k_param, stride=1, dim=dim
    )
    cb_rows = {(r.s, r.j): list(r.cw) for r in cb.collect()}
    k_eff = len({j for (_, j) in cb_rows})
    assert k_eff == 6 < k_param  # the edge under test

    codes = pq_encode(corpus, cb, m=m, dim=dim)
    code_map = {r.vec_id: list(r.codes) for r in codes.collect()}
    assert all(
        c is not None for cs in code_map.values() for c in cs
    ), "encode produced NULL codes"

    queries = corpus.filter(F.col("vec_id") == 0)
    out = pq_adc_topk(
        codes, queries, cb, k_results=5, m=m, k=k_param, dim=dim
    ).collect()
    assert len(out) == 5

    dsub = dim // m
    qv = vecs[0][1]
    for r in out:
        assert r.adc_dist is not None, "LUT misalignment → NULL dist"
        expect = sum(
            _l2sq(
                qv[s * dsub:(s + 1) * dsub],
                cb_rows[(s, code_map[r.neighbor_id][s])],
            )
            for s in range(m)
        )
        assert r.adc_dist == pytest.approx(expect, rel=1e-9), (
            r.neighbor_id, r.adc_dist, expect
        )


def test_pq_encode_empty_codebook_out_of_contract(spark):
    """Edge documented out-of-contract: an EMPTY codebook yields NULL
    codes (array_min over an empty candidate list), not a crash —
    pinned so the failure mode stays diagnosable rather than
    shifting silently."""
    from bio_lakehouse_spark.operators.similarity import pq_encode

    corpus = spark.createDataFrame(
        [(1, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    empty_cb = spark.createDataFrame(
        [], "s int, j int, cw array<double>"
    )
    rows = pq_encode(corpus, empty_cb, m=2, dim=8).collect()
    assert len(rows) == 1
    assert list(rows[0].codes) == [None, None]


def test_pack_pairs_zero_and_null_token_docs(spark):
    """Edge verified sound (VERDICT r10 #6 named it): zero-length
    docs pair like any shortest doc; NULL token counts sort as
    SHORTEST (desc window puts nulls last) and contribute nothing to
    pair_tok (sum skips nulls). Every doc appears exactly once."""
    from bio_lakehouse_spark.operators.packing import (
        pack_pairs_minimal_padding,
    )

    df = spark.createDataFrame(
        [(0, 10), (8, 6), (16, 0), (24, None)],
        "doc long, n_tok int",
    )
    out = pack_pairs_minimal_padding(df, "doc", "n_tok", n_shards=1)
    rows = {(r.long_id, r.short_id): r.pair_tok for r in out.collect()}
    # ranks desc: 10, 6, 0, NULL → pairs (10, NULL) and (6, 0)
    assert rows == {(0, 24): 10, (8, 16): 6}
    docs = {d for pair in rows for d in pair}
    assert docs == {0, 8, 16, 24}


def test_chunk_text_empty_and_null_docs(spark):
    """chunk_with_overlap: the empty string still yields one (empty)
    chunk (split('') = ['']); a NULL text drops the doc entirely
    (posexplode of NULL) — pinned as the contract."""
    from bio_lakehouse_spark.operators.packing import chunk_with_overlap

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a b c")],
        "doc_id long, text string",
    )
    rows = chunk_with_overlap(
        df, "doc_id", "text", chunk_size=2, overlap=1
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc  # NULL text → doc dropped
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == ""
    # n=3, chunk_size=2, stride=1 → ceil((3-2)/1)+1 = 2 chunks; every
    # token covered, no trailing 1-token chunk
    assert [c.chunk_text for c in sorted(by_doc[3], key=lambda c: c.chunk_id)] == [
        "a b", "b c"
    ]


# -- ANSI divide-by-zero audit (Spark 4 default ANSI mode) -------------------


def test_profile_columns_empty_frame_ansi(spark):
    """r11 FIX: profiling a rowless frame divided 0/0 for
    completeness and aborted under ANSI mode — an empty partition or
    table is a routine input for a data-quality gate. Completeness is
    NULL there now."""
    from pyspark.sql import functions as F

    from bio_lakehouse_spark.operators.profiling import profile_columns

    empty = spark.createDataFrame([], "a double, b string")
    rows = profile_columns(
        empty, {"a": F.col("a"), "b": F.col("b")}
    ).collect()
    assert {r.column_name for r in rows} == {"a", "b"}
    for r in rows:
        assert (r.n_rows, r.n_nulls, r.n_distinct) == (0, 0, 0)
        assert r.completeness is None


def test_pearson_ols_degenerate_groups_ansi(spark):
    """r11 FIX: under ANSI mode F.corr itself raises on a constant-x
    group (zero variance), the t-stat raises on |r|=1, and stderr
    raises on n=2 (t=0) — one such group in a per-entity scan aborted
    the whole job. All now NULL via try_divide; healthy groups are
    unaffected (checked against scipy-style closed forms)."""
    from bio_lakehouse_spark.operators.stats import pearson_ols

    rows = [("c", 5.0, float(i)) for i in range(10)]
    rows += [("n2", 1.0, 3.0), ("n2", 2.0, 5.0)]
    rows += [("ok", float(i), float(i % 4) + 0.1 * i) for i in range(12)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in pearson_ols(df, "x", "y", ["g"]).collect()}

    c = out["c"]
    assert (c.r, c.slope, c.intercept, c.t_stat, c.stderr) == (
        None, None, None, None, None,
    )
    n2 = out["n2"]
    assert n2.slope == pytest.approx(2.0)
    assert n2.t_stat == pytest.approx(0.0) and n2.stderr is None

    import statistics
    xs = [r[1] for r in rows if r[0] == "ok"]
    ys = [r[2] for r in rows if r[0] == "ok"]
    ok = out["ok"]
    assert ok.r == pytest.approx(statistics.correlation(xs, ys), rel=1e-9)
    mx, my = statistics.mean(xs), statistics.mean(ys)
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / (len(xs) - 1)
    varx = statistics.variance(xs)
    assert ok.slope == pytest.approx(cov / varx, rel=1e-9)


def test_rolling_corr_constant_window_ansi(spark):
    """r11 FIX: a rolling frame holding >=2 rows of a constant series
    crashed F.corr under ANSI mode (a flat fortnight in either metric
    kills the job). NULL for those frames now; varying frames still
    match pandas rolling corr."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bio_lakehouse_spark.operators.windows import rolling_corr

    vals = [1.0, 1.0, 1.0, 2.0, 4.0, 3.0, 5.0, 4.5]
    other = [2.0, 3.0, 2.5, 2.0, 5.0, 4.0, 6.0, 5.5]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(zip(vals, other))],
        "d long, x double, y double",
    )
    out = [
        r.rc
        for r in df.select(
            "d", rolling_corr("x", "y", "d", 2).alias("rc")
        ).orderBy("d").collect()
    ]
    expect = (
        pd.Series(vals).rolling(3, min_periods=1).corr(pd.Series(other))
    )
    for got, want in zip(out, expect):
        if got is None:
            assert pd.isna(want)
        else:
            assert got == pytest.approx(want, rel=1e-9)


def test_stats_toolkit_degenerate_inputs_ansi(spark):
    """r11 ANSI sweep, remaining toolkit: every final-statistic
    division whose denominator can legitimately hit zero now yields
    NULL (scipy-NaN semantics) instead of aborting the job under
    ANSI mode. One probe per fixed site."""
    from pyspark.sql import functions as F

    from bio_lakehouse_spark.operators import stats as S

    const2g = spark.createDataFrame(
        [(i, "a" if i < 5 else "b", 5.0) for i in range(10)],
        "t long, g string, v double",
    )
    # all-tied pool: sigma = 0 → z NULL (u1 still finite)
    r = S.mann_whitney_u(const2g, "v", "g", "a", "b").collect()[0]
    assert r.z is None and r.u1 is not None
    # one arm absent: n*(n-1) path + z
    r = S.mann_whitney_u(
        const2g.filter("g = 'a'"), "v", "g", "a", "b"
    ).collect()[0]
    assert (r.n2, r.z) == (0, None)
    # two constant groups: t and dof NULL
    r = S.welch_t(const2g, "v", "g", "a", "b").collect()[0]
    assert r.t_stat is None and r.welch_df is None
    # one group absent: that ECDF undefined
    r = S.ks_two_sample(
        const2g.filter("g = 'a'"), "v", "g", "a", "b"
    ).collect()[0]
    assert r.ks_d is None
    # constant series: shared ACF denominator and CUSUM sigma
    cs = spark.createDataFrame(
        [(i, 3.0) for i in range(12)], "d long, v double"
    )
    assert all(x.acf is None for x in S.acf(cs, "d", "v", 2).collect())
    assert S.cusum_changepoint(cs, "d", "v").collect()[0].stat is None
    # constant covariate: Cox information = 0, Poisson Hessian
    # singular, Huber/OLS var(x) = 0
    xy = spark.createDataFrame(
        [(float(i), 5.0, 1) for i in range(8)], "t double, x double, ev int"
    )
    r = S.cox_ph_newton(xy.select("t", "ev", "x")).collect()[0]
    assert r.beta is None and r.se is None
    hc = spark.createDataFrame(
        [(5.0, float(i)) for i in range(9)], "x double, y double"
    )
    assert S.huber_irls_fit(hc).collect()[0].b is None
    assert S.poisson_glm_fit(hc).collect()[0].b1 is None
    # single-class AUC
    one = spark.createDataFrame(
        [(float(i), 1) for i in range(6)], "s double, y int"
    )
    r = S.auc_rank_sum(one, F.col("s"), F.col("y")).collect()[0]
    assert r.auc is None
    # constant pre+post periods: Bayesian posterior undefined
    pp = spark.createDataFrame(
        [("pre", 5.0)] * 4 + [("post", 5.0)] * 4, "period string, v double"
    )
    assert S.bayesian_effect(pp, "v", "period").collect()[0].effect is None
    # all-zero-weight isotonic span imposes no constraint (no crash)
    iso = spark.createDataFrame(
        [(1, 1.0, 0.0), (2, 5.0, 0.0), (3, 2.0, 1.0)],
        "d int, y double, w double",
    )
    rows = S.isotonic_fit_ordered(iso, "d", "y", "w").collect()
    assert len(rows) == 3  # fit still produced for every position
    # logrank with every risk set of size 1: Σv = 0 → chi2 NULL
    lr = spark.createDataFrame(
        [(1, 1, 1.0)], "g int, ev int, t double"
    )
    assert S.logrank_two_groups(lr).collect()[0].logrank_chi2 is None
