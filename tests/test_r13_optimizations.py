"""Equivalence pins for the r13 expression-level optimizations.

Both rewrites claim *identical values* from a cheaper expression tree;
these tests pin that claim against the straightforward reference form
on fixtures chosen to hit the tie/NULL/zero-evidence edges, so a future
refactor can't silently change semantics where the oracle fixtures
happen not to look.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


class TestAvgRankFrame:
    """_avg_rank's tie count rides the rank's own window spec as a
    RANGE CURRENT ROW..CURRENT ROW frame. Peers of the order key are
    exactly the rows tied on it (NULLs mutually peers), so the frame
    count must equal the old Window.partitionBy(partition, col)
    count on every input, including ties and NULLs."""

    ROWS = [
        # (grp, v) — ties within group, a NULL pair, a lone NULL,
        # negative values, a singleton group
        ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", None), ("a", None),
        ("b", -3.0), ("b", -3.0), ("b", -3.0), ("b", 7.0),
        ("c", None),
        ("d", 0.0),
    ]

    def test_frame_tie_count_matches_two_window_form(self, spark):
        df = spark.createDataFrame(self.ROWS, "grp string, v double")
        w = Window.partitionBy("grp").orderBy("v")
        new = F.rank().over(w) + (
            F.count(F.lit(1)).over(w.rangeBetween(0, 0)) - 1
        ) / 2.0
        old = F.rank().over(w) + (
            F.count(F.lit(1)).over(Window.partitionBy("grp", "v")) - 1
        ) / 2.0
        out = df.select(
            new.alias("r_new"), old.alias("r_old")
        ).collect()
        assert all(r.r_new == r.r_old for r in out), out

    def test_avg_rank_is_scipy_average_rank(self, spark):
        # midrank identity on a concrete series: [10, 20, 20, 30]
        # → ranks [1, 2.5, 2.5, 4] (scipy.stats.rankdata 'average')
        from bio_lakehouse_spark.operators.stats import _avg_rank

        df = spark.createDataFrame(
            [(10.0,), (20.0,), (20.0,), (30.0,)], "v double"
        )
        got = sorted(
            r[0] for r in df.select(_avg_rank("v").alias("r")).collect()
        )
        assert got == [1.0, 2.5, 2.5, 4.0]


class TestPredictedLangLetBound:
    """predicted_lang's let-bound score array must reproduce the old
    dict-of-columns argmax exactly: same >= tie-break (first language
    in STOPWORDS order wins), zero-evidence docs resolve to the first
    language, 'und' unreachable."""

    def _old_form(self, words_col):
        from bio_lakehouse_spark.operators.textops import (
            STOPWORDS,
            stopword_hits,
        )

        scores = {lang: stopword_hits(words_col, lang) for lang in STOPWORDS}
        langs = list(STOPWORDS)
        expr = None
        for lang in langs:
            others = [scores[o] for o in langs if o != lang]
            cond = scores[lang] >= F.greatest(*others)
            expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
        return expr.otherwise("und")

    def test_matches_old_form_including_zero_evidence(self, spark):
        from bio_lakehouse_spark.operators.textops import (
            predicted_lang,
            words,
        )

        rows = [
            ("the quick brown fox and the lazy dog",),   # en evidence
            ("el perro y la casa de los gatos",),        # es evidence
            ("xyzzy plugh qwerty",),                     # zero evidence
            ("",),                                       # empty text
            ("the el und le der",),                      # cross-lang tie bait
        ]
        df = spark.createDataFrame(rows, "text string")
        out = df.select(
            predicted_lang(words("text")).alias("new"),
            self._old_form(words("text")).alias("old"),
        ).collect()
        assert all(r.new == r.old for r in out), out
        # zero-evidence rows resolve via the >= tie-break, never 'und'
        assert all(r.new != "und" for r in out)
