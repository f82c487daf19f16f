"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The registry lives in ``bio_lakehouse_spark.suite`` — one entry per
implemented operator from SURVEY.md §2 plus the training-pipeline
operators (dedup / similarity / text / multimodal).
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)

from bio_lakehouse_spark.suite import REGISTRY  # noqa: E402


def _last_green_round() -> dict[str, int]:
    """name → most recent round in which the driver recorded a FULLY
    green row (err None + rows + schema + hash all matching; a
    rows-only ``no_oracle`` row is NOT green — those queries keep
    their spot at the front so a future oracle can gate them).

    The driver sweeps ``queries()`` in dict order with a per-round
    entry cap (r01 covered exactly the first 50 of 131), so ordering
    matters: never-verified queries come first, then previously-green
    queries in least-recently-verified order — so old greens rotate
    back through the sweep and regressions (e.g. sessionize_gap30,
    green r1 → broken r2) can't hide behind a permanent demotion.
    """
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        except ValueError:
            rnd = 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _round_file_mtime() -> dict[int, float]:
    out: dict[int, float] = {}
    for path in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
            out[rnd] = os.path.getmtime(path)
        except (ValueError, OSError):
            continue
    return out


# Queries whose standing green row certifies OLD code (the fix landed
# after the round that produced the green, and the change is one the
# builder DELIBERATELY wants re-certified before anything else) —
# pinned to the front of the sweep until a fresh driver row appears.
# The r8 pins (orc_sink_pruned_read, dedup_simhash_pairs) both went
# green in r08 and have self-retired. Round-9 pins: the three queries
# whose plans changed this round (single-partition global rank sorts
# replaced by the dense_ids partition-offset rank; adaptive
# cardinality-derived blocking for the Fellegi-Sunter linkage) —
# VERDICT r8 items #2 and #7 require fresh driver rows for each.
_FORCE_RECERT: dict[str, int] = {
    "orc_sink_pruned_read": 8,
    "dedup_simhash_pairs": 8,
    "gini_concentration_audit": 9,
    "hill_tail_index": 9,
    "entity_resolution_fs": 9,
    "fs_em_priors_audit": 9,
    # r10: the audit's Spark-side minhash prefixes were silently
    # garbage (two-parameter transform lambda bound the band index to
    # the array-index Column); fixed in operators/dedup.py — the r09
    # green certifies the old hash family, re-certify under the new.
    "minhash_lsh_recall_audit": 10,
    # r11 plan changes needing fresh driver rows: triangle_stats'
    # clustering gained a wedge-guard (ANSI divide-by-zero crash on
    # wedge-free graphs); pq_adc_topk's LUT stride now derives from
    # the LUT itself (k' < k codebooks misaligned silently). Both
    # strict-verified at all three SFs locally; pin until the driver
    # hashes them under the new plans.
    "graph_triangle_stats": 11,
    "pq_adc_topk": 11,
    "pq_rerank_topk": 11,
    "quantile_histogram_sketch": 11,
    "quantile_histogram_by_group": 11,
    # r12 (VERDICT r11 #1): the r11 ANSI audit replanned the stats
    # internals these five consume — pearson_ols now computes r as
    # try_divide(covar, sd·sd) instead of F.corr (plus the r12
    # collinear 1−r² clamp), rolling_corr became three window
    # aggregates, mann_whitney_u / bayesian_effect / cox_ph_newton
    # gained degenerate-input NULL guards — but their standing greens
    # (r07–r09) certify the PRE-r11 plans and sit outside the natural
    # 50-slot drain. The r05-green members of the same audit family
    # (ks_two_sample, welch_ttest_groups, acf_daily_lags,
    # cusum_changepoint, bh_fdr_discovery) are already at the front
    # of the drain and need no pin.
    "pearson_ols_lagged": 12,
    "rolling_corr_14d": 12,
    "mann_whitney_groups": 12,
    "bayesian_pre_post": 12,
    "cox_ph_newton_audit": 12,
    # r13 (VERDICT r12 #1): the r12 degenerate-corpus sweep replaced
    # every cosine in operators/similarity.py with a zero-norm-safe
    # try_divide (NULL, ranked last) and guarded the array sequence()
    # sites — row-local substitutions, strict-verified 308/308 at
    # three SFs and independently oracled by the judge, but the
    # standing driver greens (r07-r10) certify the pre-r12
    # expressions. Pin the five most load-bearing members; the rest
    # of the changed family rides the natural drain.
    "ann_cosine_topk": 13,
    "ann_ivf_recall": 13,
    "semdedup_verdicts": 13,
    "embedding_neardup": 13,
    "kmeans_ivf_centroids": 13,
    # r13 ADVICE fixes (same-round pins, the r11/r12 pattern): the
    # unigram tercile index is now nullif-guarded and the mode bin
    # gained an explicit NULL unbinnable class — driver-fixture
    # results are bit-identical (strict-oracled at sf0.01 locally),
    # but the expressions changed, so re-certify under the new text.
    "unigram_lm_quality": 13,
    "mode_median_by_type": 13,
    # r13 all-NULL-payload sweep (permanent net #5): five more
    # row-local abort fixes — try_divide'd pivot rate, NULL-gain
    # binseg guard, get() for the NULL-label silhouette, NULL-payload
    # skip in both multimodal UDTF generators. Strict-oracled at
    # sf0.01 after the fixes; re-certify under the new expressions.
    "pivot_event_type_daily": 13,
    "binseg_changepoints": 13,
    "multimodal_frame_sample": 13,
    "multimodal_audio_chunks": 13,
    "silhouette_label_clusters": 13,
    # r13 no-reference-slice sweep (permanent net #6): the KN bigram
    # continuation probability is now try_divide'd (empty reference
    # → t = v = 0 → 0/0 ANSI abort; NULL model scores NULL).
    "kn_bigram_perplexity": 13,
}


def _ordered_names() -> list[str]:
    last = _last_green_round()
    round_mtime = _round_file_mtime()
    names = list(REGISTRY)

    def key(n: str) -> tuple[int, int, int]:
        rnd = last.get(n, -1)
        if n in _FORCE_RECERT and rnd < _FORCE_RECERT[n]:
            # Tier 0: stale green — the row predates the current code.
            return (0, 0, 0)
        if rnd < 0:
            if REGISTRY[n].oracle is None:
                # Rows-only BY DESIGN (no oracle): it can never turn
                # green, and its rows-only row re-records identically
                # every sweep — park it last so the slot drains a
                # stale green instead. If it ever gains an oracle it
                # becomes tier 0 automatically (still never green).
                return (2, 0, 0)
            # Tier 0: never green — always swept first.
            return (0, 0, 0)
        # Among greens, the ROUND of the last green row dominates the
        # sort (oldest first), and "the implementing module changed
        # since that round" only breaks ties WITHIN a round. Until r8
        # the changed-module signal was its own tier ABOVE all
        # unchanged greens — which meant one edit to a large suite
        # module could promote dozens of recently-green queries past
        # r02/r03-green queries in other files and stall the
        # staleness drain for rounds (VERDICT r8 #1: the hard external
        # signal for a quarter of the registry was six rounds old).
        # Freshness of the oldest rows is the scarcer signal; a query
        # whose module changed AND must be re-certified promptly is
        # what _FORCE_RECERT is for, and every changed module is also
        # swept by the local --strict oracle harness at preclose.
        changed = 1
        try:
            import inspect

            mod_file = inspect.getfile(REGISTRY[n].fn)
            if os.path.getmtime(mod_file) > round_mtime.get(
                rnd, float("inf")
            ):
                changed = 0
        except (OSError, TypeError):
            pass
        return (1, rnd, changed)

    # Stable sort within tiers (registry order breaks ties).
    return sorted(names, key=key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    not-yet-driver-verified queries first (see _driver_checked)."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted where the op is not
    SQL-expressible → driver records a rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
