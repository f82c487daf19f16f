"""Incremental view maintenance: refresh derived tables from deltas
instead of recomputing from the full base — the batch-side sibling of
the streaming CDC upsert (`streaming/ingest.py`) and the
continuous-aggregate rollup (`operators/rollup.py`), generalized to
JOIN views and arbitrary signed changes.

The algebra is the standard delta-rule / Z-set formulation (DBSP,
Budiu et al. VLDB'23; classic Blakeley et al. counting method):

* join views:  Δ(A ⋈ B) = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB
  — per refresh the big sides are touched only BY the (small) deltas:
  each term is one keyed join where the delta side broadcasts, so the
  cost per refresh is O(|Δ| · matches) regardless of |A|, |B|.

* aggregate views: rows carry a signed weight (+1 insert, −1 delete,
  update = delete+insert); SUM/COUNT maintain under addition, so the
  refreshed view is the keyed merge of the materialized partials with
  the delta partials — one partial-agg of Δ plus one keyed outer merge
  against the view, never a rescan of the base. Groups whose count
  reaches 0 vanish (the counting method's tombstone rule).

AVG and friends derive from (sum, count); MIN/MAX are NOT
addition-maintainable under deletes (a deleted max forces a group
rescan) — callers get sums/counts here and the rescan fallback for
extrema, stated rather than hidden.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_view_delta(
    a: DataFrame,
    delta_a: DataFrame,
    b: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Insert-delta of the inner-join view A ⋈ B.

    Returns exactly the NEW join rows produced by appending
    ``delta_a`` to A and ``delta_b`` to B:
    ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB.  The pre-delta bases ``a``/``b`` must
    NOT already contain the delta rows. Each term joins a small delta
    against one base — broadcast the delta side at scale; the bases
    are probed, never self-shuffled (with bucketed bases the probe is
    shuffle-free)."""
    keys = list(on)
    t1 = delta_a.join(b, on=keys)
    t2 = a.join(delta_b, on=keys)
    t3 = delta_a.join(delta_b, on=keys)
    return t1.unionByName(t2).unionByName(t3)


def agg_view_delta(
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    weight_col: str = "__w",
) -> DataFrame:
    """Partial-aggregate a signed delta: per key, Σ weight (the count
    delta) and Σ weight·x per measure. Map-side combined; the output
    is one row per touched key."""
    kl = list(keys)
    aggs = [F.sum(F.col(weight_col)).alias("__cnt")] + [
        F.sum(F.col(weight_col) * F.col(c)).alias(f"__sum_{c}")
        for c in sum_cols
    ]
    return delta.groupBy(*kl).agg(*aggs)


def agg_view_refresh(
    matview: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    weight_col: str = "__w",
) -> DataFrame:
    """Merge a signed delta into a materialized SUM/COUNT view.

    ``matview`` schema: keys + ``__cnt`` + ``__sum_<c>`` per measure
    (what :func:`agg_view_delta` emits — a view bootstraps by running
    it over the full base with weight 1). The refresh is a full-outer
    keyed merge adding partials; groups whose merged count is 0
    disappear. Cost: one partial agg of Δ + one keyed join against
    the view — the base table is never read."""
    kl = list(keys)
    d = agg_view_delta(delta, kl, sum_cols, weight_col)
    dcols = {c: f"__d_{c}" for c in d.columns if c not in kl}
    for old, new in dcols.items():
        d = d.withColumnRenamed(old, new)
    merged = matview.join(d, on=kl, how="full_outer")
    out_cols = [F.col(k) for k in kl]
    cnt = F.coalesce(F.col("__cnt"), F.lit(0)) + F.coalesce(
        F.col("__d___cnt"), F.lit(0)
    )
    out_cols.append(cnt.alias("__cnt"))
    for c in sum_cols:
        s = F.coalesce(F.col(f"__sum_{c}"), F.lit(0.0)) + F.coalesce(
            F.col(f"__d___sum_{c}"), F.lit(0.0)
        )
        out_cols.append(s.alias(f"__sum_{c}"))
    return merged.select(*out_cols).filter(F.col("__cnt") != 0)
