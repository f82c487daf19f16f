"""Empirical scaling probe — evidence for the SCALE.md linearity
claims: run the heavy corpus operators on 1×/4×/8×(/16×)
replications of the sf0.1 documents table and report wall-clock
scale factors.

Two replication modes (r7 — VERDICT r6 item 7):

- ``density`` (default): constant duplicate fraction. Copy i's text
  is passed through a copy-specific alphabet rotation, so cross-copy
  similarity collapses to ~0 while each copy keeps the corpus's own
  intra-copy duplicate structure — the true pair OUTPUT grows
  linearly in mult, so a super-linear time factor means super-linear
  COMPUTE, not just more answer to emit.
- ``worstcase``: doc_ids offset only, texts identical — every doc
  becomes a mult-way exact clique. Output grows quadratically by
  construction; use it to stress candidate-expansion ceilings
  (hot-bucket caps), not to judge compute linearity.

A linear operator should show time ratios ≈ data ratios (plus fixed
overhead, which local[32] exaggerates); a quadratic one explodes —
this is the experiment that caught the r5 containment form (108 s on
a corpus-sized block). Usage:

    python tools/scaling_probe.py [--mode density|worstcase] [mults ...]
    # default: --mode density 1 4 8 16
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bio_lakehouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# operator -> callable(docs_df) -> DataFrame to materialize
def _ops():
    from bio_lakehouse_spark.operators.dedup import (
        cdc_chunk_stats,
        containment_prefix_pairs,
        exact_dedup_groups,
        minhash_lsh_pairs,
        minhash_signatures_raw,
        prefix_filter_pairs,
        simhash_pairs_banded,
    )
    from bio_lakehouse_spark.operators.textops import (
        quality_metrics,
        vocab_oov_audit,
    )

    def quality(d):
        m = quality_metrics("text")
        return d.select("doc_id", *[v.alias(k) for k, v in m.items()])

    return {
        "exact_dedup": lambda d: exact_dedup_groups(d, "doc_id", "text"),
        "minhash_sigs": lambda d: minhash_signatures_raw(
            d, "doc_id", "text"
        ),
        "prefix_filter_jaccard": lambda d: prefix_filter_pairs(
            d, "doc_id", "text", threshold=0.5
        ),
        "containment_prefix": lambda d: containment_prefix_pairs(
            d, "doc_id", "text", block_cols=["lang", "source"],
            threshold=0.8,
        ),
        "minhash_lsh": lambda d: minhash_lsh_pairs(
            d, "doc_id", "text", threshold=0.5
        ),
        "simhash_banded": lambda d: simhash_pairs_banded(
            d, "doc_id", "text", n=3, max_hamming=3
        ),
        "simhash_7band_blocked": lambda d: simhash_pairs_banded(
            d, "doc_id", "text", n=3, max_hamming=6,
            n_bands=7, block_cols=["lang"],
        ),
        "cdc_chunks": lambda d: cdc_chunk_stats(d, "doc_id", "text"),
        "vocab_oov": lambda d: vocab_oov_audit(d, "lang", "text"),
        "quality_scan": quality,
        # tokenizer encode: per-DISTINCT-word Viterbi fold + broadcast
        # LUT join — should be linear in docs (the alphabet rotation
        # also grows the distinct-word set linearly, stressing the LUT)
        "unigram_encode": lambda d: _unigram_counts(d),
    }


def _unigram_counts(d):
    from bio_lakehouse_spark.operators.unigram_lm import (
        PRETRAINED_UNIGRAM_V1,
        unigram_token_counts,
    )

    return unigram_token_counts(d, "doc_id", "text", PRETRAINED_UNIGRAM_V1)


def replicate(docs, mult: int, mode: str = "density"):
    import string

    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    letters = string.ascii_lowercase
    parts = []
    for i in range(mult):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
        if mode == "density" and i > 0:
            # Copy-specific alphabet rotation: rewrites (almost) every
            # word, so shingle/fingerprint overlap ACROSS copies is ~0
            # — each copy contributes only its own intra-copy pairs
            # and the total pair output stays linear in mult. Exact
            # duplicates WITHIN a copy survive the translation
            # unchanged (same mapping both sides).
            rot = letters[i % 26:] + letters[: i % 26]
            p = p.withColumn("text", F.translate("text", letters, rot))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint()




def _fact_ops(spark):
    """Fact-table operators added in r7 parts 5–8: each has a
    PROVABLY bounded shuffle (F×B histograms, distinct-score frames,
    duration frames, daily grain), so the probe should show ~linear
    scan-dominated scaling — this is the experiment that would catch
    a regression reintroducing a data-sized exchange."""
    from pyspark.sql import functions as F

    from bio_lakehouse_spark.operators.stats import (
        auc_rank_sum,
        cox_ph_newton,
        msprt_two_sample,
    )
    from bio_lakehouse_spark.operators.trees import (
        best_splits,
        gbdt_two_round,
        histogram_split_gains,
    )
    from bio_lakehouse_spark.streaming.monitor import daily_arm_sums

    def stump(t):
        return best_splits(
            histogram_split_gains(
                t["lineitem"],
                {"l_quantity": F.col("l_quantity"),
                 "l_discount": F.col("l_discount")},
                F.col("l_returnflag") == "R",
                32,
            )
        )

    def gbdt(t):
        return gbdt_two_round(
            t["lineitem"],
            {"l_quantity": F.col("l_quantity"),
             "l_discount": F.col("l_discount")},
            target=F.col("l_extendedprice") / 1000.0,
            nbins=16,
            lr=0.5,
        )

    def auc(t):
        return auc_rank_sum(
            t["lineitem"], F.col("l_quantity"),
            F.col("l_returnflag") == "R",
        )

    def cox(t):
        span = t["orders"].groupBy("o_custkey").agg(
            F.min(F.to_date("o_orderdate")).alias("first_d"),
            F.max(F.to_date("o_orderdate")).alias("last_d"),
        )
        churned = F.col("last_d") < F.lit("2001-01-01").cast("date")
        obs = span.join(
            t["customer"], span["o_custkey"] == t["customer"]["c_custkey"]
        ).select(
            F.when(churned, 1).otherwise(0).alias("ev"),
            F.when(churned, F.datediff("last_d", "first_d"))
            .otherwise(F.datediff(F.lit("2001-08-01").cast("date"),
                                  F.col("first_d"))).alias("t"),
            (F.col("c_acctbal") / 10000.0).alias("x"),
        )
        return cox_ph_newton(obs, steps=2)

    def msprt(t):
        return msprt_two_sample(daily_arm_sums(t["events"]))

    def fs_linkage(t):
        # entity_resolution_fs's multi-rule blocked pair generation +
        # score rollup (suite/relational.py). NOTE on interpretation:
        # replicate_facts copies records VERBATIM under new custkeys,
        # so every copy of a record shares every blocking attribute —
        # matching pairs genuinely grow ∝ dup² in this data, for any
        # attribute blocking. What the probe certifies is that the
        # measured time tracks the CANDIDATE-PAIR count (bounded by
        # the fine multi-rule blocks), not an all-pairs nation×bucket
        # explosion like the r7 version's.
        cust = t["customer"]
        rec = cust.select(
            "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment",
            F.expr("floor(c_acctbal / 100.0)").alias("bal_band"),
            F.expr("right(c_name, 2)").alias("suffix"),
        )
        a, b = rec.alias("a"), rec.alias("b")
        cols = [
            F.col("a.c_custkey").alias("ka"),
            F.col("b.c_custkey").alias("kb"),
            (F.col("a.c_mktsegment") == F.col("b.c_mktsegment")).alias("g1"),
            (F.abs(F.col("a.c_acctbal") - F.col("b.c_acctbal"))
             < 100.0).alias("g2"),
            (F.col("a.suffix") == F.col("b.suffix")).alias("g3"),
        ]
        r1 = a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.bal_band") == F.col("b.bal_band"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        ).select(*cols)
        r2 = a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.suffix") == F.col("b.suffix"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        ).select(*cols)
        pairs = r1.unionByName(r2).dropDuplicates(["ka", "kb"])
        return (
            pairs.select(
                (F.when(F.col("g1"), 1.0986122886681098)
                 .otherwise(-1.9459101490553132)
                 + F.when(F.col("g2"), 2.833213344056216)
                 .otherwise(-1.845826690498331)
                 + F.when(F.col("g3"), 4.553876891600541)
                 .otherwise(-2.9856819377004893)).alias("score")
            )
            .groupBy((F.col("score") >= 4.0).alias("is_link"))
            .agg(F.count(F.lit(1)).alias("n"), F.avg("score").alias("avg"))
        )

    def huber(t):
        from bio_lakehouse_spark.operators.stats import huber_irls_fit

        d = t["events"].groupBy(F.to_date("ts").alias("date")).agg(
            F.count(F.lit(1)).cast("double").alias("x"),
            F.round(F.sum("value"), 6).alias("y"),
        )
        return huber_irls_fit(d, "x", "y", iters=3)

    def poisson(t):
        from bio_lakehouse_spark.operators.stats import poisson_glm_fit

        d = (
            t["events"]
            .groupBy(F.to_date("ts").alias("date"))
            .agg(F.count(F.lit(1)).cast("double").alias("y"))
            .select((F.dayofmonth("date") / 31.0).alias("x"), "y")
        )
        return poisson_glm_fit(d, "x", "y", iters=3)

    def fs_adaptive(t):
        # entity_resolution_fs's r9 adaptive blocking: knobs derived
        # from the replicated customer cardinality (width halves per
        # doubling past _FS_NREF, suffix +1 char per 10×). Returns
        # the candidate count + the derived knobs so the probe run
        # can record that candidates track the per-block target, not
        # an N² blowup. Verbatim-copy caveat as for fs_linkage:
        # exact duplicate records can never be split by ANY
        # recall-preserving blocker, so the dup-pair floor grows
        # ∝ mult² by construction of replicate_facts.
        from bio_lakehouse_spark.suite.relational import (
            _fs_adaptive_knobs,
            _fs_blocked_pairs,
        )

        cust = t["customer"]
        bal_w, slen = _fs_adaptive_knobs(cust)
        return _fs_blocked_pairs(cust, bal_w, slen).agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.lit(bal_w).alias("bal_width"),
            F.lit(slen).alias("suffix_len"),
        )

    def gini_rank(t):
        # gini_concentration_audit's shape (suite/relational.py): the
        # entity population grows with mult (entity-offset keys), so
        # this directly measures the r9 dense_ids global rank —
        # range-exchange + partition-local sort, no single-task sort
        from bio_lakehouse_spark.operators.windows import global_row_number

        rev = t["orders"].groupBy("o_custkey").agg(
            F.sum("o_totalprice").alias("r")
        )
        ranked = global_row_number(
            rev, ("r", "o_custkey"), rank_name="i", assume_unique=True
        ).select("r", "i")
        totals = ranked.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("r").alias("total"),
        )
        return ranked.crossJoin(F.broadcast(totals)).agg(
            F.round(
                2.0 * F.sum(F.col("i") * F.col("r"))
                / (F.max("n") * F.max("total"))
                - (F.max("n") + 1.0) / F.max("n"),
                6,
            ).alias("gini")
        )

    def hill_rank(t):
        # hill_tail_index's shape: descending dense_ids rank over the
        # per-customer frame + top-k suffix aggregate
        from bio_lakehouse_spark.operators.windows import global_row_number

        rev = t["orders"].groupBy("o_custkey").agg(
            F.sum("o_totalprice").alias("r")
        )
        ranked = global_row_number(
            rev.withColumn("__negr", -F.col("r")),
            ("__negr", "o_custkey"),
            rank_name="i",
            assume_unique=True,
        ).select("r", "i")
        kf = ranked.agg(F.count(F.lit(1)).alias("__cnt")).select(
            F.expr("(__cnt + 19) div 20").cast("long").alias("kk")
        )
        wk = ranked.crossJoin(F.broadcast(kf))
        xk1 = wk.filter(F.col("i") == F.col("kk") + 1).select(
            F.col("r").alias("xk1")
        )
        return (
            wk.filter(F.col("i") <= F.col("kk"))
            .crossJoin(F.broadcast(xk1))
            .agg(
                F.round(
                    F.max("kk").cast("double")
                    / F.sum(F.log(F.col("r") / F.col("xk1"))),
                    6,
                ).alias("hill_alpha")
            )
        )

    def _trade_edges(t):
        # cust → supplier bipartite trade graph (the
        # pagerank_cust_supplier shape). replicate_facts offsets
        # l_suppkey along with the other entity keys, so each copy is
        # a DISJOINT subgraph — node and edge populations both grow
        # with mult, the honest setting for an iterative-join probe.
        # +5M keeps supplier ids clear of the copy's custkey range.
        return (
            t["lineitem"].select("l_orderkey", "l_suppkey")
            .join(
                t["orders"].select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select(
                F.col("o_custkey").alias("src"),
                (F.col("l_suppkey") + 5_000_000).alias("dst"),
            )
            .distinct()
        )

    def pagerank_trade(t):
        # fixed 3 iterations: each is one keyed join + partial-agg sum
        # + a one-row dangling-mass broadcast → time ∝ edges per iter
        from bio_lakehouse_spark.operators.graph import pagerank

        return pagerank(_trade_edges(t), iters=3)

    def cc_trade(t):
        # label propagation to convergence; per-copy diameter is
        # constant, so the iteration COUNT stays flat while the
        # per-iteration join grows ∝ edges — net linear
        from bio_lakehouse_spark.operators.graph import (
            connected_components,
        )

        return connected_components(_trade_edges(t), max_iter=8)

    return {"decision_stump": stump, "gbdt_two_round": gbdt,
            "roc_auc_rank_sum": auc, "cox_ph_newton": cox,
            "msprt_daily": msprt, "fs_linkage": fs_linkage,
            "fs_linkage_adaptive": fs_adaptive,
            "huber_irls": huber, "poisson_glm": poisson,
            "gini_rank": gini_rank, "hill_rank": hill_rank,
            "pagerank_trade": pagerank_trade, "cc_trade": cc_trade}


def replicate_facts(spark, mult: int):
    """Replicate lineitem/orders/customer/events with ENTITY-OFFSET
    keys (copy i shifts custkeys/user_ids/orderkeys by i·10⁷), so the
    entity population grows with the data — no artificial hot keys,
    and per-entity structure (order spans, daily journeys) is
    preserved within each copy."""
    from pyspark.sql import functions as F

    out = {}
    specs = {
        "lineitem": ("l_orderkey", "l_suppkey"),
        "orders": ("o_orderkey", "o_custkey"),
        "customer": ("c_custkey",),
        "events": ("event_id", "user_id"),
    }
    for name, keys in specs.items():
        base = spark.read.parquet(f"{SF_DIR}/{name}.parquet")
        parts = []
        for i in range(mult):
            p = base
            for k in keys:
                p = p.withColumn(k, F.col(k) + F.lit(i * 10_000_000))
            parts.append(p)
        t = parts[0]
        for p in parts[1:]:
            t = t.unionByName(p)
        out[name] = t.localCheckpoint()
    return out


def replicate_embeddings(spark, mult: int):
    """Replicate the embeddings table with offset ids; copy i>0 gets a
    copy-keyed per-dimension SIGN FLIP (hash(copy, dim) parity). Norms
    and intra-copy geometry are preserved exactly (a signed
    permutation is an isometry), while cross-copy cosines decorrelate
    — so near-dup pair OUTPUT stays linear in mult and a super-linear
    time factor means super-linear COMPUTE, mirroring the density
    mode's alphabet rotation for text."""
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    parts = []
    for i in range(mult):
        p = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        if i > 0:
            # factory, NOT a default-arg lambda (a third parameter
            # would make F.transform demand a 3-arg HOF — the same
            # trap the r10 minhash fix documents); (x, j) is the
            # intentional (element, index) form, j keyed with the
            # copy number into the sign flip
            def _flip(copy: int):
                return lambda x, j: F.when(
                    F.pmod(F.xxhash64(F.lit(copy), j), F.lit(2)) == 0, x
                ).otherwise(-x)

            p = p.withColumn("embedding", F.transform("embedding", _flip(i)))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint()


def _emb_ops(spark, corpus, mult: int):
    """ANN/similarity probe ops. Queries are a FIXED 32-vector panel
    (copy 0), so brute-force work ∝ corpus; IVF and SemDeDup scale
    their cluster count with mult — the paper's own knob — so cell
    size stays bounded and within-cell work stays linear overall.

    The timed IVF op is the INDEXED serving path (ivf_topk_indexed
    over a build_ivf_index layout): index build — the O(N·cells)
    assignment — happens once per corpus outside the timing, exactly
    as in production where ingestion amortizes it one batch at a time
    (append_ivf_index). The un-indexed ivf_topk re-assigns the whole
    corpus per call and would show the build cost, not the query
    cost."""
    import shutil
    import tempfile

    from bio_lakehouse_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_topk_indexed,
        kmeans_lloyd,
        semdedup,
    )

    queries = corpus.filter(F.col("vec_id") < 32).localCheckpoint()
    k_cells = 16 * mult
    centroids = (
        kmeans_lloyd(
            corpus, k=k_cells, n_iters=2,
            id_col="vec_id", vec_col="embedding",
        )
        .select("centroid_id", F.col("centroid").alias("embedding"))
        .localCheckpoint()
    )
    idx = tempfile.mkdtemp(prefix=f"ivf_probe_m{mult}_")
    shutil.rmtree(idx, ignore_errors=True)
    build_ivf_index(corpus, centroids, idx)

    ops = {
        "ann_brute_topk": lambda d: cosine_topk(
            d, queries, id_col="vec_id", vec_col="embedding", k=5
        ),
        "ann_ivf_indexed": lambda d: ivf_topk_indexed(
            spark, idx, queries, id_col="vec_id",
            vec_col="embedding", k=5, nprobe=3,
        ),
        "semdedup_cells": lambda d: semdedup(
            d, centroids, id_col="vec_id", vec_col="embedding",
            threshold=0.35,
        ),
    }
    # (ops, cleanup): the caller rmtree's the index dir after the
    # mult's timing loop — each probe run used to leak one
    # ivf_probe_m* parquet tree per mult into /tmp.
    return ops, (lambda: shutil.rmtree(idx, ignore_errors=True))


def main() -> int:
    args = sys.argv[1:]
    mode = "density"
    if "--mode" in args:
        i = args.index("--mode")
        mode = args[i + 1]
        del args[i : i + 2]
    if mode not in ("density", "worstcase"):
        raise SystemExit(f"unknown mode {mode!r}")
    facts = "--facts" in args
    if facts:
        args.remove("--facts")
    emb = "--embeddings" in args
    if emb:
        args.remove("--embeddings")
    only: set[str] | None = None
    if "--ops" in args:
        i = args.index("--ops")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    mults = [int(a) for a in args] or [1, 4, 8, 16]
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if emb:
        results = {}
        for mult in mults:
            corpus = replicate_embeddings(spark, mult)
            n = corpus.count()
            print(f"--- embeddings mult {mult}: {n} vecs", file=sys.stderr)
            ops, cleanup_idx = _emb_ops(spark, corpus, mult)
            if only is not None:
                ops = {k: v for k, v in ops.items() if k in only}
            try:
                for name, fn in ops.items():
                    # min of 3 timed runs after the warm run: these
                    # corpora are small enough that a single run sits
                    # at the JIT/GC noise floor of local[32] (one
                    # observed 1.1 s op spiked to 35 s once in a long
                    # session)
                    fn(corpus).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dts = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        fn(corpus).write.format("noop").mode(
                            "overwrite"
                        ).save()
                        dts.append(time.perf_counter() - t0)
                    dt = min(dts)
                    results.setdefault(name, {})[mult] = round(dt, 2)
                    print(f"    {name}: {dt:.2f}s", file=sys.stderr)
            finally:
                cleanup_idx()
            corpus.unpersist()
        base = mults[0]
        table = {
            name: {
                "sec": times,
                "scale_factor": {
                    m: round(times[m] / times[base], 2)
                    for m in mults if times.get(base)
                },
            }
            for name, times in results.items()
        }
        print(json.dumps({"mode": "embeddings", "mults": mults,
                          "ops": table}, indent=1))
        return 0
    if facts:
        ops = _fact_ops(spark)
        if only is not None:
            ops = {k: v for k, v in ops.items() if k in only}
        results = {k: {} for k in ops}
        for mult in mults:
            tables = replicate_facts(spark, mult)
            print(f"--- facts mult {mult}", file=sys.stderr)
            for name, fn in ops.items():
                fn(tables).write.format("noop").mode("overwrite").save()
                t0 = time.perf_counter()
                fn(tables).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                results[name][mult] = round(dt, 2)
                print(f"    {name}: {dt:.2f}s", file=sys.stderr)
        base = mults[0]
        table = {
            name: {
                "sec": times,
                "scale_factor": {
                    m: round(times[m] / times[base], 2)
                    for m in mults if times.get(base)
                },
            }
            for name, times in results.items()
        }
        print(json.dumps({"mode": "facts", "mults": mults,
                          "ops": table}, indent=1))
        return 0
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ops = _ops()
    if only is not None:
        ops = {k: v for k, v in ops.items() if k in only}
    results: dict[str, dict[int, float]] = {k: {} for k in ops}
    for mult in mults:
        docs = replicate(docs0, mult, mode=mode)
        rows = docs.count()
        print(f"--- mult {mult} ({mode}): {rows} docs", file=sys.stderr)
        for name, fn in ops.items():
            fn(docs).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results[name][mult] = round(dt, 2)
            print(f"    {name}: {dt:.2f}s", file=sys.stderr)
        docs.unpersist()
    base = mults[0]
    table = {
        name: {
            "sec": times,
            "scale_factor": {
                m: round(times[m] / times[base], 2)
                for m in mults
                if times.get(base)
            },
        }
        for name, times in results.items()
    }
    print(json.dumps({"mode": mode, "mults": mults, "ops": table},
                     indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
