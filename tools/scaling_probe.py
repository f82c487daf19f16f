"""Empirical scaling probe — evidence for the SCALE.md linearity
claims: run the heavy corpus operators on 1×/4×/8× replications of
the sf0.1 documents table (doc_ids offset per copy so fingerprints
collide ACROSS copies — the worst case for dedup: every doc gains
7 exact duplicates) and report wall-clock scale factors.

A linear operator should show time ratios ≈ data ratios (plus fixed
overhead, which local[32] exaggerates); a quadratic one explodes —
this is the experiment that caught the r5 containment form (108 s on
a corpus-sized block). Usage:

    python tools/scaling_probe.py [mults ...]   # default 1 4 8
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
        minhash_signatures_raw,
        prefix_filter_pairs,
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
        "cdc_chunks": lambda d: cdc_chunk_stats(d, "doc_id", "text"),
        "vocab_oov": lambda d: vocab_oov_audit(d, "lang", "text"),
        "quality_scan": quality,
    }


def replicate(docs, mult: int):
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint()


def main() -> int:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ops = _ops()
    results: dict[str, dict[int, float]] = {k: {} for k in ops}
    for mult in mults:
        docs = replicate(docs0, mult)
        rows = docs.count()
        print(f"--- mult {mult}: {rows} docs", file=sys.stderr)
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
    print(json.dumps({"mults": mults, "ops": table}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
