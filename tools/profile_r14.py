"""Round-13 optimization profiler.

For each named query (default: the bench_detail.json ledger's most
expensive headline + rotation entries): time the noop-sink
materialization (min of N runs, same methodology as bench.py), count
plan features (Exchange / Sort / BatchEvalPython / ArrowEvalPython /
join strategies), and dump `.explain("formatted")` to
plans/r14/<query>_<tag>.txt.

Usage:
    python tools/profile_r14.py [--tag before|after] [--runs 3]
        [--sf DIR] [--top N] [query ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bio_lakehouse_spark.session import get_spark  # noqa: E402
from bio_lakehouse_spark.suite import REGISTRY  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS_DIR = os.path.join(HERE, "plans", "r14")


def top_queries(n: int) -> list[str]:
    with open(os.path.join(HERE, "bench_detail.json")) as fh:
        led = json.load(fh)
    entries: list[tuple[str, float]] = []
    for sect in ("queries", "rotation"):
        for k, v in (led.get(sect) or {}).items():
            if isinstance(v, (int, float)):
                entries.append((k, float(v)))
    entries.sort(key=lambda kv: -kv[1])
    return [k for k, _ in entries[:n]]


def plan_stats(plan: str) -> dict:
    def count(pat: str) -> int:
        return len(re.findall(pat, plan))

    return {
        "exchange": count(r"\bExchange\b"),
        "broadcast_exchange": count(r"BroadcastExchange"),
        "sort": count(r"\bSort\b"),
        "smj": count(r"SortMergeJoin"),
        "bhj": count(r"BroadcastHashJoin"),
        "shj": count(r"ShuffledHashJoin"),
        "bnlj": count(r"BroadcastNestedLoopJoin"),
        "cartesian": count(r"CartesianProduct"),
        "window": count(r"\bWindow\b"),
        "python": count(r"EvalPython|MapInPandas|MapInArrow"),
        "scans": count(r"Scan parquet"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    names = list(args.queries) or top_queries(args.top or 25)
    os.makedirs(PLANS_DIR, exist_ok=True)

    spark = get_spark("profile-r14")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm the reader + JVM once, like bench.py
    materialize(spark.read.parquet(f"{args.sf}/lineitem.parquet"))

    def calib() -> float:
        """bench.py's fixed synthetic host-speed probe (min of 2):
        timings on this sandbox swing >2x between host windows, so
        every profile stamps the window it ran in — numbers from
        different sessions are only comparable calib-normalized."""
        t = []
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(
                spark.range(0, 120_000_000, 1, 32)
                .selectExpr(
                    "xxhash64(id) AS h",
                    "id % 9973 AS k",
                    "sin(id * 1e-7) AS v",
                )
                .groupBy("k")
                .agg({"h": "max", "v": "sum", "k": "count"})
            )
            t.append(time.perf_counter() - t0)
        return round(min(t), 3)

    results = {"_calib_start": calib()}
    print(json.dumps({"_calib_start": results["_calib_start"]}), flush=True)
    for name in names:
        fn = REGISTRY[name].fn
        try:
            df = fn(spark, args.sf)  # fixture prebuild pass
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            print(json.dumps({name: results[name]}), flush=True)
            continue
        if not args.no_plan:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            with open(
                os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        else:
            plan = ""
        spark.sparkContext.setJobDescription(f"profile:{name}")
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            materialize(fn(spark, args.sf))
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {
            "min": min(runs),
            "runs": runs,
            **(plan_stats(plan) if plan else {}),
        }
        print(json.dumps({name: results[name]}), flush=True)

    results["_calib_end"] = calib()
    print(json.dumps({"_calib_end": results["_calib_end"]}), flush=True)

    out = os.path.join(HERE, "bench_out", f"profile_r14_{args.tag}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
