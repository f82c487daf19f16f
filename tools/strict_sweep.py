"""Full-registry strict oracle sweep at an arbitrary scale factor —
the cross-SF certification pass that found four real scale-dependent
divergences in round 9 (arg_max NULL-skipping, a signed zero, a
vacuous threshold, ulp-unsafe 6-decimal rounding on 1e9 sums) plus a
genuine cross-engine flake (streaming CORR at a ROUND boundary).

The driver's own gate runs at sf0.01; this tool runs the SAME
driver-faithful strict compare (tests/oracle_harness.py --strict) at
any SF, batched with timeouts so the handful of deliberately heavy
DuckDB oracles (unrolled minhash/dedup forms, single-threaded, >10 min
at sf0.1) get classified as ORACLE_HEAVY_TIMEOUT instead of stalling
the sweep.

    python tools/strict_sweep.py --sf /root/testdata/sf0.1 \
        --out tools/strict_sweep_sf01.json [--batch 10] [--timeout 300]

Statuses: pass / FAIL / ORACLE_HEAVY_TIMEOUT. Exit code 1 if any FAIL.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

# Known DuckDB-heavy oracle families (quadratic-in-disguise unrolled
# SQL forms kept deliberately "definitional"): swept solo, last, with
# the same per-query cap — a timeout classifies, it does not fail.
_HEAVY = re.compile(
    r"curation|dedup_|crossdoc|semdedup|containment|ngram_jaccard"
    r"|prefix_filter|minhash|simhash"
)


def _run(names: list[str], sf: str, timeout: int):
    """Returns (passed, failed, detail, broken). ``broken`` is a
    non-empty diagnostic string when the harness subprocess died
    WITHOUT emitting a single per-query pass/FAIL line (JVM OOM-kill,
    import/startup error) — that is a sweep-infrastructure failure,
    not an oracle timeout, and must surface as ERROR + exit 1 rather
    than be laundered into ORACLE_HEAVY_TIMEOUT (ADVICE r9)."""
    broken = ""
    try:
        p = subprocess.run(
            [sys.executable, "-u", "tests/oracle_harness.py", "--strict",
             "--sf", sf] + names,
            capture_output=True, text=True, timeout=timeout, cwd=_ROOT,
        )
        out = p.stdout
        rc = p.returncode
        err_tail = (p.stderr or "")[-400:]
    except subprocess.TimeoutExpired as e:
        out = e.stdout or ""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        out = "TIMEOUT\n" + out
        rc = None  # a genuine timeout, never "broken"
        err_tail = ""
    lines = out.splitlines()
    passed = {l.split()[1] for l in lines if l.startswith("pass ")}
    failed = {
        l.split()[1].rstrip(":") for l in lines if l.startswith("FAIL ")
    }
    detail = {
        l.split()[1].rstrip(":"): l for l in lines if l.startswith("FAIL ")
    }
    if rc is not None and rc != 0 and not passed and not failed:
        broken = f"harness exited {rc} with no per-query output: {err_tail}"
    return passed, failed, detail, broken


def main() -> int:
    args = sys.argv[1:]

    def opt(name, default):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i: i + 2]
            return v
        return default

    sf = opt("--sf", "/root/testdata/sf0.1")
    out_path = opt("--out", "")
    batch = int(opt("--batch", "10"))
    timeout = int(opt("--timeout", "300"))

    from bio_lakehouse_spark.suite import REGISTRY

    names = sorted(n for n in REGISTRY if REGISTRY[n].oracle is not None)
    light = [n for n in names if not _HEAVY.search(n)]
    heavy = [n for n in names if _HEAVY.search(n)]
    results: dict[str, dict] = {}

    todo = list(light)
    i = 0
    while i < len(todo):
        chunk = todo[i: i + batch]
        t0 = time.time()
        passed, failed, detail, broken = _run(chunk, sf, timeout)
        rest = []
        for n in chunk:
            if n in passed:
                results[n] = {"status": "pass"}
            elif n in failed:
                results[n] = {"status": "FAIL", "detail": detail[n][:400]}
            else:
                rest.append(n)
        if broken:
            # the subprocess died before producing ANY verdict: every
            # query in the chunk is unverified — record ERROR (counted
            # in the failing exit code), don't re-queue or classify as
            # a heavy-oracle timeout
            for n in rest:
                results[n] = {"status": "ERROR", "detail": broken}
        elif rest:
            # harness runs in order: the first unprocessed name is the
            # staller; re-queue the untouched remainder
            results[rest[0]] = {"status": "ORACLE_HEAVY_TIMEOUT"}
            todo.extend(rest[1:])
        print(f"{i}/{len(todo)} {round(time.time() - t0, 1)}s "
              f"{len(passed)} pass", flush=True)
        i += batch

    for n in heavy:
        t0 = time.time()
        passed, failed, detail, broken = _run([n], sf, timeout)
        if n in passed:
            results[n] = {"status": "pass"}
        elif n in failed:
            results[n] = {"status": "FAIL", "detail": detail[n][:400]}
        elif broken:
            results[n] = {"status": "ERROR", "detail": broken}
        else:
            results[n] = {"status": "ORACLE_HEAVY_TIMEOUT"}
        results[n]["sec"] = round(time.time() - t0, 1)
        print(f"heavy {n} {results[n]['status']}", flush=True)

    summary = {
        "sf": sf,
        "n": len(names),
        "pass": sum(1 for r in results.values() if r["status"] == "pass"),
        "fail": sum(1 for r in results.values() if r["status"] == "FAIL"),
        "error": sum(
            1 for r in results.values() if r["status"] == "ERROR"
        ),
        "oracle_heavy_timeout": sum(
            1 for r in results.values()
            if r["status"] == "ORACLE_HEAVY_TIMEOUT"
        ),
        "results": dict(sorted(results.items())),
    }
    doc = json.dumps(summary, indent=1)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(doc)
    print(json.dumps({k: v for k, v in summary.items() if k != "results"}))
    return 1 if summary["fail"] or summary["error"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
