"""Host-normalized round-over-round bench comparison (SCALE.md r10).

Implements the calib_sec normalization rule mechanically so a future
"headline moved ±30%" never again needs the forensic cross-referencing
VERDICT r9 did by hand: compare `value / calib_sec` (and per-query
ratios divided by the calib ratio) instead of raw seconds.

    python tools/bench_compare.py OLD NEW

OLD / NEW are bench JSONs in any of the three shapes this repo
produces: a driver BENCH_r{N}.json ({"parsed": {...}}), a bench.py
detail file (bench_out/detail_r{N}.json / bench_detail.json), or the
bench.py stdout line itself. Files without a calib_sec stamp (all
rounds before r10) compare raw, with a loud warning.

Output: one JSON line {raw_ratio, calib_ratio, norm_ratio,
per_query_median, per_query_p90, n_common, verdict} where verdict is
"host" when normalization explains the move (norm_ratio within ±10%)
and "code" otherwise.
"""

from __future__ import annotations

import json
import statistics
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    if isinstance(doc, dict) and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    if not isinstance(doc, dict) or "value" not in doc:
        raise SystemExit(f"{path}: not a bench JSON (no 'value')")
    return doc


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = _load(sys.argv[1]), _load(sys.argv[2])

    calib = None
    if old.get("calib_sec") and new.get("calib_sec"):
        calib = new["calib_sec"] / old["calib_sec"]
    else:
        print(
            "WARNING: calib_sec missing on at least one side "
            "(pre-r10 round?) — comparing RAW seconds; a cross-host "
            "comparison below is NOT adjudicable.",
            file=sys.stderr,
        )

    raw = new["value"] / old["value"] if old["value"] else None
    oq = {
        k: v for k, v in (old.get("queries") or {}).items()
        if isinstance(v, (int, float))
    }
    nq = {
        k: v for k, v in (new.get("queries") or {}).items()
        if isinstance(v, (int, float))
    }
    common = sorted(set(oq) & set(nq))
    ratios = sorted(nq[k] / oq[k] for k in common if oq[k])
    out = {
        "raw_ratio": round(raw, 4) if raw is not None else None,
        "calib_ratio": round(calib, 4) if calib else None,
        "norm_ratio": round(raw / calib, 4) if raw and calib else None,
        "per_query_median": (
            round(statistics.median(ratios), 4) if ratios else None
        ),
        "per_query_p90": (
            round(ratios[int(0.9 * (len(ratios) - 1))], 4)
            if ratios else None
        ),
        "n_common": len(common),
    }
    adjudicable = out["norm_ratio"] is not None
    if adjudicable:
        # One-sided: a code REGRESSION shows up as norm_ratio > 1.1
        # (the suite slowed MORE than the host did). norm_ratio < 0.9
        # is calib over-correction, not a code speedup — the pure-CPU
        # probe is more host-state-sensitive than the mixed I/O +
        # shuffle suite (measured r10: same-code rerun, raw 1.18,
        # calib 1.60, norm 0.74, per-query raw median 1.19 = a
        # uniform host smear the probe exaggerated).
        if out["norm_ratio"] > 1.1:
            out["verdict"] = "code"
        elif out["norm_ratio"] < 0.9:
            out["verdict"] = "host_overcorrected"
        else:
            out["verdict"] = "host"
    else:
        out["verdict"] = "unadjudicable_no_calib"
    # worst normalized per-query movers, for the "code" case
    if ratios and calib:
        movers = sorted(
            ((k, round(nq[k] / oq[k] / calib, 3)) for k in common
             if oq[k]),
            key=lambda kv: -kv[1],
        )[:5]
        out["worst_norm_movers"] = dict(movers)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
