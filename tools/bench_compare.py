"""Host-normalized round-over-round bench comparison (SCALE.md r10,
contention adjudication r11).

Implements the calib_sec normalization rule mechanically so a future
"headline moved ±30%" never again needs the forensic cross-referencing
VERDICT r9 did by hand: compare `value / calib_sec` (and per-query
ratios divided by the calib ratio) instead of raw seconds.

r11 (VERDICT r10 #1): calib normalization has a demonstrated blind
spot — under SUSTAINED host contention the burst calib probe slips
into scheduler gaps (under-reads the slowdown) while long
shuffle-heavy queries eat all of it, so norm_ratio > 1.1 produced a
false "code" verdict on the driver's contended r10 run. The intra-run
spread distribution bench.py records per query (max/min of the runs
of the SAME query) separates the cases cleanly: idle p90 ≈ 1.5 with
~1% of queries > 2×, contended p90 1.89 with 9% > 2×. When either
side's spread crosses the thresholds below, the verdict is
`contended_host` — the comparison is NOT adjudicable and neither a
regression nor a speedup should be claimed from it.

    python tools/bench_compare.py OLD NEW

OLD / NEW are bench JSONs in any of the three shapes this repo
produces: a driver BENCH_r{N}.json ({"parsed": {...}}), a bench.py
detail file (bench_out/detail_r{N}.json / bench_detail.json), or the
bench.py stdout line itself. Files without a calib_sec stamp (all
rounds before r10) compare raw, with a loud warning. Spread stats are
taken from the doc itself (`run_spread` / flattened stdout keys),
recomputed from its raw `runs`, or — for a driver BENCH_r{N}.json —
pulled from the `detail_file` it points at, when that file exists
next to it.

Output: one JSON line {raw_ratio, calib_ratio, norm_ratio,
per_query_median, per_query_p90, n_common, spread_old, spread_new,
verdict} where verdict is "host" when normalization explains the move
(norm_ratio within ±10%), "contended_host" when either run's spread
marks it unadjudicable, and "code" otherwise.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

# Contention thresholds, calibrated on this repo's own recorded runs
# (idle builder ledger: p90 1.511 / frac_gt2 0.010; contended driver
# r10: p90 1.891 / frac_gt2 0.094). Any one trips the verdict.
SPREAD_P90_CONTENDED = 1.8
SPREAD_FRAC_GT2_CONTENDED = 0.05
# Calib drift across the suite BODY (mid-suite timeline probes,
# max/min — r12: the start probe is excluded, see calib_drift()):
# the probe itself drifting >1.5x mid-run marks the measurement
# window contended.
CALIB_DRIFT_CONTENDED = 1.5
# Anchor reliability (r12): the START calib is the min of five
# cold-ish runs and sits a structural ~1.6x above the fully-warm
# timeline floor even on a spotless host (measured 0.718 vs
# 0.441-0.488). But when it lands FAR above the floor — the r11
# control run stamped 2.341 against ~0.65 probes, ratio 3.6 — the
# start window was contended and the calib NORMALIZATION ANCHOR is
# corrupt, so the comparison is not adjudicable even if the suite
# body ran clean. 2.5 splits the structural offset from the
# incident.
CALIB_ANCHOR_SUSPECT = 2.5


def _load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    if isinstance(doc, dict) and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    if not isinstance(doc, dict) or "value" not in doc:
        raise SystemExit(f"{path}: not a bench JSON (no 'value')")
    doc["__dir__"] = os.path.dirname(os.path.abspath(path))
    return doc


def spread_stats(doc: dict) -> dict | None:
    """Extract {p90, frac_gt2} from a bench doc, best source first:
    the stamped `run_spread` block (detail files, r11+), the
    flattened stdout keys (r11+ BENCH lines), a recompute from raw
    `runs`, or the detail file a driver BENCH_r{N}.json points at."""
    rs = doc.get("run_spread")
    if isinstance(rs, dict) and "p90" in rs:
        return {"p90": rs["p90"], "frac_gt2": rs.get("frac_gt2")}
    if isinstance(doc.get("run_spread_p90"), (int, float)):
        return {
            "p90": doc["run_spread_p90"],
            "frac_gt2": doc.get("run_spread_frac_gt2"),
        }
    runs = doc.get("runs")
    if isinstance(runs, dict) and runs:
        spreads = sorted(
            max(v) / min(v)
            for v in runs.values()
            if isinstance(v, list) and v and min(v) > 0
        )
        if spreads:
            return {
                "p90": round(spreads[int(0.9 * (len(spreads) - 1))], 3),
                "frac_gt2": round(
                    sum(1 for s in spreads if s > 2) / len(spreads), 3
                ),
            }
    detail = doc.get("detail_file")
    if detail and doc.get("__dir__"):
        p = os.path.join(doc["__dir__"], detail)
        if os.path.exists(p):
            try:
                with open(p) as fh:
                    sub = json.load(fh)
            except (OSError, ValueError):
                return None
            sub.pop("detail_file", None)  # no recursion
            return spread_stats(sub)
    return None


def _timeline_vals(doc: dict) -> list[float]:
    tl = doc.get("calib_timeline")
    if not isinstance(tl, list):
        return []
    return [
        p["calib_sec"] for p in tl
        if isinstance(p, dict)
        and isinstance(p.get("calib_sec"), (int, float))
        and p["calib_sec"] > 0
    ]


def calib_drift(doc: dict) -> float | None:
    """max/min over the mid-suite timeline probes ONLY (r12: the
    start calib is a cold-JIT min-of-5 that sits a structural ~1.6x
    above the warm floor and flagged clean runs; its reliability is
    judged separately by calib_anchor_ratio). Stamped value wins
    when a timeline isn't available to recompute from (r11 docs);
    None for older docs."""
    vals = _timeline_vals(doc)
    if len(vals) >= 2:
        return round(max(vals) / min(vals), 3)
    if isinstance(doc.get("calib_drift"), (int, float)):
        return doc["calib_drift"]
    return None


def calib_anchor_ratio(doc: dict) -> float | None:
    """start calib / warm timeline floor — >= CALIB_ANCHOR_SUSPECT
    means the start window was contended and the normalization
    anchor can't be trusted (the r11 control-run incident: 3.6)."""
    vals = _timeline_vals(doc)
    start = doc.get("calib_sec")
    if vals and isinstance(start, (int, float)) and min(vals) > 0:
        return round(start / min(vals), 3)
    return None


def _contended(
    spread: dict | None,
    drift: float | None = None,
    anchor: float | None = None,
) -> bool:
    if isinstance(drift, (int, float)) and drift >= CALIB_DRIFT_CONTENDED:
        return True
    if (
        isinstance(anchor, (int, float))
        and anchor >= CALIB_ANCHOR_SUSPECT
    ):
        return True
    if not spread:
        return False
    p90 = spread.get("p90")
    frac = spread.get("frac_gt2")
    return bool(
        (isinstance(p90, (int, float)) and p90 >= SPREAD_P90_CONTENDED)
        or (
            isinstance(frac, (int, float))
            and frac >= SPREAD_FRAC_GT2_CONTENDED
        )
    )


def outlier_absorbed(doc: dict) -> float | None:
    """Seconds the outlier re-run pass (bench.py, r13) absorbed on a
    side, from either the flattened stdout key or the detail-file
    stamp. Totals are methodologically asymmetric when one side
    absorbed and the other predates the pass (r12 vs r13: ~4.1 s of
    the headline delta was absorption, not code) — VERDICT r13 #7:
    every total-vs-total claim must quote this number."""
    v = doc.get("outlier_absorbed_sec")
    if isinstance(v, (int, float)):
        return v
    st = doc.get("outlier_reruns")
    if isinstance(st, dict) and isinstance(
        st.get("absorbed_sec"), (int, float)
    ):
        return st["absorbed_sec"]
    detail = doc.get("detail_file")
    if detail and doc.get("__dir__"):
        p = os.path.join(doc["__dir__"], detail)
        if os.path.exists(p):
            try:
                with open(p) as fh:
                    sub = json.load(fh)
            except (OSError, ValueError):
                return None
            sub.pop("detail_file", None)  # no recursion
            sub.pop("__dir__", None)
            return outlier_absorbed(sub)
    return None


def compare(old: dict, new: dict) -> dict:
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
    s_old, s_new = spread_stats(old), spread_stats(new)
    d_old, d_new = calib_drift(old), calib_drift(new)
    a_old, a_new = calib_anchor_ratio(old), calib_anchor_ratio(new)
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
        "spread_old": s_old,
        "spread_new": s_new,
        "calib_drift_old": d_old,
        "calib_drift_new": d_new,
        "calib_anchor_old": a_old,
        "calib_anchor_new": a_new,
        # Outlier-rerun absorption per side (None = side predates the
        # pass or absorbed nothing): subtract mentally before reading
        # raw_ratio — absorption is methodology, not code.
        "outlier_absorbed_old": outlier_absorbed(old),
        "outlier_absorbed_new": outlier_absorbed(new),
    }
    adjudicable = out["norm_ratio"] is not None
    old_hot = _contended(s_old, d_old, a_old)
    new_hot = _contended(s_new, d_new, a_new)
    if old_hot or new_hot:
        # Contention dominates every other signal: the calib probe is
        # structurally blind to sustained load (see module docstring),
        # so neither "code" nor "host" can be claimed.
        out["verdict"] = "contended_host"
        out["contended_side"] = (
            "both" if old_hot and new_hot
            else ("old" if old_hot else "new")
        )
    elif adjudicable:
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
    return out


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    out = compare(_load(sys.argv[1]), _load(sys.argv[2]))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
