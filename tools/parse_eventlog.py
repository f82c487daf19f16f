"""Parse a Spark event log (plain file or eventlog_v2 dir) into a
per-job / per-stage table: wall ms, task count, name. Companion to
tools/stage_profile.py for when the profiling session already ran.

    python tools/parse_eventlog.py [EVLOG_PATH_OR_DIR] [--all]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def parse(path: str, show_all: bool = False) -> None:
    if os.path.isdir(path):
        sub = sorted(glob.glob(f"{path}/events_*"))
        parts = sub or [path]
    else:
        parts = [path]
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for p in parts:
        with open(p) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except ValueError:
                    continue
                t = e.get("Event")
                if t == "SparkListenerJobStart":
                    jid = e["Job ID"]
                    jobs[jid] = {
                        "desc": (e.get("Properties") or {}).get(
                            "spark.job.description", ""
                        ),
                        "t0": e.get("Submission Time"),
                        "stages": [
                            s["Stage ID"] for s in e.get("Stage Infos", [])
                        ],
                    }
                elif t == "SparkListenerJobEnd":
                    if e["Job ID"] in jobs:
                        jobs[e["Job ID"]]["t1"] = e.get("Completion Time")
                elif t == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si.get("Stage Name", "")[:72],
                        "ntask": si.get("Number of Tasks"),
                        "ms": (si.get("Completion Time") or 0)
                        - (si.get("Submission Time") or 0),
                    }
    for jid in sorted(jobs):
        j = jobs[jid]
        if not show_all and not j["desc"].startswith("TIMED:"):
            continue
        dur = ((j.get("t1") or 0) - (j.get("t0") or 0)) / 1000.0
        print(f"\njob {jid} [{j['desc'][:60]}] {dur:.3f}s")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if s is None:
                print(f"  stage {sid:4d} SKIPPED(reused)")
            else:
                print(
                    f"  stage {sid:4d} {s['ms']:6d}ms {s['ntask']:4d} tasks"
                    f"  {s['name']}"
                )


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--all"]
    path = args[0] if args else sorted(
        glob.glob("/tmp/spark-events-r14/*")
    )[-1]
    parse(path, "--all" in sys.argv)
