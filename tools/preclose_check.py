"""Round pre-close gate — run before the last commit of a round.

The stale-green hazard (VERDICT r5 item 6): a query can be green in
an old CORRECTNESS_r{N}.json while its implementing module has since
changed — the old row no longer certifies the current code, and the
driver may not re-sweep it this round. ``__spark_entry__`` already
fronts those queries (tier 1) in its ordering; this tool closes the
loop locally: it lists exactly the tier-0 (never green) and tier-1
(green-but-module-changed) queries and re-runs THOSE through the
oracle harness under a VANILLA (driver-faithful) session.

    python tools/preclose_check.py            # check + run
    python tools/preclose_check.py --list     # just list the tiers

Exit 0 = every uncertified query is locally green; nonzero otherwise.
A round must not close while this is red.
"""

from __future__ import annotations

import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _git_commit_time(path: str) -> float | None:
    """Last-commit unix time of ``path``, or None (untracked/no git).
    Git times survive fresh clones; fs mtimes don't — after a
    re-checkout every file shares the clone time and an mtime-based
    tiering flags the whole registry."""
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", path],
            cwd=_ROOT, capture_output=True, text=True, timeout=30,
        )
        s = out.stdout.strip()
        return float(s) if s else None
    except (OSError, subprocess.SubprocessError, ValueError):
        return None


def uncertified() -> dict[str, list[str]]:
    import inspect

    import __spark_entry__ as e
    from bio_lakehouse_spark.suite import REGISTRY

    last = e._last_green_round()  # noqa: SLF001 — same-repo tooling
    round_times: dict[int, float] = {}
    for rnd in set(last.values()):
        t = _git_commit_time(f"CORRECTNESS_r{rnd:02d}.json")
        if t is None:
            t = e._round_file_mtime().get(rnd)  # noqa: SLF001
        if t is not None:
            round_times[rnd] = t

    mod_times: dict[str, float | None] = {}

    def module_time(fn) -> float | None:
        try:
            mod_file = inspect.getfile(fn)
        except (OSError, TypeError):
            return None
        if mod_file not in mod_times:
            rel = os.path.relpath(mod_file, _ROOT)
            t = _git_commit_time(rel)
            if t is None:  # uncommitted new module: treat as changed
                t = float("inf")
            # Uncommitted EDITS to a tracked module: dirty working
            # tree beats the last commit time.
            try:
                dirty = subprocess.run(
                    ["git", "status", "--porcelain", "--", rel],
                    cwd=_ROOT, capture_output=True, text=True, timeout=30,
                ).stdout.strip()
                if dirty:
                    t = float("inf")
            except (OSError, subprocess.SubprocessError):
                pass
            mod_times[mod_file] = t
        return mod_times[mod_file]

    tiers: dict[str, list[str]] = {"tier0_never_green": [],
                                   "tier1_module_changed": []}
    for name in REGISTRY:
        rnd = last.get(name, -1)
        if rnd < 0:
            tiers["tier0_never_green"].append(name)
            continue
        mt = module_time(REGISTRY[name].fn)
        if mt is not None and mt > round_times.get(rnd, float("inf")):
            tiers["tier1_module_changed"].append(name)
    return tiers


def run_pytest() -> int:
    """Full pytest — the guardrail net (plan-quality cartesian net,
    goldens, property tests) must be green before a round closes.
    Rounds 5 AND 6 shipped with tests/ red because the oracle gate
    alone certified the round; this closes that hole (VERDICT r6 #1)."""
    print("\nrunning full pytest (guardrail gate)…")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q",
         "-p", "no:cacheprovider"],
        cwd=_ROOT,
    )
    if proc.returncode != 0:
        print("pytest: RED — do not close the round")
    return proc.returncode


def main() -> int:
    tiers = uncertified()
    for tier, names in tiers.items():
        print(f"{tier}: {len(names)}")
        for n in names:
            print(f"  {n}")
    to_run = tiers["tier0_never_green"] + tiers["tier1_module_changed"]
    if "--list" in sys.argv:
        return 0
    rc = 0
    if not to_run:
        print("nothing uncertified — oracle gate green")
    else:
        print(f"\nre-running {len(to_run)} uncertified queries "
              "(vanilla session)…")
        proc = subprocess.run(
            [sys.executable,
             os.path.join(_ROOT, "tests", "oracle_harness.py"),
             "--vanilla", "--strict", *to_run],
            cwd=_ROOT,
        )
        rc = proc.returncode
    if "--no-pytest" not in sys.argv:
        rc = rc or run_pytest()
    if rc == 0:
        print("pre-close gate: GREEN")
    else:
        print("pre-close gate: RED — do not close the round")
    return rc


if __name__ == "__main__":
    sys.exit(main())
