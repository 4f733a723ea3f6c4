#!/usr/bin/env python3
"""Cross-ROUND bench A/B (VERDICT r12 #2): the shared-suite total
drifted +8-9% two rounds running on untouched code.  A single bench
per round cannot separate host drift from harness drift, so this
interleaves FULL bench runs of the r11 checkout (A) and the current
HEAD (B) in one host session — A B A B — each in its own fresh JVM
exactly as the driver runs them.  Host-speed movement shows up as
within-arm spread between the two A runs (and the calibration rows);
a genuine harness/code effect shows up as a consistent A-vs-B gap on
the COMMON queries that survives both interleavings.

The r11 arm runs from a read-only git worktree pinned at the r11
artifact commit (created on demand under .ab_r11/, gitignored).

Usage: python scripts/ab_rounds.py [r11_commit]
Writes scripts/ab_rounds_report.json; findings go to SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
R11_COMMIT = sys.argv[1] if len(sys.argv) > 1 else "3832352"
WT = REPO / ".ab_r11"


def ensure_worktree() -> None:
    if (WT / "bench.py").exists():
        return
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(WT), R11_COMMIT],
        cwd=REPO,
        check=True,
    )


def remove_worktree() -> None:
    """Remove the A-arm worktree after the session — leaving it would
    double-count the repo's own files in any tool that walks the tree
    (LoC diagnostics, copy scanners)."""
    subprocess.run(
        ["git", "worktree", "remove", "--force", str(WT)],
        cwd=REPO,
        check=False,
    )


def run_bench(cwd: Path) -> dict:
    """One full bench in a fresh process/JVM; returns the parsed JSON
    line (the last stdout line that parses)."""
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(
        f"no JSON line in bench stdout from {cwd}:\n{out.stdout[-800:]}"
        f"\n{out.stderr[-800:]}"
    )


def main() -> None:
    # try/finally so a bench timeout/failure still removes the A-arm
    # worktree — the double-counting hazard remove_worktree() exists
    # to prevent (ADVICE r13).
    ensure_worktree()
    try:
        _run_session()
    finally:
        remove_worktree()


def _run_session() -> None:
    seq = [("A_r11", WT), ("B_head", REPO), ("A_r11", WT), ("B_head", REPO)]
    runs: list[dict] = []
    for arm, cwd in seq:
        doc = run_bench(cwd)
        runs.append(
            {
                "arm": arm,
                "calibration": doc.get("calibration"),
                "queries": doc["queries"],
                "total": doc["value"],
            }
        )
        print(
            f"{arm}: total={doc['value']} cal={doc.get('calibration')}",
            file=sys.stderr,
        )
    a_runs = [r for r in runs if r["arm"] == "A_r11"]
    b_runs = [r for r in runs if r["arm"] == "B_head"]
    common = sorted(
        set(a_runs[0]["queries"]) & set(b_runs[0]["queries"])
    )

    def common_sum(r):
        return round(sum(r["queries"][q] for q in common), 4)

    per_query = {
        q: {
            "a": [r["queries"][q] for r in a_runs],
            "b": [r["queries"][q] for r in b_runs],
            "b_over_a": round(
                statistics.median(r["queries"][q] for r in b_runs)
                / statistics.median(r["queries"][q] for r in a_runs),
                3,
            ),
        }
        for q in common
    }
    a_sums = [common_sum(r) for r in a_runs]
    b_sums = [common_sum(r) for r in b_runs]
    report = {
        "r11_commit": R11_COMMIT,
        "sequence": [r["arm"] for r in runs],
        "n_common_queries": len(common),
        "common_sum_a": a_sums,
        "common_sum_b": b_sums,
        "b_over_a_common_sum": round(
            (sum(b_sums) / len(b_sums)) / (sum(a_sums) / len(a_sums)), 4
        ),
        "within_a_spread": round(max(a_sums) / min(a_sums), 4),
        "within_b_spread": round(max(b_sums) / min(b_sums), 4),
        "calibrations": {
            "a": [r["calibration"] for r in a_runs],
            "b": [r["calibration"] for r in b_runs],
        },
        "per_query": per_query,
    }
    out = REPO / "scripts" / "ab_rounds_report.json"
    out.write_text(json.dumps(report, indent=1) + "\n")
    print(json.dumps({k: report[k] for k in (
        "b_over_a_common_sum", "within_a_spread", "within_b_spread",
        "common_sum_a", "common_sum_b")}))


if __name__ == "__main__":
    main()
