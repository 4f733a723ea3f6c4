#!/usr/bin/env python3
"""Evidence-freshness report for the 50-slot driver window.

The external driver checks the first 50 registry entries per round
(CORRECTNESS_r{N}.json). Rotating that window by hand went stale-prone
(VERDICT r04 #1: 48 entries sat on round-1 evidence for three rounds),
so this computes, per registry entry, the LATEST round that
driver-checked it and whether that check was green, then prints the
stalest-first candidate list for the next rotation.

Usage: python scripts/driver_staleness.py [--window]
  --window  also print the current _DRIVER_FIRST with each entry's
            latest-evidence round, to audit a planned rotation.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def latest_evidence() -> dict[str, tuple[int, bool]]:
    """name -> (latest round with a driver row, that row was green)."""
    out: dict[str, tuple[int, bool]] = {}
    for path in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        for name, row in json.loads(path.read_text()).items():
            green = bool(
                row.get("hash_match")
                or (row.get("err") is None and "hash_match" not in row)
            )
            out[name] = (rnd, green)
    return out


def main() -> None:
    from etl_pulumi_aws_snowflake_spark.queries import _DRIVER_FIRST, all_queries

    evidence = latest_evidence()
    names = list(all_queries())
    rows = [(evidence.get(n, (0, False))[0], evidence.get(n, (0, False))[1], n)
            for n in names]
    never = [n for rnd, _, n in rows if rnd == 0]
    red = [(n, rnd) for rnd, green, n in rows if rnd and not green]
    stale_sorted = sorted((rnd, n) for rnd, _, n in rows if rnd)

    print(f"registry entries: {len(names)}")
    print(f"never driver-checked ({len(never)}): {never}")
    print(f"latest evidence RED ({len(red)}): {red}")
    by_round: dict[int, int] = {}
    for rnd, _ in stale_sorted:
        by_round[rnd] = by_round.get(rnd, 0) + 1
    print("evidence age histogram (round -> entries):", dict(sorted(by_round.items())))
    print("\nnext-window candidates, stalest first (never-checked lead):")
    for n in never:
        print(f"  r-- {n}")
    for rnd, n in stale_sorted:
        print(f"  r{rnd:02d} {n}")

    if "--window" in sys.argv:
        print("\ncurrent _DRIVER_FIRST (slot: latest-evidence entry):")
        for i, n in enumerate(_DRIVER_FIRST):
            rnd, green = evidence.get(n, (0, False))
            tag = f"r{rnd:02d}" if rnd else "r--"
            flag = "" if green or not rnd else "  RED"
            print(f"  {i + 1:2d}. {tag} {n}{flag}")


if __name__ == "__main__":
    main()
