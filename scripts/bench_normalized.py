#!/usr/bin/env python3
"""Calibration-normalized cross-round bench reading (VERDICT r08 #4).

Usage: python scripts/bench_normalized.py OLD.json NEW.json

Each bench line carries a fixed-work calibration time measuring the
HOST.  Reporting query_time / calibration_time alongside raw seconds
turns the host-noise bracketing into arithmetic: a query whose raw
time moved but whose normalized ratio is flat moved with the host, not
with the code.  Accepts either a raw bench line or the driver's
BENCH_r{N}.json wrapper (with a "parsed" field).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    return doc.get("parsed", doc)


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    # Matched-probe normalization (r16, VERDICT r15 #5): real queries
    # are shuffle/memory-bound, so normalize by the shuffle probe when
    # both lines carry it (the pure-CPU probe stayed flat through the
    # r15 host degradation that slowed every query ~17%).  Pre-r16
    # lines only have the CPU probe — fall back and say so.
    if "calibration_shuffle" in old and "calibration_shuffle" in new:
        co, cn = old["calibration_shuffle"], new["calibration_shuffle"]
        probe = "shuffle"
    else:
        co, cn = old["calibration"], new["calibration"]
        probe = "cpu (shuffle probe absent in one input)"
    print(f"calibration[{probe}]: {co} -> {cn} s (host {cn / co:.3f}x)")
    if "calibration" in old and "calibration" in new:
        print(f"calibration[cpu]: {old['calibration']} -> "
              f"{new['calibration']} s "
              f"(host {new['calibration'] / old['calibration']:.3f}x)")
    print("\n| query | old s | new s | raw ratio | old t/cal | new t/cal |"
          " norm ratio |")
    print("|---|---|---|---|---|---|---|")
    rows = []
    for q in old["queries"]:
        if q not in new["queries"]:
            continue
        to, tn = old["queries"][q], new["queries"][q]
        rows.append((tn / to, q, to, tn, to / co, tn / cn))
    for raw, q, to, tn, no, nn in sorted(rows, reverse=True):
        print(f"| {q} | {to} | {tn} | {raw:.2f} | {no:.2f} | {nn:.2f} | "
              f"{nn / no:.2f} |")
    tot_o = sum(old["queries"].values())
    tot_n = sum(new["queries"][q] for q in old["queries"] if q in new["queries"])
    print(f"\ntotal: {tot_o:.2f} -> {tot_n:.2f} s (raw {tot_n / tot_o:.3f}x, "
          f"normalized {(tot_n / cn) / (tot_o / co):.3f}x)")


if __name__ == "__main__":
    main()
