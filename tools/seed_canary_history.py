#!/usr/bin/env python3
"""Seed canary_history.json from the committed bench_out.json history.

One-shot (round 16): the rolling host-factor ledger needs same-sf
reference entries before its first bench run. Walks `git log` of
bench_out.json oldest-first and records each snapshot's CSV-canary
median as a cpu entry (io = -1: the parquet scan+shuffle canary first
exists in round 16, so its window starts empty and io_factor reads -1
until two runs have landed).

Usage: python3 tools/seed_canary_history.py   (from the repo root)
"""
import json
import subprocess
import sys

KEEP = 40


def main():
    commits = subprocess.run(
        ["git", "log", "--reverse", "--format=%h", "--", "bench_out.json"],
        capture_output=True, text=True, check=True).stdout.split()
    entries = []
    for c in commits:
        try:
            blob = subprocess.run(["git", "show", f"{c}:bench_out.json"],
                                  capture_output=True, text=True,
                                  check=True).stdout
            d = json.loads(blob)
        except Exception:
            continue
        can = d.get("pipeline_phases", {}).get("canary")
        sf = d.get("sf")
        if not (isinstance(can, list) and len(can) == 3 and sf):
            continue
        entries.append({"sf": sf, "cpu": round(float(can[1]), 4), "io": -1.0})
    entries = entries[-KEEP:]
    with open("canary_history.json", "w") as f:
        json.dump({"entries": entries}, f)
        f.write("\n")
    print(f"seeded {len(entries)} entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
