#!/usr/bin/env python3
"""Diff the gate registry against the union of driver CORRECTNESS_r*.json.

Prints, per gate, the most recent driver round that hash-checked it, and
lists the NEVER-driver-checked set — those must lead `gate._PRIORITY` so the
next driver window (first 50 declared queries) covers them.  Wired into the
round-close checklist in CLAUDE.md (round-4 verdict, "Next round" item 8).

Exit status: 0 if the first `--window` (default 50) names emitted by
`gate.queries()` include every never-checked gate (i.e. the next driver run
will cover them all), 1 otherwise.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50,
                    help="driver window size (first N declared queries)")
    ap.add_argument("-q", "--quiet", action="store_true",
                    help="only print the summary + never-checked set")
    args = ap.parse_args()

    last_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as fh:
            for name in json.load(fh):
                last_round[name] = max(last_round.get(name, 0), rnd)

    from inferdb_spark import gate

    ordered = list(gate.queries())
    never = [n for n in ordered if n not in last_round]
    window = set(ordered[: args.window])

    if not args.quiet:
        by_round: dict[int, list[str]] = {}
        for name in ordered:
            by_round.setdefault(last_round.get(name, 0), []).append(name)
        for rnd in sorted(by_round):
            label = "NEVER" if rnd == 0 else f"r{rnd:02d}"
            print(f"last-checked {label}: {len(by_round[rnd])} gates")

    checked = set(last_round) & set(ordered)
    print(f"registry: {len(ordered)} gates; driver-checked ever: "
          f"{len(checked)}; never-checked: {len(never)}")
    for name in never:
        marker = "in-window" if name in window else "OUT-OF-WINDOW"
        print(f"  {name}  [{marker}]")

    missing = [n for n in never if n not in window]
    if missing:
        print(f"FAIL: {len(missing)} never-checked gates outside the first "
              f"{args.window} declared queries — reorder gate._PRIORITY")
        return 1
    print(f"OK: next {args.window}-gate driver window covers every "
          f"never-checked gate")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
