#!/usr/bin/env python3
"""Diff the gate registry against the union of driver CORRECTNESS_r*.json.

Prints, per gate, the most recent driver round that hash-checked it, and
enforces TWO window invariants on the first `--window` (default 50) names
emitted by `gate.queries()`:

1. every NEVER-driver-checked gate is inside the window (a new gate must
   be hash-checked in its first driver round), and
2. no gate OUTSIDE the window is staler (lower last-checked round) than a
   gate INSIDE it — i.e. the window drains the oldest-coverage tiers
   first instead of re-hashing last round's set (round 6 wasted its
   entire window duplicating round 5's).

Ties within the boundary staleness tier may be resolved either way, so
the check is stable round over round without regenerating _PRIORITY for
cosmetic reasons.  `--emit-priority` prints a ready-to-paste _PRIORITY
list (never-checked first, then oldest-first, registry order within a
tier) when a rotation IS needed.  Wired into the round-close checklist
in CLAUDE.md.

Exit status: 0 if both invariants hold, 1 otherwise.
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
                    help="only print the summary + violations")
    ap.add_argument("--emit-priority", action="store_true",
                    help="print a ready-to-paste gate._PRIORITY list "
                         "(never-checked first, then oldest-first)")
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
    window = ordered[: args.window]
    window_set = set(window)

    by_round: dict[int, list[str]] = {}
    for name in ordered:
        by_round.setdefault(last_round.get(name, 0), []).append(name)
    for rnd in sorted(by_round):
        label = "NEVER" if rnd == 0 else f"r{rnd:02d}"
        in_w = sum(1 for n in by_round[rnd] if n in window_set)
        print(f"last-checked {label}: {len(by_round[rnd])} gates "
              f"({in_w} in next window)")
        if not args.quiet:
            for name in by_round[rnd]:
                print(f"    {name}")

    if args.emit_priority:
        ideal = sorted(
            ordered, key=lambda n: (last_round.get(n, 0), ordered.index(n))
        )[: args.window]
        print("_PRIORITY: list[str] = [")
        for name in ideal:
            print(f"    \"{name}\",")
        print("]")

    checked = set(last_round) & set(ordered)
    print(f"registry: {len(ordered)} gates; driver-checked ever: "
          f"{len(checked)}; never-checked: {len(never)}")

    failures = 0
    missing = [n for n in never if n not in window_set]
    if missing:
        failures += 1
        print(f"FAIL: {len(missing)} never-checked gates outside the first "
              f"{args.window} declared queries — reorder gate._PRIORITY:")
        for name in missing:
            print(f"  {name}")

    # staleness rotation: nothing outside the window may be staler than
    # anything inside it
    inside_max = max((last_round.get(n, 0) for n in window), default=0)
    outside_min = min(
        (last_round.get(n, 0) for n in ordered[args.window:]),
        default=inside_max,
    )
    if outside_min < inside_max:
        failures += 1
        worst_out = [n for n in ordered[args.window:]
                     if last_round.get(n, 0) == outside_min]
        worst_in = [n for n in window
                    if last_round.get(n, 0) == inside_max]
        print(f"FAIL: window re-hashes r{inside_max:02d}-checked gates "
              f"(e.g. {worst_in[0]}) while r{outside_min:02d}-era gates sit "
              f"outside (e.g. {worst_out[0]}) — run --emit-priority and "
              f"paste into gate._PRIORITY")

    if failures:
        return 1
    print(f"OK: next {args.window}-gate driver window covers every "
          f"never-checked gate and drains the oldest staleness tiers")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
