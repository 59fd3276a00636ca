#!/usr/bin/env python3
"""Compare two bench.py JSON outputs (or BENCH_r*.json records).

Usage: python3 tools/bench_compare.py BASE.json NEW.json [--scale N]

--scale N divides NEW's times by N before comparing — e.g. `--scale 10`
checks an sf1 run against an sf0.1 baseline for linear scaling (the
VERDICT protocol: flag any query whose sf1 time exceeds 2x linear).
Accepts either the raw one-line bench output or the driver's BENCH_r
wrapper ({"parsed": {...}}).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d["queries"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("new")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--flag", type=float, default=2.0,
                    help="ratio above which a query is flagged")
    args = ap.parse_args()
    base, new = load(args.base), load(args.new)
    rows = []
    for name in new:
        if name not in base:
            rows.append((name, None, new[name], None))
            continue
        adj = new[name] / args.scale
        rows.append((name, base[name], new[name], adj / base[name]))
    rows.sort(key=lambda r: -(r[3] or 0))
    flagged = 0
    print(f"{'query':32s} {'base':>8s} {'new':>8s} {'ratio':>7s}")
    for name, b, n, r in rows:
        if r is None:
            print(f"{name:32s} {'-':>8s} {n:8.2f}    new")
            continue
        mark = ""
        if r > args.flag:
            mark = "  <-- FLAG"
            flagged += 1
        print(f"{name:32s} {b:8.2f} {n:8.2f} {r:7.2f}{mark}")
    tb = sum(v for k, v in base.items() if k in new)
    # ratio over base∩new only — counting new-only queries in tn would
    # inflate the ratio every time coverage grows
    tn = sum(v for k, v in new.items() if k in base)
    tnew_only = sum(v for k, v in new.items() if k not in base)
    print(f"\ntotal(base∩new)={tb:.1f}s new(∩)={tn:.1f}s "
          f"new-only={tnew_only:.1f}s "
          f"adj-ratio={tn/args.scale/tb if tb else float('nan'):.2f} "
          f"(scale={args.scale}); {flagged} flagged >{args.flag}x")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
