#!/usr/bin/env python3
"""Unskippable round-close gate (round-9 verdict #1).

Runs every CLAUDE.md-required close check IN ORDER — driver-window
invariants, physical-plan audit, the full pytest suite, and the
parallel Spark-vs-DuckDB oracle sweep — and refuses to print the close
summary line on ANY nonzero exit.  Three consecutive rounds shipped a
close commit claiming "full suite green" while `driver_window_check -q`
exited 1; a check that can be skipped isn't a check, so this script is
now the only sanctioned way to produce the close line.

Usage:
    python3 tools/round_close.py [sf_dir] [--workers N] [--skip-verify]

`--skip-verify` exists ONLY for mid-round smoke use (the oracle sweep is
~8 min); it taints the summary line so a close commit pasted from a
skipped run is self-evident.

Exit status: 0 and a `ROUND CLOSE OK` line iff every check passed.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str]) -> tuple[bool, float]:
    print(f"==> {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO)
    dt = time.time() - t0
    ok = proc.returncode == 0
    print(f"<== {name}: {'OK' if ok else f'FAIL (exit {proc.returncode})'} "
          f"[{dt:.0f}s]", flush=True)
    return ok, dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--workers", type=int, default=8,
                    help="verify_parallel shard count")
    ap.add_argument("--skip-verify", action="store_true",
                    help="skip the oracle sweep (taints the summary)")
    args = ap.parse_args()

    py = sys.executable
    checks: list[tuple[str, list[str]]] = [
        ("driver_window_check", [py, "tools/driver_window_check.py", "-q"]),
        ("plan_audit", [py, "tools/plan_audit.py"]),
        ("pytest", [py, "-m", "pytest", "tests/", "-q"]),
    ]
    if not args.skip_verify:
        checks.append((
            "verify_parallel",
            [py, "tools/verify_parallel.py", args.sf_dir, str(args.workers)],
        ))

    t0 = time.time()
    for name, cmd in checks:
        ok, _ = run(name, cmd)
        if not ok:
            print(f"ROUND CLOSE REFUSED: {name} failed — fix it; there is "
                  f"no green close line until every check exits 0.")
            return 1

    taint = " [VERIFY SKIPPED — not a close]" if args.skip_verify else ""
    ran = " + ".join(n for n, _ in checks)
    print(f"ROUND CLOSE OK: {ran} all green in {time.time() - t0:.0f}s "
          f"(sf_dir={args.sf_dir}){taint}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
