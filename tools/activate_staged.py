#!/usr/bin/env python3
"""One-command activation of the staged round-8 gates.

Performs the two source edits COVERAGE.md ("Round-8 STAGED gates")
describes, idempotently:

1. inserts every `inferdb_spark/gate_r8*.py` module into
   `gate._ensure_registered`'s import tuple (after the last gate_r7*
   entry), and
2. regenerates `gate._PRIORITY` with the never-checked-first /
   oldest-first ordering that tools/driver_window_check.py enforces
   (by invoking it with --emit-priority in a FRESH interpreter so the
   freshly patched registration is what gets ordered).

Run this at ROUND-8 OPEN, i.e. once CORRECTNESS_r07.json exists — the
tool warns (and requires --force) if it does not, because activating
early would put more never-checked gates than the 50-slot window holds
and fail the round-close check.

    python3 tools/activate_staged.py [--dry-run] [--force]

After it runs: python3 tools/driver_window_check.py -q &&
python3 tools/verify_local.py /root/testdata/sf0.01 && pytest + plan_audit.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_PY = os.path.join(REPO, "inferdb_spark", "gate.py")


def staged_modules() -> list[str]:
    """Every potentially-staged gate module across rounds (r8/r9/r10/...).

    Already-registered modules in the result are harmless: patch_registration
    skips any module whose import line is already present.  Selection for a
    specific tranche happens via --modules.
    """
    mods: set[str] = set()
    for pat in ("gate_r8*.py", "gate_r9*.py", "gate_r1[0-9]*.py"):
        mods.update(
            "inferdb_spark." + os.path.basename(p)[:-3]
            for p in glob.glob(os.path.join(REPO, "inferdb_spark", pat))
        )
    return sorted(mods)


def _max_checked_round() -> int:
    """Highest N across CORRECTNESS_r{N}.json (0 if none)."""
    best = 0
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            best = max(best, int(m.group(1)))
    return best


def patch_registration(src: str, mods: list[str]) -> tuple[str, list[str]]:
    missing = [m for m in mods if f'"{m}"' not in src]
    if not missing:
        return src, []
    # anchor: the last gate_r{N}* entry inside the _ensure_registered tuple
    anchors = re.findall(r'        "inferdb_spark\.gate_r\d+\w*",\n', src)
    if not anchors:
        raise SystemExit("cannot find a gate_r* anchor in _ensure_registered")
    anchor = anchors[-1]
    insert = "".join(f'        "{m}",\n' for m in missing)
    return src.replace(anchor, anchor + insert, 1), missing


def emit_priority() -> list[str]:
    """run driver_window_check --emit-priority in a fresh interpreter
    (the current process may hold a stale gate module) and parse the
    emitted list."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "driver_window_check.py"),
         "--emit-priority", "-q"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout
    m = re.search(r"_PRIORITY: list\[str\] = \[\n((?:    \"[^\"]+\",\n)+)\]", out)
    if not m:
        raise SystemExit(
            "could not parse --emit-priority output; run it manually:\n" + out
        )
    return re.findall(r'"([^"]+)"', m.group(1))


def patch_priority(src: str, names: list[str]) -> str:
    start = src.index("_PRIORITY: list[str] = [")
    end = src.index("\n]", start) + 2
    body = "".join(f'    "{n}",\n' for n in names)
    return src[:start] + "_PRIORITY: list[str] = [\n" + body + "]\n" + src[end:]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--force", action="store_true",
                    help="activate even without CORRECTNESS_r07.json")
    ap.add_argument("--modules", nargs="*", default=None, metavar="MOD",
                    help="activate only these staged modules (bare names "
                         "like gate_r8c, or full dotted paths); default: all")
    args = ap.parse_args()

    if _max_checked_round() < 7 and not args.force:
        print("CORRECTNESS_r07.json not found: the current 50-gate window has "
              "not been driver-checked yet, so activation would exceed the "
              "window. Re-run with --force only if you know better.")
        return 1

    mods = staged_modules()
    if args.modules is not None:
        want = {
            m if m.startswith("inferdb_spark.") else "inferdb_spark." + m
            for m in args.modules
        }
        unknown = sorted(want - set(mods))
        if unknown:
            print(f"unknown staged modules: {', '.join(unknown)}")
            return 1
        mods = [m for m in mods if m in want]
    if not mods:
        print("no staged gate_r8*.py modules found")
        return 1
    src = open(GATE_PY).read()
    patched, added = patch_registration(src, mods)
    if added:
        print(f"registering {len(added)} staged modules: {', '.join(added)}")
        if not args.dry_run:
            open(GATE_PY, "w").write(patched)
    else:
        print("all staged modules already registered")

    if args.dry_run:
        # the registration patch was never written, so --emit-priority in a
        # fresh interpreter would order the UNPATCHED on-disk registry and
        # omit every staged gate from the preview — say so instead of
        # misrepresenting what a real run produces
        print("dry-run: skipping _PRIORITY preview (it would reflect the "
              "pre-activation registry; run without --dry-run to regenerate)")
        return 0

    names = emit_priority()
    print(f"regenerating _PRIORITY with {len(names)} window entries "
          f"(head: {', '.join(names[:4])} ...)")
    if not args.dry_run:
        src = open(GATE_PY).read()
        open(GATE_PY, "w").write(patch_priority(src, names))
        check = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "driver_window_check.py"),
             "-q"], cwd=REPO,
        )
        print("driver_window_check:", "OK" if check.returncode == 0 else "FAILED")
        print("next: python3 tools/verify_local.py /root/testdata/sf0.01 && "
              "python3 tools/plan_audit.py && python -m pytest tests/ -q")
        return check.returncode
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
