#!/usr/bin/env python3
"""Verify STAGED (not-yet-registered) gate modules against DuckDB.

Round N's driver window holds 50 hash-checks and the check-ordering
invariants in tools/driver_window_check.py mean a round that closes with
a full window cannot register more gates.  New gate modules are instead
STAGED: written, tested, and oracle-verified now, but imported by
`gate._ensure_registered` only at the next round's open.

This tool runs the EXACT verify_local comparison (row count, column-name
sets, dtype classes, cell values) over only the gates contributed by the
staged modules, so flipping registration later is risk-free.

Usage:
    python3 tools/verify_staged.py [sf_dir] [module ...]
defaults: sf_dir=/root/testdata/sf0.01, modules=every inferdb_spark.gate_r8*.
"""

from __future__ import annotations

import glob
import importlib
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from verify_local import compare, duck_run  # noqa: E402


def staged_modules() -> list[str]:
    mods = []
    for pat in ("gate_r8*.py", "gate_r9*.py", "gate_r1[0-9]*.py"):
        mods.extend(
            "inferdb_spark." + os.path.basename(p)[:-3]
            for p in glob.glob(os.path.join(REPO, "inferdb_spark", pat))
        )
    return sorted(mods)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    mods = sys.argv[2:] or staged_modules()
    if not mods:
        print("no staged gate modules found (inferdb_spark/gate_r8*.py)")
        return 1

    from inferdb_spark import gate
    from inferdb_spark.session import get_spark

    # ensure the registered set is loaded FIRST so a staged gate that
    # collides with an existing name raises here, not at round open
    gate._ensure_registered()
    before = set(gate._QUERIES)
    for m in mods:
        importlib.import_module(m)
    new = [n for n in gate._QUERIES if n not in before]
    print(f"staged modules: {', '.join(mods)}")
    print(f"staged gates ({len(new)}): {', '.join(new)}\n")

    spark = get_spark("verify_staged")
    failures = 0
    for name in new:
        t0 = time.time()
        try:
            sdf = gate._QUERIES[name](spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            failures += 1
            continue
        if name not in gate._ORACLES:
            print(f"SKIP {name}: no oracle (rows={len(sdf)}) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = duck_run(gate._ORACLES[name], sf_dir)
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"   - {p}")
        else:
            print(f"OK   {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
