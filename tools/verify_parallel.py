#!/usr/bin/env python3
"""Shard tools/verify_local.py across worker subprocesses.

The full gate battery is ~180 independent Spark-vs-DuckDB comparisons;
at larger scale factors a single session runs them serially for hours.
This wrapper round-robins the query names over N workers, each a separate
verify_local process with a smaller `SPARK_GRAFT_CPUS` slice, and merges
the per-shard verdicts.

Usage: python3 tools/verify_parallel.py [sf_dir] [n_workers] [logdir]
Exit 0 iff every shard printed ALL OK.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_workers = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    logdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_shards"
    os.makedirs(logdir, exist_ok=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())

    # Balance shards by MEASURED per-gate times from the previous run's
    # logs (round-8 verdict #9: round-robin left one shard 180s+ longer
    # than the rest as heavy oracles clustered).  Greedy longest-
    # processing-time: sort known gates by descending last-run time and
    # always hand the next one to the lightest shard; unmeasured gates
    # (new this round, or no logs yet) fall back to round-robin on top.
    import re

    times: dict[str, float] = {}
    for w in range(64):
        log_path = os.path.join(logdir, f"shard{w}.log")
        if not os.path.exists(log_path):
            continue
        with open(log_path) as f:
            for m in re.finditer(
                r"^(?:OK|FAIL) +(\S+) .*\[([0-9.]+)s\]", f.read(), re.M
            ):
                times[m.group(1)] = float(m.group(2))
    shards: list[list[str]] = [[] for _ in range(n_workers)]
    loads = [0.0] * n_workers
    known = sorted(
        (n for n in names if n in times), key=lambda n: -times[n]
    )
    unknown = [n for n in names if n not in times]
    for n in known:
        w = loads.index(min(loads))
        shards[w].append(n)
        loads[w] += times[n]
    # unmeasured gates join the LIGHTEST shard at a nominal weight (the
    # median measured time, else 5 s) — round-robin from shard 0 ignored
    # the LPT loads already assigned and skewed the balance whenever the
    # logdir came from a different scale factor
    nominal = sorted(times.values())[len(times) // 2] if times else 5.0
    for n in unknown:
        w = loads.index(min(loads))
        shards[w].append(n)
        loads[w] += nominal
    if known:
        print(
            f"LPT-balanced {len(known)} measured gates "
            f"(predicted spread {min(loads):.0f}-{max(loads):.0f}s per shard); "
            f"{len(unknown)} unmeasured LPT-placed at {nominal:.0f}s nominal"
        )

    cpus = max(2, (os.cpu_count() or 8) // n_workers)
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_DRIVER_MEM="16g")
    procs = []
    t0 = time.time()
    for w, shard in enumerate(shards):
        log = open(os.path.join(logdir, f"shard{w}.log"), "w")
        p = subprocess.Popen(
            [sys.executable, "-u", os.path.join(os.path.dirname(__file__), "verify_local.py"),
             sf_dir, *shard],
            stdout=log, stderr=subprocess.STDOUT, env=env,
        )
        procs.append((w, p, log))
        print(f"shard {w}: {len(shard)} queries -> {log.name} (pid {p.pid})")

    failures = 0
    for w, p, log in procs:
        rc = p.wait()
        log.close()
        with open(log.name) as f:
            txt = f.read()
        n_ok = txt.count("\nOK ") + txt.startswith("OK ")
        n_fail = txt.count("FAIL ")
        print(f"shard {w}: rc={rc} ok={n_ok} fail={n_fail} [{time.time()-t0:.0f}s]")
        if rc != 0 or n_fail:
            failures += 1
            for line in txt.splitlines():
                if line.startswith("FAIL") or line.startswith("   -"):
                    print("   " + line)
    print("ALL OK" if failures == 0 else f"{failures} SHARD FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
