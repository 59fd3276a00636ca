#!/usr/bin/env python3
"""Heavy-family scale probe: time the named gate queries at two scale
dirs and report the per-query ratio normalized by the scale factor.

Usage: python3 tools/scale_probe.py SF_A SF_B SCALE query [query ...]

Mirrors bench.py's protocol (untimed warm-up + median of BENCH_ITERS
runs, noop-sink materialization).  The VERDICT protocol flags any query
whose SF_B time exceeds 2x linear vs SF_A.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = max(int(os.environ.get("BENCH_ITERS", "2")), 1)


def timed(fn) -> float:
    fn()
    runs = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return statistics.median(runs)


def main() -> int:
    sf_a, sf_b, scale = sys.argv[1], sys.argv[2], float(sys.argv[3])
    names = sys.argv[4:]
    from inferdb_spark.session import get_spark
    from inferdb_spark.gate import queries as gate_queries

    spark = get_spark("scale-probe")
    # staged (not-yet-registered) gate modules are probe-able too
    import glob as _glob
    import importlib as _importlib

    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for _pat in ("gate_r8*.py", "gate_r9*.py", "gate_r1[0-9]*.py"):
        for _p in sorted(_glob.glob(os.path.join(_repo, "inferdb_spark", _pat))):
            _importlib.import_module("inferdb_spark." + os.path.basename(_p)[:-3])
    qs = gate_queries()
    out = {"sf_a": sf_a, "sf_b": sf_b, "scale": scale, "queries": {}}
    flagged = []
    for name in names:
        fn = qs[name]
        ta = timed(lambda: fn(spark, sf_a).write.format("noop").mode("overwrite").save())
        tb = timed(lambda: fn(spark, sf_b).write.format("noop").mode("overwrite").save())
        ratio = (tb / scale) / ta if ta > 0 else float("inf")
        out["queries"][name] = {"a_sec": round(ta, 2), "b_sec": round(tb, 2),
                                "ratio_vs_linear": round(ratio, 2)}
        mark = "  <-- FLAG" if ratio > 2.0 else ""
        print(f"{name:28s} {ta:8.2f}s -> {tb:8.2f}s  ratio/linear {ratio:5.2f}{mark}",
              flush=True)
        if ratio > 2.0:
            flagged.append(name)
    print(json.dumps(out))
    print(f"flagged over 2x linear: {flagged or 'none'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
