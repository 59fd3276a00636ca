"""Alternating A/B timer for gate queries under a code toggle.

Round-10's methodology lesson (OPTIMIZATION_r10.md §7): sequential
A/Bs on this sandbox are drift-biased — whichever side runs first looks
faster.  This harness interleaves the sides (A,B,[C,]A,B,[C,]...) inside
ONE JVM and reports per-side min/median over >= `reps` samples.

Usage:
    python3 tools/ab_alternate.py <query> <toggle> <val_a> <val_b> [val_c ...] [--reps N]

<toggle> is "module.attr" set before each sample, e.g.
    python3 tools/ab_alternate.py connected_components \
        inferdb_spark.operators.graph._PATH_COMPRESSIONS 1 2 3
or "conf:<spark.conf.key>" to toggle a runtime-settable Spark conf, e.g.
    python3 tools/ab_alternate.py bm25_ranked_retrieval \
        conf:spark.sql.adaptive.coalescePartitions.parallelismFirst true false
Values parse as int when possible, else float, else string
("True"/"False" parse as bools; conf values are passed as strings).
"""

from __future__ import annotations

import importlib
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _parse(v: str):
    if v == "True":
        return True
    if v == "False":
        return False
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 6
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else reps
    query, toggle = args[0], args[1]

    from inferdb_spark.gate import queries as gate_queries
    from inferdb_spark.session import get_spark

    spark = get_spark("ab-alternate")
    fn = gate_queries()[query]

    if toggle.startswith("conf:"):
        key = toggle[5:]
        values = list(args[2:])  # conf values stay strings
        orig = spark.conf.get(key, None)

        def setattr_toggle(v):
            spark.conf.set(key, v)

        def restore():
            if orig is not None:
                spark.conf.set(key, orig)
    else:
        values = [_parse(v) for v in args[2:]]
        mod_name, attr = toggle.rsplit(".", 1)
        mod = importlib.import_module(mod_name)
        orig = getattr(mod, attr)

        def setattr_toggle(v):
            setattr(mod, attr, v)

        def restore():
            setattr(mod, attr, orig)

    def run_once() -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        # drive the ContextCleaner between samples so neither side
        # inherits the other's shuffle-state backlog (bench.timed parity)
        spark._jvm.System.gc()
        return dt

    # untimed warm-up on each side (JIT/codegen)
    for v in values:
        setattr_toggle(v)
        run_once()

    samples: dict[object, list[float]] = {v: [] for v in values}
    for r in range(reps):
        for v in values:
            setattr_toggle(v)
            la = os.getloadavg()[0]
            dt = run_once()
            samples[v].append(dt)
            print(f"rep {r} {toggle}={v}: {dt:.3f}s (load {la:.1f})", flush=True)
    restore()

    print(f"\n== {query} / {toggle} (reps={reps}) ==")
    for v in values:
        s = samples[v]
        print(
            f"  {v}: min {min(s):.3f}  median {statistics.median(s):.3f}  "
            f"max {max(s):.3f}"
        )


if __name__ == "__main__":
    main()
