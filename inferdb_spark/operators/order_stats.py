"""Exact order statistics over integer columns at unbounded scale.

The reference fetches order statistics by sorting inside Postgres
(``ORDER BY ... LIMIT k`` over the residual relation, the shape its
``percentile_disc`` oracle queries compile to).  A literal Spark
translation — ``orderBy(col).limit(k)`` — is TakeOrderedAndProject:
each task keeps its top-``min(k, rows)`` and ONE driver-side task
merges ``~k`` values.  Fine when k is small; fatal when k is a fixed
FRACTION of the relation (conformal q̂ uses k ≈ 0.9·n), because the
merge task then materializes ~n values no matter how many executors
exist.

This module replaces that with **count-bisection over the integer
domain** (the classic selection-by-counting algorithm; same discipline
as gate_dss's group_exact_quartiles integer-rank join): repeatedly
histogram the candidate value range into ≤``buckets`` equal-width
integer buckets with ONE aggregate pass, locate the bucket containing
the k-th smallest from the (driver-side, ≤``buckets``-row) cumulative
counts, and narrow the range.  Each pass shrinks the range by a factor
of ``buckets``; for 64-bit cents domains that is ≤ ~5 passes, each a
map-side-combined groupBy whose driver traffic is ≤``buckets`` rows —
**independent of n**.

Input-shape note: when ``df`` is a bare parquet scan the narrowed
range filters push into the scan and later passes touch a shrinking
byte range under parquet min/max pruning.  When ``df`` is a DERIVED
relation (a join/aggregate output, e.g. conformal's calibration
residuals) there is no scan to prune — every pass would re-execute the
whole upstream lineage.  That is why ``persist=True`` is the default:
the (projected, single-column) input is cached once and the 1 + ~5
passes hit the cache, not the join.

NULL semantics: NULLs in ``col`` are excluded before ranking — ranks
are over non-null values only (``F.count`` and the range filters both
skip NULLs).  This intentionally differs from a raw ascending
``orderBy.limit(k)``, where Spark places NULLs FIRST and they would
occupy ranks.  For conformal q̂ the inputs are non-null abs residuals,
so the two agree; callers with nullable columns get the
non-null-ranked value.

Domain guard: bucket ids are computed as ``(v - lo) DIV width`` in
64-bit integer arithmetic, exact as long as ``hi - lo`` fits in a
signed 64-bit int.  A span wider than 2^63 - 1 (lo deeply negative AND
hi large positive) would overflow, so it raises instead of silently
wrapping.  Practical integer domains (cents, micros, ids) are far
inside the guard.

No sampling, no approximation: over non-null values the returned value
is exactly the k-th smallest (ties included).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_kth_smallest"]

_I64_MAX = (1 << 63) - 1


def exact_kth_smallest(
    df: DataFrame,
    col: str,
    k: int | Callable[[int], int],
    *,
    buckets: int = 4096,
    persist: bool = True,
) -> int:
    """Exact k-th smallest (1-indexed, ties counted, non-null values
    only) of integer column ``col``.

    ``k`` may be an int or a callable ``n -> k`` evaluated on the exact
    non-null count (conformal's k = ceil((n+1)(1-alpha)) needs n first;
    the callable form folds that into the same first pass that fetches
    min/max).  ``k > n`` clamps to the maximum, ``k < 1`` raises.

    ``persist=True`` (default) caches the single-column projection for
    the duration of the bisection so derived inputs (join/agg outputs)
    are materialized once, not once per pass; pass ``persist=False``
    for bare scans where parquet min/max pruning already makes re-reads
    cheap.

    Driver memory per pass is O(buckets); number of passes is
    O(log_buckets(max - min)).  Every pass is a single JVM-side
    aggregate — no Python UDFs, no sort, no single-task merge.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    c = F.col(col)
    scoped = df.select(c.cast("long").alias("_v")).filter(F.col("_v").isNotNull())
    if persist:
        scoped = scoped.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        first = scoped.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_v").alias("lo"),
            F.max("_v").alias("hi"),
        ).collect()[0]
        n = int(first["n"])
        if n == 0:
            raise ValueError(
                f"exact_kth_smallest: column {col!r} has no non-null rows"
            )
        kk = int(k(n)) if callable(k) else int(k)
        if kk < 1:
            raise ValueError(f"k must be >= 1, got {kk}")
        lo, hi = int(first["lo"]), int(first["hi"])
        if hi - lo > _I64_MAX:  # Python ints: exact, no wrap
            raise ValueError(
                "exact_kth_smallest: value span exceeds 2^63-1 "
                f"({lo}..{hi}); bucket arithmetic would overflow BIGINT"
            )
        if kk >= n:
            return hi
        remaining = kk
        while lo < hi:
            width = -((lo - hi - 1) // buckets)  # ceil((hi-lo+1)/buckets) >= 1
            hist = (
                scoped.filter(
                    (F.col("_v") >= F.lit(lo)) & (F.col("_v") <= F.lit(hi))
                )
                # two-step: _v - lo is in [0, span] (guard above) so the
                # subtraction cannot wrap; F.lit(lo) handles LONG_MIN,
                # which an f-string SQL literal cannot (unary-minus parse).
                .select(((F.col("_v") - F.lit(lo))).alias("_d"))
                .groupBy(
                    # integer DIV, not double /: exact for the full guarded
                    # domain (doubles lose integers above 2^53)
                    F.expr(f"_d DIV {width}L").alias("_b")
                )
                .agg(F.count(F.lit(1)).alias("_cnt"))
                .collect()
            )
            counts = {int(r["_b"]): int(r["_cnt"]) for r in hist}
            b = None
            for bucket_id in sorted(counts):
                if remaining <= counts[bucket_id]:
                    b = bucket_id
                    break
                remaining -= counts[bucket_id]
            if b is None:  # k exceeded rows in range — impossible with exact counts
                raise AssertionError("count-bisection invariant violated")
            lo_new = lo + b * width
            hi = min(hi, lo_new + width - 1)
            lo = lo_new
        return lo
    finally:
        if persist:
            scoped.unpersist()
