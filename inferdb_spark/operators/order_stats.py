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
**independent of n**.  Filters on the narrowed range are pushed into
the scan, so later passes touch a shrinking byte range under parquet
min/max pruning.

No sampling, no approximation: the returned value is exactly the k-th
smallest (ties included), bit-identical to what ``orderBy.limit(k)``
would produce.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_kth_smallest"]


def exact_kth_smallest(
    df: DataFrame,
    col: str,
    k: int | Callable[[int], int],
    *,
    buckets: int = 4096,
) -> int:
    """Exact k-th smallest (1-indexed, ties counted) of integer column
    ``col``.

    ``k`` may be an int or a callable ``n -> k`` evaluated on the exact
    row count (conformal's k = ceil((n+1)(1-alpha)) needs n first; the
    callable form folds that into the same first pass that fetches
    min/max).  ``k > n`` clamps to the maximum, ``k < 1`` raises.

    Driver memory per pass is O(buckets); number of passes is
    O(log_buckets(max - min)).  Every pass is a single JVM-side
    aggregate — no Python UDFs, no sort, no single-task merge.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    c = F.col(col)
    first = df.agg(
        F.count(c).alias("n"),
        F.min(c).cast("long").alias("lo"),
        F.max(c).cast("long").alias("hi"),
    ).collect()[0]
    n = int(first["n"])
    if n == 0:
        raise ValueError(f"exact_kth_smallest: column {col!r} has no rows")
    kk = int(k(n)) if callable(k) else int(k)
    if kk < 1:
        raise ValueError(f"k must be >= 1, got {kk}")
    lo, hi = int(first["lo"]), int(first["hi"])
    if kk >= n:
        return hi
    remaining = kk
    scoped = df.select(c.cast("long").alias("_v"))
    while lo < hi:
        width = -((lo - hi - 1) // buckets)  # ceil((hi-lo+1)/buckets) >= 1
        hist = (
            scoped.filter((F.col("_v") >= lo) & (F.col("_v") <= hi))
            .groupBy(
                # integer DIV, not double /: exact for the full 64-bit domain
                F.expr(f"(_v - {lo}L) DIV {width}L").alias("_b")
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
        if b is None:  # k exceeded rows in range — cannot happen with exact counts
            raise AssertionError("count-bisection invariant violated")
        lo_new = lo + b * width
        hi = min(hi, lo_new + width - 1)
        lo = lo_new
    return lo
