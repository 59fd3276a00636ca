"""exact_kth_smallest: count-bisection selection vs sorted-list ground truth.

The conformal gate (gate_r5.py) depends on this returning EXACTLY the value
``sorted(vals)[k-1]`` for every k — the gate hash pins one instance; these
tests pin the algorithm across duplicates, negatives, wide ranges, and the
degenerate single-bucket / k>n edges.
"""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from inferdb_spark.operators.order_stats import exact_kth_smallest


def _df(spark, vals):
    schema = StructType([StructField("v", LongType())])
    return spark.createDataFrame([(int(v),) for v in vals], schema)


def test_matches_sorted_selection_random(spark):
    rng = random.Random(7)
    vals = [rng.randint(-10_000, 10_000) for _ in range(500)]
    df = _df(spark, vals).cache()
    ordered = sorted(vals)
    for k in [1, 2, 7, 250, 499, 500]:
        assert exact_kth_smallest(df, "v", k) == ordered[k - 1]
    df.unpersist()


def test_heavy_duplicates_and_wide_range(spark):
    # duplicates straddling bucket boundaries + one far outlier that forces
    # multi-pass bisection (range >> buckets with buckets=4)
    vals = [5] * 40 + [-3] * 10 + [10**12]
    df = _df(spark, vals).cache()
    ordered = sorted(vals)
    for k in [1, 10, 11, 50, 51]:
        assert exact_kth_smallest(df, "v", k, buckets=4) == ordered[k - 1]
    df.unpersist()


def test_callable_k_and_clamp(spark):
    vals = [3, 1, 2]
    df = _df(spark, vals)
    assert exact_kth_smallest(df, "v", lambda n: (n + 1) // 2) == 2
    assert exact_kth_smallest(df, "v", 99) == 3  # k > n clamps to max


def test_errors(spark):
    df = _df(spark, [1])
    with pytest.raises(ValueError):
        exact_kth_smallest(df, "v", 0)
    with pytest.raises(ValueError):
        exact_kth_smallest(df.filter(F.col("v") > 5), "v", 1)
    with pytest.raises(ValueError):
        exact_kth_smallest(df, "v", 1, buckets=1)


def test_small_buckets_many_passes(spark):
    # buckets=2 degrades to plain bisection — maximum pass count path
    vals = list(range(100, 0, -1))
    df = _df(spark, vals).cache()
    for k in [1, 37, 100]:
        assert exact_kth_smallest(df, "v", k, buckets=2) == k
    df.unpersist()


def test_nulls_excluded_from_ranks(spark):
    # ranks are over NON-NULL values (docstring contract): a raw
    # orderBy.limit(k) would place NULLs first; bisection skips them
    schema = StructType([StructField("v", LongType())])
    rows = [(None,), (10,), (None,), (1,), (5,)]
    df = spark.createDataFrame(rows, schema)
    assert exact_kth_smallest(df, "v", 1) == 1
    assert exact_kth_smallest(df, "v", 2) == 5
    assert exact_kth_smallest(df, "v", 3) == 10


def test_long_min_neighborhood(spark):
    # lo = LONG_MIN used to break the f-string SQL literal (unary-minus
    # overflow parse); the F.lit form must handle it
    lm = -(1 << 63)
    vals = [lm, lm + 3, lm + 7, lm + 7, lm + 100]
    df = _df(spark, vals).cache()
    ordered = sorted(vals)
    for k in [1, 2, 3, 4, 5]:
        assert exact_kth_smallest(df, "v", k, buckets=4) == ordered[k - 1]
    df.unpersist()


def test_span_overflow_guard(spark):
    # lo deeply negative AND hi large positive: span > 2^63-1 would wrap
    # the bucket arithmetic, so it must raise instead
    df = _df(spark, [-(1 << 63), (1 << 63) - 1, 0])
    with pytest.raises(ValueError, match="span"):
        exact_kth_smallest(df, "v", 2)


def test_persist_false_path(spark):
    vals = list(range(100, 0, -1))
    df = _df(spark, vals)
    assert exact_kth_smallest(df, "v", 37, persist=False) == 37
