"""As-of join (operators/relational_ext.asof_join): nearest-before
semantics, inclusive equal-time match, duplicate-timestamp tie-break
(atomic struct payload), tolerance, no-match nulls — against a
brute-force twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from inferdb_spark.operators.relational_ext import asof_join


def _run(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "lid: long, k: string, t: long")
    right = spark.createDataFrame(right_rows, "rid: long, k: string, t: long")
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        right_values=["rid"], right_seq_col="rid", **kw
    )
    return {r["lid"]: (r["rid_asof"], r["t_asof"]) for r in out.collect()}


def test_basic_backward_and_no_match(spark):
    got = _run(
        spark,
        [(1, "a", 100), (2, "a", 50), (3, "a", 5)],
        [(10, "a", 10), (11, "a", 60), (12, "b", 1)],
    )
    assert got == {1: (11, 60), 2: (10, 10), 3: (None, None)}


def test_equal_time_inclusive(spark):
    # right row AT the left timestamp matches (backward-inclusive)
    got = _run(spark, [(1, "a", 10)], [(10, "a", 10)])
    assert got == {1: (10, 10)}


def test_duplicate_right_times_greatest_seq_wins(spark):
    got = _run(
        spark,
        [(1, "a", 20)],
        [(10, "a", 10), (11, "a", 10), (9, "a", 10)],
    )
    assert got == {1: (11, 10)}


def test_tolerance_nulls_stale_matches(spark):
    got = _run(
        spark,
        [(1, "a", 100), (2, "a", 12)],
        [(10, "a", 10)],
        tolerance=5,
    )
    assert got == {1: (None, None), 2: (10, 10)}


def test_brute_force_parity(spark):
    import random

    rnd = random.Random(7)
    left = [(i, f"k{rnd.randrange(4)}", rnd.randrange(100)) for i in range(60)]
    right = [
        (1000 + i, f"k{rnd.randrange(4)}", rnd.randrange(100))
        for i in range(40)
    ]
    got = _run(spark, left, right)

    def brute(lk, lt):
        cands = [(t, rid) for rid, k, t in right if k == lk and t <= lt]
        if not cands:
            return (None, None)
        t, rid = max(cands)
        return (rid, t)

    want = {lid: brute(k, t) for lid, k, t in left}
    assert got == want


def test_left_columns_survive(spark):
    left = spark.createDataFrame(
        [(1, "a", 10, "payload")], "lid: long, k: string, t: long, extra: string"
    )
    right = spark.createDataFrame([(5, "a", 3)], "rid: long, k: string, t: long")
    out = asof_join(
        left, right, on=["k"], left_ts="t", right_ts="t",
        right_values=["rid"],
    ).collect()
    assert out[0]["extra"] == "payload" and out[0]["rid_asof"] == 5
