from pyspark.sql import functions as F

from inferdb_spark.operators.relational_ext import (
    asof_join,
    pivot_counts,
    sessionize,
    unpivot,
)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 15), ("b", 7), ("c", 1)], "k string, t int"
    ).select("k", F.timestamp_seconds(F.col("t")).alias("ts"))
    right = spark.createDataFrame(
        [("a", 5, 100.0), ("a", 12, 200.0), ("b", 3, 50.0)], "k string, rt int, v double"
    ).select("k", F.timestamp_seconds(F.col("rt")).alias("rts"), "v")
    out = asof_join(left, right, ["k"], "ts", "rts", ["v"])
    got = {(r.k, r.ts.second): r.v_asof for r in out.collect()}
    assert got[("a", 5)] == 100.0   # inclusive: right at t=5 matches left t=5
    assert got[("a", 10)] == 100.0  # most recent <= 10 is t=5
    assert got[("a", 15)] == 200.0  # t=12 row
    assert got[("b", 7)] == 50.0
    assert got[("c", 1)] is None    # no right rows for key c -> LEFT semantics


def test_asof_join_is_single_window_no_pandas(spark):
    left = spark.createDataFrame([("a", 1)], "k string, t int").select(
        "k", F.timestamp_seconds("t").alias("ts")
    )
    right = spark.createDataFrame([("a", 1, 1.0)], "k string, rt int, v double").select(
        "k", F.timestamp_seconds("rt").alias("rts"), "v"
    )
    plan = asof_join(left, right, ["k"], "ts", "rts", ["v"])._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "Join" not in plan  # union+window, not a join (no row explosion)


def test_sessionize(spark):
    rows = [("u", 0), ("u", 60), ("u", 4000), ("u", 4030), ("v", 0)]
    df = spark.createDataFrame(rows, "k string, t int").select(
        "k", F.timestamp_seconds("t").alias("ts")
    )
    out = sessionize(df, "k", "ts", gap_minutes=30.0)
    got = sorted((r.k, r.ts.timestamp(), r.session_id) for r in out.collect())
    sessions = {(k, int(t)): s for k, t, s in got}
    assert sessions[("u", 0)] == 1 and sessions[("u", 60)] == 1
    assert sessions[("u", 4000)] == 2 and sessions[("u", 4030)] == 2
    assert sessions[("v", 0)] == 1


def test_pivot_and_unpivot_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "x", 10.0), (1, "y", 20.0), (2, "x", 5.0)], "g int, c string, v double"
    )
    wide = pivot_counts(df, "g", "c", ["x", "y"], F.sum("v")).na.fill(0.0)
    got = {r.grp: (r.x, r.y) for r in wide.collect()}
    assert got == {1: (10.0, 20.0), 2: (5.0, 0.0)}
    long = unpivot(wide, ["grp"], ["x", "y"])
    back = {(r.grp, r.variable): r.value for r in long.collect()}
    assert back[(1, "x")] == 10.0 and back[(2, "y")] == 0.0


def test_interval_join_matches_naive(spark):
    """Banded construction == naive inequality join, incl. band-crossing
    intervals and intervals longer than one band."""
    from datetime import datetime

    from inferdb_spark.operators.relational_ext import interval_join

    ev = spark.createDataFrame(
        [(i, 1, datetime(2024, 1, 1, h, m)) for i, (h, m) in enumerate(
            [(0, 0), (0, 59), (1, 0), (2, 30), (5, 0), (23, 59)]
        )] + [(100, 2, datetime(2024, 1, 1, 1, 30))],
        "event_id int, k int, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 30), datetime(2024, 1, 1, 2, 31)),  # spans 3 bands
            (1, datetime(2024, 1, 1, 4, 0), datetime(2024, 1, 1, 6, 0)),
            (2, datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 2, 0, 0)),    # 24h interval
        ],
        "k int, s timestamp, e timestamp",
    )
    got = sorted(
        (r["event_id"], r["s"].hour)
        for r in interval_join(ev, iv, ["k"], "ts", "s", "e", band_seconds=3600).collect()
    )
    naive = sorted(
        (r["event_id"], r["s"].hour)
        for r in ev.join(iv, "k").filter((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e"))).collect()
    )
    assert got == naive and len(got) == 5


def test_apply_changes_idempotent_and_tombstones(spark):
    from inferdb_spark.operators.relational_ext import apply_changes

    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k int, val int"
    )
    changes = spark.createDataFrame(
        [(2, 25, 1, "U"), (3, 0, 1, "D"), (4, 40, 1, "U"), (2, 27, 2, "U")],
        "k int, val int, v long, op string",
    )
    final = apply_changes(base, changes, ["k"], "v", "op", "D")
    got = {r["k"]: r["val"] for r in final.collect()}
    assert got == {1: 10, 2: 27, 4: 40}
    # idempotence: re-applying the same delta to the result is a no-op
    again = apply_changes(final.drop("v"), changes, ["k"], "v", "op", "D")
    assert {r["k"]: r["val"] for r in again.collect()} == got


def test_morton_key_roundtrip(spark):
    from inferdb_spark.functions.layout import morton_interleave

    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 1023) for y in (0, 2, 7, 1023)], "x int, y int"
    )
    rows = df.select("x", "y", morton_interleave(F.col("x"), F.col("y")).alias("m")).collect()

    def deinterleave(m):
        x = y = 0
        for i in range(10):
            x |= ((m >> (2 * i)) & 1) << i
            y |= ((m >> (2 * i + 1)) & 1) << i
        return x, y

    for r in rows:
        assert deinterleave(r["m"]) == (r["x"], r["y"])
