"""Round-7 batch-5 gate math vs independent references (sf0.001)."""

from __future__ import annotations

import math

import pytest

from inferdb_spark.gate_r7e import (
    _SPRT_LOWER,
    _SPRT_UPPER,
    _SPRT_W0,
    _SPRT_W1,
    q_eb_shrunk_rates,
    q_sprt_ab_monitor,
)


def test_sprt_matches_sequential_replay(spark, sf_dir):
    from inferdb_spark.catalog import load_table
    from inferdb_spark.functions.hashing import h52
    from pyspark.sql import functions as F

    out = {r["variant"]: r for r in q_sprt_ab_monitor(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            (h52(F.col("user_id").cast("string")) % 2).alias("variant"),
            F.expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").alias("day"),
        )
        .agg(
            F.count("*").alias("n_t"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("k_t"),
        )
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r["variant"], []).append((r["day"], r["n_t"], r["k_t"]))
    for v, pts in series.items():
        pts.sort()
        llr = 0
        max_l = None
        min_l = None
        first = -1
        decision = "continue"
        for day, n_t, k_t in pts:
            llr += _SPRT_W1 * k_t + _SPRT_W0 * (n_t - k_t)
            max_l = llr if max_l is None else max(max_l, llr)
            min_l = llr if min_l is None else min(min_l, llr)
            if first < 0:
                if llr >= _SPRT_UPPER:
                    first, decision = day, "accept_h1"
                elif llr <= _SPRT_LOWER:
                    first, decision = day, "accept_h0"
        assert out[v]["n_days"] == len(pts)
        assert out[v]["max_llr_u"] == max_l
        assert out[v]["min_llr_u"] == min_l
        assert out[v]["first_decision_day"] == first
        assert out[v]["decision"] == decision
    # the boundary literals are the Wald bounds
    assert _SPRT_UPPER == round(math.log(0.80 / 0.05) * 1e6)
    assert _SPRT_LOWER == round(math.log(0.20 / 0.95) * 1e6)


def test_eb_shrinkage_pulls_toward_mean_and_matches_moments(spark, sf_dir):
    rows = q_eb_shrunk_rates(spark, sf_dir).collect()
    g = len(rows)
    rates_u = [round(r["k_b"] / r["n_b"] * 1e6) for r in rows]
    rates2_u = [round((r["k_b"] / r["n_b"]) ** 2 * 1e12) for r in rows]
    mu = sum(rates_u) / 1e6 / g
    var = sum(rates2_u) / 1e12 / g - mu * mu
    alpha = mu * (mu * (1 - mu) / var - 1)
    beta = (1 - mu) * (mu * (1 - mu) / var - 1)
    for r in rows:
        assert r["alpha"] == pytest.approx(alpha, abs=1e-5)
        assert r["beta"] == pytest.approx(beta, abs=1e-5)
        want = (r["k_b"] + alpha) / (r["n_b"] + alpha + beta)
        assert r["shrunk_rate"] == pytest.approx(want, abs=1e-5)
        raw = r["k_b"] / r["n_b"]
        # shrinkage moves every rate strictly toward the prior mean
        lo, hi = sorted((raw, alpha / (alpha + beta)))
        assert lo - 1e-9 <= r["shrunk_rate"] <= hi + 1e-9


def test_stream_page_hinkley_equals_batch(spark, sf_dir):
    """The streaming monitor's final summary must equal the batch
    computation of the same fixed-baseline PH over the full table."""
    from inferdb_spark.catalog import load_table
    from inferdb_spark.gate_r7e import (
        _SPH_DELTA,
        _SPH_LAMBDA,
        _SPH_MU0,
        q_stream_page_hinkley,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    streamed = {
        r["event_type"]: r for r in q_stream_page_hinkley(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.expr("CAST(unix_micros(ts) div 3600000000 AS BIGINT)").alias("h"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x"),
        F.count("*").cast("long").alias("cnt"),
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = hourly.select(
        "event_type",
        "h",
        F.sum(F.col("x") - F.col("cnt") * F.lit(_SPH_MU0 + _SPH_DELTA))
        .over(wc)
        .alias("m"),
    )
    ph = pre.select(
        "event_type", "h", (F.col("m") - F.min("m").over(wc)).alias("ph")
    )
    batch = {
        r["event_type"]: r
        for r in ph.groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            F.max("ph").alias("max_ph"),
            F.sum(F.when(F.col("ph") > _SPH_LAMBDA, 1).otherwise(0)).alias(
                "n_alarms"
            ),
            F.coalesce(
                F.min(F.when(F.col("ph") > _SPH_LAMBDA, F.col("h"))), F.lit(-1)
            ).alias("first_alarm_h"),
        )
        .collect()
    }
    assert set(streamed) == set(batch)
    for et in batch:
        for c in ("n_hours", "max_ph", "n_alarms", "first_alarm_h"):
            assert streamed[et][c] == batch[et][c], (et, c)
