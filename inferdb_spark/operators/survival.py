"""Survival-analysis operators over a (t, obs[, grp]) duration relation:
the log-rank two-group test and the Nelson-Aalen cumulative-hazard
estimator.  Kaplan-Meier lives gate-side (gate_r5b) with the same
discipline; these two are the reusable forms (any duration construction
— churn, conversion, time-to-failure — feeds them).

Scale/determinism contract (the kaplan_meier standard):
- the caller reduces raw data to ONE ROW PER SUBJECT (t = duration,
  obs = 1 if the event was observed, 0 if right-censored; grp ∈ {0, 1}
  for log_rank);
- all cumulative windows here run over the DISTINCT-duration relation
  (at-risk counts by cumulative subtraction), never subjects;
- every per-time fractional term (hypergeometric E and V, hazard
  increments d/n and d/n²) is quantized to integer micro/nano units
  BEFORE summation, so aggregation order cannot move the statistic and
  an independent SQL oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# per-event-time hypergeometric expectation/variance, micro-quantized;
# shared verbatim with the DuckDB oracle by the gate layer
E1_U_SQL = "CAST(floor(CAST(d * n1 AS DOUBLE) / n * 1000000.0 + 0.5) AS BIGINT)"
V_U_SQL = (
    "CASE WHEN n > 1 THEN CAST(floor(CAST(d * n1 AS DOUBLE) * (n - n1)"
    " * (n - d) / n / n / (n - 1) * 1000000.0 + 0.5) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)
LR_CHI2_SQL = (
    # v_u = 0 (all events in one group at one time, or a single subject)
    # gives a degenerate test: chi2 is undefined, surfaced as NULL rather
    # than an ANSI DIVIDE_BY_ZERO.  Guard shared verbatim by the oracle.
    "CASE WHEN v_u = 0 THEN NULL ELSE "
    "CAST(round((CAST(o1 AS DOUBLE) - CAST(e1_u AS DOUBLE) / 1000000.0)"
    " * (CAST(o1 AS DOUBLE) - CAST(e1_u AS DOUBLE) / 1000000.0)"
    " / (CAST(v_u AS DOUBLE) / 1000000.0), 6) AS DOUBLE) END"
)


def log_rank(durs: DataFrame) -> DataFrame:
    """Log-rank test over (t, obs, grp): one row
    (o1, e1, v, chi2, n_times) — observed group-0 events vs the
    hypergeometric expectation Σ d·n1/n and variance at each distinct
    event time, χ² = (O−E)²/V."""
    per_t = durs.groupBy("t").agg(
        F.sum("obs").cast("long").alias("d"),
        F.sum(F.when(F.col("grp") == 0, F.col("obs")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.count("*").cast("long").alias("rem"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("rem1"),
    )
    tot = durs.agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("long").alias("n1_all"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        per_t.crossJoin(F.broadcast(tot))
        .select(
            "t",
            "d",
            "d1",
            (F.col("n_all") - F.coalesce(F.sum("rem").over(w), F.lit(0))).alias("n"),
            (F.col("n1_all") - F.coalesce(F.sum("rem1").over(w), F.lit(0))).alias(
                "n1"
            ),
        )
        .filter(F.col("d") > 0)
    )
    terms = risk.selectExpr("d1", f"{E1_U_SQL} AS e1_u", f"{V_U_SQL} AS v_u")
    sums = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1_u").cast("long").alias("e1_u"),
        F.sum("v_u").cast("long").alias("v_u"),
        F.count("*").cast("long").alias("n_times"),
    )
    return sums.selectExpr(
        "o1",
        "CAST(round(CAST(e1_u AS DOUBLE) / 1000000.0, 6) AS DOUBLE) AS e1",
        "CAST(round(CAST(v_u AS DOUBLE) / 1000000.0, 6) AS DOUBLE) AS v",
        f"{LR_CHI2_SQL} AS chi2",
        "n_times",
    )


def nelson_aalen(durs: DataFrame) -> DataFrame:
    """Nelson-Aalen cumulative hazard over (t, obs): per distinct event
    time (t, d, n_risk, h, var_h) with H(t) = Σ d/n and Var = Σ d/n²
    cumulated as nano-quantized BIGINTs."""
    per_t = durs.groupBy("t").agg(
        F.sum("obs").cast("long").alias("d"),
        F.count("*").cast("long").alias("rem"),
    )
    tot = durs.agg(F.count("*").cast("long").alias("n_all"))
    wp = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        per_t.crossJoin(F.broadcast(tot))
        .select(
            "t",
            "d",
            (F.col("n_all") - F.coalesce(F.sum("rem").over(wp), F.lit(0))).alias("n"),
        )
        .filter(F.col("d") > 0)
    )
    evt = risk.selectExpr(
        "t",
        "d",
        "n",
        "CAST(floor(CAST(d AS DOUBLE) / n * 1000000000.0 + 0.5) AS BIGINT) AS h_u",
        "CAST(floor(CAST(d AS DOUBLE) / n / n * 1000000000.0 + 0.5) AS BIGINT)"
        " AS vh_u",
    )
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return evt.select(
        "t",
        "d",
        F.col("n").cast("long").alias("n_risk"),
        F.round(F.sum("h_u").over(wc) / 1000000000.0, 6).cast("double").alias("h"),
        F.round(F.sum("vh_u").over(wc) / 1000000000.0, 6)
        .cast("double")
        .alias("var_h"),
    ).orderBy("t")
