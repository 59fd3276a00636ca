"""Round-7 gate queries, batch 7: model-evaluation and two-sample
statistics — PR-curve average precision, Youden threshold selection,
McNemar's paired test, Fleiss' kappa, the log-rank survival test,
Nelson-Aalen cumulative hazard, Jarque-Bera normality, and
Jensen-Shannon drift.

These close the evaluation-statistics gaps around the existing metric
gates (auc_rank_sum, cohens_kappa, kaplan_meier, psi_drift): the PR-side
ranking metric, the threshold-selection step after AUC, paired-classifier
comparison, multi-rater agreement, two-group survival comparison, the
hazard-scale twin of Kaplan-Meier, a moments-based normality test, and
the symmetric/bounded drift divergence.

Cross-engine determinism (the repo cookbook): every cumulative window
runs over a GROUPED domain relation (distinct scores / durations / bins
— never raw rows); per-element transcendental terms are quantized to
integer micro/nano units before summation so aggregation order can't
perturb the hash; argmaxes compare exact BIGINT margins; final doubles
are rounded to 6dp on both sides.  Where a multi-step double expression
is unavoidable (moments, divergence terms) the SAME SQL string is fed to
Spark via selectExpr and to DuckDB verbatim, pinning the IEEE op order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.functions.hashing import duckdb_h52, h52
from inferdb_spark.gate import gate
from inferdb_spark.gate_ml import LIN_B, LIN_COEF_D, LIN_COEF_Q, LIN_COEF_T

# the deterministic linear scorer shared with auc_rank_sum /
# calibration_bins: integer-milli scores over lineitem
_SC_SQL = (
    f"CAST(round((l_quantity * {LIN_COEF_Q!r} + l_discount * {LIN_COEF_D!r}"
    f" + l_tax * {LIN_COEF_T!r} + {LIN_B!r}) * 1000) AS BIGINT)"
)


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.round(
            (
                F.col("l_quantity") * LIN_COEF_Q
                + F.col("l_discount") * LIN_COEF_D
                + F.col("l_tax") * LIN_COEF_T
                + F.lit(LIN_B)
            )
            * 1000
        )
        .cast("long")
        .alias("s"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
        "l_quantity",
    )


@gate(
    "average_precision_eval",
    oracle=f"""
    WITH sc AS (
      SELECT {_SC_SQL} AS s,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    g AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(y) AS BIGINT) AS pos
          FROM sc GROUP BY s),
    r AS (SELECT pos, cnt,
                 sum(cnt) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cum_cnt,
                 sum(pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cum_pos
          FROM g)
    SELECT CAST(round(sum(pos * CAST(round(CAST(cum_pos AS DOUBLE) / cum_cnt
                    * 1000000) AS BIGINT)) / 1000000.0 / sum(pos), 6)
                AS DOUBLE) AS ap,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(cnt - pos) AS BIGINT) AS n_neg
    FROM r
    """,
)
def q_average_precision_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (step-interpolated PR-AUC at unique thresholds,
    the sklearn definition) of the deterministic linear scorer against
    the returnflag label — the PR-side companion to gate:auc_rank_sum
    for the imbalanced filtering decisions a curation pipeline makes.
    Grouped scores → ONE window over the distinct-score relation;
    per-threshold precision quantized to micro-units so the weighted sum
    is a BIGINT (operators/metrics.py:average_precision)."""
    from inferdb_spark.operators.metrics import average_precision

    return average_precision(_scored(spark, sf_dir), "s", "y")


@gate(
    "youden_j_threshold",
    oracle=f"""
    WITH sc AS (
      SELECT {_SC_SQL} AS s,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    g AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(y) AS BIGINT) AS pos
          FROM sc GROUP BY s),
    r AS (SELECT s,
                 sum(pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cum_pos,
                 sum(cnt - pos) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cum_neg
          FROM g),
    tot AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
                   CAST(sum(cnt - pos) AS BIGINT) AS n_neg FROM g),
    m AS (SELECT s, cum_pos, cum_neg, n_pos, n_neg,
                 cum_pos * n_neg - cum_neg * n_pos AS m
          FROM r CROSS JOIN tot),
    best AS (SELECT max(m) AS best_m FROM m),
    thr AS (SELECT min(s) AS thr FROM m CROSS JOIN best WHERE m = best_m)
    SELECT CAST(thr.thr AS BIGINT) AS thr,
           CAST(round(CAST(m.m AS DOUBLE) / (m.n_pos * m.n_neg), 6)
                AS DOUBLE) AS j,
           CAST(round(CAST(m.cum_pos AS DOUBLE) / m.n_pos, 6) AS DOUBLE) AS tpr,
           CAST(round(CAST(m.cum_neg AS DOUBLE) / m.n_neg, 6) AS DOUBLE) AS fpr,
           CAST(m.n_pos AS BIGINT) AS n_pos,
           CAST(m.n_neg AS BIGINT) AS n_neg
    FROM m JOIN thr ON m.s = thr.thr
    """,
)
def q_youden_j_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal decision threshold by Youden's J = TPR − FPR, maximized
    over unique score thresholds with the argmax compared in EXACT
    integer margins (cum_pos·N − cum_neg·P — no float can flip the
    winner) and ties broken to the lowest threshold.  The step after
    gate:auc_rank_sum in any scoring pipeline: AUC says the ranking is
    good, this picks the operating point
    (operators/metrics.py:youden_threshold)."""
    from inferdb_spark.operators.metrics import youden_threshold

    return youden_threshold(_scored(spark, sf_dir), "s", "y")


@gate(
    "mcnemar_paired_test",
    oracle=f"""
    WITH sc AS (
      SELECT CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END AS pa,
             CASE WHEN {_SC_SQL} > 0 THEN 1 ELSE 0 END AS pb,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ),
    ct AS (
      SELECT CAST(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS n
      FROM sc
    )
    SELECT b, c, n,
           CAST(round(CAST((b - c) * (b - c) AS DOUBLE) / (b + c), 6)
                AS DOUBLE) AS chi2,
           CAST(round(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                      / (b + c), 6) AS DOUBLE) AS chi2_cc
    FROM ct
    """,
)
def q_mcnemar_paired_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test comparing two deterministic classifiers on PAIRED
    predictions (rule A: quantity ≥ 25; rule B: linear score > 0) against
    the returnflag label — the correct significance test for "is model B
    better than model A on the SAME rows", which the independent-sample
    z-test gates cannot answer.  Discordant-pair counts b/c are one
    map-side-combinable aggregation (integers end to end; the χ² ratios
    divide once at the end) — scales like a count(*)."""
    sc = _scored(spark, sf_dir).select(
        (F.col("l_quantity") >= 25).cast("int").alias("pa"),
        (F.col("s") > 0).cast("int").alias("pb"),
        "y",
    )
    ct = sc.agg(
        F.sum(
            F.when((F.col("pa") == F.col("y")) & (F.col("pb") != F.col("y")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("b"),
        F.sum(
            F.when((F.col("pa") != F.col("y")) & (F.col("pb") == F.col("y")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("c"),
        F.count("*").cast("long").alias("n"),
    )
    return ct.select(
        "b",
        "c",
        "n",
        F.round(
            ((F.col("b") - F.col("c")) * (F.col("b") - F.col("c"))).cast("double")
            / (F.col("b") + F.col("c")),
            6,
        )
        .cast("double")
        .alias("chi2"),
        F.round(
            (
                (F.abs(F.col("b") - F.col("c")) - 1)
                * (F.abs(F.col("b") - F.col("c")) - 1)
            ).cast("double")
            / (F.col("b") + F.col("c")),
            6,
        )
        .cast("double")
        .alias("chi2_cc"),
    )


# three deterministic raters over documents: length terciles, token-count
# terciles, and a hash rater (deliberately noisy — kappa should sit well
# below the two correlated raters' agreement)
_R1_SQL = "CASE WHEN n_chars < 216 THEN 0 WHEN n_chars < 374 THEN 1 ELSE 2 END"
_R2_SQL = (
    "CASE WHEN length(text) - length(replace(text, ' ', '')) < 35 THEN 0 "
    "WHEN length(text) - length(replace(text, ' ', '')) < 60 THEN 1 ELSE 2 END"
)


@gate(
    "fleiss_kappa_raters",
    oracle=f"""
    WITH rated AS (
      SELECT {_R1_SQL} AS r1, {_R2_SQL} AS r2,
             {duckdb_h52("substr(text, 1, 16)")} % 3 AS r3
      FROM documents
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CASE WHEN r1 = r2 AND r2 = r3 THEN 9
                           WHEN r1 = r2 OR r1 = r3 OR r2 = r3 THEN 5
                           ELSE 3 END) AS BIGINT) AS s_sum,
             CAST(sum(CASE WHEN r1 = 0 THEN 1 ELSE 0 END
                      + CASE WHEN r2 = 0 THEN 1 ELSE 0 END
                      + CASE WHEN r3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN r1 = 1 THEN 1 ELSE 0 END
                      + CASE WHEN r2 = 1 THEN 1 ELSE 0 END
                      + CASE WHEN r3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN r1 = 2 THEN 1 ELSE 0 END
                      + CASE WHEN r2 = 2 THEN 1 ELSE 0 END
                      + CASE WHEN r3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM rated
    )
    SELECT n_items, s_sum, c0, c1, c2,
           CAST(round(CAST(s_sum - 3 * n_items AS DOUBLE)
                      / (6 * n_items), 6) AS DOUBLE) AS pbar,
           CAST(round(CAST(c0 * c0 + c1 * c1 + c2 * c2 AS DOUBLE)
                      / (9.0 * n_items * n_items), 6) AS DOUBLE) AS pe,
           CAST(round((CAST(s_sum - 3 * n_items AS DOUBLE) / (6 * n_items)
                       - CAST(c0 * c0 + c1 * c1 + c2 * c2 AS DOUBLE)
                         / (9.0 * n_items * n_items))
                      / (1.0 - CAST(c0 * c0 + c1 * c1 + c2 * c2 AS DOUBLE)
                         / (9.0 * n_items * n_items)), 6) AS DOUBLE) AS kappa
    FROM s
    """,
)
def q_fleiss_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa for THREE raters over the documents table (length
    terciles, token-count terciles, and a deliberately-noisy hash rater)
    — the multi-rater generalization of gate:cohens_kappa, the agreement
    statistic a labeling/QA pipeline reports for annotation campaigns.
    The per-item agreement Σ n_ij² collapses to a closed form on rater
    triples (9/5/3 for all-equal / one-pair / all-distinct), so the whole
    statistic is ONE integer aggregation pass; P̄, P̄_e and kappa divide
    exact BIGINTs at the end with the op order pinned by a shared SQL
    string."""
    docs = load_table(spark, sf_dir, "documents")
    rated = (
        docs.selectExpr("text", f"{_R1_SQL} AS r1", f"{_R2_SQL} AS r2")
        .withColumn("r3", h52(F.substring(F.col("text"), 1, 16)) % 3)
        .drop("text")
    )
    s = rated.selectExpr(
        "CAST(count(*) AS BIGINT) AS n_items",
        "CAST(sum(CASE WHEN r1 = r2 AND r2 = r3 THEN 9 "
        "WHEN r1 = r2 OR r1 = r3 OR r2 = r3 THEN 5 ELSE 3 END) AS BIGINT) AS s_sum",
        "CAST(sum(CASE WHEN r1 = 0 THEN 1 ELSE 0 END"
        " + CASE WHEN r2 = 0 THEN 1 ELSE 0 END"
        " + CASE WHEN r3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0",
        "CAST(sum(CASE WHEN r1 = 1 THEN 1 ELSE 0 END"
        " + CASE WHEN r2 = 1 THEN 1 ELSE 0 END"
        " + CASE WHEN r3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1",
        "CAST(sum(CASE WHEN r1 = 2 THEN 1 ELSE 0 END"
        " + CASE WHEN r2 = 2 THEN 1 ELSE 0 END"
        " + CASE WHEN r3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2",
    )
    return s.selectExpr(
        "n_items",
        "s_sum",
        "c0",
        "c1",
        "c2",
        "CAST(round(CAST(s_sum - 3 * n_items AS DOUBLE) / (6 * n_items), 6)"
        " AS DOUBLE) AS pbar",
        "CAST(round(CAST(c0 * c0 + c1 * c1 + c2 * c2 AS DOUBLE)"
        " / (9.0 * n_items * n_items), 6) AS DOUBLE) AS pe",
        "CAST(round((CAST(s_sum - 3 * n_items AS DOUBLE) / (6 * n_items)"
        " - CAST(c0 * c0 + c1 * c1 + c2 * c2 AS DOUBLE)"
        " / (9.0 * n_items * n_items))"
        " / (1.0 - CAST(c0 * c0 + c1 * c1 + c2 * c2 AS DOUBLE)"
        " / (9.0 * n_items * n_items)), 6) AS DOUBLE) AS kappa",
    )


# ---------------------------------------------------------------------------
# Survival statistics over time-to-first-purchase per user, in HOURS
# from each user's first event, with ADMINISTRATIVE censoring at a fixed
# 24-hour observation budget (users who purchase later — or never — are
# censored at t = 24).  Unlike the activity-lifetime construction of
# gate:kaplan_meier (which at gate scale has almost no churn events),
# this yields dozens of distinct event times AND a real censored tail,
# so the two-group comparison and the hazard curve are non-degenerate.

_LR_HORIZON_H = 24

_SURV_PREFIX = f"""
    WITH fe AS (
      SELECT user_id, min(epoch_us(ts)) AS first_us FROM events GROUP BY user_id
    ),
    fp AS (
      SELECT user_id, min(epoch_us(ts)) AS p_us FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    durs AS (
      SELECT CASE WHEN fp.p_us IS NULL
                    OR (fp.p_us - fe.first_us) // 3600000000 >= {_LR_HORIZON_H}
                  THEN {_LR_HORIZON_H}
                  ELSE CAST((fp.p_us - fe.first_us) // 3600000000 AS BIGINT)
             END AS t,
             CASE WHEN fp.p_us IS NULL
                    OR (fp.p_us - fe.first_us) // 3600000000 >= {_LR_HORIZON_H}
                  THEN 0 ELSE 1 END AS obs,
             CAST(fe.user_id % 2 AS BIGINT) AS grp
      FROM fe LEFT JOIN fp ON fe.user_id = fp.user_id
    )"""

# per-event-time expectation/variance terms, micro-quantized; the SAME
# strings run through Spark selectExpr (operators/survival.py) and the
# DuckDB oracle below
from inferdb_spark.operators.survival import (  # noqa: E402
    E1_U_SQL as _E1_U,
    LR_CHI2_SQL as _LR_CHI2,
    V_U_SQL as _V_U,
)


def _survival_durs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t, obs, grp) per user: hours from first event to first purchase,
    administratively censored at the 24-hour horizon; grp = user parity.
    Mirrors the _SURV_PREFIX oracle CTE chain exactly."""
    ev = load_table(spark, sf_dir, "events")
    fe = ev.groupBy("user_id").agg(F.min(F.unix_micros("ts")).alias("first_us"))
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("p_us"))
    )
    return fe.join(fp, "user_id", "left").selectExpr(
        f"CASE WHEN p_us IS NULL OR (p_us - first_us) div 3600000000"
        f" >= {_LR_HORIZON_H} THEN {_LR_HORIZON_H}"
        f" ELSE CAST((p_us - first_us) div 3600000000 AS BIGINT) END AS t",
        f"CASE WHEN p_us IS NULL OR (p_us - first_us) div 3600000000"
        f" >= {_LR_HORIZON_H} THEN 0 ELSE 1 END AS obs",
        "CAST(user_id % 2 AS BIGINT) AS grp",
    )


@gate(
    "log_rank_survival",
    oracle=f"""{_SURV_PREFIX},
    per_t AS (
      SELECT t, CAST(sum(obs) AS BIGINT) AS d,
             CAST(sum(CASE WHEN grp = 0 THEN obs ELSE 0 END) AS BIGINT) AS d1,
             CAST(count(*) AS BIGINT) AS rem,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS rem1
      FROM durs GROUP BY t
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
                   CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n1_all
            FROM durs),
    risk AS (
      SELECT t, d, d1,
             n_all - coalesce(sum(rem) OVER (ORDER BY t ROWS BETWEEN
               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n,
             n1_all - coalesce(sum(rem1) OVER (ORDER BY t ROWS BETWEEN
               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1
      FROM per_t CROSS JOIN tot
    ),
    terms AS (
      SELECT d1, {_E1_U} AS e1_u, {_V_U} AS v_u
      FROM risk WHERE d > 0
    ),
    sums AS (
      SELECT CAST(sum(d1) AS BIGINT) AS o1,
             CAST(sum(e1_u) AS BIGINT) AS e1_u,
             CAST(sum(v_u) AS BIGINT) AS v_u,
             CAST(count(*) AS BIGINT) AS n_times
      FROM terms
    )
    SELECT o1,
           CAST(round(CAST(e1_u AS DOUBLE) / 1000000.0, 6) AS DOUBLE) AS e1,
           CAST(round(CAST(v_u AS DOUBLE) / 1000000.0, 6) AS DOUBLE) AS v,
           {_LR_CHI2} AS chi2,
           n_times
    FROM sums
    """,
)
def q_log_rank_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing time-to-first-purchase between two user
    cohorts (user_id parity), administratively censored at 24 hours —
    the standard "does cohort A convert faster than cohort B" test, the
    two-group companion to gate:kaplan_meier.  Per distinct event time:
    observed group-0 conversions vs the hypergeometric expectation
    E = d·n1/n and variance; both per-time terms are quantized to
    integer micro-units so the sums are exact BIGINTs, and every
    cumulative window runs over the distinct-duration relation (at-risk
    counts by cumulative subtraction), never raw events.
    χ² = (O−E)²/V, one row (operators/survival.py:log_rank)."""
    from inferdb_spark.operators.survival import log_rank

    return log_rank(_survival_durs(spark, sf_dir))


@gate(
    "nelson_aalen_hazard",
    oracle=f"""{_SURV_PREFIX},
    per_t AS (
      SELECT t, CAST(sum(obs) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS rem
      FROM durs GROUP BY t
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM durs),
    risk AS (
      SELECT t, d,
             n_all - coalesce(sum(rem) OVER (ORDER BY t ROWS BETWEEN
               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
      FROM per_t CROSS JOIN tot
    ),
    ev AS (
      SELECT t, d, n,
             CAST(floor(CAST(d AS DOUBLE) / n * 1000000000.0 + 0.5)
                  AS BIGINT) AS h_u,
             CAST(floor(CAST(d AS DOUBLE) / n / n * 1000000000.0 + 0.5)
                  AS BIGINT) AS vh_u
      FROM risk WHERE d > 0
    )
    SELECT t, d, CAST(n AS BIGINT) AS n_risk,
           CAST(round(sum(h_u) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW) / 1000000000.0, 6) AS DOUBLE) AS h,
           CAST(round(sum(vh_u) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW) / 1000000000.0, 6) AS DOUBLE) AS var_h
    FROM ev ORDER BY t
    """,
)
def q_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator H(t) = Σ d/n over the
    time-to-first-purchase event times (24-hour administrative censor),
    with its variance Σ d/n² — the hazard-scale twin of
    gate:kaplan_meier (the two are the canonical cross-check: S(t) ≈
    exp(−H(t))).  Per-time increments are quantized to integer NANO
    units and cumulated as BIGINTs over the distinct-duration relation —
    the sum is order-independent and the windows are domain-bounded
    (operators/survival.py:nelson_aalen)."""
    from inferdb_spark.operators.survival import nelson_aalen

    return nelson_aalen(_survival_durs(spark, sf_dir).select("t", "obs"))


# ---------------------------------------------------------------------------
# Jarque-Bera normality test from raw integer power sums.  l_quantity is
# integer-valued (1..50), so S1..S4 are EXACT BIGINTs: 50^4 = 6.25e6 per
# row keeps the 4th-power sum under 2^63 through ~1.4e12 rows; beyond
# that (full 100 TB) the sums move to DECIMAL(38,0) — same plan shape,
# noted not hidden.  The moment algebra runs on the exact sums with the
# IEEE op order pinned by a shared SQL string.

_JB_MU = "(CAST(s1 AS DOUBLE) / n)"
_JB_M2 = f"(CAST(s2 AS DOUBLE) / n - {_JB_MU} * {_JB_MU})"
_JB_M3 = (
    f"(CAST(s3 AS DOUBLE) / n - 3.0 * {_JB_MU} * (CAST(s2 AS DOUBLE) / n)"
    f" + 2.0 * {_JB_MU} * {_JB_MU} * {_JB_MU})"
)
_JB_M4 = (
    f"(CAST(s4 AS DOUBLE) / n - 4.0 * {_JB_MU} * (CAST(s3 AS DOUBLE) / n)"
    f" + 6.0 * {_JB_MU} * {_JB_MU} * (CAST(s2 AS DOUBLE) / n)"
    f" - 3.0 * {_JB_MU} * {_JB_MU} * {_JB_MU} * {_JB_MU})"
)
_JB_SKEW = f"({_JB_M3} / ({_JB_M2} * sqrt({_JB_M2})))"
_JB_KURT = f"({_JB_M4} / ({_JB_M2} * {_JB_M2}))"
_JB_STAT = (
    f"(CAST(n AS DOUBLE) / 6.0 * ({_JB_SKEW} * {_JB_SKEW}"
    f" + ({_JB_KURT} - 3.0) * ({_JB_KURT} - 3.0) / 4.0))"
)
_JB_OUT = [
    "n",
    f"CAST(round({_JB_MU}, 6) AS DOUBLE) AS mean",
    f"CAST(round({_JB_SKEW}, 6) AS DOUBLE) AS skewness",
    f"CAST(round({_JB_KURT}, 6) AS DOUBLE) AS kurtosis",
    f"CAST(round({_JB_STAT}, 6) AS DOUBLE) AS jb",
]


@gate(
    "jarque_bera_normality",
    oracle=f"""
    WITH q AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q FROM lineitem),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(q) AS BIGINT) AS s1,
             CAST(sum(q * q) AS BIGINT) AS s2,
             CAST(sum(q * q * q) AS BIGINT) AS s3,
             CAST(sum(q * q * q * q) AS BIGINT) AS s4
      FROM q
    )
    SELECT {", ".join(_JB_OUT)} FROM s
    """,
)
def q_jarque_bera_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on l_quantity from raw power sums
    S1..S4 — the moments-based screen (skewness² + excess-kurtosis²
    scaled by n/6) a feature pipeline runs before assuming Gaussian
    scaling; here it correctly screams non-normal for the uniform
    quantity column.  ONE aggregation pass of exact BIGINT power sums
    (map-side combinable); skew/kurtosis/JB are closed forms over the
    five sums, evaluated with a shared SQL string on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.selectExpr("CAST(round(l_quantity) AS BIGINT) AS q").selectExpr(
        "CAST(count(*) AS BIGINT) AS n",
        "CAST(sum(q) AS BIGINT) AS s1",
        "CAST(sum(q * q) AS BIGINT) AS s2",
        "CAST(sum(q * q * q) AS BIGINT) AS s3",
        "CAST(sum(q * q * q * q) AS BIGINT) AS s4",
    )
    return s.selectExpr(*_JB_OUT)


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between the price distributions of two
# ship-date eras, on a 21-bucket fixed-width binning.  JSD is the
# symmetric, bounded ([0, ln 2]) companion to gate:psi_drift — the
# drift score dashboards prefer because it never divides by an empty
# reference bin.  Per-bin p·ln(p/m) terms are quantized to NANO units
# (21 exact BIGINTs), so bin-order and shuffle order cannot move the sum.

_JS_SPLIT = "TIMESTAMP '1998-07-01 00:00:00'"
_JS_BIN = "least(20, CAST(floor(l_extendedprice / 5000.0) AS BIGINT))"
_JS_P = "(CAST(cnt_r AS DOUBLE) / n_r)"
_JS_Q = "(CAST(cnt_c AS DOUBLE) / n_c)"
_JS_M = f"(({_JS_P} + {_JS_Q}) / 2.0)"
_JS_TP = (
    f"CASE WHEN cnt_r > 0 THEN CAST(floor({_JS_P} * ln({_JS_P} / {_JS_M})"
    " * 1000000000.0 + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
)
_JS_TQ = (
    f"CASE WHEN cnt_c > 0 THEN CAST(floor({_JS_Q} * ln({_JS_Q} / {_JS_M})"
    " * 1000000000.0 + 0.5) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
)


@gate(
    "js_divergence_drift",
    oracle=f"""
    WITH b AS (
      SELECT {_JS_BIN} AS bin,
             CASE WHEN l_shipdate < {_JS_SPLIT} THEN 1 ELSE 0 END AS is_r
      FROM lineitem
    ),
    per_bin AS (
      SELECT bin, CAST(sum(is_r) AS BIGINT) AS cnt_r,
             CAST(sum(1 - is_r) AS BIGINT) AS cnt_c
      FROM b GROUP BY bin
    ),
    tot AS (SELECT CAST(sum(cnt_r) AS BIGINT) AS n_r,
                   CAST(sum(cnt_c) AS BIGINT) AS n_c FROM per_bin),
    terms AS (
      SELECT {_JS_TP} AS tp_u, {_JS_TQ} AS tq_u
      FROM per_bin CROSS JOIN tot
    )
    SELECT CAST(round((sum(tp_u) + sum(tq_u)) / 2.0 / 1000000000.0, 6)
                AS DOUBLE) AS jsd,
           CAST((SELECT n_r FROM tot) AS BIGINT) AS n_ref,
           CAST((SELECT n_c FROM tot) AS BIGINT) AS n_cur,
           CAST(count(*) AS BIGINT) AS n_bins
    FROM terms
    """,
)
def q_js_divergence_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between pre- and post-1998H2 price
    distributions on a fixed 21-bucket grid — the symmetric, bounded
    drift score (cf. gate:psi_drift, which blows up on empty reference
    bins; JSD's mixture denominator never does).  ONE groupBy(bin) with
    conditional counts (no join between the two samples), a broadcast of
    the 1-row totals, and nano-quantized per-bin terms so the 21-term
    sum is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.selectExpr(
        f"{_JS_BIN} AS bin",
        f"CASE WHEN l_shipdate < {_JS_SPLIT} THEN 1 ELSE 0 END AS is_r",
    )
    per_bin = b.groupBy("bin").agg(
        F.sum("is_r").cast("long").alias("cnt_r"),
        F.sum(1 - F.col("is_r")).cast("long").alias("cnt_c"),
    )
    tot = per_bin.agg(
        F.sum("cnt_r").cast("long").alias("n_r"),
        F.sum("cnt_c").cast("long").alias("n_c"),
    )
    terms = per_bin.crossJoin(F.broadcast(tot)).selectExpr(
        f"{_JS_TP} AS tp_u", f"{_JS_TQ} AS tq_u", "n_r", "n_c"
    )
    return terms.agg(
        F.round(
            (F.sum("tp_u") + F.sum("tq_u")) / 2.0 / 1000000000.0, 6
        )
        .cast("double")
        .alias("jsd"),
        F.first("n_r").cast("long").alias("n_ref"),
        F.first("n_c").cast("long").alias("n_cur"),
        F.count("*").cast("long").alias("n_bins"),
    )
