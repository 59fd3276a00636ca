"""Round-7 gate queries, batch 3: model/data QUALITY diagnostics for
training pipelines — calibration error (ECE reliability diagram),
label-noise estimation (confident learning), and dataset cartography
(confidence/variability regions over the training trajectory).

These close the monitoring loop around the in-engine trainers: the
engine can fit a model (logreg_train_replay), calibrate it (isotonic
gates), and now AUDIT the labels and examples it was trained on — the
data-centric QA steps a large-scale curation pipeline runs before
committing a training mix.

Determinism engineering: probabilities live on the 1e-6 snap grid
(operators/logreg._snap_prob), so per-row micro-unit terms are exact
BIGINTs; class thresholds (confident learning) are compared in
cross-multiplied integer form p_u * n_c >= S_c — no rational ever
materializes; cartography's mean/std region cuts compare the exact
integer statistics conf_u and var_x against pre-cross-multiplied
literals (operators/logreg.cartography_thresholds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import gate
from inferdb_spark.operators import logreg as LG

# ---------------------------------------------------------------------------
# Expected calibration error + reliability diagram
# ---------------------------------------------------------------------------

# fixed scorer literals (shared verbatim with the oracle): a deliberately
# miscalibrated logistic over line features, so the diagram is non-trivial
_ECE_B0, _ECE_BQ, _ECE_BD = -1.2, 0.05, 8.0


@gate(
    "ece_reliability",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(floor((1.0 / (1.0 + exp(-(({_ECE_B0!r} + ({_ECE_BQ!r} * l_quantity))
                     + ({_ECE_BD!r} * l_discount))))) * 1000000.0 + 0.5)
               AS BIGINT) AS p_u,
             (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS y
      FROM lineitem
    ),
    binned AS (
      SELECT least(CAST(p_u // 100000 AS BIGINT), 9) AS bin,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(y) AS BIGINT) AS acc_sum,
             CAST(sum(CAST(p_u AS BIGINT)) AS BIGINT) AS conf_u
      FROM scored GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS n FROM binned)
    SELECT bin, n_b,
           round(CAST(conf_u AS DOUBLE) / (CAST(n_b AS DOUBLE) * 1000000.0), 6)
             AS mean_conf,
           round(CAST(acc_sum AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS mean_acc,
           round(CAST(sum(abs(acc_sum * 1000000 - conf_u)) OVER () AS DOUBLE)
                 / (1000000.0 * CAST(n AS DOUBLE)), 6) AS ece
    FROM binned, tot
    """,
)
def q_ece_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error for a fixed
    logistic scorer against the returnflag outcome: 10 equal-width
    probability bins, per-bin mean confidence vs empirical accuracy, and
    ECE = sum_b (n_b/n)*|acc_b - conf_b| — the calibration audit run
    before trusting model scores as mixing/filtering weights.

    Exactness: probabilities are snapped to integer micro-units, so the
    per-bin |acc*1e6 - conf_u| numerators are exact BIGINTs and ECE is
    one division at the end; the window runs over 10 bin rows.  Scale:
    one scan + one 10-row aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    margin = (
        F.lit(_ECE_B0)
        + (F.lit(_ECE_BQ) * F.col("l_quantity"))
    ) + (F.lit(_ECE_BD) * F.col("l_discount"))
    p_u = F.floor(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) * F.lit(1_000_000.0)
        + F.lit(0.5)
    )
    scored = li.select(
        p_u.alias("p_u"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    binned = scored.groupBy(
        F.least(F.expr("CAST(p_u div 100000 AS BIGINT)"), F.lit(9)).alias("bin")
    ).agg(
        F.count("*").cast("long").alias("n_b"),
        F.sum("y").cast("long").alias("acc_sum"),
        F.sum(F.col("p_u").cast("long")).cast("long").alias("conf_u"),
    )
    tot = binned.agg(F.sum("n_b").cast("long").alias("n"))
    w = Window.partitionBy()
    return binned.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_b",
        F.round(
            F.col("conf_u").cast("double")
            / (F.col("n_b").cast("double") * F.lit(1_000_000.0)),
            6,
        ).alias("mean_conf"),
        F.round(F.col("acc_sum").cast("double") / F.col("n_b").cast("double"), 6)
        .alias("mean_acc"),
        F.round(
            F.sum(F.abs(F.col("acc_sum") * 1_000_000 - F.col("conf_u")))
            .over(w)
            .cast("double")
            / (F.lit(1_000_000.0) * F.col("n").cast("double")),
            6,
        ).alias("ece"),
    )


# ---------------------------------------------------------------------------
# Confident-learning label-noise matrix (binary)
# ---------------------------------------------------------------------------

_CL_PRICE = 250_000.0  # noisy label: "expensive order"
_CL_B0, _CL_BP, _CL_BU = -2.0, 0.012, 0.6  # scorer literals


@gate(
    "confident_learning_binary",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(floor((1.0 / (1.0 + exp(-(({_CL_B0!r}
                + ({_CL_BP!r} * (o_totalprice / 1000.0)))
                + ({_CL_BU!r} * (CASE WHEN o_orderpriority = '1-URGENT'
                                 THEN 1.0 ELSE 0.0 END)))))) * 1000000.0 + 0.5)
             AS BIGINT) AS p_u,
             (CASE WHEN o_totalprice > {_CL_PRICE!r} THEN 1 ELSE 0 END) AS yt
      FROM orders
    ),
    th AS (
      SELECT CAST(sum(CASE WHEN yt = 1 THEN p_u ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(yt) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN yt = 0 THEN p_u ELSE 0 END) AS BIGINT) AS s0,
             CAST(count(*) - sum(yt) AS BIGINT) AS n0
      FROM scored
    ),
    assigned AS (
      SELECT yt,
             (CASE
                WHEN p_u * n1 >= s1 AND (1000000 - p_u) * n0 >= n0 * 1000000 - s0
                  THEN (CASE WHEN p_u > 500000 THEN 1 ELSE 0 END)
                WHEN p_u * n1 >= s1 THEN 1
                WHEN (1000000 - p_u) * n0 >= n0 * 1000000 - s0 THEN 0
                ELSE -1 END) AS yhat
      FROM scored, th
    )
    SELECT CAST(sum(CASE WHEN yt = 0 AND yhat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c00,
           CAST(sum(CASE WHEN yt = 0 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c01,
           CAST(sum(CASE WHEN yt = 1 AND yhat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c10,
           CAST(sum(CASE WHEN yt = 1 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c11,
           CAST(sum(CASE WHEN yhat = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_excluded,
           round(CAST(sum(CASE WHEN yhat >= 0 AND yt <> yhat THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / CAST(sum(CASE WHEN yhat >= 0 THEN 1 ELSE 0 END) AS DOUBLE), 6)
             AS est_noise_rate
    FROM assigned
    """,
)
def q_confident_learning_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning joint matrix (Northcutt et al., JAIR'21
    "cleanlab"): given noisy labels y~ (price threshold) and model
    scores, estimate the latent-true-label confusion C[y~][y*] using
    per-class confidence thresholds t_c = mean score of class c; rows
    whose score clears neither threshold are excluded, rows clearing
    both go to the higher-probability class.  The off-diagonal mass is
    the estimated label-noise rate — the audit that decides whether a
    weak labeler's output is trainable.

    Exactness: scores snap to the micro grid; every threshold compare is
    cross-multiplied (p_u*n_c >= S_c), so class assignment is pure BIGINT
    arithmetic — no rational mean, no float tie ambiguity (p=0.5 goes to
    class 0, the lowest-value tie rule).  Scale: two scans (threshold
    pass + assignment pass) and a broadcast 1-row join.
    """
    od = load_table(spark, sf_dir, "orders")
    margin = (
        F.lit(_CL_B0) + (F.lit(_CL_BP) * (F.col("o_totalprice") / F.lit(1000.0)))
    ) + (
        F.lit(_CL_BU)
        * F.when(F.col("o_orderpriority") == "1-URGENT", 1.0).otherwise(0.0)
    )
    p_u = F.floor(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    scored = od.select(
        p_u.alias("p_u"),
        F.when(F.col("o_totalprice") > _CL_PRICE, 1).otherwise(0).alias("yt"),
    )
    scored.cache()
    th = scored.agg(
        F.sum(F.when(F.col("yt") == 1, F.col("p_u")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum("yt").cast("long").alias("n1"),
        F.sum(F.when(F.col("yt") == 0, F.col("p_u")).otherwise(0))
        .cast("long")
        .alias("s0"),
        (F.count("*") - F.sum("yt")).cast("long").alias("n0"),
    )
    j = scored.crossJoin(F.broadcast(th))
    q1 = F.col("p_u") * F.col("n1") >= F.col("s1")
    q0 = (F.lit(1_000_000) - F.col("p_u")) * F.col("n0") >= F.col("n0") * F.lit(
        1_000_000
    ) - F.col("s0")
    yhat = (
        F.when(q1 & q0, F.when(F.col("p_u") > 500_000, 1).otherwise(0))
        .when(q1, F.lit(1))
        .when(q0, F.lit(0))
        .otherwise(F.lit(-1))
    )
    assigned = j.select("yt", yhat.alias("yhat"))
    cnt = (
        lambda yt, yh: F.sum(
            F.when((F.col("yt") == yt) & (F.col("yhat") == yh), 1).otherwise(0)
        )
        .cast("long")
    )
    counted = F.sum(F.when(F.col("yhat") >= 0, 1).otherwise(0))
    wrong = F.sum(
        F.when((F.col("yhat") >= 0) & (F.col("yt") != F.col("yhat")), 1).otherwise(0)
    )
    return assigned.agg(
        cnt(0, 0).alias("c00"),
        cnt(0, 1).alias("c01"),
        cnt(1, 0).alias("c10"),
        cnt(1, 1).alias("c11"),
        F.sum(F.when(F.col("yhat") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_excluded"),
        F.round(wrong.cast("double") / counted.cast("double"), 6).alias(
            "est_noise_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Dataset cartography over the logreg training trajectory
# ---------------------------------------------------------------------------

_CARTO_FEATS = ["qn", "l_discount", "l_tax"]
_CARTO_FEAT_SQLS = [
    "l_quantity * CAST(0.02 AS DOUBLE)",
    "l_discount",
    "l_tax",
]
_CARTO_STEPS = 8
_CARTO_WHERE = "l_orderkey % 4 = 0"


@gate(
    "training_cartography",
    oracle=LG.cartography_sql(
        _CARTO_FEAT_SQLS,
        label_sql="CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END",
        row_id_sql="l_orderkey * 10 + l_linenumber",
        n_steps=_CARTO_STEPS,
        where=_CARTO_WHERE,
    ),
)
def q_training_cartography(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset cartography (Swayamdipta et al., EMNLP'20): per training
    example, CONFIDENCE (mean true-class probability across the 8 logreg
    GD steps) and VARIABILITY (its std) locate the example in the
    easy / hard / ambiguous map used to curate training mixes (drop
    hard-mislabeled, upweight ambiguous).  The trajectory comes from
    operators/logreg.fit_logreg_gd_history — the SAME per-step exact
    BIGINT gradient aggregation as logreg_train_replay — and the oracle
    replays the whole fit as a MATERIALIZED CTE chain, then recomputes
    every step's snapped probability.

    Exactness: probabilities are 1e-6-snapped, so conf_u = sum_k ptu_k
    and var_x = K*sum(ptu^2) - (sum ptu)^2 are exact BIGINTs; region
    cuts compare those integers against pre-cross-multiplied literals
    (mean 0.75/0.25, std 0.15 — cartography_thresholds).  Scale: K
    aggregate passes to fit (driver rows independent of data) + one
    scoring scan; no window, no join beyond one broadcast of the step
    coefficients.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.expr(_CARTO_WHERE))
        .withColumn("qn", F.col("l_quantity") * F.lit(0.02))
        .withColumn("y", F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0))
    )
    li.cache()
    history = LG.fit_logreg_gd_history(
        li, _CARTO_FEATS, "y", n_steps=_CARTO_STEPS
    )
    y = F.col("y")
    sum_pt = None
    sum_pt2 = None
    for model in history:
        pu = F.round(model.probability() * F.lit(float(LG.GRID))).cast("long")
        ptu = F.when(y == 1.0, pu).otherwise(F.lit(LG.GRID) - pu)
        sum_pt = ptu if sum_pt is None else sum_pt + ptu
        sum_pt2 = ptu * ptu if sum_pt2 is None else sum_pt2 + ptu * ptu
    conf_u = sum_pt.cast("long")
    var_x = (F.lit(_CARTO_STEPS) * sum_pt2 - sum_pt * sum_pt).cast("long")
    easy, hard, ambig = LG.cartography_thresholds(_CARTO_STEPS)
    out = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("row_id"),
        y.cast("long").alias("label"),
        conf_u.alias("conf_u"),
        var_x.alias("var_x"),
    ).select(
        "*",
        F.when(F.col("var_x") >= ambig, "ambiguous")
        .when(F.col("conf_u") >= easy, "easy")
        .when(F.col("conf_u") <= hard, "hard")
        .otherwise("mid")
        .alias("region"),
    )
    return out
