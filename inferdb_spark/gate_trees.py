"""Gate queries: tree-model scoring transpiled to CASE WHEN expressions and
in-database OLS training via exact normal equations (the reference's MADlib
tree/linregr and XGBoost-in-PG paths, src/transpiler.py:2338-2753).

Shared-literal rule: ONE Python tree structure / column list generates both
the Spark Column tree and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import gate
from inferdb_spark.operators import cluster as CL
from inferdb_spark.operators import linreg as LR
from inferdb_spark.operators import logreg as LG
from inferdb_spark.operators import gbt_train as GT
from inferdb_spark.operators import trees as T

# dyadic thresholds and leaf values: comparisons and leaves are exact in
# both engines, so the tree gate needs no rounding at all.
TREE_1 = {
    "feature": "l_quantity", "threshold": 24.0,
    "left": {
        "feature": "l_discount", "threshold": 0.04,
        "left": {"value": 1.25}, "right": {"value": -0.5},
    },
    "right": {
        "feature": "l_tax", "threshold": 0.03,
        "left": {"value": 0.75}, "right": {"value": 2.5},
    },
}
TREE_2 = {
    "feature": "l_discount", "threshold": 0.06,
    "left": {"value": -0.25},
    "right": {
        "feature": "l_quantity", "threshold": 40.0,
        "left": {"value": 0.5}, "right": {"value": -1.5},
    },
}
TREE_3 = {
    "feature": "l_tax", "threshold": 0.05,
    "left": {
        "feature": "l_quantity", "threshold": 12.0,
        "left": {"value": 2.0}, "right": {"value": -0.125},
    },
    "right": {"value": 0.0625},
}
GBT_TREES = [TREE_1, TREE_2, TREE_3]
GBT_WEIGHTS = [1.0, 0.5, 0.25]
GBT_BASE = -0.5

LINREG_FEATURES = ["l_quantity", "l_discount", "l_tax"]


@gate(
    "tree_score",
    oracle=f"""
    SELECT l_orderkey*10 + l_linenumber AS row_id,
           CAST({T.tree_to_sql(TREE_1)} AS DOUBLE) AS prediction
    FROM lineitem
    """,
)
def q_tree_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A fitted decision tree burned into the plan as one nested CASE WHEN
    projection (operators/trees.tree_to_expression): zero join, zero UDF,
    whole-stage codegen'd — the transpiled analog of madlib.tree_predict."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("row_id"),
        T.tree_to_expression(TREE_1).cast("double").alias("prediction"),
    )


@gate(
    "gbt_score_sigmoid",
    oracle=f"""
    SELECT l_orderkey*10 + l_linenumber AS row_id,
           CAST(round({T.gbt_sql(GBT_TREES, GBT_WEIGHTS, GBT_BASE, link="sigmoid")}, 6) AS DOUBLE) AS prob
    FROM lineitem
    """,
)
def q_gbt_score_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GBT ensemble scoring: base + Σ wᵢ·treeᵢ(x) through a sigmoid link,
    still ONE flat projection (operators/trees.gbt_expression) — the
    XGBoost-in-PG analog (src/transpiler.py:2500-2753).  Transcendental
    output rounded to 6dp on both sides per the repo rule."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("row_id"),
        F.round(
            T.gbt_expression(GBT_TREES, GBT_WEIGHTS, GBT_BASE, link="sigmoid"), 6
        ).cast("double").alias("prob"),
    )


@gate(
    "linreg_gram",
    oracle=LR.gram_relation_sql("lineitem", LINREG_FEATURES, "l_extendedprice", 100),
)
def q_linreg_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS sufficient statistics (XᵀX, Xᵀy) as ONE exact-integer aggregation
    over the training scan (operators/linreg.gram_relation) — the
    distributed half of madlib.linregr_train.  The p×p solve is driver-side
    (pytest vs numpy); this gate pins the distributed statistics
    bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    return LR.gram_relation(li, LINREG_FEATURES, "l_extendedprice", 100)


# --- KMeans Lloyd step + exact covariance moments -------------------------

# integer-scaled feature space: (round(l_quantity*100), round(l_discount*1e4))
KM_CENTERS = [[1000, 200], [3000, 500], [5000, 800]]

_km_feat_sql = [
    "CAST(round(l_quantity*100) AS BIGINT)",
    "CAST(round(l_discount*10000) AS BIGINT)",
]
_km_d = [
    " + ".join(
        f"({fs} - {c[i]}) * ({fs} - {c[i]})" for i, fs in enumerate(_km_feat_sql)
    )
    for c in KM_CENTERS
]


@gate(
    "kmeans_lloyd_step",
    oracle=f"""
    WITH assigned AS (
      SELECT CASE WHEN ({_km_d[0]}) <= ({_km_d[1]}) AND ({_km_d[0]}) <= ({_km_d[2]}) THEN 0
                  WHEN ({_km_d[1]}) <= ({_km_d[2]}) THEN 1 ELSE 2 END AS cluster,
             {_km_feat_sql[0]} AS f0, {_km_feat_sql[1]} AS f1
      FROM lineitem
    )
    SELECT CAST(cluster AS INT) AS cluster, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(f0) AS BIGINT) AS sum_0, CAST(sum(f1) AS BIGINT) AS sum_1
    FROM assigned GROUP BY cluster
    """,
)
def q_kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration's sufficient statistics (operators/cluster.
    lloyd_update): argmin assignment is a centers-as-literals projection
    (zero join), the update one k-row exact-integer aggregate — the
    distributed-KMeans-training unit (madlib kmeans analog).  Lowest-id
    tie-break pinned in both dialects."""
    li = load_table(spark, sf_dir, "lineitem")
    feat = li.select(
        F.round(F.col("l_quantity") * 100).cast("long").alias("fq"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("fd"),
    )
    out = CL.lloyd_update(feat, ["fq", "fd"], KM_CENTERS)
    return out.select(
        F.col("cluster").cast("int").alias("cluster"), "n", "sum_0", "sum_1"
    )


PCA_COLS = ["l_quantity", "l_discount", "l_tax"]


@gate(
    "covariance_moments",
    oracle=LR.moments_relation_sql("lineitem", PCA_COLS, 100),
)
def q_covariance_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance/PCA sufficient statistics in one exact-integer aggregate
    (operators/linreg.moments_relation) — the distributed half of
    fit_pca_exact; eigendecomposition is driver-side (pytest vs numpy)."""
    li = load_table(spark, sf_dir, "lineitem")
    return LR.moments_relation(li, PCA_COLS, 100)


# ---------------------------------------------------------------------------
# native histogram-GBT training (operators/gbt_train.py) — the in-database
# boosted-tree TRAINER the reference gets from XGBoost-in-PG
# (src/transpiler.py:2500-2753)

GBT_FEATS = ["l_quantity", "l_discount", "l_tax"]
# fixed dyadic-ish edges: exact in both engines, so the histogram gate
# needs no quantile agreement between Spark and DuckDB
GBT_EDGES = {
    "l_quantity": [10.0, 20.0, 30.0, 40.0],
    "l_discount": [0.02, 0.04, 0.06, 0.08],
    "l_tax": [0.02, 0.04, 0.06],
}
GBT_BASE_SCORE = 500.0


@gate(
    "gbt_grad_histogram",
    oracle=GT.gradient_histogram_sql(
        GBT_FEATS, "l_extendedprice", GBT_EDGES, GBT_BASE_SCORE
    ),
)
def q_gbt_grad_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One tree level of distributed GBT training: per-(feature, bin)
    integer-quantized gradient/hessian sums (operators/gbt_train.
    gradient_histogram).  This IS the aggregation fit_hist_gbt ships
    through the shuffle each level — features x bins output rows whatever
    the input size, map-side combined, bit-deterministic (BIGINT sums).
    The XGBoost `hist` inner loop as a relation."""
    li = load_table(spark, sf_dir, "lineitem")
    return GT.gradient_histogram(
        li, GBT_FEATS, "l_extendedprice", GBT_EDGES, GBT_BASE_SCORE
    ).select(
        "feature",
        F.col("bin").cast("int").alias("bin"),
        F.col("grad_sum_q").cast("long").alias("grad_sum_q"),
        F.col("hess_sum_q").cast("long").alias("hess_sum_q"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


@gate(
    "gbt_train_predict",
    # the WHOLE training loop replayed in DuckDB: 3 trees x depth 2 of
    # histogram -> prefix-sum -> gain-argmax -> route CTE stages generated
    # from the same edge literals; integer micro-unit sums + identical
    # IEEE parenthesization make trees and predictions bit-equal
    oracle=GT.fit_predict_hist_gbt_sql(
        GBT_FEATS,
        "l_extendedprice",
        GBT_EDGES,
        row_id_sql="l_orderkey * 10 + l_linenumber",
        n_trees=3,
        max_depth=2,
        base_score=GBT_BASE_SCORE,
        learning_rate=0.5,
    ),
)
def q_gbt_train_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end native GBT training (operators/gbt_train.fit_hist_gbt):
    3 rounds x depth 2 on lineitem, then the fitted ensemble burned into
    a CASE WHEN projection (operators/trees.gbt_expression) — train AND
    score without a row ever leaving the cluster.  The oracle
    (fit_predict_hist_gbt_sql) unrolls the identical training into a
    DuckDB CTE chain, so the driver hash checks the TRAINER, not just the
    scorer."""
    li = load_table(spark, sf_dir, "lineitem")
    model = GT.fit_hist_gbt(
        li,
        GBT_FEATS,
        "l_extendedprice",
        objective="squared",
        n_trees=3,
        max_depth=2,
        edges=GBT_EDGES,
        base_score=GBT_BASE_SCORE,
        learning_rate=0.5,
        track_loss=False,
    )
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("row_id"),
        F.round(model.expression(), 6).cast("double").alias("prediction"),
    )


@gate(
    "gbt_train_logistic",
    oracle=GT.fit_predict_hist_gbt_sql(
        GBT_FEATS,
        "y",
        GBT_EDGES,
        row_id_sql="l_orderkey * 10 + l_linenumber",
        n_trees=3,
        max_depth=2,
        base_score=0.0,
        learning_rate=0.5,
        objective="logistic",
        label_sql="CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END",
    ),
)
def q_gbt_train_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native hist-GBT training, LOGISTIC objective (operators/gbt_train.
    fit_hist_gbt): binary target returnflag='R', 3 trees x depth 2, then
    sigmoid-linked ensemble scoring.  The oracle replays the full
    training loop in DuckDB with the identical p=1/(1+exp(-m)) gradient
    formula — integer micro-unit histograms keep the replay hash-stable
    through the transcendental."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "y", F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)
    )
    model = GT.fit_hist_gbt(
        li,
        GBT_FEATS,
        "y",
        objective="logistic",
        n_trees=3,
        max_depth=2,
        edges=GBT_EDGES,
        base_score=0.0,
        learning_rate=0.5,
        track_loss=False,
    )
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("row_id"),
        F.round(model.expression(), 6).cast("double").alias("prediction"),
    )


# ---------------------------------------------------------------------------
# native logistic-regression training replay (round-4 verdict item 2): the
# last asymmetry in the in-engine trainer family — LR was previously fit
# only through the MLlib bridge while OLS/GBT/kmeans/tokenizers all replay
# their full fit in DuckDB.  Reference anchor: PGML logistic train
# (src/transpiler.py:2032-2101) and madlib.logregr_train (:2382-2466).

LOGREG_FEATS = ["qn", "l_discount", "l_tax"]  # qn = l_quantity*0.02 ~ [0,1]
LOGREG_FEAT_SQLS = [
    "l_quantity * CAST(0.02 AS DOUBLE)",
    "l_discount",
    "l_tax",
]
LOGREG_STEPS = 8
LOGREG_LR = 1.0
LOGREG_SCALE = 10_000


@gate(
    "logreg_train_replay",
    oracle=LG.fit_predict_logreg_sql(
        LOGREG_FEAT_SQLS,
        label_sql="CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END",
        row_id_sql="l_orderkey * 10 + l_linenumber",
        n_steps=LOGREG_STEPS,
        learning_rate=LOGREG_LR,
        scale=LOGREG_SCALE,
    ),
)
def q_logreg_train_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native logistic-regression TRAINING (operators/logreg.fit_logreg_gd):
    8 fixed-step full-batch gradient-descent rounds on returnflag='R', one
    exact BIGINT aggregation per step (p+2 sums to the driver), then every
    row scored with the fitted coefficients.  The oracle replays the entire
    fit as a DuckDB CTE chain — quantize → (gradient → update) × 8 → score —
    from the same literals, so the driver hash checks the TRAINER itself
    (the gbt_train_predict standard applied to LR)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("qn", F.col("l_quantity") * F.lit(0.02))
        .withColumn(
            "y", F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)
        )
    )
    model = LG.fit_logreg_gd(
        li,
        LOGREG_FEATS,
        "y",
        n_steps=LOGREG_STEPS,
        learning_rate=LOGREG_LR,
        scale=LOGREG_SCALE,
    )
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("row_id"),
        model.probability().cast("double").alias("prob"),
        model.prediction().cast("long").alias("pred"),
    )
