"""Categorical Naive Bayes trained and scored entirely in relational algebra.

The reference's in-database training story (PGML `pgml.train`, MADlib
`madlib.create_nb_prepared_data_tables` — invoked from
src/transpiler.py:2032-2101 and the MADlib zoo at 2382-2753) keeps both
fit and predict inside the database.  mllib_bridge covers the estimator
route; this module is the *transpiled* route: the fitted model IS a pair of
small relations (class priors, per-(feature,value,class) log-likelihoods),
and scoring is a melt + broadcast join + integer sum — no ML runtime in
the scoring path at all.

Determinism contract (cross-engine oracle-safe):
- all probabilities are ratios of BIGINT counts with Laplace smoothing;
- log-likelihoods are stored as integer micro-nats
  `CAST(round(ln(p)*1e6) AS BIGINT)` (the repo-wide rule for
  transcendental outputs);
- argmax tie-break: highest score, then lowest label value.

Scale: the model relations are O(Σ_f |domain(f)| · |classes|) — tiny —
so scoring a 100 TB test relation is one broadcast join per melt + a
groupBy(row) whose width is bounded by n_features · n_classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _micro_ln(x) -> F.Column:
    return F.round(F.log(x) * MICRO).cast("long")


def melt_features(df: DataFrame, key_cols: list[str], feature_cols: list[str]) -> DataFrame:
    """Wide → long (key..., f, v): one stack expression, no shuffle."""
    pairs = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in feature_cols)
    return df.select(
        *key_cols, F.expr(f"stack({len(feature_cols)}, {pairs}) AS (f, v)")
    )


def fit_nb(
    train: DataFrame, feature_cols: list[str], label_col: str, alpha: float = 1.0
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fit: (priors, conditionals, defaults) as DataFrames.

    priors:        (y, lp)            lp = round(ln(n_y / n) * 1e6)
    conditionals:  (f, v, y, ll)      ll = round(ln((n_fvy + α)/(n_y + α·|V_f|)) * 1e6)
    defaults:      (f, y, ll)         unseen value → ll = round(ln(α/(n_y + α·|V_f|)) * 1e6)

    Three aggregates over one melt of the training relation; every output
    is small enough to broadcast.
    """
    y = F.col(label_col).alias("y")
    classes = train.groupBy(y).agg(F.count("*").alias("n_y"))
    total = train.agg(F.count("*").alias("n"))
    priors = classes.crossJoin(F.broadcast(total)).select(
        "y", _micro_ln(F.col("n_y") / F.col("n")).alias("lp")
    )

    m = melt_features(train, [label_col], feature_cols).withColumnRenamed(label_col, "y_raw")
    m = m.select(F.col("y_raw").alias("y"), "f", "v")
    vdom = m.groupBy("f").agg(F.countDistinct("v").alias("vn"))
    fvy = m.groupBy("f", "v", "y").agg(F.count("*").alias("n_fvy"))
    cond = (
        fvy.join(F.broadcast(classes), "y")
        .join(F.broadcast(vdom), "f")
        .select(
            "f", "v", "y",
            _micro_ln(
                (F.col("n_fvy") + F.lit(alpha))
                / (F.col("n_y") + F.lit(alpha) * F.col("vn"))
            ).alias("ll"),
        )
    )
    defaults = vdom.crossJoin(classes).select(
        "f", "y",
        _micro_ln(
            F.lit(alpha) / (F.col("n_y") + F.lit(alpha) * F.col("vn"))
        ).alias("ll"),
    )
    return priors, cond, defaults


def score_nb(
    test: DataFrame,
    key_col: str,
    feature_cols: list[str],
    priors: DataFrame,
    cond: DataFrame,
    defaults: DataFrame,
) -> DataFrame:
    """Score: melt test rows, broadcast-join the model relations, sum
    integer micro-nats per (row, class), argmax with lowest-label
    tie-break.  Returns (key, predicted, score)."""
    tm = melt_features(test, [key_col], feature_cols)
    classes = priors.select("y")
    cand = tm.crossJoin(F.broadcast(classes))
    joined = (
        cand.join(F.broadcast(cond).withColumnRenamed("ll", "_ll_hit"), ["f", "v", "y"], "left")
        .join(F.broadcast(defaults).withColumnRenamed("ll", "_ll_def"), ["f", "y"])
        .select(
            key_col, "y",
            F.coalesce("_ll_hit", "_ll_def").alias("ll"),
        )
    )
    per_class = joined.groupBy(key_col, "y").agg(F.sum("ll").alias("fsum"))
    total = per_class.join(F.broadcast(priors), "y").select(
        key_col, "y", (F.col("fsum") + F.col("lp")).alias("score")
    )
    best = total.groupBy(key_col).agg(
        F.min(
            F.struct((-F.col("score")).alias("_neg"), F.col("y").alias("_y"),
                     F.col("score").alias("_s"))
        ).alias("_w")
    )
    return best.select(
        key_col,
        F.col("_w._y").alias("predicted"),
        F.col("_w._s").alias("score"),
    )


def fit_score_nb(
    train: DataFrame,
    test: DataFrame,
    key_col: str,
    feature_cols: list[str],
    label_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    priors, cond, defaults = fit_nb(train, feature_cols, label_col, alpha)
    return score_nb(test, key_col, feature_cols, priors, cond, defaults)
