"""Evaluation metrics as single-pass aggregations.

The reference computes accuracy/precision/recall/F1 (macro for multi-class)
and RMSLE both in Python (sklearn) and in generated SQL
(src/transpiler.py:241-377; sql_scripts/clf_acc.sql, lr_reg_test.sql:17-21).
Here each metric is ONE aggregation over the joined (prediction, truth)
frame — a map-side-combinable plan that scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inferdb_spark.functions.math_fns import ln1p_compat, safe_div


def _bounded_score(df: DataFrame, score_col: str):
    """Score expression for the threshold-curve metrics (AUC/AP/Youden),
    whose ONE unpartitioned cumulative window runs over the DISTINCT-score
    relation.  That design is safe only while the score domain is bounded:
    a continuous 100x-scale score column would otherwise serialize the
    full row count through a single partition.  Doubles are therefore
    quantized to the engine's 6dp rounding discipline BEFORE the groupBy —
    for probability-like scores that caps the domain at ~2e6 distinct
    values regardless of row count (wider real-line scores should be
    pre-binned by the caller; plan_audit asserts the gate plans keep the
    aggregate-before-window shape).  Integer/decimal scores pass through
    untouched, so existing integer-cent gate hashes are unchanged."""
    from pyspark.sql.types import DoubleType, FloatType

    col = F.col(score_col)
    if isinstance(df.schema[score_col].dataType, (DoubleType, FloatType)):
        return F.round(col, 6)
    return col


def binary_classification_report(
    scored: DataFrame, prediction: str = "prediction", label: str = "label"
) -> DataFrame:
    """tp/fp/fn/tn + acc/precision/recall/f1 in one pass
    (src/transpiler.py:253-273: SUM(CASE WHEN round(p)=t ...))."""
    p = F.round(F.col(prediction)).cast("int")
    t = F.col(label).cast("int")
    agg = scored.agg(
        F.sum(F.when((p == 1) & (t == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((p == 1) & (t == 0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((p == 0) & (t == 1), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((p == 0) & (t == 0), 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    precision = safe_div(tp, tp + fp)
    recall = safe_div(tp, tp + fn)
    return agg.select(
        tp, fp, fn, tn,
        ((tp + tn) / (tp + fp + fn + tn)).alias("accuracy"),
        precision.alias("precision"),
        recall.alias("recall"),
        safe_div(F.lit(2) * precision * recall, precision + recall).alias("f1"),
    )


def multiclass_report(
    scored: DataFrame, prediction: str = "prediction", label: str = "label"
) -> DataFrame:
    """Macro-averaged precision/recall/F1 + accuracy, one-vs-rest per class
    (src/transpiler.py:276-344's per-label CTE loop → one groupBy here)."""
    p = F.col(prediction).cast("long")
    t = F.col(label).cast("long")
    # per-class counts from three small groupBys, joined on class id
    pred_counts = scored.groupBy(p.alias("cls")).agg(F.count("*").alias("pred_n"))
    true_counts = scored.groupBy(t.alias("cls")).agg(F.count("*").alias("true_n"))
    hit_counts = (
        scored.filter(p == t).groupBy(p.alias("cls")).agg(F.count("*").alias("tp"))
    )
    per = (
        true_counts.join(pred_counts, "cls", "full")
        .join(hit_counts, "cls", "left")
        .na.fill(0, ["pred_n", "true_n", "tp"])
        .select(
            "cls",
            safe_div(F.col("tp"), F.col("pred_n")).alias("precision"),
            safe_div(F.col("tp"), F.col("true_n")).alias("recall"),
        )
        .withColumn(
            "f1",
            safe_div(
                F.lit(2) * F.col("precision") * F.col("recall"),
                F.col("precision") + F.col("recall"),
            ),
        )
    )
    total = scored.agg(
        (F.sum(F.when(p == t, 1).otherwise(0)) / F.count("*")).alias("accuracy")
    )
    macro = per.agg(
        F.avg("precision").alias("precision_macro"),
        F.avg("recall").alias("recall_macro"),
        F.avg("f1").alias("f1_macro"),
    )
    return total.crossJoin(macro)


def rmsle(
    scored: DataFrame, prediction: str = "prediction", label: str = "label"
) -> DataFrame:
    """sqrt(mean((ln(p+1)-ln(t+1))^2)) — sql_scripts/lr_reg_test.sql:17-20.
    Uses literal ln(1+x) (not log1p) to match the SQL spec bit-for-bit."""
    d = ln1p_compat(F.col(prediction)) - ln1p_compat(F.col(label))
    return scored.agg(F.sqrt(F.sum(d * d) / F.count("*")).alias("rmsle"))


def binary_auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank-sum with average ranks for
    ties — one row (auc, n_pos, n_neg).

    Fully integer until the final division: scores are grouped, ranks
    expressed in half-units (2*avg_rank = 2*cum - cnt + 1, a BIGINT), so
    the aggregation is order-independent and bit-exact across engines at
    any scale (no float accumulation).  The global cumulative window runs
    over the DISTINCT-score relation (post-aggregation, small); the scan
    and per-score counting are two-phase distributed.  Extends the
    reference's metric set (acc/f1/rmsle — src/transpiler.py:241-377)
    with the ranking metric its benchmarks lack."""
    from pyspark.sql import Window

    g = df.groupBy(_bounded_score(df, score_col).alias("s")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    ranked = g.withColumn("cum", F.sum("cnt").over(w))
    agg = ranked.agg(
        F.sum(F.col("pos") * (2 * F.col("cum") - F.col("cnt") + 1)).alias("rank_sum2"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n_neg"),
    )
    # single-class input (n_pos or n_neg = 0): AUC is undefined — NULL,
    # not an ANSI DIVIDE_BY_ZERO (the log-rank degenerate-input class)
    return agg.select(
        F.when(
            F.col("n_pos") * F.col("n_neg") > 0,
            F.round(
                (F.col("rank_sum2") / 2.0 - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
                / (F.col("n_pos") * F.col("n_neg")),
                6,
            ),
        ).cast("double").alias("auc"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
    )


def average_precision(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Average precision (area under the precision-recall curve, step
    interpolation at unique thresholds — the sklearn definition) as one
    row (ap, n_pos, n_neg).

    Same two-phase shape as :func:`binary_auc`: rows are first grouped by
    score (distributed, map-side combinable), then ONE cumulative window
    runs over the DISTINCT-score relation descending — bounded by score
    cardinality, never by row count.  Precision at each threshold is
    quantized to integer micro-units before the weighted sum, so the
    final aggregation is a BIGINT sum (order-independent, bit-exact
    across engines); the only float steps are one division per distinct
    score and the final normalization.  Complements the reference's
    accuracy/F1 set (src/transpiler.py:241-377) with the PR-curve metric
    used to evaluate retrieval/filtering stages of a curation pipeline.
    """
    from pyspark.sql import Window

    g = df.groupBy(_bounded_score(df, score_col).alias("s")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos"),
    )
    w = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    ranked = g.select(
        "pos",
        "cnt",
        F.sum("cnt").over(w).alias("cum_cnt"),
        F.sum("pos").over(w).alias("cum_pos"),
    )
    prec_u = F.round(
        F.col("cum_pos").cast("double") / F.col("cum_cnt") * 1000000
    ).cast("long")
    agg = ranked.agg(
        F.sum(F.col("pos") * prec_u).alias("wsum_u"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n_neg"),
    )
    # zero positives: AP is undefined — NULL, not a DIVIDE_BY_ZERO
    return agg.select(
        F.when(
            F.col("n_pos") > 0,
            F.round(F.col("wsum_u").cast("double") / 1000000.0 / F.col("n_pos"), 6),
        )
        .cast("double")
        .alias("ap"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
    )


def youden_threshold(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Optimal decision threshold by Youden's J (max TPR − FPR over all
    unique score thresholds; ties break to the LOWEST threshold) — one
    row (thr, j, tpr, fpr, n_pos, n_neg).

    The argmax runs on the margin in INTEGER form, m = cum_pos·N −
    cum_neg·P (exact BIGINTs — no float comparison can flip the winner),
    over the grouped distinct-score relation; the chosen row is fetched
    back with a 1-row broadcast join.  Products stay under 2^63 while
    rows·scores < ~3·10^9; beyond that, pre-scale counts to per-million
    rates (noted rather than hidden — the gate scale never approaches
    it).  This is the threshold-selection step a scoring pipeline runs
    after :func:`binary_auc` says the ranking is good.
    """
    from pyspark.sql import Window

    g = df.groupBy(_bounded_score(df, score_col).alias("s")).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos"),
    )
    w = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    ranked = g.select(
        "s",
        F.sum("pos").over(w).alias("cum_pos"),
        F.sum(F.col("cnt") - F.col("pos")).over(w).alias("cum_neg"),
    )
    tot = g.agg(
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n_neg"),
    )
    rt = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "m", F.col("cum_pos") * F.col("n_neg") - F.col("cum_neg") * F.col("n_pos")
    )
    best = rt.agg(F.max("m").alias("best_m"))
    thr = (
        rt.crossJoin(F.broadcast(best))
        .filter(F.col("m") == F.col("best_m"))
        .agg(F.min("s").alias("thr"))
    )
    return (
        rt.join(F.broadcast(thr), F.col("s") == F.col("thr"))
        .select(
            F.col("thr").cast("long").alias("thr"),
            # single-class input: J/TPR/FPR undefined — NULL, not a
            # DIVIDE_BY_ZERO (same degenerate-input guard as binary_auc)
            F.when(
                F.col("n_pos") * F.col("n_neg") > 0,
                F.round(
                    F.col("m").cast("double") / (F.col("n_pos") * F.col("n_neg")), 6
                ),
            )
            .cast("double")
            .alias("j"),
            F.when(
                F.col("n_pos") > 0,
                F.round(F.col("cum_pos").cast("double") / F.col("n_pos"), 6),
            )
            .cast("double")
            .alias("tpr"),
            F.when(
                F.col("n_neg") > 0,
                F.round(F.col("cum_neg").cast("double") / F.col("n_neg"), 6),
            )
            .cast("double")
            .alias("fpr"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
        )
    )
