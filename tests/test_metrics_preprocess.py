import math

from pyspark.sql import functions as F

from inferdb_spark.operators.metrics import (
    binary_classification_report,
    multiclass_report,
    rmsle,
)
from inferdb_spark.operators.preprocess import (
    fit_mean_imputer,
    fit_mode_imputer,
    fit_one_hot,
    fit_robust_scaler,
    impute_outliers_linear,
    outlier_bounds_iqr,
)


def test_binary_report_counts(spark):
    rows = [(1.0, 1), (0.9, 1), (0.2, 1), (0.8, 0), (0.1, 0), (0.3, 0)]
    df = spark.createDataFrame(rows, "prediction double, label int")
    r = binary_classification_report(df).first()
    assert (r.tp, r.fp, r.fn, r.tn) == (2, 1, 1, 2)
    assert abs(r.accuracy - 4 / 6) < 1e-12
    assert abs(r.precision - 2 / 3) < 1e-12
    assert abs(r.recall - 2 / 3) < 1e-12
    assert abs(r.f1 - 2 / 3) < 1e-12


def test_multiclass_macro(spark):
    rows = [(0, 0), (0, 0), (1, 0), (1, 1), (2, 2), (0, 2)]
    df = spark.createDataFrame(rows, "prediction int, label int")
    r = multiclass_report(df).first()
    assert abs(r.accuracy - 4 / 6) < 1e-12
    # sklearn macro precision for this case = mean(2/3, 1/2, 1) = 13/18
    assert abs(r.precision_macro - 13 / 18) < 1e-12


def test_rmsle(spark):
    rows = [(1.0, 2.0), (3.0, 3.0)]
    df = spark.createDataFrame(rows, "prediction double, label double")
    want = math.sqrt(((math.log(2.0) - math.log(3.0)) ** 2) / 2)
    assert abs(rmsle(df).first().rmsle - want) < 1e-12


def test_mean_imputer(spark):
    df = spark.createDataFrame([(1.0,), (3.0,), (None,)], "x double")
    m = fit_mean_imputer(df, ["x"])
    assert m.fill["x"] == 2.0
    got = sorted(r.x for r in m.transform(df).collect())
    assert got == [1.0, 2.0, 3.0]


def test_mode_imputer_tiebreak(spark):
    df = spark.createDataFrame([("b",), ("a",), ("b",), ("a",), (None,)], "c string")
    m = fit_mode_imputer(df, ["c"])
    assert m.fill["c"] == "a"  # tie -> lowest value


def test_robust_scaler(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    m = fit_robust_scaler(df, ["x"])
    out = m.transform(df).agg(F.min("x"), F.max("x")).first()
    assert out[0] < 0 < out[1]


def test_one_hot(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",)], "c string")
    m = fit_one_hot(df, ["c"])
    assert m.categories["c"] == ["a", "b"]
    out = m.transform(df).collect()
    assert [(r.c_oh_0, r.c_oh_1) for r in out] == [(1, 0), (0, 1), (1, 0)]


def test_outlier_impute(spark):
    df = spark.createDataFrame(
        [(5.0, 1.0), (6.0, 2.0), (1000.0, 3.0)], "x double, f double"
    )
    lo, hi = 0.0, 100.0
    out = impute_outliers_linear(df, "x", (lo, hi), intercept=1.0, coef={"f": 2.0})
    got = {r.f: r.x for r in out.collect()}
    assert got[1.0] == 5.0 and got[2.0] == 6.0
    assert got[3.0] == 1.0 + 2.0 * 3.0  # outlier replaced by linear model


def test_outlier_bounds(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    lo, hi = outlier_bounds_iqr(df, "x", k=1.5)
    assert lo < 0 and hi > 99
