"""Unit tests for operators/trees.py (transpiled tree scoring, MLlib
round-trip) and operators/linreg.py (normal-equations OLS)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from inferdb_spark.operators import linreg as LR
from inferdb_spark.operators import trees as T

TINY_TREE = {
    "feature": "x", "threshold": 5.0,
    "left": {"value": 1.0},
    "right": {
        "feature": "y", "threshold": 0.5,
        "left": {"value": 2.0}, "right": {"value": 3.0},
    },
}


def _eval_py(node, row):
    while "value" not in node:
        v = row[node["feature"]]
        node = node["left"] if v is None or v <= node["threshold"] else node["right"]
    return node["value"]


def test_tree_expression_matches_python_eval(spark):
    rows = [(float(i % 11), float((i * 7 % 10) / 10)) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = df.select("x", "y", T.tree_to_expression(TINY_TREE).alias("p")).collect()
    for r in got:
        assert r["p"] == _eval_py(TINY_TREE, {"x": r["x"], "y": r["y"]})


def test_tree_null_routes_left(spark):
    df = spark.createDataFrame([(None, 0.9)], "x double, y double")
    assert df.select(T.tree_to_expression(TINY_TREE).alias("p")).collect()[0]["p"] == 1.0


def test_tree_stats():
    assert T.tree_depth(TINY_TREE) == 2
    assert T.tree_n_leaves(TINY_TREE) == 3


def test_gbt_expression_sums_trees(spark):
    df = spark.createDataFrame([(2.0, 0.1), (8.0, 0.9)], "x double, y double")
    out = df.select(
        T.gbt_expression([TINY_TREE, TINY_TREE], [1.0, 0.5], base=0.25).alias("s")
    ).collect()
    assert out[0]["s"] == 0.25 + 1.5 * 1.0
    assert out[1]["s"] == 0.25 + 1.5 * 3.0


def test_from_mllib_roundtrip(spark):
    pytest.importorskip("pyspark.ml")
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import DecisionTreeRegressor

    rows = [
        (float(i % 13), float(i % 7), float((i % 13) * 2 + (i % 7) * 3))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "a double, b double, label double")
    feats = VectorAssembler(inputCols=["a", "b"], outputCol="fv")
    assembled = feats.transform(df)
    model = DecisionTreeRegressor(
        featuresCol="fv", labelCol="label", maxDepth=4, seed=7
    ).fit(assembled)
    tree = T.from_mllib(model, ["a", "b"])
    ours = {
        (r["a"], r["b"]): r["p"]
        for r in df.select(
            "a", "b", T.tree_to_expression(tree).alias("p")
        ).collect()
    }
    theirs = {
        (r["a"], r["b"]): r["prediction"]
        for r in model.transform(assembled).select("a", "b", "prediction").collect()
    }
    assert ours == theirs


def test_from_mllib_gbt_roundtrip(spark):
    pytest.importorskip("pyspark.ml")
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    rows = [
        (float(i % 13), float(i % 7), float((i % 13) * 2 - (i % 7)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "a double, b double, label double")
    assembled = VectorAssembler(inputCols=["a", "b"], outputCol="fv").transform(df)
    model = GBTRegressor(
        featuresCol="fv", labelCol="label", maxIter=3, maxDepth=3, seed=7
    ).fit(assembled)
    trees, weights = T.from_mllib_gbt(model, ["a", "b"])
    ours = df.select(
        "a", "b", T.gbt_expression(trees, weights).alias("p")
    ).collect()
    theirs = model.transform(assembled).select("a", "b", "prediction").collect()
    for o, t in zip(
        sorted(ours, key=lambda r: (r["a"], r["b"])),
        sorted(theirs, key=lambda r: (r["a"], r["b"])),
    ):
        assert o["p"] == pytest.approx(t["prediction"], abs=1e-9)


def test_linreg_normal_matches_numpy(spark):
    rng = np.random.default_rng(42)
    n = 500
    # data already on an integer 0.01 grid -> scaling is lossless
    x1 = np.round(rng.uniform(0, 50, n), 2)
    x2 = np.round(rng.uniform(0, 1, n), 2)
    y = np.round(3.0 * x1 - 7.0 * x2 + 2.5 + rng.normal(0, 0.5, n), 2)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y double",
    )
    coefs, intercept = LR.fit_linear_normal(df, ["x1", "x2"], "y", scale=100)
    X = np.column_stack([np.ones(n), x1, x2])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    assert intercept == pytest.approx(beta[0], abs=1e-6)
    assert coefs[0] == pytest.approx(beta[1], abs=1e-6)
    assert coefs[1] == pytest.approx(beta[2], abs=1e-6)
