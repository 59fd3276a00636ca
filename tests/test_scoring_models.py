import math

import numpy as np
from pyspark.sql import functions as F

from inferdb_spark.operators.scoring import (
    score_linear_coo,
    score_linear_dense,
    score_mlp_pandas,
    score_mlp_relational,
    score_multiclass_linear,
    sparsify_coo,
)


def _data(spark, n=50):
    rows = [(i, float(i % 7), float((i * 3) % 5), float(i % 2)) for i in range(n)]
    return spark.createDataFrame(rows, "row_id long, f0 double, f1 double, f2 double")


COEF = [0.5, -1.25, 2.0]
B = 0.75


def test_dense_vs_coo_linear_agree(spark):
    df = _data(spark)
    dense = {
        r.row_id: r.prediction
        for r in score_linear_dense(df, ["f0", "f1", "f2"], COEF, B).collect()
    }
    coo = sparsify_coo(df, ["f0", "f1", "f2"])
    coef_df = spark.createDataFrame(list(enumerate(COEF)), "col_id int, coef double")
    sparse = {
        r.row_id: r.prediction for r in score_linear_coo(coo, coef_df, B).collect()
    }
    # rows with all-zero features drop from COO — compare the common support
    assert sparse, "coo produced no rows"
    for rid, v in sparse.items():
        assert abs(dense[rid] - v) < 1e-12


def test_dense_sigmoid_link(spark):
    df = _data(spark, 10)
    out = score_linear_dense(df, ["f0", "f1", "f2"], COEF, B, link="sigmoid").collect()
    for r in out:
        z = 0.5 * r.f0 - 1.25 * r.f1 + 2.0 * r.f2 + 0.75
        assert abs(r.prediction - 1 / (1 + math.exp(-z))) < 1e-12


def test_multiclass_linear_argmax_and_tiebreak(spark):
    df = _data(spark, 30)
    W = [[0.1, 0.2, 0.3], [0.3, 0.2, 0.1], [0.1, 0.2, 0.3]]  # class 2 duplicates class 0
    b = [0.0, 0.0, 0.0]
    out = score_multiclass_linear(df, ["f0", "f1", "f2"], W, b).collect()
    for r in out:
        scores = [
            sum(w * f for w, f in zip(ws, [r.f0, r.f1, r.f2])) + bb
            for ws, bb in zip(W, b)
        ]
        best = max(range(3), key=lambda c: (scores[c], -c))  # lowest-class tiebreak
        assert r.prediction == best
        if scores[0] == scores[2] and scores[0] >= scores[1]:
            assert r.prediction == 0  # never 2 on a tie


def test_mlp_relational_vs_pandas_vs_numpy(spark):
    df = _data(spark, 40)
    rng = np.random.RandomState(7)
    W0 = rng.randn(3, 4).round(3).tolist()
    b0 = rng.randn(4).round(3).tolist()
    W1 = rng.randn(4, 1).round(3).tolist()
    b1 = [0.1]
    X = np.array([[r.f0, r.f1, r.f2] for r in df.orderBy("row_id").collect()])
    H = np.maximum(X @ np.array(W0) + np.array(b0), 0)
    Z = (H @ np.array(W1) + np.array(b1))[:, 0]
    expect = 1 / (1 + np.exp(-Z))

    pd_out = (
        score_mlp_pandas(df, ["f0", "f1", "f2"], [W0, W1], [b0, b1])
        .orderBy("row_id")
        .collect()
    )
    np.testing.assert_allclose([r.prediction for r in pd_out], expect, rtol=1e-10)

    coo = sparsify_coo(df, ["f0", "f1", "f2"])
    rel_out = {
        r.row_id: r.prediction
        for r in score_mlp_relational(coo, [W0, W1], [b0, b1]).collect()
    }
    ordered = [r.row_id for r in df.orderBy("row_id").collect()]
    for rid, exp in zip(ordered, expect):
        if rid in rel_out:  # all-zero rows drop from COO
            assert abs(rel_out[rid] - exp) < 1e-9
