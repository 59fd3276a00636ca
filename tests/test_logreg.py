"""Native logistic-regression GD training: bit-exact Spark-vs-numpy parity,
partitioning invariance, loss improvement, and scoring-path integration
(operators/logreg.py).

Same contract as test_gbt_train.py: gradients are quantized to integer
micro-units before aggregation, so the two fits must produce *identical*
coefficient doubles — any divergence is a determinism bug, not float noise.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from inferdb_spark.operators import logreg as LG


@pytest.fixture(scope="module")
def synth(spark):
    rng = np.random.default_rng(11)
    n = 3000
    x1 = rng.uniform(0, 1, n)
    x2 = rng.uniform(0, 0.1, n)
    x3 = rng.uniform(0, 0.08, n)
    logit = 3.0 * x1 - 20.0 * x2 + 10.0 * x3 - 1.2
    y = (rng.uniform(0, 1, n) < 1.0 / (1.0 + np.exp(-logit))).astype(float)
    X = np.column_stack([x1, x2, x3])
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"f1": x1, "f2": x2, "f3": x3, "y": y})
    ).repartition(8)
    df = df.localCheckpoint()
    return df, X, y


FEATS = ["f1", "f2", "f3"]


def test_parity_numpy(synth):
    df, X, y = synth
    m = LG.fit_logreg_gd(df, FEATS, "y", n_steps=8, learning_rate=1.0,
                         scale=10_000)
    coefs_np, intercept_np = LG.fit_logreg_numpy(
        X, y, n_steps=8, learning_rate=1.0, scale=10_000
    )
    assert m.intercept == intercept_np          # bit-exact, not approx
    assert m.coefs == coefs_np


def test_partitioning_invariant(synth):
    df, _, _ = synth
    a = LG.fit_logreg_gd(df.repartition(3), FEATS, "y", n_steps=4)
    b = LG.fit_logreg_gd(df.repartition(17), FEATS, "y", n_steps=4)
    assert a.coefs == b.coefs and a.intercept == b.intercept


def test_loss_improves(synth):
    """More GD steps -> lower log-loss than the 0-step (all-0.5) model."""
    df, X, y = synth
    m = LG.fit_logreg_gd(df, FEATS, "y", n_steps=8)
    coefs, b0 = np.array(m.coefs), m.intercept
    xq = np.floor(X * 10_000.0 + 0.5)
    margin = b0 + (xq / 10_000.0) @ coefs
    p = np.clip(1.0 / (1.0 + np.exp(-margin)), 1e-9, 1 - 1e-9)
    ll = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert ll < np.log(2.0)  # beats the uninformed baseline


def test_scoring_columns(synth):
    df, _, _ = synth
    m = LG.fit_logreg_gd(df, FEATS, "y", n_steps=2)
    out = df.select(
        m.probability().alias("prob"), m.prediction().alias("pred")
    ).limit(20).collect()
    for r in out:
        assert 0.0 <= r["prob"] <= 1.0
        assert r["pred"] == (1 if r["prob"] > 0.5 else 0)
        # snapped to the 1e-6 grid
        assert abs(r["prob"] * 1_000_000 - round(r["prob"] * 1_000_000)) < 1e-6
