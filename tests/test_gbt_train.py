"""Native histogram-GBT training: bit-exact Spark-vs-numpy parity,
loss monotonicity, and scoring-path integration (operators/gbt_train.py).

The parity test is the load-bearing one: both fits quantize gradients to
integer micro-units before aggregation, so the distributed histogram sums
are exact integers and the two implementations must produce *identical*
trees (structure, thresholds, leaf values) — any divergence is a real
algorithmic or determinism bug, not float noise.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from inferdb_spark.operators import gbt_train as G
from inferdb_spark.operators import trees as T


@pytest.fixture(scope="module")
def synth(spark):
    rng = np.random.default_rng(7)
    n = 4000
    x1 = rng.uniform(0, 50, n)
    x2 = rng.uniform(0, 0.1, n)
    x3 = rng.uniform(0, 0.08, n)
    y = 3.0 * (x1 > 24) - 2.0 * (x2 > 0.05) + 0.5 * (x3 > 0.03) + rng.normal(
        0, 0.1, n
    )
    ybin = (y > 0.5).astype(float)
    X = np.column_stack([x1, x2, x3])
    pdf = {
        "f1": x1.tolist(),
        "f2": x2.tolist(),
        "f3": x3.tolist(),
        "y": y.tolist(),
        "ybin": ybin.tolist(),
    }
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(pdf)).repartition(8)
    df = df.localCheckpoint()
    return df, X, y, ybin


# fixed dyadic edges: removes exact-percentile vs numpy-percentile
# interpolation differences from the parity claim (edge *selection* is
# tested separately in test_quantile_edges)
EDGES = {
    "f1": [6.25, 12.5, 18.75, 25.0, 31.25, 37.5, 43.75],
    "f2": [0.0125, 0.025, 0.0375, 0.05, 0.0625, 0.075, 0.0875],
    "f3": [0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07],
}
FEATS = ["f1", "f2", "f3"]


def test_parity_squared(synth):
    df, X, y, _ = synth
    m_spark = G.fit_hist_gbt(
        df, FEATS, "y", objective="squared", n_trees=6, max_depth=3,
        edges=EDGES, base_score=0.0,
    )
    m_np = G.fit_hist_gbt_numpy(
        X, y, FEATS, EDGES, objective="squared", n_trees=6, max_depth=3,
        base_score=0.0,
    )
    assert m_spark.trees == m_np.trees
    assert m_spark.base_score == m_np.base_score


def test_parity_squared_partitioning_invariant(synth):
    """Same fit under a different partitioning -> identical trees (the
    integer-histogram determinism claim)."""
    df, X, y, _ = synth
    a = G.fit_hist_gbt(
        df.repartition(3), FEATS, "y", n_trees=3, max_depth=2,
        edges=EDGES, base_score=0.0,
    )
    b = G.fit_hist_gbt(
        df.coalesce(1), FEATS, "y", n_trees=3, max_depth=2,
        edges=EDGES, base_score=0.0,
    )
    assert a.trees == b.trees


def test_loss_decreases_and_fits_signal(synth):
    df, X, y, _ = synth
    m = G.fit_hist_gbt(
        df, FEATS, "y", objective="squared", n_trees=8, max_depth=3,
        edges=EDGES,
    )
    losses = [r["train_loss"] for r in m.train_rounds]
    assert all(b <= a + 1e-9 for a, b in zip(losses, losses[1:]))
    # signal has variance ~ (3^2+2^2+.5^2)/4-ish; after 8 rounds MSE must
    # be far below the var(y) baseline
    assert losses[-1] < np.var(y) * 0.25


def test_logistic_objective(synth):
    df, X, y, ybin = synth
    m = G.fit_hist_gbt(
        df, FEATS, "ybin", objective="logistic", n_trees=8, max_depth=3,
        edges=EDGES,
    )
    losses = [r["train_loss"] for r in m.train_rounds]
    assert losses[-1] < losses[0]
    # score through the standard expression path; accuracy >> majority
    scored = df.select(
        F.col("ybin"), m.expression().alias("p")
    ).select(
        (F.col("ybin") == (F.col("p") > 0.5).cast("double")).cast("int").alias("ok")
    )
    acc = scored.agg(F.avg("ok")).collect()[0][0]
    base = max(float(np.mean(ybin)), 1.0 - float(np.mean(ybin)))
    assert acc > base + 0.05


def test_fitted_tree_routes_like_binned(synth):
    """The emitted real-valued thresholds (nextafter(edge)) must route
    every row to the same leaf as the binned trainer did: margin column
    from training == scoring the returned trees with gbt_expression."""
    df, X, y, _ = synth
    m = G.fit_hist_gbt(
        df, FEATS, "y", n_trees=4, max_depth=3, edges=EDGES, base_score=0.0,
    )
    pred = df.select(
        "f1", "f2", "f3", m.expression().alias("p")
    ).limit(200).toPandas()
    mn = G.fit_hist_gbt_numpy(
        X, y, FEATS, EDGES, n_trees=4, max_depth=3, base_score=0.0
    )
    # numpy-side re-score via the same Node dicts
    def score_np(trees, base, xrow):
        tot = base
        for t in trees:
            node = t
            while "value" not in node:
                v = xrow[FEATS.index(node["feature"])]
                node = (
                    node["left"]
                    if (np.isnan(v) or v <= node["threshold"])
                    else node["right"]
                )
            tot += node["value"]
        return tot

    rows = pred[["f1", "f2", "f3"]].to_numpy()
    want = np.array([score_np(mn.trees, 0.0, rows[i]) for i in range(len(rows))])
    got = pred["p"].to_numpy()
    assert np.allclose(got, want, atol=1e-12)


def test_quantile_edges(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"a": list(range(100)), "b": [1.0] * 100})
    )
    e = G.quantile_edges(df, ["a", "b"], n_bins=4)
    assert len(e["a"]) == 3
    assert e["b"] == [1.0]  # constant column collapses to one edge


def test_sql_twin_scores_identically(synth):
    """Fitted model through gbt_sql == gbt_expression (DuckDB vs Spark) —
    the scoring-parity bridge that lets a trained model be burned into
    either engine's plan."""
    import duckdb

    df, X, y, _ = synth
    m = G.fit_hist_gbt(
        df, FEATS, "y", n_trees=3, max_depth=2, edges=EDGES, base_score=0.0
    )
    pdf = df.select("f1", "f2", "f3").limit(500).toPandas()
    con = duckdb.connect()
    con.register("t_gbt", pdf)
    want = con.sql(
        f"SELECT round({m.sql()}, 6) AS p FROM t_gbt"
    ).df()["p"].to_numpy()
    con.close()
    got = (
        df.limit(500)
        .select(F.round(m.expression(), 6).alias("p"))
        .toPandas()["p"]
        .to_numpy()
    )
    assert np.allclose(sorted(got), sorted(want), atol=1e-9)


def test_feature_importance(synth):
    """Gain importance must rank the dominant synthetic signal (f1, 3.0
    coefficient) first, and the three kinds must cover executed splits."""
    df, X, y, _ = synth
    m = G.fit_hist_gbt(
        df, FEATS, "y", n_trees=5, max_depth=3, edges=EDGES, base_score=0.0
    )
    gain = m.importance("gain")
    assert max(gain, key=gain.get) == "f1"
    w = m.importance("weight")
    assert sum(w.values()) == len(m.split_stats)
    cover = m.importance("cover")
    assert all(v > 0 for v in cover.values())


def test_early_stopping(synth, spark):
    """Pure-noise target + held-out split: valid loss cannot keep
    improving, so training truncates to the best iteration well before
    n_trees (XGBoost early_stopping_rounds semantics)."""
    import pandas as pd

    rng = np.random.default_rng(11)
    n = 3000
    pdf = pd.DataFrame({
        "f1": rng.uniform(0, 50, n),
        "f2": rng.uniform(0, 0.1, n),
        "f3": rng.uniform(0, 0.08, n),
        "y": rng.normal(0, 1.0, n),  # no signal at all
    })
    train = spark.createDataFrame(pdf.iloc[:2000]).localCheckpoint()
    valid = spark.createDataFrame(pdf.iloc[2000:]).localCheckpoint()
    m = G.fit_hist_gbt(
        train, FEATS, "y", n_trees=20, max_depth=3, edges=EDGES,
        learning_rate=0.5, valid_df=valid, early_stopping_rounds=3,
    )
    assert len(m.trees) < 20
    assert all("valid_loss" in r for r in m.train_rounds)
    # truncated model == best valid iteration
    vlosses = [r["valid_loss"] for r in m.train_rounds]
    assert len(m.trees) == vlosses.index(min(vlosses)) + 1
