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


def _exact_greedy_one_tree(
    X, y, feats, edges, max_depth, reg_lambda=1.0, gamma=0.0,
    min_child_weight=1.0, base_score=0.0, lr=0.3,
):
    """Known-correct exact greedy depth-wise fit of ONE squared-loss tree
    over the binned data — brute force, no histogram reuse, node totals
    recomputed from raw rows.  Cross-checks _best_splits (which computes
    node totals from feature 0's bin slice)."""
    Q = G.QUANT
    n, nf = X.shape
    B = np.zeros((n, nf), dtype=np.int64)
    for j, c in enumerate(feats):
        for e in edges[c]:
            B[:, j] += (X[:, j] >= e).astype(np.int64)
    gq = np.floor((base_score - y) * Q + 0.5).astype(np.int64)
    hq = np.full(n, Q, dtype=np.int64)
    nid = np.zeros(n, dtype=np.int64)
    splits = {}
    open_nodes = [0]
    lam_q = reg_lambda * Q
    for _ in range(max_depth):
        nxt = []
        for node in open_nodes:
            rows = nid == node
            tg, th = int(gq[rows].sum()), int(hq[rows].sum())
            parent = (tg * tg) / (th + lam_q)
            best = None
            for f in range(nf):
                for sb in range(len(edges[feats[f]])):
                    left = rows & (B[:, f] <= sb)
                    gl, hl = int(gq[left].sum()), int(hq[left].sum())
                    gr, hr = tg - gl, th - hl
                    if hl < min_child_weight * Q or hr < min_child_weight * Q:
                        continue
                    gain = 0.5 * (
                        (gl * gl) / (hl + lam_q)
                        + (gr * gr) / (hr + lam_q)
                        - parent
                    ) / Q - gamma
                    if gain > 1e-12 and (best is None or gain > best[0]):
                        best = (gain, f, sb)
            if best is None:
                continue
            _, f, sb = best
            splits[node] = (f, sb)
            left = rows & (B[:, f] <= sb)
            nid[left] = 2 * node + 1
            nid[rows & ~left] = 2 * node + 2
            nxt += [2 * node + 1, 2 * node + 2]
        open_nodes = nxt
        if not open_nodes:
            break
    leaf_w = {
        int(v): G._leaf_weight(
            int(gq[nid == v].sum()), int(hq[nid == v].sum()), reg_lambda, lr
        )
        for v in np.unique(nid)
    }
    return G._assemble_tree(0, splits, leaf_w, feats, edges)


def test_track_loss_off_same_model(synth):
    """track_loss=False must fit the IDENTICAL model (trees, base score)
    while skipping the per-round train-loss job — the loss is purely
    informational and never feeds back into the fit.  Also guards the
    derived-leaf-weight path: weights now come from driver-side prefix
    sums over the level histograms instead of a per-tree groupBy collect,
    and both fits here flow through that derivation."""
    df, X, y, ybin = synth
    kw = dict(n_trees=3, max_depth=2, edges=EDGES, base_score=0.0)
    for obj, label in (("squared", "y"), ("logistic", "ybin")):
        a = G.fit_hist_gbt(df, FEATS, label, objective=obj, **kw)
        b = G.fit_hist_gbt(
            df, FEATS, label, objective=obj, track_loss=False, **kw
        )
        assert a.trees == b.trees
        assert a.base_score == b.base_score
        assert all("train_loss" in r for r in a.train_rounds)
        assert all("train_loss" not in r for r in b.train_rounds)


def test_derived_leaf_weights_match_row_aggregation(synth):
    """The driver-derived leaf totals (histogram prefix sums) must equal a
    direct groupBy over the routed rows — the invariant that let the
    per-tree leaf collect be removed."""
    df, X, y, _ = synth
    m = G.fit_hist_gbt(
        df, FEATS, "y", objective="squared", n_trees=1, max_depth=3,
        edges=EDGES, base_score=0.0, track_loss=False,
    )
    # recompute each leaf's quantized gradient sums from the raw rows
    tree = m.trees[0]
    leaves: dict[tuple, float] = {}

    def walk(node, path):
        if "value" in node:
            leaves[tuple(path)] = node["value"]
            return
        step = (node["feature"], node["threshold"])
        walk(node["left"], path + [step + ("L",)])
        walk(node["right"], path + [step + ("R",)])

    walk(tree, [])
    for path, value in leaves.items():
        cond = F.lit(True)
        for feat, thr, side in path:
            c = F.col(feat) <= F.lit(thr)
            cond = cond & (c if side == "L" else ~c)
        rows = df.where(cond).select(
            G._quantize_expr(F.lit(0.0) - F.col("y")).alias("gq"),
            G._quantize_expr(F.lit(1.0)).alias("hq"),
        ).agg(F.sum("gq").alias("g"), F.sum("hq").alias("h")).collect()[0]
        want = G._leaf_weight(int(rows["g"]), int(rows["h"]), 1.0, 0.3)
        assert value == want, (path, value, want)


def test_one_tree_matches_exact_greedy(synth):
    """Histogram trainer == brute-force exact greedy on one tree.  Guards
    the node-totals bug class: totals summed over ALL features' histogram
    slices would overcount n_features-fold and re-rank splits."""
    _, X, y, _ = synth
    m = G.fit_hist_gbt_numpy(
        X, y, FEATS, EDGES, objective="squared", n_trees=1, max_depth=3,
        base_score=0.0,
    )
    want = _exact_greedy_one_tree(X, y, FEATS, EDGES, max_depth=3)
    assert m.trees[0] == want


def test_nan_routes_to_bin_zero(spark):
    """NaN features route to bin 0 (left) in the Spark fit exactly as the
    numpy twin's NaN mask does — parity must survive NaN inputs."""
    import pandas as pd

    rng = np.random.default_rng(5)
    n = 1000
    x1 = rng.uniform(0, 50, n)
    x2 = rng.uniform(0, 0.1, n)
    x3 = rng.uniform(0, 0.08, n)
    x1[::7] = np.nan  # every 7th row NaN in the dominant feature
    y = 3.0 * np.nan_to_num(x1 > 24) - 2.0 * (x2 > 0.05) + rng.normal(0, 0.1, n)
    X = np.column_stack([x1, x2, x3])
    df = spark.createDataFrame(
        pd.DataFrame({"f1": x1, "f2": x2, "f3": x3, "y": y})
    ).repartition(4).localCheckpoint()
    m_spark = G.fit_hist_gbt(
        df, FEATS, "y", n_trees=3, max_depth=3, edges=EDGES, base_score=0.0
    )
    m_np = G.fit_hist_gbt_numpy(
        X, y, FEATS, EDGES, n_trees=3, max_depth=3, base_score=0.0
    )
    assert m_spark.trees == m_np.trees


def test_training_oracle_sql_matches_spark_fit(synth, spark):
    """fit_predict_hist_gbt_sql replays the ENTIRE training loop in DuckDB;
    its predictions must equal the Spark fit + expression() scoring to the
    rounded 6dp — the driver-gate contract, pinned here on synthetic data
    (the gate pins it on lineitem)."""
    import duckdb
    import pandas as pd

    df, X, y, _ = synth
    pdf = df.select(
        F.monotonically_increasing_id().alias("rid"), "f1", "f2", "f3", "y"
    ).toPandas()
    m = G.fit_hist_gbt(
        df, FEATS, "y", n_trees=3, max_depth=2, edges=EDGES,
        base_score=0.0, learning_rate=0.4,
    )
    sql = G.fit_predict_hist_gbt_sql(
        FEATS, "y", EDGES, row_id_sql="rid", n_trees=3, max_depth=2,
        base_score=0.0, learning_rate=0.4, table="t_synth",
    )
    con = duckdb.connect()
    con.register("t_synth", pdf)
    want = con.sql(sql).df().sort_values("row_id")["prediction"].to_numpy()
    con.close()
    # score the SAME pandas rows with the fitted expression
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            F.col("rid"), F.round(m.expression(), 6).alias("p")
        )
        .toPandas()
        .sort_values("rid")["p"]
        .to_numpy()
    )
    assert np.array_equal(got, want)


def test_nan_scoring_matches_binned_routing(spark):
    """The fitted model's expression() must route NaN rows exactly as the
    binned trainer did (NaN -> bin 0 -> left): fit on NaN-bearing data,
    then compare expression() predictions against explicit binned-tree
    routing for every row."""
    import pandas as pd

    rng = np.random.default_rng(5)
    n = 600
    x1 = rng.uniform(0, 50, n)
    x2 = rng.uniform(0, 0.1, n)
    x3 = rng.uniform(0, 0.08, n)
    x1[::5] = np.nan
    y = 3.0 * np.nan_to_num(x1 > 24) - 2.0 * (x2 > 0.05) + rng.normal(0, 0.1, n)
    df = spark.createDataFrame(
        pd.DataFrame({"rid": range(n), "f1": x1, "f2": x2, "f3": x3, "y": y})
    ).localCheckpoint()
    m = G.fit_hist_gbt(df, FEATS, "y", n_trees=2, max_depth=2, edges=EDGES,
                       base_score=0.0)

    # binned routing twin: bin each feature (NaN->0), walk the binned tree
    def binned_pred(row):
        tot = m.base_score
        for tree in m.trees:
            node = tree
            while "value" not in node:
                c = node["feature"]
                v = row[c]
                go_left = v is None or (isinstance(v, float) and math.isnan(v)) \
                    or v <= node["threshold"]
                node = node["left"] if go_left else node["right"]
            tot += node["value"]
        return tot

    import math
    got = {
        r["rid"]: r["p"]
        for r in df.select("rid", F.round(m.expression(), 6).alias("p")).collect()
    }
    pdf = df.toPandas()
    for _, row in pdf.iterrows():
        want = round(binned_pred(row), 6)
        assert got[row["rid"]] == pytest.approx(want, abs=1e-9), row["rid"]
