"""Round-7 batch-3 gate math vs independent references (sf0.001)."""

from __future__ import annotations

import math

import pytest

from inferdb_spark.gate_r7c import (
    _CARTO_STEPS,
    _CL_B0,
    _CL_BP,
    _CL_BU,
    _CL_PRICE,
    _ECE_B0,
    _ECE_BD,
    _ECE_BQ,
    q_confident_learning_binary,
    q_ece_reliability,
    q_training_cartography,
)


def _snap_u(m: float) -> int:
    return int(math.floor((1.0 / (1.0 + math.exp(-m))) * 1_000_000.0 + 0.5))


def test_ece_matches_bruteforce(spark, sf_dir):
    rows = q_ece_reliability(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bins = {}
    for r in li.collect():
        m = (_ECE_B0 + (_ECE_BQ * r["l_quantity"])) + (_ECE_BD * r["l_discount"])
        pu = _snap_u(m)
        y = 1 if r["l_returnflag"] == "R" else 0
        b = min(pu // 100_000, 9)
        n, acc, conf = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, acc + y, conf + pu)
    n_tot = sum(v[0] for v in bins.values())
    ece = sum(abs(acc * 1_000_000 - conf) for _, acc, conf in bins.values()) / (
        1e6 * n_tot
    )
    assert {r["bin"] for r in rows} == set(bins)
    for r in rows:
        n, acc, conf = bins[r["bin"]]
        assert r["n_b"] == n
        assert r["mean_acc"] == pytest.approx(acc / n, abs=1e-6)
        assert r["mean_conf"] == pytest.approx(conf / (n * 1e6), abs=1e-6)
        assert r["ece"] == pytest.approx(ece, abs=1e-6)


def test_confident_learning_matches_bruteforce(spark, sf_dir):
    row = q_confident_learning_binary(spark, sf_dir).first()
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    recs = []
    for r in od.collect():
        m = (_CL_B0 + (_CL_BP * (r["o_totalprice"] / 1000.0))) + (
            _CL_BU * (1.0 if r["o_orderpriority"] == "1-URGENT" else 0.0)
        )
        recs.append((_snap_u(m), 1 if r["o_totalprice"] > _CL_PRICE else 0))
    s1 = sum(p for p, y in recs if y == 1)
    n1 = sum(1 for _, y in recs if y == 1)
    s0 = sum(p for p, y in recs if y == 0)
    n0 = len(recs) - n1
    c = {(a, b): 0 for a in (0, 1) for b in (0, 1)}
    excluded = 0
    for p, y in recs:
        q1 = p * n1 >= s1
        q0 = (1_000_000 - p) * n0 >= n0 * 1_000_000 - s0
        if q1 and q0:
            yh = 1 if p > 500_000 else 0
        elif q1:
            yh = 1
        elif q0:
            yh = 0
        else:
            excluded += 1
            continue
        c[(y, yh)] += 1
    assert (row["c00"], row["c01"], row["c10"], row["c11"]) == (
        c[(0, 0)],
        c[(0, 1)],
        c[(1, 0)],
        c[(1, 1)],
    )
    assert row["n_excluded"] == excluded
    counted = sum(c.values())
    assert row["est_noise_rate"] == pytest.approx(
        (c[(0, 1)] + c[(1, 0)]) / counted, abs=1e-6
    )


def test_cartography_trajectory_matches_numpy_fit(spark, sf_dir):
    import numpy as np

    from inferdb_spark.operators.logreg import GRID, fit_logreg_numpy

    out = q_training_cartography(spark, sf_dir)
    collected = out.collect()
    rows = {r["row_id"]: r for r in collected}
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter("l_orderkey % 4 = 0")
        .collect()
    )
    X = np.array(
        [[r["l_quantity"] * 0.02, r["l_discount"], r["l_tax"]] for r in li]
    )
    y = np.array([1.0 if r["l_returnflag"] == "R" else 0.0 for r in li])
    ids = [r["l_orderkey"] * 10 + r["l_linenumber"] for r in li]
    # replay the fit step by step, capturing per-step snapped probs
    scale = 10_000
    xq = np.floor(X * scale + 0.5).astype(np.int64)
    coefs, intercept = [0.0] * 3, 0.0
    n = len(y)
    ptus = np.zeros((n, _CARTO_STEPS), dtype=np.int64)
    for k in range(_CARTO_STEPS):
        m = np.full(n, intercept)
        for j in range(3):
            m = m + coefs[j] * (xq[:, j].astype(float) / scale)
        prob = np.floor((1.0 / (1.0 + np.exp(-m))) * GRID + 0.5) / GRID
        gq = np.floor((prob - y) * GRID + 0.5).astype(np.int64)
        intercept = intercept - (int(gq.sum()) / (1e6 * n))
        coefs = [
            coefs[j] - (int((gq * xq[:, j]).sum()) / (1e6 * scale * n))
            for j in range(3)
        ]
        m2 = np.full(n, intercept)
        for j in range(3):
            m2 = m2 + coefs[j] * (xq[:, j].astype(float) / scale)
        p2 = np.floor((1.0 / (1.0 + np.exp(-m2))) * GRID + 0.5) / GRID
        pu = np.round(p2 * GRID).astype(np.int64)
        ptus[:, k] = np.where(y == 1.0, pu, GRID - pu)
    # final coefficients must equal the plain fit (history is a superset)
    cf, bf = fit_logreg_numpy(X, y, n_steps=_CARTO_STEPS)
    assert np.allclose(cf, coefs) and bf == pytest.approx(intercept)
    conf_u = ptus.sum(axis=1)
    var_x = _CARTO_STEPS * (ptus**2).sum(axis=1) - conf_u**2
    # row_id collides on the fixture's duplicated (orderkey, linenumber)
    # keys, so compare the (row_id, conf_u, var_x) MULTISETS
    from collections import Counter

    got = Counter((r["row_id"], r["conf_u"], r["var_x"]) for r in collected)
    want = Counter(
        (ids[i], int(conf_u[i]), int(var_x[i])) for i in range(len(ids))
    )
    assert got == want
    assert len(collected) == n
    # region labels are consistent with the integer thresholds
    from inferdb_spark.operators.logreg import cartography_thresholds

    easy, hard, ambig = cartography_thresholds(_CARTO_STEPS)
    for r in rows.values():
        if r["var_x"] >= ambig:
            assert r["region"] == "ambiguous"
        elif r["conf_u"] >= easy:
            assert r["region"] == "easy"
        elif r["conf_u"] <= hard:
            assert r["region"] == "hard"
        else:
            assert r["region"] == "mid"
