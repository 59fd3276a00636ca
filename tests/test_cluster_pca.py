"""Unit tests for operators/cluster.py (relational Lloyd KMeans) and
linreg.fit_pca_exact (moments-based PCA fit)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from inferdb_spark.operators import cluster as CL
from inferdb_spark.operators import linreg as LR


def _blobs(spark, centers, n_per=50, spread=20, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for cx, cy in centers:
        for _ in range(n_per):
            rows.append(
                (int(cx + rng.integers(-spread, spread + 1)),
                 int(cy + rng.integers(-spread, spread + 1)))
            )
    return spark.createDataFrame(rows, "x long, y long"), rows


def test_lloyd_recovers_blob_centers(spark):
    true_centers = [(100, 100), (1000, 200), (500, 900)]
    df, _ = _blobs(spark, true_centers)
    fitted = CL.fit_kmeans_lloyd(
        df, ["x", "y"], init_centers=[[0, 0], [800, 0], [0, 800]], n_iter=15
    )
    for (tx, ty), (fx, fy) in zip(sorted(true_centers), sorted(fitted)):
        assert abs(tx - fx) <= 15 and abs(ty - fy) <= 15


def test_lloyd_matches_python_reference(spark):
    # bit-exact parity with a driver-side re-implementation of the same
    # integer Lloyd rule (argmin lowest-id, round-half-up integer centroid)
    df, rows = _blobs(spark, [(0, 0), (400, 400)], n_per=30, seed=9)
    init = [[50, 50], [300, 300]]
    got = CL.fit_kmeans_lloyd(df, ["x", "y"], init, n_iter=8)

    centers = [list(c) for c in init]
    for _ in range(8):
        sums = {i: [0, 0, 0] for i in range(len(centers))}
        for x, y in rows:
            best = min(
                range(len(centers)),
                key=lambda i: ((x - centers[i][0]) ** 2 + (y - centers[i][1]) ** 2, i),
            )
            s = sums[best]
            s[0] += x
            s[1] += y
            s[2] += 1
        new = []
        for i, c in enumerate(centers):
            if sums[i][2] == 0:
                new.append(list(c))
            else:
                n = sums[i][2]
                new.append([(sums[i][0] + n // 2) // n, (sums[i][1] + n // 2) // n])
        if new == centers:
            break
        centers = new
    assert got == centers


def test_empty_cluster_keeps_center(spark):
    df = spark.createDataFrame([(0, 0), (2, 2)], "x long, y long")
    fitted = CL.fit_kmeans_lloyd(
        df, ["x", "y"], init_centers=[[1, 1], [9999, 9999]], n_iter=3
    )
    assert fitted[1] == [9999, 9999]


def test_within_cluster_ssd(spark):
    df = spark.createDataFrame([(0, 0), (10, 0)], "x long, y long")
    row = CL.within_cluster_ssd(df, ["x", "y"], [[0, 0], [10, 0]]).collect()[0]
    assert row["ssd"] == 0 and row["n"] == 2


def test_fit_pca_exact_matches_numpy(spark):
    rng = np.random.default_rng(11)
    n = 400
    # correlated 3-d data on a 0.01 grid
    z = rng.normal(0, 1, n)
    a = np.round(2.0 * z + rng.normal(0, 0.1, n), 2)
    b = np.round(-1.0 * z + rng.normal(0, 0.1, n), 2)
    c = np.round(0.5 * z + rng.normal(0, 0.1, n), 2)
    df = spark.createDataFrame(
        [(float(x), float(y), float(w)) for x, y, w in zip(a, b, c)],
        "a double, b double, c double",
    )
    means, comps = LR.fit_pca_exact(df, ["a", "b", "c"], k=2, scale=100)
    X = np.column_stack([a, b, c]) * 100  # the scaled space the fit sees
    cov = np.cov(X, rowvar=False)
    eigval, eigvec = np.linalg.eigh(cov)
    top = eigvec[:, np.argsort(eigval)[::-1][:2]]
    for k in range(2):
        v = top[:, k]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        assert np.allclose(comps[k], v, atol=1e-9)
    assert np.allclose(means, X.mean(axis=0) / 100, atol=1e-12)


def test_pca_project_roundtrip_with_exact_fit(spark):
    from inferdb_spark.operators.featurize import pca_project

    rng = np.random.default_rng(5)
    pts = np.round(rng.normal(0, 3, (100, 2)), 2)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "a double, b double"
    )
    means, comps = LR.fit_pca_exact(df, ["a", "b"], k=2, scale=100)
    out = pca_project(df, ["a", "b"], means, comps).collect()
    # projection preserves squared norm (orthonormal basis)
    for r in out:
        centered = np.array([r["a"] - means[0], r["b"] - means[1]])
        proj = np.array([r["pca_0"], r["pca_1"]])
        assert float(centered @ centered) == pytest.approx(float(proj @ proj), rel=1e-9)
