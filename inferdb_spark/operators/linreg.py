"""In-database linear-regression *training* via exact normal equations.

The reference trains linear models inside the database through MADlib
(`madlib.linregr_train`, src/transpiler.py:2338-2481) and PGML
(`pgml.train('linear')`, src/transpiler.py:2032-2101).  The Spark-native
equivalent needs no ML runtime in the distributed path at all: the
sufficient statistics of OLS are the Gram matrix XᵀX and moment vector
Xᵀy — pure sums of products, ONE map-side-combined aggregation over the
training scan.  The p×p solve happens on the driver (p is tiny; the data
is huge — the classic scale split).

Determinism: features and label are integer-scaled (`round(x*scale)` as
BIGINT) so every sum is exact integer arithmetic — shuffle order cannot
perturb a bit, and the DuckDB oracle reproduces the statistics exactly.
At 100 TB this is a single pass producing O(p²) numbers; no shuffle wider
than one combiner row per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ix(df_or_col, name: str, scale: int) -> Column:
    return F.round(F.col(name) * scale).cast("long")


def gram_relation(
    df: DataFrame, feature_cols: list[str], label_col: str, scale: int = 100
) -> DataFrame:
    """One-row relation of exact OLS sufficient statistics over
    integer-scaled columns: n, s_{i} = Σx_i, g_{i}_{j} = Σx_i·x_j (i ≤ j),
    sy = Σy, xy_{i} = Σx_i·y.  All BIGINT."""
    xs = {c: _ix(df, c, scale) for c in feature_cols}
    y = _ix(df, label_col, scale)
    aggs: list[Column] = [F.count("*").alias("n"), F.sum(y).alias("sy")]
    for i, ci in enumerate(feature_cols):
        aggs.append(F.sum(xs[ci]).alias(f"s_{i}"))
        aggs.append(F.sum(xs[ci] * y).alias(f"xy_{i}"))
        for j, cj in enumerate(feature_cols):
            if i <= j:
                aggs.append(F.sum(xs[ci] * xs[cj]).alias(f"g_{i}_{j}"))
    return df.agg(*aggs)


def gram_relation_sql(
    table: str, feature_cols: list[str], label_col: str, scale: int = 100
) -> str:
    """The DuckDB oracle twin of gram_relation (shared-literal codegen)."""

    def ix(c: str) -> str:
        return f"CAST(round({c}*{scale}) AS BIGINT)"

    y = ix(label_col)
    parts = [
        "CAST(count(*) AS BIGINT) AS n",
        f"CAST(sum({y}) AS BIGINT) AS sy",
    ]
    for i, ci in enumerate(feature_cols):
        parts.append(f"CAST(sum({ix(ci)}) AS BIGINT) AS s_{i}")
        parts.append(f"CAST(sum({ix(ci)} * {y}) AS BIGINT) AS xy_{i}")
        for j, cj in enumerate(feature_cols):
            if i <= j:
                parts.append(
                    f"CAST(sum({ix(ci)} * {ix(cj)}) AS BIGINT) AS g_{i}_{j}"
                )
    return f"SELECT {', '.join(parts)} FROM {table}"


def solve_normal(row, feature_cols: list[str], scale: int = 100):
    """Driver-side solve of the normal equations from a collected gram row.
    Returns (coefficients, intercept) in ORIGINAL units (the integer
    scaling cancels: X̃ = s·X, ỹ = s·y ⇒ β̃ = β, b̃ = s·b)."""
    import numpy as np

    p = len(feature_cols)
    A = np.zeros((p + 1, p + 1))
    b = np.zeros(p + 1)
    A[0, 0] = float(row["n"])
    b[0] = float(row["sy"])
    for i in range(p):
        A[0, i + 1] = A[i + 1, 0] = float(row[f"s_{i}"])
        b[i + 1] = float(row[f"xy_{i}"])
        for j in range(p):
            key = f"g_{i}_{j}" if i <= j else f"g_{j}_{i}"
            A[i + 1, j + 1] = float(row[key])
    beta = np.linalg.solve(A, b)
    intercept = float(beta[0]) / scale
    coefs = [float(c) for c in beta[1:]]
    return coefs, intercept


def moments_relation(df: DataFrame, cols: list[str], scale: int = 100) -> DataFrame:
    """Label-free twin of gram_relation: n, s_i = Σx_i, g_i_j = Σx_i·x_j
    (i ≤ j) over integer-scaled columns — the sufficient statistics of the
    covariance matrix (and so of PCA fit) in ONE exact aggregation."""
    xs = {c: _ix(df, c, scale) for c in cols}
    aggs: list[Column] = [F.count("*").alias("n")]
    for i, ci in enumerate(cols):
        aggs.append(F.sum(xs[ci]).alias(f"s_{i}"))
        for j, cj in enumerate(cols):
            if i <= j:
                aggs.append(F.sum(xs[ci] * xs[cj]).alias(f"g_{i}_{j}"))
    return df.agg(*aggs)


def moments_relation_sql(table: str, cols: list[str], scale: int = 100) -> str:
    def ix(c: str) -> str:
        return f"CAST(round({c}*{scale}) AS BIGINT)"

    parts = ["CAST(count(*) AS BIGINT) AS n"]
    for i, ci in enumerate(cols):
        parts.append(f"CAST(sum({ix(ci)}) AS BIGINT) AS s_{i}")
        for j, cj in enumerate(cols):
            if i <= j:
                parts.append(f"CAST(sum({ix(ci)} * {ix(cj)}) AS BIGINT) AS g_{i}_{j}")
    return f"SELECT {', '.join(parts)} FROM {table}"


def fit_pca_exact(df: DataFrame, cols: list[str], k: int, scale: int = 100):
    """PCA fit from the exact moments relation: covariance on the driver
    from integer sums (no sampling, no ML runtime in the distributed path
    — the cluster-scale twin of featurize.fit_pca's MLlib estimator).
    Returns (means, components[k][p]) in original units for
    featurize.pca_project."""
    import numpy as np

    row = moments_relation(df, cols, scale).collect()[0]
    n = row["n"]
    p = len(cols)
    s = np.array([row[f"s_{i}"] for i in range(p)], dtype=float)
    G = np.zeros((p, p))
    for i in range(p):
        for j in range(p):
            key = f"g_{i}_{j}" if i <= j else f"g_{j}_{i}"
            G[i, j] = float(row[key])
    mean = s / n
    cov = (G - np.outer(mean, s)) / (n - 1)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1][:k]
    comps = []
    for idx in order:
        v = eigvec[:, idx]
        # deterministic sign: largest-|coordinate| entry positive
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    means = [float(m) / scale for m in mean]
    return means, comps


def fit_linear_normal(
    df: DataFrame, feature_cols: list[str], label_col: str, scale: int = 100
):
    """Distributed sufficient statistics + driver solve.  The rounding to
    1/scale units is the (documented) quantization of this trainer; pick
    `scale` to the data's native precision (cents → 100) for exactness."""
    row = gram_relation(df, feature_cols, label_col, scale).collect()[0]
    return solve_normal(row, feature_cols, scale)
