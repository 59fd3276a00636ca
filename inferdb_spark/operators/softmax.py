"""In-database *multinomial* (softmax) logistic-regression training.

The reference trains multiclass classifiers in-database through PGML
(`pgml.train` task='classification' generalizes past binary,
src/transpiler.py:2032-2101) and scores MADlib multinomial models
(`madlib.multinom` family is the documented extension of
`madlib.logregr_train`, src/transpiler.py:2382-2466); its own multiclass
surface (IV multiclass, argmax scoring) assumes an externally-fitted
model.  This module closes that gap natively: full-batch fixed-step
gradient descent on the softmax objective, expressed as ONE exact
relational aggregation per step — the operators/logreg.py playbook
lifted to C classes.

Scale shape: each step is a single map-side-combined `agg` over the
training scan producing C*(p+1)+1 BIGINT sums; driver state is the
C*(p+1) coefficient matrix.  Nothing grows with row count.

Determinism (see logreg.py for the full rationale):
- features integer-quantized once via floor(x*scale + 0.5);
- per-class margins evaluated in written order ((b + c0*t0) + c1*t1)...;
- softmax probabilities p_c = exp(m_c) / ((exp(m_0) + exp(m_1)) + ...)
  with the denominator summed in class order, then snapped to the 1e-6
  grid — ONE division per class, identical parenthesization in the
  Column tree, the DuckDB CTE chain, and the numpy twin;
- per-row gradients gq_c = floor((p_c - y_c)*1e6 + 0.5) and products
  gq_c * xq_j are exact BIGINTs → order-independent sums;
- argmax prediction ties break to the LOWEST class index on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRID = 1_000_000


def _xq(col: str, scale: int) -> Column:
    return F.floor(F.col(col) * F.lit(float(scale)) + F.lit(0.5)).cast("long")


def _margin_expr(
    feature_cols: list[str], coefs: list[float], intercept: float, scale: int
) -> Column:
    m = F.lit(float(intercept))
    for c, b in zip(feature_cols, coefs):
        t = _xq(c, scale).cast("double") / F.lit(float(scale))
        m = m + F.lit(float(b)) * t
    return m


@dataclass
class SoftmaxModel:
    feature_cols: list[str]
    n_classes: int
    coefs: list[list[float]]  # [class][feature]
    intercepts: list[float]
    scale: int
    n_steps: int
    learning_rate: float

    def margins(self) -> list[Column]:
        return [
            _margin_expr(self.feature_cols, self.coefs[c], self.intercepts[c], self.scale)
            for c in range(self.n_classes)
        ]

    def probabilities(self) -> list[Column]:
        """1e-6-snapped softmax probabilities, denominator folded in class
        order (written-order parenthesization)."""
        ms = self.margins()
        denom = F.exp(ms[0])
        for m in ms[1:]:
            denom = denom + F.exp(m)
        return [
            F.floor(F.exp(m) / denom * F.lit(float(GRID)) + F.lit(0.5))
            / F.lit(float(GRID))
            for m in ms
        ]

    def prediction(self) -> Column:
        """Argmax class, ties to the LOWEST class index: class c wins iff
        p_c >= p_k for every k > c and p_c > p_k is not required for k < c
        (strictly-greater already handled by the when-chain order)."""
        ps = self.probabilities()
        expr = F.lit(self.n_classes - 1)
        # build the chain backwards so class 0's condition is checked first
        for c in range(self.n_classes - 2, -1, -1):
            cond = F.lit(True)
            for k in range(c + 1, self.n_classes):
                cond = cond & (ps[c] >= ps[k])
            expr = F.when(cond, F.lit(c)).otherwise(expr)
        return expr.cast("long")


def gradient_relation(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    coefs: list[list[float]],
    intercepts: list[float],
    scale: int,
) -> DataFrame:
    """One-row relation of exact integer softmax gradient sums:
    n, and per class c: sg_c = SUM gq_c, sgx_c_j = SUM gq_c * xq_j with
    gq_c = floor((p_c - [y=c])*1e6 + 0.5).  All BIGINT."""
    n_classes = len(coefs)
    model = SoftmaxModel(
        feature_cols=list(feature_cols), n_classes=n_classes, coefs=coefs,
        intercepts=intercepts, scale=scale, n_steps=0, learning_rate=0.0,
    )
    ps = model.probabilities()
    y = F.col(label_col).cast("long")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in range(n_classes):
        yc = (y == c).cast("double")
        gq = F.floor((ps[c] - yc) * F.lit(float(GRID)) + F.lit(0.5)).cast("long")
        aggs.append(F.sum(gq).alias(f"sg_{c}"))
        for j, col in enumerate(feature_cols):
            aggs.append(F.sum(gq * _xq(col, scale)).alias(f"sgx_{c}_{j}"))
    return df.agg(*aggs)


def _gradient_relation_q(
    qdf: DataFrame,
    p: int,
    label_col: str,
    coefs: list[list[float]],
    intercepts: list[float],
    scale: int,
) -> DataFrame:
    """gradient_relation reading the PRE-QUANTIZED fit input (_xq{j}
    BIGINT columns): identical expression tree except the xq leaves are
    cached longs instead of floor(col*scale+0.5) recomputed per row —
    same values, same written-order parenthesization, same snapping."""
    n_classes = len(coefs)
    ms = []
    for c in range(n_classes):
        m = F.lit(float(intercepts[c]))
        for j in range(p):
            t = F.col(f"_xq{j}").cast("double") / F.lit(float(scale))
            m = m + F.lit(float(coefs[c][j])) * t
        ms.append(m)
    denom = F.exp(ms[0])
    for m in ms[1:]:
        denom = denom + F.exp(m)
    ps = [
        F.floor(F.exp(m) / denom * F.lit(float(GRID)) + F.lit(0.5))
        / F.lit(float(GRID))
        for m in ms
    ]
    y = F.col(label_col).cast("long")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in range(n_classes):
        yc = (y == c).cast("double")
        gq = F.floor((ps[c] - yc) * F.lit(float(GRID)) + F.lit(0.5)).cast("long")
        aggs.append(F.sum(gq).alias(f"sg_{c}"))
        for j in range(p):
            aggs.append(F.sum(gq * F.col(f"_xq{j}")).alias(f"sgx_{c}_{j}"))
    return qdf.agg(*aggs)


def _gradient_step_row_sql(
    qdf: DataFrame,
    p: int,
    label_col: str,
    coefs: list[list[float]],
    intercepts: list[float],
    scale: int,
):
    """Assembled-SQL twin of _gradient_relation_q + collect (r10, guide
    §7.3 — the operators/logreg._gd_step_row pattern): the Column form
    paid C·(p+1) py4j-built aggregate children, each re-evaluating the
    full softmax (C exps) per row; here every per-class gq projects ONCE
    per row from one selectExpr parse and the aggregates read the
    projected BIGINTs.  Identical expression trees ({x!r}D literals,
    Column-form association), exact integer sums — the numpy-parity test
    and the DuckDB full-fit replay pin the fitted matrix."""
    n_classes = len(coefs)
    gr = f"{float(GRID)!r}D"
    ms = []
    for c in range(n_classes):
        m = f"{float(intercepts[c])!r}D"
        for j in range(p):
            m = (
                f"({m} + ({float(coefs[c][j])!r}D *"
                f" (CAST(_xq{j} AS DOUBLE) / {float(scale)!r}D)))"
            )
        ms.append(m)
    denom = f"EXP({ms[0]})"
    for m in ms[1:]:
        denom = f"({denom} + EXP({m}))"
    gqs = []
    for c in range(n_classes):
        pc = f"(FLOOR(((EXP({ms[c]}) / {denom}) * {gr}) + 0.5D) / {gr})"
        # backtick-quote the identifier: raw splicing breaks on any column
        # name needing quoting (round-10 advice item 2)
        yc = f"CAST((CAST(`{label_col}` AS BIGINT) = {c}) AS DOUBLE)"
        gqs.append(
            f"CAST(FLOOR((({pc} - {yc}) * {gr}) + 0.5D) AS BIGINT) AS _gq{c}"
        )
    g = qdf.selectExpr(*gqs, *[f"_xq{j}" for j in range(p)])
    aggs = [F.expr("count(1) AS n")]
    for c in range(n_classes):
        aggs.append(F.expr(f"sum(_gq{c}) AS sg_{c}"))
        for j in range(p):
            aggs.append(F.expr(f"sum(_gq{c} * _xq{j}) AS sgx_{c}_{j}"))
    return g.agg(*aggs).collect()[0]


def fit_softmax_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_classes: int,
    n_steps: int = 4,
    learning_rate: float = 1.0,
    scale: int = 10_000,
) -> SoftmaxModel:
    """Fixed-step full-batch softmax GD from the zero matrix.  Per step one
    exact aggregation (C*(p+1)+1 BIGINT sums) reaches the driver."""
    p = len(feature_cols)
    coefs = [[0.0] * p for _ in range(n_classes)]
    intercepts = [0.0] * n_classes
    lr = float(learning_rate)
    # quantize-once fit input (see operators/logreg._gd_input): the
    # integer feature quantizations and the label are materialized into a
    # spread, persisted projection so each of the n_steps aggregations
    # reads cached BIGINTs in parallel instead of re-scanning the (one-
    # row-group, one-task) parquet and re-quantizing per row per step.
    # The cached _xq{j} is exactly _xq(col, scale); margins rebuild
    # t = cast(_xq{j} AS DOUBLE)/scale — bit-identical to the inline form,
    # and the gradient sums are exact BIGINTs, so the fitted matrix (and
    # the DuckDB fit replay) is unchanged.
    from inferdb_spark.scale import spread

    qdf = spread(
        df.select(
            *[_xq(c, scale).alias(f"_xq{j}") for j, c in enumerate(feature_cols)],
            F.col(label_col).alias("_y"),
        )
    ).persist()
    for _ in range(n_steps):
        row = _gradient_step_row_sql(qdf, p, label_col="_y", coefs=coefs,
                                     intercepts=intercepts, scale=scale)
        n = row["n"]
        intercepts = [
            intercepts[c] - lr * (row[f"sg_{c}"] / (1000000.0 * n))
            for c in range(n_classes)
        ]
        coefs = [
            [
                coefs[c][j]
                - lr * (row[f"sgx_{c}_{j}"] / (1000000.0 * scale * n))
                for j in range(p)
            ]
            for c in range(n_classes)
        ]
    qdf.unpersist()
    return SoftmaxModel(
        feature_cols=list(feature_cols), n_classes=n_classes, coefs=coefs,
        intercepts=intercepts, scale=scale, n_steps=n_steps, learning_rate=lr,
    )


# ---------------------------------------------------------------------------
# DuckDB oracle: the ENTIRE fit replayed as one CTE chain, then every row
# scored (probabilities + argmax) with the final coefficient matrix.


def fit_predict_softmax_sql(
    feature_sqls: list[str],
    label_sql: str,
    row_id_sql: str,
    n_classes: int,
    n_steps: int = 4,
    learning_rate: float = 1.0,
    scale: int = 10_000,
    table: str = "lineitem",
) -> str:
    """Full softmax training replay in DuckDB, mirroring fit_softmax_gd's
    arithmetic expression-for-expression (same parenthesization, same
    floor-snapping, same argmax tie-break)."""
    p = len(feature_sqls)
    lr = float(learning_rate)

    def xq_sql(expr: str) -> str:
        return f"CAST(floor(({expr}) * {float(scale)!r} + 0.5) AS BIGINT)"

    base_cols = ", ".join(
        f"{xq_sql(e)} AS x{j}" for j, e in enumerate(feature_sqls)
    )
    beta0_cols = ", ".join(
        [f"CAST(0.0 AS DOUBLE) AS b{c}" for c in range(n_classes)]
        + [
            f"CAST(0.0 AS DOUBLE) AS c{c}_{j}"
            for c in range(n_classes)
            for j in range(p)
        ]
    )
    ctes = [
        f"b AS MATERIALIZED (SELECT CAST({row_id_sql} AS BIGINT) AS row_id, "
        f"{base_cols}, CAST({label_sql} AS BIGINT) AS y FROM {table})",
        f"beta0 AS (SELECT {beta0_cols})",
    ]

    def margin_sql(src: str, c: int) -> str:
        m = f"{src}.b{c}"
        for j in range(p):
            t = f"(CAST(x{j} AS DOUBLE) / {float(scale)!r})"
            m = f"({m} + ({src}.c{c}_{j} * {t}))"
        return m

    def prob_sqls(src: str) -> list[str]:
        ms = [margin_sql(src, c) for c in range(n_classes)]
        denom = f"exp({ms[0]})"
        for m in ms[1:]:
            denom = f"({denom} + exp({m}))"
        return [
            f"(floor(exp({m}) / {denom} * {float(GRID)!r} + 0.5) / {float(GRID)!r})"
            for m in ms
        ]

    for k in range(n_steps):
        ps = prob_sqls(f"beta{k}")
        gq_cols = ", ".join(
            f"CAST(floor(({ps[c]} - CASE WHEN y = {c} THEN 1.0 ELSE 0.0 END) "
            f"* {float(GRID)!r} + 0.5) AS BIGINT) AS gq{c}"
            for c in range(n_classes)
        )
        sums = ["CAST(count(*) AS BIGINT) AS n"]
        for c in range(n_classes):
            sums.append(f"SUM(gq{c}) AS sg_{c}")
            for j in range(p):
                sums.append(f"SUM(gq{c} * x{j}) AS sgx_{c}_{j}")
        xs = ", ".join(f"x{j}" for j in range(p))
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT {', '.join(sums)} FROM "
            f"(SELECT y, {xs}, {gq_cols} FROM b CROSS JOIN beta{k}))"
        )
        upd = []
        for c in range(n_classes):
            upd.append(
                f"beta{k}.b{c} - {lr!r} * (s{k}.sg_{c} / (1000000.0 * s{k}.n)) AS b{c}"
            )
        for c in range(n_classes):
            for j in range(p):
                upd.append(
                    f"beta{k}.c{c}_{j} - {lr!r} * (s{k}.sgx_{c}_{j} / "
                    f"(1000000.0 * {scale} * s{k}.n)) AS c{c}_{j}"
                )
        ctes.append(
            f"beta{k + 1} AS MATERIALIZED (SELECT {', '.join(upd)} FROM beta{k} CROSS JOIN s{k})"
        )

    final = f"beta{n_steps}"
    ps = prob_sqls(final)
    prob_cols = ", ".join(
        f"CAST({ps[c]} AS DOUBLE) AS p{c}" for c in range(n_classes)
    )
    # argmax, ties to lowest class: when-chain checked from class 0 down
    pred = str(n_classes - 1)
    for c in range(n_classes - 2, -1, -1):
        cond = " AND ".join(
            f"{ps[c]} >= {ps[k]}" for k in range(c + 1, n_classes)
        )
        pred = f"CASE WHEN {cond} THEN {c} ELSE {pred} END"
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT row_id, {prob_cols}, CAST({pred} AS BIGINT) AS pred "
        f"FROM b CROSS JOIN {final} ORDER BY row_id"
    )


# ---------------------------------------------------------------------------
# pure-Python twin (parity tests)


def fit_softmax_numpy(
    X, y, n_classes: int, n_steps: int = 4, learning_rate: float = 1.0,
    scale: int = 10_000,
):
    """Bit-identical numpy replay of fit_softmax_gd.  Returns (coefs,
    intercepts) with coefs[class][feature]."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.int64)
    n, p = X.shape
    xq = np.floor(X * float(scale) + 0.5).astype(np.int64)
    coefs = [[0.0] * p for _ in range(n_classes)]
    intercepts = [0.0] * n_classes
    lr = float(learning_rate)
    for _ in range(n_steps):
        ms = []
        for c in range(n_classes):
            m = np.full(n, intercepts[c], dtype=np.float64)
            for j in range(p):
                t = xq[:, j].astype(np.float64) / float(scale)
                m = m + coefs[c][j] * t
            ms.append(m)
        denom = np.exp(ms[0])
        for m in ms[1:]:
            denom = denom + np.exp(m)
        new_b, new_c = [], []
        gqs = []
        for c in range(n_classes):
            pc = np.floor(np.exp(ms[c]) / denom * float(GRID) + 0.5) / float(GRID)
            yc = (y == c).astype(np.float64)
            gqs.append(np.floor((pc - yc) * float(GRID) + 0.5).astype(np.int64))
        for c in range(n_classes):
            new_b.append(intercepts[c] - lr * (int(gqs[c].sum()) / (1000000.0 * n)))
            new_c.append(
                [
                    coefs[c][j]
                    - lr * (int((gqs[c] * xq[:, j]).sum()) / (1000000.0 * scale * n))
                    for j in range(p)
                ]
            )
        intercepts, coefs = new_b, new_c
    return coefs, intercepts
