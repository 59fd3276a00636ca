"""In-database logistic-regression *training* via fixed-step gradient descent.

The reference trains logistic models inside the database through PGML
(`pgml.train` on 'classification'/logistic, src/transpiler.py:2032-2101)
and MADlib (`madlib.logregr_train`, src/transpiler.py:2382-2466) and then
transpiles the fitted coefficients into a scoring expression.  This module
is the Spark-native twin of that story, completing the in-engine trainer
family (OLS normal equations — linreg.py; hist-GBT — gbt_train.py; kmeans
Lloyd — cluster.py): the ENTIRE fit is expressed as one exact relational
aggregation per gradient step, with only the O(p) coefficient vector ever
reaching the driver.

Scale shape (the 100 TB question): each step is a single map-side-combined
`agg` over the training scan producing p+2 BIGINT sums — no shuffle wider
than one combiner row per partition, no per-row state, nothing driver-side
that grows with the data.  `n_steps` scans of the data total (persist the
quantized projection once if the input is remote).

Determinism engineering (the gbt_train.py playbook, see _grad_hess there):

- features are integer-quantized once: ``xq = floor(x*scale + 0.5)`` as
  BIGINT (floor(+0.5), NOT round(): Spark round is HALF_UP, DuckDB/numpy
  differ — floor-based snapping is identical everywhere);
- the per-row margin is evaluated in written order
  ``((b + c0*t0) + c1*t1) + ...`` with ``t_j = xq_j / scale`` — identical
  parenthesization in the Column tree, the DuckDB CTE chain, and the numpy
  twin, so IEEE doubles agree bit-for-bit;
- the ONLY libm call, ``p = 1/(1+exp(-m))``, is snapped onto the 1e-6 grid
  immediately; the per-row gradient ``gq = floor((p-y)*1e6 + 0.5)`` and the
  products ``gq * xq_j`` are then exact BIGINTs, so the aggregated sums are
  order-independent under any partitioning;
- the coefficient update ``c_j - lr * (sgx_j / (1e6 * scale * n))`` is the
  same correctly-rounded double expression on the driver (Python float),
  in DuckDB, and in numpy — coefficients stay bit-identical step for step.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRID = 1_000_000  # 1e-6 probability grid, the gbt_train.py convention


@dataclass
class LogRegModel:
    feature_cols: list[str]
    coefs: list[float]
    intercept: float
    scale: int
    n_steps: int
    learning_rate: float

    def margin(self) -> Column:
        return _margin_expr(self.feature_cols, self.coefs, self.intercept, self.scale)

    def probability(self) -> Column:
        """Snapped-to-1e-6 P(y=1) as a Column over the feature columns."""
        return _snap_prob(self.margin())

    def prediction(self) -> Column:
        return (self.probability() > F.lit(0.5)).cast("long")


def _xq(col: str, scale: int) -> Column:
    return F.floor(F.col(col) * F.lit(float(scale)) + F.lit(0.5)).cast("long")


def _margin_from_ts(ts: list[Column], coefs: list[float], intercept: float) -> Column:
    m = F.lit(float(intercept))
    for t, b in zip(ts, coefs):
        m = m + F.lit(float(b)) * t
    return m


def _margin_expr(
    feature_cols: list[str], coefs: list[float], intercept: float, scale: int
) -> Column:
    ts = [_xq(c, scale).cast("double") / F.lit(float(scale)) for c in feature_cols]
    return _margin_from_ts(ts, coefs, intercept)


# -- quantize-once fit-loop input (optimization round 10) -------------------
#
# Every GD fit here runs n_steps sequential one-row aggregations.  The
# original loops aggregated over the RAW df, so each step re-scanned the
# parquet and re-quantized every feature — and on the single-row-group
# local files that scan is ONE task, serializing each step's per-row work
# (floor/exp/compare) on one core.  The prep below materializes the
# integer quantizations ONCE into a spread, persisted projection; steps
# then aggregate cached BIGINTs in parallel.
#
# Bit-exactness: the cached column _xq{j} holds exactly _xq(col, scale);
# margins rebuild t = cast(_xq{j} AS DOUBLE) / scale — the same long
# cast to the same double the inline form produces, so every
# margin/probability/gradient value (and therefore every fitted
# coefficient and the oracle replay) is unchanged.  The per-step sums are
# exact BIGINTs, so the repartition cannot reorder anything observable.


def _gd_input(
    df: DataFrame, feature_cols: list[str], label_col: str, scale: int
) -> DataFrame:
    from inferdb_spark.scale import spread

    proj = df.select(
        *[_xq(c, scale).alias(f"_xq{j}") for j, c in enumerate(feature_cols)],
        F.col(label_col).alias("_y"),
    )
    return spread(proj).persist()


def _q_ts(p: int, scale: int) -> list[Column]:
    return [
        F.col(f"_xq{j}").cast("double") / F.lit(float(scale)) for j in range(p)
    ]


def _gd_sums(qdf: DataFrame, p: int, gq: Column) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(gq).alias("sg")]
    for j in range(p):
        aggs.append(F.sum(gq * F.col(f"_xq{j}")).alias(f"sgx_{j}"))
    return qdf.agg(*aggs)


# --- assembled-SQL twins of the per-step expressions (r10, guide §7.3) ---
# The Column forms above build the margin/probability/gradient trees one
# py4j call at a time, and _gd_sums re-evaluates the FULL gq tree (incl.
# its exp) inside every aggregate child — p+1 evaluations per row where
# one suffices (the poisson_bootstrap_ci finding, §1/§6 of
# OPTIMIZATION_r10.md).  The twins below parse the identical expression
# trees JVM-side in a handful of calls and project gq ONCE per row
# before the aggregate.  Exactness: `{x!r}D` double literals round-trip
# (the gate_r5c house pattern), every sub-tree is parenthesized to the
# Column form's association, and the gradient sums are exact BIGINTs —
# the numpy-parity tests and the full DuckDB fit replays pin the models.


def _t_sql(j: int, scale: int) -> str:
    """Textual twin of _q_ts()[j]."""
    return f"(CAST(_xq{j} AS DOUBLE) / {float(scale)!r}D)"


def _margin_sql(p: int, coefs: list[float], intercept: float, scale: int) -> str:
    """Textual twin of _margin_from_ts(_q_ts(p, scale), coefs, intercept)."""
    import math

    # repr(inf/nan) is not a valid SQL double literal — a diverged fit
    # (oversized learning_rate) must fail with a diagnosis, not a
    # ParseException deep in the step (round-10 advice item 1).
    if not all(math.isfinite(c) for c in [intercept, *coefs]):
        raise ValueError(
            "fit diverged: non-finite coefficient/intercept "
            f"(intercept={intercept!r}, coefs={coefs!r}); lower learning_rate"
        )
    m = f"{float(intercept)!r}D"
    for j in range(p):
        m = f"({m} + ({float(coefs[j])!r}D * {_t_sql(j, scale)}))"
    return m


def _gd_step_row(qdf: DataFrame, p: int, gq_sql: str):
    """One GD step's exact sums: project gq once per row (single
    selectExpr parse), aggregate n/sg/sgx_j.  Same BIGINT sums as
    _gd_sums over the same gq tree."""
    g = qdf.selectExpr(
        f"{gq_sql} AS _gq", *[f"_xq{j}" for j in range(p)]
    )
    return g.agg(
        F.expr("count(1) AS n"),
        F.expr("sum(_gq) AS sg"),
        *[F.expr(f"sum(_gq * _xq{j}) AS sgx_{j}") for j in range(p)],
    ).collect()[0]


def _logreg_gq_sql(p: int, coefs: list[float], intercept: float, scale: int) -> str:
    """Twin of floor((snap_prob(margin) − y)·GRID + 0.5) cast long."""
    gr = f"{float(GRID)!r}D"
    m = _margin_sql(p, coefs, intercept, scale)
    prob = f"(FLOOR(((1.0D / (1.0D + EXP(-({m})))) * {gr}) + 0.5D) / {gr})"
    return (
        f"CAST(FLOOR((({prob} - CAST(_y AS DOUBLE)) * {gr}) + 0.5D) AS BIGINT)"
    )


def _snap_prob(margin: Column) -> Column:
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return F.floor(p * F.lit(float(GRID)) + F.lit(0.5)) / F.lit(float(GRID))


def gradient_relation(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    coefs: list[float],
    intercept: float,
    scale: int,
) -> DataFrame:
    """One-row relation of exact integer gradient sums at the given
    coefficients: n, sg = Σ gq, sgx_j = Σ gq·xq_j with
    gq = floor((p−y)·1e6 + 0.5).  All BIGINT — bit-stable under shuffle."""
    p = _snap_prob(_margin_expr(feature_cols, coefs, intercept, scale))
    y = F.col(label_col).cast("double")
    gq = F.floor((p - y) * F.lit(float(GRID)) + F.lit(0.5)).cast("long")
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(gq).alias("sg")]
    for j, c in enumerate(feature_cols):
        aggs.append(F.sum(gq * _xq(c, scale)).alias(f"sgx_{j}"))
    return df.agg(*aggs)


def fit_logreg_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_steps: int = 8,
    learning_rate: float = 1.0,
    scale: int = 10_000,
) -> LogRegModel:
    """Fixed-step full-batch gradient descent from β = 0.  Per step: one
    exact aggregation over the scan (p+2 BIGINT sums collected), then the
    O(p) double update on the driver — the kmeans-Lloyd/hist-GBT driver-loop
    shape, `.collect()` volume independent of row count."""
    p = len(feature_cols)
    coefs = [0.0] * p
    intercept = 0.0
    lr = float(learning_rate)
    qdf = _gd_input(df, feature_cols, label_col, scale)
    try:
        for _ in range(n_steps):
            row = _gd_step_row(
                qdf, p, _logreg_gq_sql(p, coefs, intercept, scale)
            )
            n = row["n"]
            intercept = intercept - lr * (row["sg"] / (1000000.0 * n))
            coefs = [
                coefs[j] - lr * (row[f"sgx_{j}"] / (1000000.0 * scale * n))
                for j in range(p)
            ]
    finally:
        qdf.unpersist()
    return LogRegModel(
        feature_cols=list(feature_cols),
        coefs=coefs,
        intercept=intercept,
        scale=scale,
        n_steps=n_steps,
        learning_rate=lr,
    )


def fit_logreg_gd_history(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_steps: int = 8,
    learning_rate: float = 1.0,
    scale: int = 10_000,
) -> list[LogRegModel]:
    """Like fit_logreg_gd but returns the PER-STEP model snapshots
    beta_1..beta_K (same arithmetic, same gradient_relation aggregates) —
    the input to dataset-cartography statistics, which need the model's
    probability trajectory across training steps, not just the final
    fit.  Driver traffic is still p+2 BIGINT sums per step."""
    p = len(feature_cols)
    coefs = [0.0] * p
    intercept = 0.0
    lr = float(learning_rate)
    history: list[LogRegModel] = []
    qdf = _gd_input(df, feature_cols, label_col, scale)
    for _ in range(n_steps):
        row = _gd_step_row(qdf, p, _logreg_gq_sql(p, coefs, intercept, scale))
        n = row["n"]
        intercept = intercept - lr * (row["sg"] / (1000000.0 * n))
        coefs = [
            coefs[j] - lr * (row[f"sgx_{j}"] / (1000000.0 * scale * n))
            for j in range(p)
        ]
        history.append(
            LogRegModel(
                feature_cols=list(feature_cols),
                coefs=list(coefs),
                intercept=intercept,
                scale=scale,
                n_steps=n_steps,
                learning_rate=lr,
            )
        )
    qdf.unpersist()
    return history


# ---------------------------------------------------------------------------
# DuckDB oracle: the ENTIRE fit replayed as one CTE chain (the
# fit_predict_hist_gbt_sql standard) + final per-row scoring


def fit_predict_logreg_sql(
    feature_sqls: list[str],
    label_sql: str,
    row_id_sql: str,
    n_steps: int = 8,
    learning_rate: float = 1.0,
    scale: int = 10_000,
    table: str = "lineitem",
) -> str:
    """Full training replay in DuckDB: quantize → (gradient-sum CTE →
    coefficient-update CTE) × n_steps → score every row with the final
    coefficients.  Generated from the SAME step/lr/scale literals as the
    Spark fit; every arithmetic expression mirrors the Column tree's
    parenthesization so coefficients and probabilities are bit-identical."""
    p = len(feature_sqls)
    lr = float(learning_rate)

    def xq_sql(expr: str) -> str:
        return f"CAST(floor(({expr}) * {float(scale)!r} + 0.5) AS BIGINT)"

    base_cols = ", ".join(
        f"{xq_sql(e)} AS x{j}" for j, e in enumerate(feature_sqls)
    )
    ctes = [
        f"b AS MATERIALIZED (SELECT CAST({row_id_sql} AS BIGINT) AS row_id, "
        f"{base_cols}, CAST({label_sql} AS DOUBLE) AS y FROM {table})",
        "beta0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0, "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS c{j}" for j in range(p))
        + ")",
    ]

    def margin_sql(src: str) -> str:
        # ((b0 + (c0 * t0)) + (c1 * t1)) + ... — the Column tree's shape
        m = f"{src}.b0"
        for j in range(p):
            t = f"(CAST(x{j} AS DOUBLE) / {float(scale)!r})"
            m = f"({m} + ({src}.c{j} * {t}))"
        return m

    def prob_sql(m: str) -> str:
        return f"(floor((1.0 / (1.0 + exp(-({m})))) * {float(GRID)!r} + 0.5) / {float(GRID)!r})"

    for k in range(n_steps):
        m = margin_sql(f"beta{k}")
        gq = f"CAST(floor(({prob_sql(m)} - y) * {float(GRID)!r} + 0.5) AS BIGINT)"
        sgx = ", ".join(f"SUM(gq * x{j}) AS sgx_{j}" for j in range(p))
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n, SUM(gq) AS sg, {sgx} "
            f"FROM (SELECT y, {', '.join(f'x{j}' for j in range(p))}, {gq} AS gq "
            f"FROM b CROSS JOIN beta{k}))"
        )
        upd = [
            f"beta{k}.b0 - {lr!r} * (s{k}.sg / (1000000.0 * s{k}.n)) AS b0"
        ]
        for j in range(p):
            upd.append(
                f"beta{k}.c{j} - {lr!r} * (s{k}.sgx_{j} / "
                f"(1000000.0 * {scale} * s{k}.n)) AS c{j}"
            )
        ctes.append(
            f"beta{k + 1} AS MATERIALIZED (SELECT {', '.join(upd)} FROM beta{k} CROSS JOIN s{k})"
        )

    final = f"beta{n_steps}"
    m = margin_sql(final)
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT row_id, CAST({prob_sql(m)} AS DOUBLE) AS prob, "
        f"CAST(CASE WHEN {prob_sql(m)} > 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred "
        f"FROM b CROSS JOIN {final} ORDER BY row_id"
    )


def cartography_sql(
    feature_sqls: list[str],
    label_sql: str,
    row_id_sql: str,
    n_steps: int = 8,
    learning_rate: float = 1.0,
    scale: int = 10_000,
    table: str = "lineitem",
    where: str | None = None,
) -> str:
    """Dataset-cartography oracle (Swayamdipta et al., EMNLP'20 "Dataset
    Cartography"): replay the full logreg fit (same CTE chain as
    fit_predict_logreg_sql), then for EVERY training step k compute each
    row's snapped true-class probability ptu_k = y*p_k + (1-y)*(1-p_k) in
    integer micro-units, and report confidence sum_k(ptu_k) and the
    variability numerator K*sum(ptu^2) - (sum ptu)^2 — both exact
    BIGINTs (std and mean are monotone in these, so region thresholds
    compare integers, no float tie-break anywhere)."""
    p = len(feature_sqls)
    lr = float(learning_rate)
    k_steps = n_steps

    def xq_sql(expr: str) -> str:
        return f"CAST(floor(({expr}) * {float(scale)!r} + 0.5) AS BIGINT)"

    src_where = f" WHERE {where}" if where else ""
    base_cols = ", ".join(
        f"{xq_sql(e)} AS x{j}" for j, e in enumerate(feature_sqls)
    )
    ctes = [
        f"b AS MATERIALIZED (SELECT CAST({row_id_sql} AS BIGINT) AS row_id, "
        f"{base_cols}, CAST({label_sql} AS DOUBLE) AS y FROM {table}{src_where})",
        "beta0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0, "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS c{j}" for j in range(p))
        + ")",
    ]

    def margin_sql(src: str) -> str:
        m = f"{src}.b0"
        for j in range(p):
            t = f"(CAST(x{j} AS DOUBLE) / {float(scale)!r})"
            m = f"({m} + ({src}.c{j} * {t}))"
        return m

    def prob_sql(m: str) -> str:
        return (
            f"(floor((1.0 / (1.0 + exp(-({m})))) * {float(GRID)!r} + 0.5)"
            f" / {float(GRID)!r})"
        )

    for k in range(n_steps):
        m = margin_sql(f"beta{k}")
        gq = f"CAST(floor(({prob_sql(m)} - y) * {float(GRID)!r} + 0.5) AS BIGINT)"
        sgx = ", ".join(f"SUM(gq * x{j}) AS sgx_{j}" for j in range(p))
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n, "
            f"SUM(gq) AS sg, {sgx} "
            f"FROM (SELECT y, {', '.join(f'x{j}' for j in range(p))}, {gq} AS gq "
            f"FROM b CROSS JOIN beta{k}))"
        )
        upd = [f"beta{k}.b0 - {lr!r} * (s{k}.sg / (1000000.0 * s{k}.n)) AS b0"]
        for j in range(p):
            upd.append(
                f"beta{k}.c{j} - {lr!r} * (s{k}.sgx_{j} / "
                f"(1000000.0 * {scale} * s{k}.n)) AS c{j}"
            )
        ctes.append(
            f"beta{k + 1} AS MATERIALIZED (SELECT {', '.join(upd)} "
            f"FROM beta{k} CROSS JOIN s{k})"
        )

    betas = ", ".join(f"beta{k}" for k in range(1, n_steps + 1))
    ptus = []
    for k in range(1, n_steps + 1):
        pk = prob_sql(margin_sql(f"beta{k}"))
        pu = f"CAST(round({pk} * {float(GRID)!r}) AS BIGINT)"
        ptus.append(
            f"(CASE WHEN y = 1.0 THEN {pu} ELSE {GRID} - {pu} END) AS ptu{k}"
        )
    sum_pt = " + ".join(f"ptu{k}" for k in range(1, n_steps + 1))
    sum_pt2 = " + ".join(f"ptu{k} * ptu{k}" for k in range(1, n_steps + 1))
    return (
        "WITH "
        + ", ".join(ctes)
        + f", steps AS (SELECT row_id, CAST(y AS BIGINT) AS label, {', '.join(ptus)} "
        f"FROM b CROSS JOIN {betas})"
        f", stats AS (SELECT row_id, label, "
        f"CAST({sum_pt} AS BIGINT) AS conf_u, "
        f"CAST({k_steps} * ({sum_pt2}) - ({sum_pt}) * ({sum_pt}) AS BIGINT)"
        f" AS var_x FROM steps) "
        f"SELECT row_id, label, conf_u, var_x, "
        f"(CASE WHEN var_x >= {cartography_thresholds(n_steps)[2]} THEN 'ambiguous' "
        f"WHEN conf_u >= {cartography_thresholds(n_steps)[0]} THEN 'easy' "
        f"WHEN conf_u <= {cartography_thresholds(n_steps)[1]} THEN 'hard' "
        f"ELSE 'mid' END) AS region FROM stats ORDER BY row_id"
    )


def cartography_thresholds(n_steps: int) -> tuple[int, int, int]:
    """(easy conf_u >=, hard conf_u <=, ambiguous var_x >=) integer
    thresholds: mean true-class prob 0.75 / 0.25, std 0.15 — the usual
    cartography region cuts, cross-multiplied onto the exact integer
    statistics (conf_u = K*mean*1e6; var_x = K^2*std^2*1e12)."""
    return (
        (3 * n_steps * GRID) // 4,
        (n_steps * GRID) // 4,
        n_steps * n_steps * 22_500_000_000,
    )


# ---------------------------------------------------------------------------
# pure-Python twin (parity tests — the fit_hist_gbt_numpy convention)


def fit_logreg_numpy(
    X, y, n_steps: int = 8, learning_rate: float = 1.0, scale: int = 10_000
):
    """Bit-identical numpy replay of fit_logreg_gd (float64 everywhere,
    same snapping, same update parenthesization).  Returns (coefs,
    intercept)."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, p = X.shape
    xq = np.floor(X * float(scale) + 0.5).astype(np.int64)
    coefs = [0.0] * p
    intercept = 0.0
    lr = float(learning_rate)
    for _ in range(n_steps):
        m = np.full(n, intercept, dtype=np.float64)
        for j in range(p):
            t = xq[:, j].astype(np.float64) / float(scale)
            m = m + coefs[j] * t
        prob = np.floor((1.0 / (1.0 + np.exp(-m))) * float(GRID) + 0.5) / float(GRID)
        gq = np.floor((prob - y) * float(GRID) + 0.5).astype(np.int64)
        sg = int(gq.sum())
        intercept = intercept - lr * (sg / (1000000.0 * n))
        coefs = [
            coefs[j] - lr * (int((gq * xq[:, j]).sum()) / (1000000.0 * scale * n))
            for j in range(p)
        ]
    return coefs, intercept


# ---------------------------------------------------------------------------
# QUANTILE regression by the same fixed-step GD harness: pinball loss
# rho_tau(y - f), whose subgradient wrt f is -tau when y > f and (1-tau)
# otherwise (the y == f tie takes the (1-tau) branch on both engines).
# With tau on the 1e-6 grid the per-row gradient is EXACTLY one of two
# integers {-tau*1e6, (1-tau)*1e6} — no libm at all, so the whole fit is
# transcendental-free.  Reference anchor: the reference's regression
# trainers are squared-loss only (PGML regression, src/transpiler.py:
# 2032-2101); quantile regression extends the family to P50/P90 bands.


@dataclass
class QuantRegModel:
    feature_cols: list[str]
    coefs: list[float]
    intercept: float
    scale: int
    tau_micro: int  # tau * 1e6, exact
    n_steps: int
    learning_rate: float

    def prediction(self) -> Column:
        return _margin_expr(self.feature_cols, self.coefs, self.intercept, self.scale)


def quantile_gradient_relation(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    coefs: list[float],
    intercept: float,
    scale: int,
    tau_micro: int,
) -> DataFrame:
    """One-row relation of exact integer pinball-gradient sums: gq is
    -tau_micro when y > f else GRID - tau_micro."""
    m = _margin_expr(feature_cols, coefs, intercept, scale)
    y = F.col(label_col).cast("double")
    gq = (
        F.when(y > m, F.lit(-tau_micro)).otherwise(F.lit(GRID - tau_micro))
    ).cast("long")
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(gq).alias("sg")]
    for j, c in enumerate(feature_cols):
        aggs.append(F.sum(gq * _xq(c, scale)).alias(f"sgx_{j}"))
    return df.agg(*aggs)


def fit_quantile_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    tau_micro: int = 900_000,
    n_steps: int = 12,
    learning_rate: float = 1.0,
    scale: int = 10_000,
) -> QuantRegModel:
    """Fixed-step full-batch subgradient descent from beta = 0 — the
    fit_logreg_gd loop with the pinball gradient."""
    p = len(feature_cols)
    coefs = [0.0] * p
    intercept = 0.0
    lr = float(learning_rate)
    qdf = _gd_input(df, feature_cols, label_col, scale)
    try:
        for _ in range(n_steps):
            m = _margin_sql(p, coefs, intercept, scale)
            gq_sql = (
                f"CAST(CASE WHEN CAST(_y AS DOUBLE) > {m} THEN {-tau_micro} "
                f"ELSE {GRID - tau_micro} END AS BIGINT)"
            )
            row = _gd_step_row(qdf, p, gq_sql)
            n = row["n"]
            intercept = intercept - lr * (row["sg"] / (1000000.0 * n))
            coefs = [
                coefs[j] - lr * (row[f"sgx_{j}"] / (1000000.0 * scale * n))
                for j in range(p)
            ]
    finally:
        qdf.unpersist()
    return QuantRegModel(
        feature_cols=list(feature_cols), coefs=coefs, intercept=intercept,
        scale=scale, tau_micro=tau_micro, n_steps=n_steps, learning_rate=lr,
    )


def fit_predict_quantile_sql(
    feature_sqls: list[str],
    label_sql: str,
    row_id_sql: str,
    tau_micro: int = 900_000,
    n_steps: int = 12,
    learning_rate: float = 1.0,
    scale: int = 10_000,
    table: str = "lineitem",
) -> str:
    """Full quantile-regression training replay in DuckDB (the
    fit_predict_logreg_sql chain with the pinball gradient), scoring every
    row with the final coefficients (6dp-rounded predictions)."""
    p = len(feature_sqls)
    lr = float(learning_rate)

    def xq_sql(expr: str) -> str:
        return f"CAST(floor(({expr}) * {float(scale)!r} + 0.5) AS BIGINT)"

    base_cols = ", ".join(
        f"{xq_sql(e)} AS x{j}" for j, e in enumerate(feature_sqls)
    )
    ctes = [
        f"b AS MATERIALIZED (SELECT CAST({row_id_sql} AS BIGINT) AS row_id, "
        f"{base_cols}, CAST({label_sql} AS DOUBLE) AS y FROM {table})",
        "beta0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0, "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS c{j}" for j in range(p))
        + ")",
    ]

    def margin_sql(src: str) -> str:
        m = f"{src}.b0"
        for j in range(p):
            t = f"(CAST(x{j} AS DOUBLE) / {float(scale)!r})"
            m = f"({m} + ({src}.c{j} * {t}))"
        return m

    for k in range(n_steps):
        m = margin_sql(f"beta{k}")
        gq = (
            f"CAST(CASE WHEN y > {m} THEN {-tau_micro} "
            f"ELSE {GRID - tau_micro} END AS BIGINT)"
        )
        sgx = ", ".join(f"SUM(gq * x{j}) AS sgx_{j}" for j in range(p))
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n, SUM(gq) AS sg, {sgx} "
            f"FROM (SELECT y, {', '.join(f'x{j}' for j in range(p))}, {gq} AS gq "
            f"FROM b CROSS JOIN beta{k}))"
        )
        upd = [
            f"beta{k}.b0 - {lr!r} * (s{k}.sg / (1000000.0 * s{k}.n)) AS b0"
        ]
        for j in range(p):
            upd.append(
                f"beta{k}.c{j} - {lr!r} * (s{k}.sgx_{j} / "
                f"(1000000.0 * {scale} * s{k}.n)) AS c{j}"
            )
        ctes.append(
            f"beta{k + 1} AS MATERIALIZED (SELECT {', '.join(upd)} FROM beta{k} CROSS JOIN s{k})"
        )

    final = f"beta{n_steps}"
    m = margin_sql(final)
    return (
        "WITH "
        + ", ".join(ctes)
        # floor-snap, NOT round(,6): the margin is a raw (unsnapped)
        # double, and on exact-boundary cells Spark's round (exact-decimal
        # HALF_UP) and DuckDB's (float-scaled nearbyint, half-even)
        # disagree by 1e-6 — seen at sf0.001 row 5681.  floor(x*1e6+0.5)
        # is the same float op sequence in both engines, so it cannot.
        + f" SELECT row_id, CAST(floor({m} * 1000000.0 + 0.5) / 1000000.0 "
        "AS DOUBLE) AS qpred, "
        f"CAST(CASE WHEN y <= {m} THEN 1 ELSE 0 END AS BIGINT) AS under "
        f"FROM b CROSS JOIN {final} ORDER BY row_id"
    )


def fit_quantile_numpy(
    X, y, tau_micro: int = 900_000, n_steps: int = 12,
    learning_rate: float = 1.0, scale: int = 10_000,
):
    """Bit-identical numpy replay of fit_quantile_gd."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, p = X.shape
    xq = np.floor(X * float(scale) + 0.5).astype(np.int64)
    coefs = [0.0] * p
    intercept = 0.0
    lr = float(learning_rate)
    for _ in range(n_steps):
        m = np.full(n, intercept, dtype=np.float64)
        for j in range(p):
            t = xq[:, j].astype(np.float64) / float(scale)
            m = m + coefs[j] * t
        gq = np.where(y > m, -tau_micro, GRID - tau_micro).astype(np.int64)
        intercept = intercept - lr * (int(gq.sum()) / (1000000.0 * n))
        coefs = [
            coefs[j] - lr * (int((gq * xq[:, j]).sum()) / (1000000.0 * scale * n))
            for j in range(p)
        ]
    return coefs, intercept


# ---------------------------------------------------------------------------
# LINEAR SVM by the same fixed-step GD harness: L2-regularized hinge loss
# max(0, 1 - s*f) with s = 2y - 1, whose subgradient wrt f is -s when
# s*f < 1 and 0 otherwise (the s*f == 1 boundary takes the 0 branch on both
# engines via a strict <).  The per-row gradient is EXACTLY one of
# {-GRID, 0, +GRID} — like quantile regression the whole fit is
# transcendental-free.  The L2 term enters only the driver-side coefficient
# update (lam * c_j in written-order doubles), so per-step work stays one
# exact BIGINT aggregation.  Reference anchor: the in-DB classifier-training
# family (PGML `pgml.train` on 'classification', src/transpiler.py:
# 2032-2101); SVM extends it past logistic the way MADlib's svm module
# extends logregr_train.


@dataclass
class SVMModel:
    feature_cols: list[str]
    coefs: list[float]
    intercept: float
    scale: int
    lam: float
    n_steps: int
    learning_rate: float

    def margin(self) -> Column:
        return _margin_expr(self.feature_cols, self.coefs, self.intercept, self.scale)

    def prediction(self) -> Column:
        return (self.margin() > F.lit(0.0)).cast("long")


def svm_gradient_relation(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    coefs: list[float],
    intercept: float,
    scale: int,
) -> DataFrame:
    """One-row relation of exact integer hinge-gradient sums: with
    s = 2y - 1, gq = -s*GRID when s*f < 1 else 0 (BIGINT, order-free)."""
    m = _margin_expr(feature_cols, coefs, intercept, scale)
    s = F.lit(2.0) * F.col(label_col).cast("double") - F.lit(1.0)
    gq = (
        F.when((s * m) < F.lit(1.0), (-s) * F.lit(float(GRID))).otherwise(F.lit(0.0))
    ).cast("long")
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(gq).alias("sg")]
    for j, c in enumerate(feature_cols):
        aggs.append(F.sum(gq * _xq(c, scale)).alias(f"sgx_{j}"))
    return df.agg(*aggs)


def fit_svm_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lam: float = 0.01,
    n_steps: int = 12,
    learning_rate: float = 1.0,
    scale: int = 10_000,
) -> SVMModel:
    """Fixed-step full-batch subgradient descent from beta = 0 — the
    fit_logreg_gd driver loop with the hinge gradient and an L2 shrink
    term on the coefficients (intercept unregularized, as usual)."""
    p = len(feature_cols)
    coefs = [0.0] * p
    intercept = 0.0
    lr = float(learning_rate)
    lamf = float(lam)
    qdf = _gd_input(df, feature_cols, label_col, scale)
    # textual twin of  y_sign = 2.0·y − 1.0  (duplicated where the Column
    # form reused the subexpression — identical tree either way)
    ys = "((2.0D * CAST(_y AS DOUBLE)) - 1.0D)"
    for _ in range(n_steps):
        m = _margin_sql(p, coefs, intercept, scale)
        gq_sql = (
            f"CAST(CASE WHEN ({ys} * {m}) < 1.0D "
            f"THEN (-{ys}) * {float(GRID)!r}D ELSE 0.0D END AS BIGINT)"
        )
        row = _gd_step_row(qdf, p, gq_sql)
        n = row["n"]
        intercept = intercept - lr * (row["sg"] / (1000000.0 * n))
        coefs = [
            coefs[j]
            - lr * (row[f"sgx_{j}"] / (1000000.0 * scale * n) + lamf * coefs[j])
            for j in range(p)
        ]
    qdf.unpersist()
    return SVMModel(
        feature_cols=list(feature_cols), coefs=coefs, intercept=intercept,
        scale=scale, lam=lamf, n_steps=n_steps, learning_rate=lr,
    )


def fit_predict_svm_sql(
    feature_sqls: list[str],
    label_sql: str,
    row_id_sql: str,
    lam: float = 0.01,
    n_steps: int = 12,
    learning_rate: float = 1.0,
    scale: int = 10_000,
    table: str = "lineitem",
) -> str:
    """Full linear-SVM training replay in DuckDB (the fit_predict_logreg_sql
    chain with the hinge gradient and L2-shrunk coefficient updates),
    scoring every row with the final hyperplane."""
    p = len(feature_sqls)
    lr = float(learning_rate)
    lamf = float(lam)

    def xq_sql(expr: str) -> str:
        return f"CAST(floor(({expr}) * {float(scale)!r} + 0.5) AS BIGINT)"

    base_cols = ", ".join(
        f"{xq_sql(e)} AS x{j}" for j, e in enumerate(feature_sqls)
    )
    ctes = [
        f"b AS MATERIALIZED (SELECT CAST({row_id_sql} AS BIGINT) AS row_id, "
        f"{base_cols}, (2.0 * CAST({label_sql} AS DOUBLE) - 1.0) AS s FROM {table})",
        "beta0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0, "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS c{j}" for j in range(p))
        + ")",
    ]

    def margin_sql(src: str) -> str:
        m = f"{src}.b0"
        for j in range(p):
            t = f"(CAST(x{j} AS DOUBLE) / {float(scale)!r})"
            m = f"({m} + ({src}.c{j} * {t}))"
        return m

    for k in range(n_steps):
        m = margin_sql(f"beta{k}")
        gq = (
            f"CAST(CASE WHEN (s * {m}) < 1.0 "
            f"THEN (-s) * {float(GRID)!r} ELSE 0.0 END AS BIGINT)"
        )
        sgx = ", ".join(f"SUM(gq * x{j}) AS sgx_{j}" for j in range(p))
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n, SUM(gq) AS sg, {sgx} "
            f"FROM (SELECT s, {', '.join(f'x{j}' for j in range(p))}, {gq} AS gq "
            f"FROM b CROSS JOIN beta{k}))"
        )
        upd = [
            f"beta{k}.b0 - {lr!r} * (s{k}.sg / (1000000.0 * s{k}.n)) AS b0"
        ]
        for j in range(p):
            upd.append(
                f"beta{k}.c{j} - {lr!r} * (s{k}.sgx_{j} / "
                f"(1000000.0 * {scale} * s{k}.n) + {lamf!r} * beta{k}.c{j}) AS c{j}"
            )
        ctes.append(
            f"beta{k + 1} AS MATERIALIZED (SELECT {', '.join(upd)} FROM beta{k} CROSS JOIN s{k})"
        )

    final = f"beta{n_steps}"
    m = margin_sql(final)
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT row_id, CAST(round({m}, 6) AS DOUBLE) AS margin6, "
        f"CAST(CASE WHEN {m} > 0.0 THEN 1 ELSE 0 END AS BIGINT) AS pred "
        f"FROM b CROSS JOIN {final} ORDER BY row_id"
    )


def fit_svm_numpy(
    X, y, lam: float = 0.01, n_steps: int = 12,
    learning_rate: float = 1.0, scale: int = 10_000,
):
    """Bit-identical numpy replay of fit_svm_gd."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, p = X.shape
    xq = np.floor(X * float(scale) + 0.5).astype(np.int64)
    s = 2.0 * y - 1.0
    coefs = [0.0] * p
    intercept = 0.0
    lr = float(learning_rate)
    lamf = float(lam)
    for _ in range(n_steps):
        m = np.full(n, intercept, dtype=np.float64)
        for j in range(p):
            t = xq[:, j].astype(np.float64) / float(scale)
            m = m + coefs[j] * t
        gq = np.where(s * m < 1.0, (-s) * float(GRID), 0.0).astype(np.int64)
        intercept = intercept - lr * (int(gq.sum()) / (1000000.0 * n))
        coefs = [
            coefs[j]
            - lr * (int((gq * xq[:, j]).sum()) / (1000000.0 * scale * n)
                    + lamf * coefs[j])
            for j in range(p)
        ]
    return coefs, intercept
