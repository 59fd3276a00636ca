"""Preprocessing operators: impute, scale, one-hot — fit via Spark
aggregations, apply via pure projections.

These are the reference's transpiled sklearn stages
(src/transpiler.py:593-835): SimpleImputer -> CASE WHEN f IS NULL THEN mean,
RobustScaler -> (f-center)/scale, OneHotEncoder -> CASE WHEN f='cat'.
Fit state is a plain dict of floats (the analog of burning stats into SQL
literals); apply is one withColumns projection — map-only, codegen'd,
shuffle-free at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ImputerModel:
    """Per-column fill statistics (src/transpiler.py:593-685)."""

    fill: dict[str, float | str] = field(default_factory=dict)

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumns(
            {c: F.coalesce(F.col(c), F.lit(v)) for c, v in self.fill.items()}
        )


def fit_mean_imputer(df: DataFrame, columns: list[str]) -> ImputerModel:
    row = df.agg(*[F.avg(F.col(c).cast("double")).alias(c) for c in columns]).first()
    return ImputerModel(fill={c: float(row[c]) for c in columns if row[c] is not None})


def fit_mode_imputer(df: DataFrame, columns: list[str]) -> ImputerModel:
    """Most-frequent fill for categoricals; lowest-value tiebreak."""
    fill: dict[str, float | str] = {}
    for c in columns:
        r = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c)
            .count()
            .orderBy(F.desc("count"), F.asc(c))
            .first()
        )
        if r is not None:
            fill[c] = r[0]
    return ImputerModel(fill=fill)


@dataclass
class RobustScalerModel:
    """(f - median) / IQR per column (src/transpiler.py:727-750)."""

    center: dict[str, float]
    scale: dict[str, float]

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumns(
            {
                c: (F.col(c) - F.lit(self.center[c])) / F.lit(self.scale[c] or 1.0)
                for c in self.center
            }
        )


def fit_robust_scaler(
    df: DataFrame, columns: list[str], relative_error: float = 0.0
) -> RobustScalerModel:
    qs = df.approxQuantile(columns, [0.25, 0.5, 0.75], relative_error)
    center, scale = {}, {}
    for c, (q1, q2, q3) in zip(columns, qs):
        center[c] = q2
        scale[c] = (q3 - q1) or 1.0
    return RobustScalerModel(center=center, scale=scale)


@dataclass
class OneHotModel:
    """Category lists per column, fitted from distinct()
    (src/transpiler.py:752-766)."""

    categories: dict[str, list[str]]
    drop_input: bool = True

    def transform(self, df: DataFrame) -> DataFrame:
        cols = {}
        for c, cats in self.categories.items():
            for i, cat in enumerate(cats):
                cols[f"{c}_oh_{i}"] = (
                    F.when(F.col(c).cast("string") == cat, 1).otherwise(0)
                )
        out = df.withColumns(cols)
        return out.drop(*self.categories) if self.drop_input else out


def fit_one_hot(df: DataFrame, columns: list[str]) -> OneHotModel:
    cats = {}
    for c in columns:
        vals = [
            r[0]
            for r in df.select(F.col(c).cast("string"))
            .filter(F.col(c).isNotNull())
            .distinct()
            .orderBy(c)
            .collect()
        ]
        cats[c] = vals
    return OneHotModel(categories=cats)


def fit_datetime_mean_imputer(df: DataFrame, columns: list[str]) -> dict[str, int]:
    """Datetime mean fill values (epoch seconds) — the reference's
    int64-view mean (src/featurizers/nyc_rides_featurizer.py:77-83).
    Apply with `impute_datetime`."""
    row = df.agg(
        *[F.avg(F.unix_timestamp(F.col(c))).alias(c) for c in columns]
    ).first()
    return {c: int(row[c]) for c in columns if row[c] is not None}


def impute_datetime(df: DataFrame, fill: dict[str, int]) -> DataFrame:
    return df.withColumns(
        {
            c: F.coalesce(F.col(c), F.timestamp_seconds(F.lit(v)))
            for c, v in fill.items()
        }
    )


def positional_rename(
    df: DataFrame, columns: list[str], prefix: str = "f_"
) -> DataFrame:
    """Passthrough/remainder projection with positional f_i names (P4,
    src/transpiler.py:768-783) — the reference's generated-schema
    convention for model inputs."""
    return df.select(
        *[F.col(c).alias(f"{prefix}{i}") for i, c in enumerate(columns)]
    )


def outlier_bounds_iqr(
    df: DataFrame, column: str, k: float = 3.0, relative_error: float = 0.0
) -> tuple[float, float]:
    """IQR cutoff bounds (src/featurizers/nyc_rides_featurizer.py:165-172:
    q25/q75 ± k*IQR)."""
    q1, q3 = df.approxQuantile(column, [0.25, 0.75], relative_error)
    iqr = q3 - q1
    return q1 - k * iqr, q3 + k * iqr


def impute_outliers_linear(
    df: DataFrame,
    column: str,
    bounds: tuple[float, float],
    intercept: float,
    coef: dict[str, float],
) -> DataFrame:
    """CASE WHEN f BETWEEN lo AND hi THEN f ELSE b0 + Σ b_i*f_i — the
    reference's learned outlier imputation
    (src/featurizers/create_featurizer_pg.py:173-216)."""
    lo, hi = bounds
    pred = F.lit(float(intercept))
    for c, w in coef.items():
        pred = pred + F.col(c) * F.lit(float(w))
    cond = (F.col(column) >= lo) & (F.col(column) <= hi)
    return df.withColumn(column, F.when(cond, F.col(column)).otherwise(pred))
