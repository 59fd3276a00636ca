"""Vector math over ArrayType(Double) columns — JVM-side, no UDFs.

Dot products / norms fold left-to-right via F.aggregate so results are
deterministic (and bit-identical to a sequential oracle).  For wide vectors
in genuinely hot paths, scoring.py offers a Pandas-UDF numpy alternative;
these expression forms keep everything inside whole-stage codegen and are
the default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i, sequential fold (reference dot_product UDF,
    sql_scripts/dot_product.sql:1-13, was unnest+zip+sum)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_sq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(norm_sq(a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(|a||b|); 0 when either norm is 0."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def dot_literal(a: Column, weights: list[float]) -> Column:
    """Dot product against a driver-side literal weight vector, emitted as a
    flat arithmetic expression (stays in codegen; no array materialization).
    This is the dense fast path for linear scoring: zero shuffle, zero join."""
    expr = F.lit(0.0)
    for i, w in enumerate(weights):
        if w != 0.0:
            expr = expr + F.element_at(a, i + 1) * F.lit(float(w))
    return expr
