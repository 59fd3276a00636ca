"""2-D skyline (Pareto frontier) as a domain-sized window, not a
pairwise dominance join.

A row (x, y) with x to MINIMIZE and y to MAXIMIZE is dominated iff some
other row has x' <= x and y' >= y with at least one strict.  The naive
formulation is a quadratic self-join; the classic sort-scan algorithm is
a sequential driver loop.  This implementation keeps the whole thing
relational and domain-bounded:

1. group rows by x — per distinct x keep gmax = max(y) and the
   multiplicity of (x, gmax);
2. ONE cumulative-max window over the DISTINCT-x relation ascending
   (rows between unbounded preceding and 1 preceding) gives, for each x,
   the best y among all strictly cheaper x;
3. a point survives iff y = gmax(x) (nothing at the same x beats it
   strictly) AND y > prevmax(x) (nothing strictly cheaper ties-or-beats
   it).  Equal duplicates of a skyline point all survive (no strict
   dominance between equals), reported via their multiplicity.

Scale: the only ordered pass runs over DISTINCT x values (a price/size
domain, not the row count); everything before it is a map-side
combinable aggregation.  This extends the engine's OLAP set (cube /
rollup / windows, gate_olap.py) with the multi-criteria shortlist
operator the reference's SQL surface lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Pareto-optimal (minimize, maximize) points with multiplicities.

    Returns (x, y, n_rows): the undominated value pairs and how many
    input rows carry each.  Null measures are excluded (they can neither
    dominate nor be ranked).
    """
    pts = df.filter(
        F.col(minimize).isNotNull() & F.col(maximize).isNotNull()
    ).select(F.col(minimize).alias("x"), F.col(maximize).alias("y"))
    per_xy = pts.groupBy("x", "y").agg(F.count("*").alias("n_rows"))
    per_x = per_xy.groupBy("x").agg(F.max("y").alias("gmax"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    # rename the frontier's columns before joining back: per_x derives
    # from per_xy, and Spark's ambiguous-self-join check (rightly)
    # refuses lineage-shared column references
    frontier = (
        per_x.select("x", "gmax", F.max("gmax").over(w).alias("prevmax"))
        .filter(F.col("prevmax").isNull() | (F.col("gmax") > F.col("prevmax")))
        .select(F.col("x").alias("fx"), F.col("gmax").alias("fy"))
    )
    return per_xy.join(
        frontier,
        (per_xy["x"] == F.col("fx")) & (per_xy["y"] == F.col("fy")),
    ).select("x", "y", "n_rows")
