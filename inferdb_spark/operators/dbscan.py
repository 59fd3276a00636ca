"""Grid-blocked DBSCAN (Ester et al. KDD'96) as a relational composition.

No reference counterpart (the reference's clustering is kmeans through
PGML/MADlib, src/transpiler.py:2382-2466); DBSCAN extends the in-engine
clustering family to density-based clusters with noise, composed entirely
from operators this engine already has:

1. GRID BLOCKING: quantize points to integer cents, bucket into eps-sized
   cells.  A point's eps-neighbors can only live in the 3x3 neighboring
   cells, so the candidate join is an EQUI-join on cell id after a 9-way
   literal offset explode — never an all-pairs join.  At 100 TB the cell
   id is a partition key: candidate generation shuffles once on cell.
2. CORE POINTS: neighbor count (self included, the textbook definition)
   >= min_pts, from one groupBy over the candidate pairs.
3. CLUSTERS: connected components (operators/graph.py min-label + path
   halving) over core-core eps-edges; cluster label = lowest core id.
4. BORDERS: non-core points adopt the LOWEST cluster label among their
   core eps-neighbors (deterministic tie-break); everything else is
   noise (-1).

Distance tests are exact BIGINT arithmetic ((dx^2 + dy^2) <= eps_q^2) —
no float anywhere, so the relation replays bit-identically in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _cells(pts: DataFrame, eps_q: int) -> DataFrame:
    e = float(eps_q)
    return pts.withColumn(
        "cx", F.floor(F.col("px").cast("double") / F.lit(e)).cast("long")
    ).withColumn(
        "cy", F.floor(F.col("py").cast("double") / F.lit(e)).cast("long")
    )


def neighbor_pairs(pts: DataFrame, eps_q: int, id_col: str = "pid") -> DataFrame:
    """(ai, bi) for every ordered pair within eps (self-pairs included —
    the textbook eps-neighborhood contains the point).  Equi-join on the
    3x3-exploded cell key; the exact distance test prunes the candidates."""
    cells = _cells(pts, eps_q)
    off = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in _OFFSETS
            ]
        )
    )
    a = cells.withColumn("o", off).select(
        F.col(id_col).alias("ai"),
        F.col("px").alias("ax"),
        F.col("py").alias("ay"),
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = cells.select(
        F.col(id_col).alias("bi"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        "cx",
        "cy",
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return a.join(
        b, (F.col("jx") == F.col("cx")) & (F.col("jy") == F.col("cy"))
    ).where(d2 <= F.lit(eps_q * eps_q)).select("ai", "bi")


def dbscan(
    pts: DataFrame,
    eps_q: int,
    min_pts: int,
    id_col: str = "pid",
) -> DataFrame:
    """Full DBSCAN over an integer-quantized point relation
    (`id_col`, px, py).  Returns (`id_col`, is_core, cluster) with
    cluster = lowest member core id, -1 for noise."""
    from inferdb_spark.operators.graph import connected_components

    pairs = neighbor_pairs(pts, eps_q, id_col=id_col)
    # pairs feeds three consumers (degree, core edges, border adoption) —
    # materialize once, eagerly, without leaving CacheManager residue
    pairs = pairs.localCheckpoint(eager=True)
    deg = pairs.groupBy("ai").agg(F.count(F.lit(1)).cast("long").alias("c"))
    core = deg.where(F.col("c") >= F.lit(min_pts)).select("ai")
    # core is data-scale: no broadcast hint — AQE picks the strategy
    core_edges = (
        pairs.join(core, "ai", "semi")
        .join(core.select(F.col("ai").alias("bi")), "bi", "semi")
        .select(F.col("ai").alias("src"), F.col("bi").alias("dst"))
    )
    comp = connected_components(core_edges, "src", "dst").select(
        F.col("node").alias("ai"), F.col("component").cast("long").alias("cluster")
    )
    border = (
        pairs.join(core, "ai", "anti")
        .join(comp.select(F.col("ai").alias("bi"), "cluster"), "bi")
        .groupBy("ai")
        .agg(F.min("cluster").alias("cluster"))
    )
    is_core = F.when(F.col("core_c").isNotNull(), 1).otherwise(0).cast("long")
    out = (
        pts.select(F.col(id_col).alias("ai"))
        .join(core.withColumn("core_c", F.lit(1)), "ai", "left")
        .join(comp.withColumnRenamed("cluster", "core_cluster"), "ai", "left")
        .join(border.withColumnRenamed("cluster", "border_cluster"), "ai", "left")
        .select(
            F.col("ai").alias(id_col),
            is_core.alias("is_core"),
            F.coalesce(
                F.col("core_cluster"), F.col("border_cluster"), F.lit(-1)
            )
            .cast("long")
            .alias("cluster"),
        )
    )
    return out
