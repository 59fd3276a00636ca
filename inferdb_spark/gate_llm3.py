"""Round-3 LLM-training-data gates (beyond-reference surface).

Shared-literal rule throughout: centroids/planes/thresholds are Python
constants formatted into BOTH the Column tree and the DuckDB oracle.
Cross-engine float discipline: cluster ranking keys are quantized to
BIGINT micro-units (floor(x*1e6+0.5)) before any ordering decision, so
ULP differences between JVM and libm cannot flip a keep/drop choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import gate

# 4 patterned 64-dim centroids at embedding scale (~±0.3)
SD_CENTROIDS = [
    [((i * (j + 2)) % 7 - 3) / 10.0 for i in range(64)] for j in range(4)
]
SD_THRESHOLD = 0.3
SD_DIM = 64

_SD_CENT_SQL = ", ".join(
    "(" + str(j) + ", ["
    + ", ".join(repr(float(x)) for x in c)
    + "]::DOUBLE[])"
    for j, c in enumerate(SD_CENTROIDS)
)


def _d_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {SD_DIM}), "
        f"i -> cast({a}[i] as double) * {b}[i]))"
    )


def _d_dot_ee(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {SD_DIM}), "
        f"i -> cast({a}[i] as double) * cast({b}[i] as double)))"
    )


@gate(
    "semantic_dedup",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
    ),
    cl AS (SELECT * FROM (VALUES {_SD_CENT_SQL}) AS t(cid, cv)),
    d AS (
      SELECT e.vec_id, e.embedding, cl.cid,
             list_sum(list_transform(generate_series(1, {SD_DIM}),
                 i -> (cast(e.embedding[i] as double) - cl.cv[i])
                    * (cast(e.embedding[i] as double) - cl.cv[i]))) AS dsq,
             {_d_dot('e.embedding', 'cl.cv')}
               / (sqrt({_d_dot_ee('e.embedding', 'e.embedding')})
                * sqrt({_d_dot_ee('cl.cv', 'cl.cv')})) AS ccos
      FROM e CROSS JOIN cl
    ),
    m AS (SELECT vec_id, min(dsq) AS md FROM d GROUP BY vec_id),
    asg0 AS (
      SELECT d.vec_id, min(d.cid) AS cluster
      FROM d JOIN m ON d.vec_id = m.vec_id AND d.dsq = m.md
      GROUP BY d.vec_id
    ),
    asg AS (
      SELECT a0.vec_id, a0.cluster,
             CAST(floor(d.ccos * 1000000.0 + 0.5) AS BIGINT) AS ccos_q,
             d.embedding
      FROM asg0 a0 JOIN d ON d.vec_id = a0.vec_id AND d.cid = a0.cluster
    ),
    losers AS (
      SELECT DISTINCT x.vec_id
      FROM asg x JOIN asg y
        ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
       AND (y.ccos_q < x.ccos_q
            OR (y.ccos_q = x.ccos_q AND y.vec_id < x.vec_id))
      WHERE {_d_dot_ee('x.embedding', 'y.embedding')}
            / (sqrt({_d_dot_ee('x.embedding', 'x.embedding')})
             * sqrt({_d_dot_ee('y.embedding', 'y.embedding')}))
            >= {SD_THRESHOLD!r}
    )
    SELECT a.vec_id, CAST(a.cluster AS INT) AS cluster, a.ccos_q
    FROM asg a LEFT JOIN losers l ON a.vec_id = l.vec_id
    WHERE l.vec_id IS NULL
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table (operators/similarity.
    semantic_dedup; Abbas et al. 2023): nearest-literal-centroid assign
    (map-only) -> within-cluster cosine pairs (one shuffle on cluster id)
    -> greedy keep-lowest-(ccos_q, id).  The vec_id % 5 stratum keeps the
    oracle's cluster self-join scale-proportionate (fixed modulus =
    corpus-linear slice)."""
    from inferdb_spark.operators.similarity import semantic_dedup

    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 5 == 0
    )
    out = semantic_dedup(
        e, "embedding", SD_CENTROIDS, threshold=SD_THRESHOLD
    )
    return out.select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        F.col("ccos_q").cast("long").alias("ccos_q"),
    )
