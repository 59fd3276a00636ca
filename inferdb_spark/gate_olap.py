"""Gate queries: OLAP completeness — rollup/grouping sets, intersect/except,
range join.  Not in the reference's surface (SURVEY notes their absence);
a general engine replacing it needs them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import gate

PRICE_BANDS = [  # (band_id, lo, hi) — half-open [lo, hi)
    (0, 0.0, 25000.0),
    (1, 25000.0, 50000.0),
    (2, 50000.0, 75000.0),
    (3, 75000.0, 1e9),
]


@gate(
    "rollup_revenue",
    oracle="""
    SELECT coalesce(l_returnflag, '(all)') AS rflag,
           coalesce(l_linestatus, '(all)') AS lstatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping-id disambiguation (subtotal rows keyed by
    sentinel + gid so NULL-as-data and NULL-as-subtotal can't collide)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.sum(cents).alias("cents"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("lstatus"),
            "gid", "cents", "n",
        )
    )


@gate(
    "intersect_except",
    oracle="""
    WITH q1 AS (SELECT DISTINCT o_custkey FROM orders WHERE month(o_orderdate) <= 6),
         q2 AS (SELECT DISTINCT o_custkey FROM orders WHERE month(o_orderdate) > 6)
    SELECT 'both' AS tag, CAST(count(*) AS BIGINT) AS n FROM (SELECT * FROM q1 INTERSECT SELECT * FROM q2)
    UNION ALL
    SELECT 'only_h1', CAST(count(*) AS BIGINT) FROM (SELECT * FROM q1 EXCEPT SELECT * FROM q2)
    UNION ALL
    SELECT 'only_h2', CAST(count(*) AS BIGINT) FROM (SELECT * FROM q2 EXCEPT SELECT * FROM q1)
    """,
)
def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct semantics) — customers active in both
    halves of the year vs only one."""
    o = load_table(spark, sf_dir, "orders")
    q1 = o.filter(F.month("o_orderdate") <= 6).select("o_custkey").distinct()
    q2 = o.filter(F.month("o_orderdate") > 6).select("o_custkey").distinct()
    spark_df = q1.sparkSession.createDataFrame
    rows = [
        ("both", q1.intersect(q2).count()),
        ("only_h1", q1.exceptAll(q2).distinct().count()),
        ("only_h2", q2.exceptAll(q1).distinct().count()),
    ]
    return spark_df(rows, "tag string, n long")


@gate(
    "range_join_bands",
    oracle=f"""
    WITH bands AS (
      SELECT * FROM (VALUES {", ".join(f"({b}, {lo!r}, {hi!r})" for b, lo, hi in PRICE_BANDS)})
        AS t(band_id, lo, hi)
    )
    SELECT b.band_id, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_id
    """,
)
def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a small band table: broadcast
    nested-loop join — the right plan when one side is tiny; the
    bucketize-then-equi-join construction covers the big-big case
    (SURVEY §2.3 notes the reference has no range joins)."""
    o = load_table(spark, sf_dir, "orders")
    bands = o.sparkSession.createDataFrame(
        PRICE_BANDS, "band_id int, lo double, hi double"
    )
    joined = o.join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    )
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )
