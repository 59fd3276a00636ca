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


_CC_ORACLE = """
    WITH RECURSIVE sel AS (
      SELECT l.l_orderkey AS ok, CAST(l.l_partkey AS BIGINT) AS pk
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate >= DATE '1995-01-01' AND o.o_orderdate < DATE '1996-01-01'
        AND l.l_partkey % 10 = 0
    ),
    edges0 AS (
      SELECT DISTINCT a.pk AS src, b.pk AS dst
      FROM sel a JOIN sel b ON a.ok = b.ok AND a.pk < b.pk
    ),
    edges AS (
      SELECT src, dst FROM edges0 UNION ALL SELECT dst AS src, src AS dst FROM edges0
    ),
    nodes AS (SELECT DISTINCT pk AS node FROM sel),
    labels(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, l.lbl FROM labels l JOIN edges e ON e.src = l.node
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(min(lbl) AS BIGINT) AS component
    FROM labels GROUP BY node
"""


def _cc_edge_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared co-purchase pair graph for the two CC gates: parts bought in
    the same 1995 order (partkey sampled 1-in-10 to bound the oracle's
    recursive-CTE blowup), with self-loops for isolated nodes."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    sel = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
            & (F.col("l_partkey") % 10 == 0)
        )
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").cast("long").alias("pk"))
    )
    a, b = sel.alias("a"), sel.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    # isolated nodes enter as self-loops so every node gets a component
    nodes = sel.select(F.col("pk").alias("src"), F.col("pk").alias("dst")).distinct()
    return pairs.union(nodes)


@gate("connected_components", oracle=_CC_ORACLE)
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment as distributed connected components
    (operators/graph.py): the graph is parts co-purchased in the same
    1995 order (sampled 1-in-10 by partkey to bound the oracle's
    recursive-CTE blowup); component = min partkey.  The oracle computes
    the same fixpoint by recursive label propagation; Spark computes it
    by iterative min-label propagation with path halving.  The reference
    has no graph operator (SURVEY §2.7) — this closes the LSH-pairs →
    duplicate-groups step of the dedup pipeline."""
    from inferdb_spark.operators.graph import connected_components

    cc = connected_components(_cc_edge_relation(spark, sf_dir), "src", "dst")
    return cc.select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )


@gate("connected_components_star", oracle=_CC_ORACLE)
def q_connected_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same component fixpoint as gate:connected_components, computed by
    the alternating large-star/small-star algorithm (Kiveris et al.,
    SoCC'14; operators/graph.connected_components_star) — the variant
    whose per-round shuffle volume SHRINKS with the edge set, preferred
    when the edge list dwarfs the node set (see DESIGN_SCALE.md).  Both
    algorithms must agree with the recursive-CTE oracle exactly."""
    from inferdb_spark.operators.graph import connected_components_star

    cc = connected_components_star(_cc_edge_relation(spark, sf_dir), "src", "dst")
    return cc.select(
        F.col("node").cast("long").alias("node"),
        F.col("component").cast("long").alias("component"),
    )


@gate(
    "cube_volume",
    oracle="""
    SELECT coalesce(CAST(year(o_orderdate) AS BIGINT), -1) AS yr,
           coalesce(o_orderpriority, '(all)') AS prio,
           CAST(GROUPING(year(o_orderdate), o_orderpriority) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    GROUP BY CUBE(year(o_orderdate), o_orderpriority)
    """,
)
def q_cube_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (year, priority) with grouping_id disambiguation —
    completes the grouping-sets family next to rollup_revenue."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("yr0", F.year("o_orderdate"))
        .cube("yr0", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
        .select(
            F.coalesce(F.col("yr0").cast("long"), F.lit(-1)).alias("yr"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("prio"),
            "gid", "n", "cents",
        )
    )


@gate(
    "window_value_functions",
    oracle="""
    WITH w AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(round(o_totalprice*100) AS BIGINT) AS cents,
             CAST(round(percent_rank() OVER
                 (PARTITION BY o_custkey ORDER BY o_orderkey), 6) AS DOUBLE) AS prank,
             CAST(round(cume_dist() OVER
                 (PARTITION BY o_custkey ORDER BY o_orderkey), 6) AS DOUBLE) AS cdist,
             CAST(first_value(o_orderkey) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS first_ok,
             CAST(last_value(o_orderkey) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS last_ok,
             CAST(nth_value(o_orderkey, 2) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS second_ok
      FROM orders
    )
    SELECT CAST(o_custkey AS BIGINT) AS custkey, CAST(o_orderkey AS BIGINT) AS orderkey,
           prank, cdist, first_ok, last_ok, second_ok
    FROM w WHERE o_custkey % 100 = 0
    """,
)
def q_window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / first_value / last_value / nth_value —
    the window value-function battery (SURVEY §2.5 lists only
    row_number/rank in the reference; a replacement engine needs the full
    family).  last/nth use an explicit unbounded frame: the default frame
    for ordered windows stops at CURRENT ROW in both engines, which would
    make last_value degenerate."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    by_key = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    by_date = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = by_date.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            F.col("o_custkey").cast("long").alias("custkey"),
            F.col("o_orderkey").cast("long").alias("orderkey"),
            F.round(F.percent_rank().over(by_key), 6).cast("double").alias("prank"),
            F.round(F.cume_dist().over(by_key), 6).cast("double").alias("cdist"),
            F.first("o_orderkey").over(by_date).cast("long").alias("first_ok"),
            F.last("o_orderkey").over(full).cast("long").alias("last_ok"),
            F.nth_value("o_orderkey", 2).over(full).cast("long").alias("second_ok"),
            F.col("o_custkey").alias("ck0"),
        )
        .filter(F.col("ck0") % 100 == 0)
        .drop("ck0")
    )


@gate(
    "correlated_above_avg",
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(o.o_custkey AS BIGINT) AS custkey,
           CAST(count(*) AS BIGINT) AS n_above,
           CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents_above
    FROM orders o JOIN c ON o.o_custkey = c.o_custkey
    WHERE CAST(round(o.o_totalprice*100) AS BIGINT) * c.n > c.sum_cents
    GROUP BY o.o_custkey
    """,
)
def q_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery pattern ('orders above this customer's
    average'), decorrelated into a window aggregate on the Spark side —
    one shuffle, no per-row subquery.  The above-average comparison is
    integer cross-multiplication (cents*n > sum_cents), never a float
    average: double averages are shuffle-order-dependent and would break
    cross-engine equality at the boundary."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey")
    enriched = o.select(
        F.col("o_custkey").cast("long").alias("custkey"),
        cents.alias("cents"),
    ).select(
        "custkey",
        "cents",
        F.sum("cents").over(w.partitionBy("custkey")).alias("sum_cents"),
        F.count("*").over(w.partitionBy("custkey")).alias("n"),
    )
    return (
        enriched.filter(F.col("cents") * F.col("n") > F.col("sum_cents"))
        .groupBy("custkey")
        .agg(F.count("*").alias("n_above"), F.sum("cents").alias("cents_above"))
    )


@gate(
    "full_outer_reconcile",
    oracle="""
    WITH c AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_orders
               FROM orders GROUP BY o_custkey),
         u AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY user_id)
    SELECT CAST(coalesce(c.k, u.k) AS BIGINT) AS k,
           CAST(coalesce(c.n_orders, -1) AS BIGINT) AS n_orders,
           CAST(coalesce(u.n_events, -1) AS BIGINT) AS n_events,
           CASE WHEN c.k IS NULL THEN 'right_only'
                WHEN u.k IS NULL THEN 'left_only' ELSE 'both' END AS side
    FROM c FULL OUTER JOIN u ON c.k = u.k
    """,
)
def q_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join reconciliation of two aggregates over different
    domains (customers with orders vs users with events) — the join kind
    missing from the reference's equi/left/cross surface (SURVEY §2.3).
    Sentinel -1 for absent sides keeps the output hashable."""
    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    c = o.groupBy(F.col("o_custkey").alias("ck")).agg(F.count("*").alias("n_orders"))
    u = ev.groupBy(F.col("user_id").alias("uk")).agg(F.count("*").alias("n_events"))
    j = c.join(u, c["ck"] == u["uk"], "full_outer")
    return j.select(
        F.coalesce("ck", "uk").cast("long").alias("k"),
        F.coalesce("n_orders", F.lit(-1)).cast("long").alias("n_orders"),
        F.coalesce("n_events", F.lit(-1)).cast("long").alias("n_events"),
        F.when(F.col("ck").isNull(), "right_only")
        .when(F.col("uk").isNull(), "left_only")
        .otherwise("both")
        .alias("side"),
    )


@gate(
    "null_safe_join",
    oracle="""
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderpriority = '5-LOW' THEN NULL ELSE o_orderpriority END AS prio
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    d AS (
      SELECT * FROM (VALUES ('1-URGENT', 100), ('2-HIGH', 80), (NULL, 0)) AS t(prio, score)
    )
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(coalesce(d.score, -1) AS BIGINT) AS score,
           coalesce(l.prio, '(null)') AS prio
    FROM l LEFT JOIN d ON l.prio IS NOT DISTINCT FROM d.prio
    GROUP BY d.score, l.prio
    """,
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark <=> / SQL IS NOT DISTINCT FROM):
    NULL keys MATCH null dim rows instead of dropping — the semantic gap
    between '=' joins and dimension tables with an explicit unknown
    bucket."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    l = o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "5-LOW", F.lit(None)).otherwise(
            F.col("o_orderpriority")
        ).alias("prio"),
    )
    d = spark.createDataFrame(
        [("1-URGENT", 100), ("2-HIGH", 80), (None, 0)], "dprio string, score int"
    )
    j = l.join(F.broadcast(d), l["prio"].eqNullSafe(d["dprio"]), "left")
    return j.groupBy(
        F.coalesce("score", F.lit(-1)).cast("long").alias("score"),
        F.coalesce("prio", F.lit("(null)")).alias("prio"),
    ).agg(F.count("*").alias("n"))


@gate(
    "hof_battery",
    oracle="""
    WITH a AS (
      SELECT l_orderkey, list(CAST(l_quantity AS BIGINT) ORDER BY l_linenumber, l_partkey) AS qtys
      FROM lineitem WHERE l_orderkey % 25 = 0 GROUP BY l_orderkey
    )
    SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
           CAST(list_sum(list_transform(qtys, q -> q * 2 + 1)) AS BIGINT) AS sum_affine,
           CAST(len(list_filter(qtys, q -> q > 25)) AS BIGINT) AS n_big,
           CAST(CASE WHEN list_has_any(list_transform(qtys, q -> q > 40), [true]) THEN 1 ELSE 0 END AS BIGINT) AS any_gt40,
           CAST(CASE WHEN len(list_filter(qtys, q -> q <= 0)) = 0 THEN 1 ELSE 0 END AS BIGINT) AS all_pos,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), qtys), (acc, q) -> acc + q * q) AS BIGINT) AS sum_sq
    FROM a
    """,
)
def q_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function battery over per-order quantity arrays:
    transform (affine map), filter+size, exists, forall, and a seeded
    aggregate fold (sum of squares).  Lambdas are JVM expression trees —
    whole-stage-codegen'd, no Python round trip (SURVEY §2.10 F1/F2
    'UDFs become Column expressions').  Deterministic array order via
    (linenumber, partkey) sort before collect."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 25 == 0)
    a = (
        li.select(
            "l_orderkey",
            F.struct(
                F.col("l_linenumber"), F.col("l_partkey"), F.col("l_quantity").cast("long").alias("q")
            ).alias("s"),
        )
        .groupBy(F.col("l_orderkey").cast("long").alias("orderkey"))
        .agg(F.array_sort(F.collect_list("s")).alias("structs"))
        .select("orderkey", F.transform("structs", lambda s: s["q"]).alias("qtys"))
    )
    return a.select(
        "orderkey",
        F.aggregate(
            F.transform("qtys", lambda q: q * 2 + 1),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_affine"),
        F.size(F.filter("qtys", lambda q: q > 25)).cast("long").alias("n_big"),
        F.exists("qtys", lambda q: q > 40).cast("long").alias("any_gt40"),
        F.forall("qtys", lambda q: q > 0).cast("long").alias("all_pos"),
        F.aggregate(
            "qtys", F.lit(0).cast("long"), lambda acc, q: acc + q * q
        ).alias("sum_sq"),
    )


@gate(
    "grouping_sets_mix",
    oracle="""
    SELECT coalesce(l_returnflag, '(all)') AS rflag,
           coalesce(CAST(month(l_shipdate) AS BIGINT), -1) AS smonth,
           CAST(GROUPING(l_returnflag, month(l_shipdate)) AS BIGINT) AS gid,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (month(l_shipdate)), (l_returnflag, month(l_shipdate)))
    """,
)
def q_grouping_sets_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither pure rollup nor cube) through the
    engine's SQL surface — the DataFrame API has no grouping-sets
    builder, and a user switching from the reference's SQL generation
    needs the SQL path anyway (S3's spark.sql surface)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql("""
        SELECT coalesce(l_returnflag, '(all)') AS rflag,
               coalesce(CAST(month(l_shipdate) AS BIGINT), -1) AS smonth,
               CAST(grouping_id(l_returnflag, month(l_shipdate)) AS BIGINT) AS gid,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (month(l_shipdate)), (l_returnflag, month(l_shipdate)))
    """)


@gate(
    "decimal_exact_money",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS total,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS VARCHAR) AS disc_total,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_decimal_exact_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-class DECIMAL money arithmetic: sums and decimal×decimal
    products aggregate EXACTLY (no float rounding, no cents trick), with
    string output pinning scale and value bit-for-bit across engines —
    the money-typed alternative to the integer-cents recipe used by the
    double-typed gates."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(p).cast("string").alias("total"),
        F.sum(p * d).cast("string").alias("disc_total"),
        F.count("*").alias("n"),
    )


@gate(
    "cdc_apply_changes",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, CAST(round(o_totalprice*100) AS BIGINT) AS cents,
             CAST(NULL AS BIGINT) AS v, 'U' AS op, 0 AS src
      FROM orders
    ),
    changes AS (
      SELECT o_orderkey, o_custkey, CAST(round(o_totalprice*100) AS BIGINT) + 100000 AS cents,
             CAST(1 AS BIGINT) AS v, 'U' AS op, 1 AS src
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, 0, CAST(2 AS BIGINT), 'D', 1
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    u AS (SELECT * FROM base UNION ALL SELECT * FROM changes),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                   ORDER BY v DESC NULLS LAST, src DESC) AS rn
      FROM u
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents,
           CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
    FROM r WHERE rn = 1 AND op != 'D'
    """,
)
def q_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot+delta reconciliation (relational_ext.apply_changes):
    1-in-7 orders get a versioned price update, 1-in-13 a tombstone;
    latest version per key wins, deletes drop.  Output is the final-state
    rollup (row count, cents total, updated-row count) — pins both the
    window dedup and the tombstone semantics.  The delete set overlaps
    the update set (keys ≡ 0 mod 91), exercising version precedence."""
    from inferdb_spark.operators.relational_ext import apply_changes

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select("o_orderkey", "o_custkey", cents.alias("cents"))
    upd = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey", "o_custkey",
            (cents + 100000).alias("cents"),
            F.lit(1).cast("long").alias("v"),
            F.lit("U").alias("op"),
        )
    )
    dele = (
        o.filter(F.col("o_orderkey") % 13 == 0)
        .select(
            "o_orderkey", "o_custkey",
            F.lit(0).cast("long").alias("cents"),
            F.lit(2).cast("long").alias("v"),
            F.lit("D").alias("op"),
        )
    )
    final = apply_changes(
        base, upd.unionByName(dele), ["o_orderkey"], "v", "op", "D"
    )
    return final.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("cents"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).cast("long").alias("n_updated"),
    )


@gate(
    "morton_zorder_key",
    oracle=None,  # set below to share the generator with the Spark side
)
def q_morton_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (partkey, suppkey) — the
    multi-dim data-skipping sort key (functions/layout.py); per-key-range
    rollup pins every interleaved bit.  At scale: write with
    sortWithinPartitions(morton) so parquet row-group min/max stats prune
    2-D range predicates."""
    from inferdb_spark.functions.layout import morton_interleave

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    m = morton_interleave(F.col("l_partkey"), F.col("l_suppkey"), bits=10)
    return (
        li.select(m.alias("mkey"))
        .groupBy((F.col("mkey") % 97).cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum("mkey").cast("long").alias("sum_keys"),
            F.min("mkey").cast("long").alias("min_key"),
            F.max("mkey").cast("long").alias("max_key"),
        )
    )


def _register_morton_oracle() -> None:
    from inferdb_spark.functions.layout import duckdb_morton_sql
    from inferdb_spark.gate import _ORACLES

    mk = duckdb_morton_sql("l_partkey", "l_suppkey", bits=10)
    _ORACLES["morton_zorder_key"] = f"""
    WITH m AS (
      SELECT {mk} AS mkey FROM lineitem WHERE l_orderkey % 50 = 0
    )
    SELECT CAST(mkey % 97 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(mkey) AS BIGINT) AS sum_keys,
           CAST(min(mkey) AS BIGINT) AS min_key,
           CAST(max(mkey) AS BIGINT) AS max_key
    FROM m GROUP BY 1
    """


_register_morton_oracle()


@gate(
    "column_profile",
    oracle="""
    SELECT 'o_totalprice' AS column_name, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           CAST(min(o_totalprice) AS VARCHAR) AS min_str,
           CAST(max(o_totalprice) AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    """,
)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiling (validate.profile_columns): null
    counts, exact cardinalities, min/max per column in ONE aggregation —
    the batch data-quality gate every 100 TB ingest runs before
    downstream work (approx=True swaps the HLL sketch in at scale).
    Floats stringify identically here because parquet doubles of 2-dp
    synthetic money values round-trip exactly."""
    from inferdb_spark.operators.validate import profile_columns

    o = load_table(spark, sf_dir, "orders")
    prof = profile_columns(o, ["o_totalprice", "o_orderpriority", "o_custkey"])
    return prof.withColumnRenamed("column", "column_name")


@gate(
    "triangle_count",
    oracle="""
    WITH sel AS (
      SELECT DISTINCT l.l_orderkey AS ok, CAST(l.l_partkey AS BIGINT) AS pk
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate >= DATE '1995-01-01' AND o.o_orderdate < DATE '1996-01-01'
        AND l.l_partkey % 10 = 0
    ),
    e AS (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM sel a JOIN sel b ON a.ok = b.ok AND a.pk < b.pk
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges
    FROM e e1 JOIN e e2 ON e1.v = e2.u
              JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the sampled co-purchase graph (same edge set
    as gate:connected_components): the oriented u<v<w two-hop join —
    each triangle counted exactly once, no symmetric double-join blowup.
    The clustering-coefficient numerator for graph-shaped dedup QA.
    Scale: edges shuffle on v=u join key; orientation (u<v) keeps
    per-node fan-out bounded by out-degree, the standard MapReduce
    triangle trick."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    sel = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
            & (F.col("l_partkey") % 10 == 0)
        )
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").cast("long").alias("pk"))
        .distinct()
    )
    a, b = sel.alias("a"), sel.alias("b")
    e = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
        .cache()
    )
    n_edges = e.count()
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .count()
    )
    return spark.createDataFrame(
        [(tri, n_edges)], "n_triangles long, n_edges long"
    )


@gate(
    "mad_outliers",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS m
      FROM lineitem GROUP BY l_returnflag
    ),
    dev AS (
      SELECT l.l_returnflag, abs(l.l_extendedprice - med.m) AS d, l.l_extendedprice, med.m
      FROM lineitem l JOIN med USING (l_returnflag)
    ),
    mad AS (
      SELECT l_returnflag, quantile_cont(d, 0.5) AS mad
      FROM dev GROUP BY l_returnflag
    )
    SELECT dev.l_returnflag AS flag,
           CAST(round(mad.mad, 6) AS DOUBLE) AS mad,
           CAST(sum(CASE WHEN abs(dev.l_extendedprice - dev.m) > 3 * 1.4826 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM dev JOIN mad USING (l_returnflag)
    GROUP BY dev.l_returnflag, mad.mad
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier screening per group — the
    robust-statistics alternative to the reference's IQR bounds (P7,
    src/featurizers/nyc_rides_featurizer.py:165-172): flag rows beyond
    3·1.4826·MAD of the group median.  Two exact-percentile passes
    (approx_percentile is the scale substitution); broadcast joins for
    the 3-row stats relations."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice").cast("double")
    med = li.groupBy("l_returnflag").agg(
        F.percentile(x, F.lit(0.5)).alias("m")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag", x.alias("x"), "m", F.abs(x - F.col("m")).alias("d")
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.percentile(F.col("d"), F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy(F.col("l_returnflag").alias("flag"), F.round("mad", 6).cast("double").alias("mad"))
        .agg(
            F.sum(
                (F.col("d") > 3 * 1.4826 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


@gate(
    "try_safe_arithmetic",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN TRY_CAST(pseudo AS BIGINT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_badcast,
           CAST(sum(COALESCE(TRY_CAST(pseudo AS BIGINT), 0)) AS BIGINT) AS sum_parsed,
           CAST(sum(CASE WHEN d = 0 THEN -1
                    ELSE CAST(CAST(round(o_totalprice*100) AS BIGINT) // d AS BIGINT) END) AS BIGINT) AS sum_div
    FROM (
      SELECT o_totalprice,
             CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_orderkey AS VARCHAR)
                  ELSE o_orderpriority END AS pseudo,
             CAST(o_orderkey % 5 AS BIGINT) AS d
      FROM orders
    )
    """,
)
def q_try_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar semantics: try_cast on a mixed numeric/text
    column (invalid → NULL, never a job-killing exception — at 100 TB a
    single dirty row must not fail a 6-hour job) and explicit
    zero-divisor handling with integer division pinned on both engines
    (Spark div vs DuckDB //)."""
    o = load_table(spark, sf_dir, "orders")
    src = o.select(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderkey").cast("string"))
        .otherwise(F.col("o_orderpriority"))
        .alias("pseudo"),
        (F.col("o_orderkey") % 5).cast("long").alias("d"),
    )
    parsed = F.col("pseudo").try_cast("bigint")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return src.agg(
        F.count("*").alias("n"),
        F.sum(parsed.isNull().cast("long")).alias("n_badcast"),
        F.sum(F.coalesce(parsed, F.lit(0))).alias("sum_parsed"),
        F.sum(
            F.when(F.col("d") == 0, F.lit(-1)).otherwise(
                F.expr(f"CAST(round(o_totalprice*100) AS BIGINT) div d")
            )
        ).alias("sum_div"),
    )
