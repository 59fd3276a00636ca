"""Gate queries: decision-support classics (TPC-H-shaped) not yet covered
by the other gate modules.

The reference's integration benchmark embeds index scoring inside ordinary
warehouse SQL (``sql_scripts/query_integration.sql:1-43``); a user replacing
it with this engine will run the surrounding decision-support queries too.
These gates pin the canonical shapes — correlated-min decorrelation,
fraction-of-total HAVING, outer-join distributions, HAVING + semi-join,
anti-join with scalar threshold, multi-count-distinct, cumulative distinct
users, and equi-width histograms — each against a DuckDB oracle.

Determinism rules per CLAUDE.md: money in integer cents, BIGINT casts on
both sides, tie-breaks by lowest value, no transcendental output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import gate


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


@gate(
    "min_acctbal_supplier_per_nation",
    oracle="""
    WITH m AS (
        SELECT s_nationkey AS nationkey,
               min(CAST(round(s_acctbal*100) AS BIGINT)) AS min_cents
        FROM supplier GROUP BY s_nationkey
    )
    SELECT n.n_name AS nation,
           CAST(s.s_suppkey AS BIGINT) AS suppkey,
           CAST(round(s.s_acctbal*100) AS BIGINT) AS acctbal_cents
    FROM supplier s
    JOIN m ON s.s_nationkey = m.nationkey
          AND CAST(round(s.s_acctbal*100) AS BIGINT) = m.min_cents
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
)
def q_min_acctbal_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery (supplier with the minimum
    account balance in its nation) decorrelated into a groupBy-min +
    broadcast equi-join — the scalable plan (no per-row subquery, one
    shuffle on the fact side, dimension aggregates broadcast).

    Reference analog: the greedy optimizer's per-candidate argmin scans
    (``/root/reference/src/optimizer.py:175-231``) are this same
    decorrelate-then-join pattern expressed relationally.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    bal = s.withColumn("acctbal_cents", _cents("s_acctbal"))
    mins = (
        bal.groupBy("s_nationkey")
        .agg(F.min("acctbal_cents").alias("min_cents"))
        .select(F.col("s_nationkey").alias("nk"), "min_cents")
    )
    return (
        bal.join(
            F.broadcast(mins),
            on=[
                F.col("s_nationkey") == F.col("nk"),
                F.col("acctbal_cents") == F.col("min_cents"),
            ],
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("s_suppkey").cast("long").alias("suppkey"),
            "acctbal_cents",
        )
    )


@gate(
    "having_fraction_of_total",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS part_cents
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(l_partkey AS BIGINT) AS partkey,
           CAST(part_cents AS BIGINT) AS part_cents
    FROM per_part
    WHERE part_cents * 2000 > (SELECT sum(part_cents) FROM per_part)
    """,
)
def q_having_fraction_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: keep groups whose sum exceeds a fraction (1/2000)
    of the grand total.  The scalar subquery becomes a 1-row broadcast
    cross-join; the comparison is integer cross-multiplication (no
    float division) so both engines agree bit-for-bit.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_cents("l_extendedprice")).alias("part_cents")
    )
    total = per_part.agg(F.sum("part_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_cents") * 2000 > F.col("total_cents"))
        .select(
            F.col("l_partkey").cast("long").alias("partkey"),
            F.col("part_cents").cast("long").alias("part_cents"),
        )
    )


@gate(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM per_cust GROUP BY n_orders
    """,
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    including zero-order customers (LEFT join with the filter in the ON
    clause, NOT in WHERE — moving it to WHERE would silently drop the
    zero bucket).  Two aggregations; the second input is one row per
    customer so the re-shuffle is tiny.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count("*").alias("n_customers")
    ).select(
        F.col("n_orders").cast("long"),
        F.col("n_customers").cast("long"),
    )


@gate(
    "large_volume_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(round(sum(l_quantity)) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    SELECT CAST(o.o_orderkey AS BIGINT) AS orderkey,
           CAST(o.o_custkey AS BIGINT) AS custkey,
           CAST(round(o.o_totalprice*100) AS BIGINT) AS price_cents,
           big.total_qty
    FROM orders o JOIN big ON o.o_orderkey = big.l_orderkey
    """,
)
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose line quantities sum above a
    threshold, joined back to the order header.  The HAVING filter runs
    on the aggregated (small) side before the join, so the join input is
    already reduced — the plan the optimizer should keep at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select(
            F.col("l_orderkey"),
            F.round(F.col("qty")).cast("long").alias("total_qty"),
        )
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        F.col("o_orderkey").cast("long").alias("orderkey"),
        F.col("o_custkey").cast("long").alias("custkey"),
        _cents("o_totalprice").alias("price_cents"),
        "total_qty",
    )


@gate(
    "inactive_high_balance_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT avg(CAST(round(c_acctbal*100) AS BIGINT)) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS n_custs,
           CAST(sum(CAST(round(c.c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer c, avg_bal
    WHERE CAST(round(c.c_acctbal*100) AS BIGINT) > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def q_inactive_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balances and no
    urgent orders, grouped by nation.  Scalar-average broadcast + LEFT
    ANTI join (NOT EXISTS with a correlated filter); the anti join
    shuffles on custkey once.  The average is computed over exact integer
    cents so the threshold comparison is the same IEEE double on both
    engines.  (Every synthetic customer has ≥1 order, so the classic
    "no orders at all" predicate would be vacuous — the priority filter
    keeps the anti join selective.)
    """
    c = load_table(spark, sf_dir, "customer").withColumn(
        "bal_cents", _cents("c_acctbal")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("bal_cents").alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("bal_cents") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            F.sum("bal_cents").alias("bal_cents"),
        )
        .select(
            F.col("c_nationkey").cast("long").alias("nationkey"),
            F.col("n_custs").cast("long"),
            F.col("bal_cents").cast("long"),
        )
    )


@gate(
    "multi_count_distinct",
    oracle="""
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    """,
)
def q_multi_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several COUNT(DISTINCT ...) over different columns in ONE
    aggregate.  Catalyst rewrites this with an Expand node (one
    row-replica per distinct column) and a two-stage aggregate — the
    scalable plan; at 100 TB swap each for approx_count_distinct (the
    documented substitution, SURVEY §2.4 A4 note).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.countDistinct("l_suppkey").cast("long").alias("n_supps"),
        F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        F.count("*").cast("long").alias("n_rows"),
    )


@gate(
    "cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    per_day AS (
        SELECT d, count(*) AS new_users FROM first_seen GROUP BY d
    )
    SELECT CAST(d AS VARCHAR) AS day,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_users
    FROM per_day
    """,
)
def q_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user count per day.  COUNT(DISTINCT) over a
    running window is unsupported (and unscalable — state grows without
    bound); the scalable rewrite is first-seen-date per user → new-users
    per day → running sum.  Two shuffles total, window over one row per
    day.  Filtered to first *purchase* (first-conversion cohort) so the
    per-day spread is non-degenerate on the dense synthetic stream.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d")
    )
    per_day = first_seen.groupBy("d").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("d").cast("string").alias("day"),
        F.col("new_users").cast("long"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


@gate(
    "group_exact_quartiles",
    oracle="""
    SELECT l_returnflag AS rflag,
           percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(round(l_extendedprice*100) AS BIGINT)) AS p25,
           percentile_cont(0.5)  WITHIN GROUP (ORDER BY CAST(round(l_extendedprice*100) AS BIGINT)) AS p50,
           percentile_cont(0.75) WITHIN GROUP (ORDER BY CAST(round(l_extendedprice*100) AS BIGINT)) AS p75,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_group_exact_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group EXACT interpolated quartiles (percentile_cont WITHIN
    GROUP) — the group-wise twin of the global exact_quantiles gate and
    the exact form of the P7 IQR fit.  Inputs are integer cents, so the
    linear interpolation (midpoint halves) is bit-identical across
    engines.  At 100 TB the documented substitution is
    percentile_approx per group (single-pass sketch, no per-group sort).
    """
    li = load_table(spark, sf_dir, "lineitem")
    c = _cents("l_extendedprice")
    # ONE percentile agg with an array of fractions: a single sort buffer
    # per group instead of three (3x less agg memory + sort work; was the
    # heaviest non-iterative bench query before this)
    qs = F.percentile(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        li.groupBy(F.col("l_returnflag").alias("rflag"))
        .agg(qs.alias("_q"), F.count("*").cast("long").alias("n"))
        .select(
            "rflag",
            F.col("_q")[0].alias("p25"),
            F.col("_q")[1].alias("p50"),
            F.col("_q")[2].alias("p75"),
            "n",
        )
    )


@gate(
    "width_bucket_histogram",
    oracle="""
    SELECT least(11, CAST(floor(CAST(round(o_totalprice*100) AS BIGINT)
                              / 5000000.0) AS BIGINT)) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders GROUP BY 1
    """,
)
def q_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (width_bucket analog) over order totals:
    fixed $50k buckets, top bucket clamped.  Bucket id is exact integer
    division on cents, so bucket edges are bit-identical across engines
    (float division would put edge values in different buckets).
    Complement of the supervised/quantile binning in operators/binning.py.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.lit(11).cast("long"),
        F.floor(_cents("o_totalprice") / F.lit(5000000)).cast("long"),
    )
    return (
        o.select(
            bucket.alias("bucket"), _cents("o_totalprice").alias("c")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("c").cast("long").alias("cents"),
        )
    )
