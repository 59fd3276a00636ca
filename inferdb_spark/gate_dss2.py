"""Gate queries: the remaining TPC-H classic shapes (Q3/4/5/6/7/8/9/10/12/
14/15/16/17/19/20/21), adapted to the synthetic schema (no partsupp /
commitdate / shipmode columns — substitutions documented per query).

Together with gate_dss.py (Q1/2/11/13/18/22 shapes) ALL 22 TPC-H query
shapes are covered, completing the canonical decision-support battery
around the reference's query-integration benchmark
(``sql_scripts/query_integration.sql:1-43``).

Determinism rules per CLAUDE.md: money as integer cents rounded per line
BEFORE summing (BIGINT sums are exact and order-independent, double sums
are not), quantities as BIGINT, float division only on already-aggregated
integers with identical expression order on both sides, ties broken by
lowest key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import gate

# line revenue in integer cents: round per line, sum exactly
_REV_SQL = "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"
_EP_SQL = "CAST(round(l_extendedprice * 100) AS BIGINT)"


def _rev_cents() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0)
    ).cast("long")


def _ep_cents() -> F.Column:
    return F.round(F.col("l_extendedprice") * F.lit(100.0)).cast("long")


def _qint() -> F.Column:
    # quantities are integral doubles in the fixture (verified); BIGINT
    # cast is exact on both engines for integral values
    return F.col("l_quantity").cast("long")


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


# ---------------------------------------------------------------------------
# Q3 — shipping priority
# ---------------------------------------------------------------------------


@gate(
    "q3_shipping_priority",
    oracle=f"""
    SELECT CAST(l.l_orderkey AS BIGINT) AS orderkey,
           CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_cents,
           CAST(date_diff('day', DATE '1970-01-01', o.o_orderdate) AS BIGINT)
             AS order_day,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND l.l_shipdate > TIMESTAMP '1997-07-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_cents DESC, orderkey ASC LIMIT 10
    """,
)
def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer dim broadcasts onto
    orders; the orders⨝lineitem equi-join shuffles on orderkey (the only
    wide exchange); top-10 after aggregation is TakeOrderedAndProject.
    The l_shipdate predicate pushes into the lineitem scan.
    """
    c, o, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cut = F.lit("1997-07-01").cast("timestamp")
    j = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .join(o.filter(F.col("o_orderdate") < cut), F.col("c_custkey") == F.col("o_custkey"))
        .join(li.filter(F.col("l_shipdate") > cut), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    agg = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(_rev_cents()).alias("revenue_cents")
    )
    return agg.select(
        F.col("l_orderkey").cast("long").alias("orderkey"),
        F.col("revenue_cents").cast("long"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp"))
        .cast("long")
        .alias("order_day"),
        F.col("o_orderpriority").alias("orderpriority"),
    ).orderBy(F.desc("revenue_cents"), F.asc("orderkey")).limit(10)


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi-join with range condition)
# ---------------------------------------------------------------------------


@gate(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority AS orderpriority,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS becomes a LEFT SEMI join whose condition is
    equi (orderkey) + range (shipped >90 days after ordering — the
    late-shipment substitute for the missing commit/receipt dates).  The
    semi join keeps the build side de-duplicated by construction — no
    distinct needed — and the priority rollup is a 5-group two-phase agg.
    """
    o, li = _t(spark, sf_dir, "orders", "lineitem")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .select(F.col("o_orderpriority").alias("orderpriority"), "order_count")
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (6-way join, two paths to nation)
# ---------------------------------------------------------------------------


@gate(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the 6-way join where supplier and customer must sit
    in the SAME nation (s_nationkey = c_nationkey is a second join path,
    not a filter).  All dims broadcast; the fact-side chain shuffles on
    custkey then orderkey.  Region restriction prunes the nation dim
    before it ever touches the fact side.
    """
    c, o, li, s, n, r = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    nr = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy("n_name").agg(F.sum(_rev_cents()).alias("revenue_cents")).select(
        F.col("n_name").alias("nation"), F.col("revenue_cents").cast("long")
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


@gate(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_cents
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
)
def q_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair predicate across two
    different dimension paths (supplier nation × customer nation), with a
    year rollup of shipping revenue.  The disjunctive pair filter applies
    after both broadcast dim joins; the only wide shuffles are the fact
    chain on orderkey/custkey.
    """
    c, o, li, s, n = _t(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation")
    sn = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    li = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    j = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
        .select(
            "supp_nation",
            "cust_nation",
            F.col("l_year").cast("long"),
            F.col("revenue_cents").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product type profit (no partsupp: retail price as the cost basis)
# ---------------------------------------------------------------------------


@gate(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum({_REV_SQL}
                    - CAST(round(p.p_retailprice * l.l_quantity * 100) AS BIGINT))
             AS BIGINT) AS profit_cents
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year over a
    pattern-filtered part subset.  The fixture has no partsupp, so cost =
    retail price × quantity (rounded to cents per line before the exact
    BIGINT sum).  The part filter prunes the broadcast BEFORE the fact
    join — the LIKE never runs against the fact table.
    """
    p, li, s, o, n = _t(spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation")
    p = p.filter(F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")
    cost = F.round(F.col("p_retailprice") * F.col("l_quantity") * F.lit(100.0)).cast(
        "long"
    )
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_rev_cents() - cost).alias("profit_cents"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_year").cast("long"),
            F.col("profit_cents").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (top-20 customers by lost revenue)
# ---------------------------------------------------------------------------


@gate(
    "q10_returned_items",
    oracle=f"""
    SELECT CAST(c.c_custkey AS BIGINT) AS custkey,
           c.c_name AS name,
           n.n_name AS nation,
           CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_cents DESC, custkey ASC LIMIT 20
    """,
)
def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost revenue from returned lines per customer in a
    quarter, top-20.  Return-flag and date predicates push into the scans;
    the customer rollup keys the shuffle; top-k avoids a global sort.
    """
    c, o, li, n = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = li.filter(F.col("l_returnflag") == "R")
    j = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_cents()).alias("revenue_cents"))
        .select(
            F.col("c_custkey").cast("long").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
            F.col("revenue_cents").cast("long"),
        )
        .orderBy(F.desc("revenue_cents"), F.asc("custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-priority counts (linestatus as the mode dimension)
# ---------------------------------------------------------------------------


@gate(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q_q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional CASE counts of high/low priority
    orders among LATE shipments (>60 days after ordering — the fixture's
    substitute for commit/receipt dates; linestatus stands in for
    shipmode).  One equi-join + post-join range predicate + two
    conditional sums in a single pass.
    """
    o, li = _t(spark, sf_dir, "orders", "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = o.join(li, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
    ).select(F.col("l_linestatus").alias("linestatus"), "high_line_count", "low_line_count")


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional-sum ratio)
# ---------------------------------------------------------------------------


@gate(
    "q14_promo_effect",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END)
             AS BIGINT) AS promo_cents,
           CAST(sum({_REV_SQL}) AS BIGINT) AS total_cents,
           round(CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END)
                   AS DOUBLE)
                 / CAST(sum({_REV_SQL}) AS DOUBLE) * 100, 6) AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of a month's revenue from promo parts —
    two conditional integer sums in ONE pass, float division only on the
    two final BIGINTs (identical expression order both engines).  Part dim
    broadcasts; the month predicate prunes the fact scan.
    """
    li, p = _t(spark, sf_dir, "lineitem", "part")
    li = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", _rev_cents()).otherwise(F.lit(0)))
        .cast("long")
        .alias("promo_cents"),
        F.sum(_rev_cents()).cast("long").alias("total_cents"),
    )
    return agg.select(
        "promo_cents",
        "total_cents",
        F.round(
            F.col("promo_cents").cast("double")
            / F.col("total_cents").cast("double")
            * 100,
            6,
        ).alias("promo_pct"),
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (scalar max join-back)
# ---------------------------------------------------------------------------


@gate(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             sum({_REV_SQL}) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT CAST(r.suppkey AS BIGINT) AS suppkey,
           s.s_name AS name,
           CAST(r.total_cents AS BIGINT) AS total_cents
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.suppkey
    WHERE r.total_cents = (SELECT max(total_cents) FROM rev)
    """,
)
def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue view is computed ONCE and reused for
    both the max scalar and the join-back (Catalyst ReusedExchange / our
    explicit cache); the scalar max is a 1-row broadcast.  No window
    needed — ties all surface, as the spec requires.
    """
    li, s = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_rev_cents()).alias("total_cents"))
        .cache()  # materialize the (small) view once: max scalar + join-back
    )
    mx = rev.agg(F.max("total_cents").alias("max_cents"))
    return (
        rev.join(F.broadcast(mx), F.col("total_cents") == F.col("max_cents"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("suppkey"))
        .select(
            F.col("suppkey").cast("long"),
            F.col("s_name").alias("name"),
            F.col("total_cents").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (NOT IN exclusion)
# ---------------------------------------------------------------------------


@gate(
    "q16_parts_supplier_count",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS type,
           CAST(p.p_size AS BIGINT) AS size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    bucket, excluding flagged suppliers (negative balance stands in for
    the complaints LIKE).  The fixture has no partsupp, so lineitem is
    the part↔supplier bridge.  The NOT IN compiles to an anti join
    (keys are non-null, so null-semantics traps don't bite — pinned
    separately by gate:not_in_null_semantics).
    """
    li, p, s = _t(spark, sf_dir, "lineitem", "part", "supplier")
    p = p.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = s.filter(F.col("s_acctbal") < 0).select(F.col("s_suppkey").alias("bad_key"))
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("bad_key"), "left_anti")
    )
    return (
        j.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .select(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").cast("long").alias("size"),
            "supplier_cnt",
        )
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg, integer cross-multiply)
# ---------------------------------------------------------------------------


@gate(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH target AS (
      SELECT p_partkey FROM part
      WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
    ),
    lines AS (
      SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS q, {_EP_SQL} AS ep
      FROM lineitem l JOIN target t ON l.l_partkey = t.p_partkey
    ),
    stats AS (
      SELECT l_partkey, sum(q) AS sum_q, count(*) AS cnt
      FROM lines GROUP BY l_partkey
    )
    SELECT CAST(sum(l.ep) AS BIGINT) AS total_cents,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(CAST(sum(l.ep) AS DOUBLE) / 7.0, 4) AS avg_yearly_cents
    FROM lines l JOIN stats s ON l.l_partkey = s.l_partkey
    WHERE 5 * l.q * s.cnt < s.sum_q
    """,
)
def q_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines below 20% of their part's average quantity.
    The correlated AVG decorrelates into a per-part (sum, count) aggregate
    broadcast back onto the lines; the threshold `q < 0.2·avg` becomes the
    INTEGER cross-multiply `5·q·cnt < sum_q` — exact, no float compare.
    """
    li, p = _t(spark, sf_dir, "lineitem", "part")
    target = p.filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    lines = li.join(F.broadcast(target), F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", _qint().alias("q"), _ep_cents().alias("ep")
    )
    stats = lines.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("q").alias("sum_q"), F.count("*").alias("cnt")
    )
    small = lines.join(F.broadcast(stats), F.col("l_partkey") == F.col("pk")).filter(
        F.lit(5) * F.col("q") * F.col("cnt") < F.col("sum_q")
    )
    agg = small.agg(
        F.sum("ep").cast("long").alias("total_cents"),
        F.count("*").cast("long").alias("n_lines"),
    )
    return agg.select(
        "total_cents",
        "n_lines",
        F.round(F.col("total_cents").cast("double") / F.lit(7.0), 4).alias(
            "avg_yearly_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive predicate join
# ---------------------------------------------------------------------------

_Q19_PRED_SQL = """(
       (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
        AND l.l_quantity BETWEEN 1 AND 21)
    OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
        AND l.l_quantity BETWEEN 10 AND 30)
    OR (p.p_type = 'PROMO' AND p.p_size BETWEEN 1 AND 35
        AND l.l_quantity BETWEEN 20 AND 40)
)"""


@gate(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {_Q19_PRED_SQL}
    """,
)
def q_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate mixing part attributes and
    line quantities.  The equi key (partkey) still drives a hash join —
    the disjunction is a post-join filter, NOT a fallback to nested-loop;
    Catalyst also derives the common size/quantity bounds for scan-level
    pruning where possible.
    """
    li, p = _t(spark, sf_dir, "lineitem", "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    q, size = F.col("l_quantity"), F.col("p_size")
    pred = (
        ((F.col("p_brand") == "Brand#1") & size.between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & size.between(1, 25) & q.between(10, 30))
        | ((F.col("p_type") == "PROMO") & size.between(1, 35) & q.between(20, 40))
    )
    return j.filter(pred).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(_rev_cents()).cast("long").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess shipped volume (agg → HAVING → join back)
# ---------------------------------------------------------------------------

Q20_MIN_QTY = 180


@gate(
    "q20_excess_volume_suppliers",
    oracle=f"""
    WITH small_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ),
    vol AS (
      SELECT l.l_suppkey AS suppkey, sum(CAST(l.l_quantity AS BIGINT)) AS total_qty
      FROM lineitem l
      JOIN small_parts sp ON l.l_partkey = sp.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey
      HAVING sum(CAST(l.l_quantity AS BIGINT)) > {Q20_MIN_QTY}
    )
    SELECT s.s_name AS name, n.n_name AS nation,
           CAST(v.total_qty AS BIGINT) AS total_qty
    FROM vol v
    JOIN supplier s ON s.s_suppkey = v.suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def q_q20_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped an excess volume of
    pattern-matched parts in a year (the availability>half-of-shipped
    partsupp predicate becomes a HAVING threshold — no partsupp in the
    fixture).  Part filter prunes a broadcast; the per-supplier rollup is
    the only wide shuffle; supplier/nation join back on the tiny result.
    """
    li, p, s, n = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    sp = p.filter(F.col("p_name").like("small%")).select("p_partkey")
    vol = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(sp), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_qint()).alias("total_qty"))
        .filter(F.col("total_qty") > Q20_MIN_QTY)
    )
    return (
        vol.join(F.broadcast(s), F.col("s_suppkey") == F.col("suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("s_name").alias("name"),
            F.col("n_name").alias("nation"),
            F.col("total_qty").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (semi + anti self-joins)
# ---------------------------------------------------------------------------


@gate(
    "q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name AS name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, name ASC LIMIT 20
    """,
)
def q_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the hardest classic — suppliers in one nation who
    were the SOLE late shipper on multi-supplier orders.  `late` (shipped
    >60 days after ordering) is computed once and reused for the probe and
    the NOT EXISTS side; EXISTS/NOT EXISTS become LEFT SEMI / LEFT ANTI
    self-joins on orderkey with a suppkey inequality.
    """
    li, o, s, n = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    nat = n.filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    sup = s.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", "s_name"
    )
    l1 = late.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    l1 = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
        "left_anti",
    )
    return (
        l1.groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .select(F.col("s_name").alias("name"), "numwait")
        .orderBy(F.desc("numwait"), F.asc("name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure filtered aggregate)
# ---------------------------------------------------------------------------


@gate(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
             AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: no joins at all — three pushed-down predicates and
    one exact integer sum.  The whole query is scan + map-side partial
    agg + a 1-row final agg; every predicate reaches the parquet reader
    as a PushedFilter, so row groups outside the year/discount/quantity
    bounds never decompress.
    """
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    disc_cents = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * F.lit(100.0)
    ).cast("long")
    return f.agg(
        F.sum(disc_cents).cast("long").alias("revenue_cents"),
        F.count("*").cast("long").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q8 — national market share (conditional-sum ratio per year)
# ---------------------------------------------------------------------------


@gate(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN sn.n_name = 'NATION_5' THEN {_REV_SQL} ELSE 0 END)
             AS BIGINT) AS nation_cents,
           CAST(sum({_REV_SQL}) AS BIGINT) AS total_cents,
           round(CAST(sum(CASE WHEN sn.n_name = 'NATION_5' THEN {_REV_SQL}
                               ELSE 0 END) AS DOUBLE)
                 / CAST(sum({_REV_SQL}) AS DOUBLE), 6) AS mkt_share
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN region r ON cn.n_regionkey = r.r_regionkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    GROUP BY year(o.o_orderdate)
    """,
)
def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for a part
    type, per year — the numerator is a CASE inside the SAME aggregate
    pass as the denominator (no second scan, no self-join).  Customer
    nation restricts via region; supplier nation feeds the share
    condition through a second, independent path to the nation dim.
    """
    p, li, s, o, c, n, r = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer",
        "nation", "region",
    )
    cn = (
        n.join(
            F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cnk"))
    )
    sn = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    pf = p.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    j = (
        li.join(F.broadcast(pf), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"), "inner")
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
    )
    is_nat = F.col("supp_nation") == "NATION_5"
    agg = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(is_nat, _rev_cents()).otherwise(F.lit(0)))
        .cast("long")
        .alias("nation_cents"),
        F.sum(_rev_cents()).cast("long").alias("total_cents"),
    )
    return agg.select(
        F.col("o_year").cast("long"),
        "nation_cents",
        "total_cents",
        F.round(
            F.col("nation_cents").cast("double") / F.col("total_cents").cast("double"),
            6,
        ).alias("mkt_share"),
    )
