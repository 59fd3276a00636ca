"""Round-7 gate queries, batch 8: classic DB operators, data-profiling
dependencies, and causal estimators — 2-D skyline (Pareto frontier),
k-core decomposition, functional-dependency audit (g3), inclusion-
dependency (FK discovery), stratified-propensity IPW ATE,
difference-in-differences, binned 1-D Wasserstein drift, and an X-bar
control chart.

The skyline and k-core close the last classic query-operator gaps next
to the OLAP battery (cube/rollup/windows, gate_olap.py); the dependency
audits extend operators/validate.py from single-column profiles to
column-PAIR structure (join-key and dedup-key discovery at ingest); the
causal pair (IPW, DiD) and the drift/control-chart pair extend the
experimentation suite (cuped_adjusted_ab, psi_drift, ab_test_ztest).

Determinism: frontier and argmax decisions compare exact integers; the
only ordered passes run over DOMAIN relations (distinct prices, bins,
weeks, strata — never raw rows); k-core runs a FIXED number of peeling
rounds on both engines (rounds past the fixpoint are no-ops, the
dbscan-gate precedent); per-stratum/per-bin double terms are quantized
to integer units before summation; multi-step double expressions share
one SQL string between Spark selectExpr and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import gate


@gate(
    "skyline_pareto_parts",
    oracle="""
    WITH pts AS (
      SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS size
      FROM part WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
    ),
    per_xy AS (
      SELECT price_cents, size, CAST(count(*) AS BIGINT) AS n_rows
      FROM pts GROUP BY price_cents, size
    ),
    per_x AS (SELECT price_cents, max(size) AS gmax FROM per_xy
              GROUP BY price_cents),
    fr AS (
      SELECT price_cents, gmax,
             max(gmax) OVER (ORDER BY price_cents ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING) AS prevmax
      FROM per_x
    )
    SELECT p.price_cents, p.size, p.n_rows
    FROM per_xy p JOIN fr ON p.price_cents = fr.price_cents
                         AND p.size = fr.gmax
    WHERE fr.prevmax IS NULL OR fr.gmax > fr.prevmax
    ORDER BY p.price_cents
    """,
)
def q_skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline of parts — the Pareto-optimal (minimize retail price,
    maximize size) shortlist, the classic multi-criteria operator the
    TPC-H battery lacks.  NOT the quadratic dominance self-join: rows
    group to distinct (price, size), one cumulative-max window runs over
    the DISTINCT-price domain, and a point survives iff nothing at its
    price beats it and nothing cheaper ties-or-beats it
    (operators/skyline.py:skyline_2d — dominance decided on exact
    integer cents)."""
    from inferdb_spark.operators.skyline import skyline_2d

    part = load_table(spark, sf_dir, "part")
    pts = part.select(
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    return (
        skyline_2d(pts, "price_cents", "size")
        .select(
            F.col("x").alias("price_cents"),
            F.col("y").alias("size"),
            "n_rows",
        )
        .orderBy("price_cents")
    )


# ---------------------------------------------------------------------------
# k-core of the co-purchase graph (same edge construction as
# gate:triangle_count / gate:connected_components): peel nodes with
# degree < K until stable.  Both engines run EXACTLY the same fixed
# round count — rounds past the fixpoint are no-ops, so the result is
# deterministic whether or not the peel has converged (it converges in 4
# rounds at sf0.01; 8 leaves margin).  The oracle unrolls the rounds as
# MATERIALIZED CTEs (the repo rule for unrolled chains — plain CTEs
# re-expand combinatorially).

_KCORE_K = 2
_KCORE_ROUNDS = 8

_KCORE_EDGES_SQL = """
    sel AS (
      SELECT DISTINCT l.l_orderkey AS ok, CAST(l.l_partkey AS BIGINT) AS pk
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate >= DATE '1995-01-01'
        AND o.o_orderdate < DATE '1996-01-01'
        AND l.l_partkey % 10 = 0
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM sel a JOIN sel b ON a.ok = b.ok AND a.pk < b.pk
    )"""


def _kcore_oracle() -> str:
    steps = []
    for i in range(_KCORE_ROUNDS):
        steps.append(
            f"""
    d{i + 1} AS MATERIALIZED (
      SELECT n, count(*) AS d FROM (
        SELECT u AS n FROM e{i} UNION ALL SELECT v AS n FROM e{i}
      ) GROUP BY n
    ),
    k{i + 1} AS MATERIALIZED (SELECT n FROM d{i + 1} WHERE d >= {_KCORE_K}),
    e{i + 1} AS MATERIALIZED (
      SELECT e{i}.u, e{i}.v FROM e{i}
      JOIN k{i + 1} a ON e{i}.u = a.n JOIN k{i + 1} b ON e{i}.v = b.n
    )"""
        )
    last = f"e{_KCORE_ROUNDS}"
    return (
        "WITH "
        + _KCORE_EDGES_SQL
        + ","
        + ",".join(steps)
        + f"""
    SELECT d AS degree, CAST(count(*) AS BIGINT) AS n_nodes FROM (
      SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS n FROM {last} UNION ALL SELECT v AS n FROM {last}
      ) GROUP BY n
    ) GROUP BY d ORDER BY d
    """
    )


@gate("kcore_decomposition", oracle=_kcore_oracle())
def q_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the 2-core of the co-purchase graph —
    iterative peeling of nodes with degree < k, the classic
    dense-subgraph primitive (community cores, spam-cluster mining) that
    complements gate:connected_components / gate:triangle_count.  State
    is the shrinking edge relation itself; each round is one map-side-
    combinable degree count plus two left-semi joins, lineage truncated
    per round (operators/graph.py:k_core).  Both engines run the same
    fixed 8 rounds; post-fixpoint rounds are no-ops."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    sel = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
            & (F.col("l_partkey") % 10 == 0)
        )
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_partkey").cast("long").alias("pk"),
        )
        .distinct()
    )
    a, b = sel.alias("a"), sel.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
    )
    from inferdb_spark.operators.graph import k_core

    core = k_core(edges, _KCORE_K, _KCORE_ROUNDS)
    deg = (
        core.select(F.col("u").alias("n"))
        .unionByName(core.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    return (
        deg.groupBy(F.col("d").alias("degree"))
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .orderBy("degree")
    )


def _fd_oracle(fd_name: str, table: str, lhs: str, rhs: str) -> str:
    return f"""
    SELECT '{fd_name}' AS fd_name,
           CAST(sum(tot) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_lhs,
           CAST(sum(mx) AS BIGINT) AS n_keepable,
           CAST(round(1.0 - CAST(sum(mx) AS DOUBLE) / sum(tot), 6)
                AS DOUBLE) AS g3
    FROM (
      SELECT max(c) AS mx, sum(c) AS tot FROM (
        SELECT {lhs} AS l, {rhs} AS r, count(*) AS c
        FROM {table} GROUP BY {lhs}, {rhs}
      ) GROUP BY l
    )"""


@gate(
    "functional_dependency_audit",
    oracle=" UNION ALL ".join(
        [
            _fd_oracle("lineitem.l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
            _fd_oracle("lineitem.l_orderkey->l_returnflag", "lineitem", "l_orderkey", "l_returnflag"),
            _fd_oracle("orders.o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
        ]
    ),
)
def q_functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency audit over three candidate
    column pairs via the TANE g3 error — the minimum row fraction to
    delete for lhs → rhs to hold exactly (0 = exact dependency).  The
    schema-inference / dedup-key-selection primitive a 100 TB ingest
    runs after single-column profiling (gate:column_profile): two
    stacked map-side-combinable aggregations per candidate, no sort, no
    join (operators/validate.py:fd_violation_g3)."""
    from inferdb_spark.operators.validate import fd_violation_g3

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        fd_violation_g3(li, "lineitem.l_partkey->l_suppkey", "l_partkey", "l_suppkey")
        .unionByName(
            fd_violation_g3(
                li, "lineitem.l_orderkey->l_returnflag", "l_orderkey", "l_returnflag"
            )
        )
        .unionByName(
            fd_violation_g3(
                o, "orders.o_custkey->o_orderpriority", "o_custkey", "o_orderpriority"
            )
        )
    )


def _ind_oracle(name: str, fk_tab: str, fk: str, pk_tab: str, pk: str) -> str:
    return f"""
    SELECT '{name}' AS candidate,
           CAST(count(*) AS BIGINT) AS n_distinct_fk,
           CAST(sum(coalesce(hit, 0)) AS BIGINT) AS n_contained,
           CAST(round(CAST(sum(coalesce(hit, 0)) AS DOUBLE) / count(*), 6)
                AS DOUBLE) AS containment
    FROM (SELECT DISTINCT {fk} AS val FROM {fk_tab} WHERE {fk} IS NOT NULL) d
    LEFT JOIN (SELECT DISTINCT {pk} AS val, 1 AS hit FROM {pk_tab}
               WHERE {pk} IS NOT NULL) p USING (val)"""


@gate(
    "inclusion_dependency_fk",
    oracle=" UNION ALL ".join(
        [
            _ind_oracle("lineitem.l_partkey<=part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
            _ind_oracle("lineitem.l_suppkey<=supplier.s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
            _ind_oracle("orders.o_custkey<=customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
            _ind_oracle("lineitem.l_suppkey<=part.p_partkey", "lineitem", "l_suppkey", "part", "p_partkey"),
        ]
    ),
)
def q_inclusion_dependency_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency (foreign-key discovery) audit: distinct-value
    containment of three real FK edges plus one deliberately-wrong
    candidate (l_suppkey ⊆ part keys — scores by coincidence of dense id
    ranges, the false-positive a crawler must rank below the real
    edges).  Domain-sized distinct + one left join per candidate
    (operators/validate.py:inclusion_coverage)."""
    from inferdb_spark.operators.validate import inclusion_coverage

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    return (
        inclusion_coverage(li, "l_partkey", part, "p_partkey", "lineitem.l_partkey<=part.p_partkey")
        .unionByName(
            inclusion_coverage(li, "l_suppkey", supp, "s_suppkey", "lineitem.l_suppkey<=supplier.s_suppkey")
        )
        .unionByName(
            inclusion_coverage(o, "o_custkey", cust, "c_custkey", "orders.o_custkey<=customer.c_custkey")
        )
        .unionByName(
            inclusion_coverage(li, "l_suppkey", part, "p_partkey", "lineitem.l_suppkey<=part.p_partkey")
        )
    )


# ---------------------------------------------------------------------------
# Stratified-propensity IPW average treatment effect.  Treatment =
# BUILDING market segment; outcome = lifetime order spend; propensity
# estimated within acctbal strata (exact group fractions, so IPW
# algebraically reduces to the stratified estimator — the classic
# identity, and the cross-engine-exact way to do propensity weighting
# without a fitted model in the determinism path).

_IPW_STRATUM = (
    "least(9, greatest(0, CAST(floor((c_acctbal + 1000.0) / 1100.0) AS BIGINT)))"
)
_IPW_TREAT = "CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END"
_IPW_DIFF6 = (
    "CAST(round((CAST(y1 AS DOUBLE) / n1 - CAST(y0 AS DOUBLE) / n0)"
    " / 100.0, 6) AS DOUBLE)"
)
_IPW_TERM_U = (
    "CAST(floor((CAST(y1 AS DOUBLE) / n1 - CAST(y0 AS DOUBLE) / n0)"
    " * n_s * 10000.0 + 0.5) AS BIGINT)"
)
_IPW_ATE6 = (
    "CAST(round(CAST(sum(term_u) AS DOUBLE) / 10000.0 / sum(n_s) / 100.0, 6)"
    " AS DOUBLE)"
)


@gate(
    "ipw_ate_stratified",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    base AS (
      SELECT {_IPW_STRATUM} AS stratum, {_IPW_TREAT} AS t,
             coalesce(spend.cents, 0) AS y
      FROM customer LEFT JOIN spend ON c_custkey = spend.o_custkey
    ),
    per_s AS (
      SELECT stratum, CAST(count(*) AS BIGINT) AS n_s,
             CAST(sum(t) AS BIGINT) AS n1,
             CAST(sum(1 - t) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS y1,
             CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS y0
      FROM base GROUP BY stratum
    ),
    complete AS (SELECT * FROM per_s WHERE n1 > 0 AND n0 > 0),
    terms AS (SELECT *, {_IPW_TERM_U} AS term_u FROM complete),
    ate AS (SELECT {_IPW_ATE6} AS ate FROM terms)
    SELECT stratum, n_s, n1 AS n_treat, n0 AS n_ctrl,
           {_IPW_DIFF6} AS diff, ate.ate
    FROM complete CROSS JOIN ate ORDER BY stratum
    """,
)
def q_ipw_ate_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average treatment effect of the BUILDING market segment on
    lifetime spend by inverse-propensity weighting with the propensity
    estimated per acctbal stratum — with exact within-stratum propensity
    fractions, IPW reduces algebraically to the stratified estimator
    Σ (n_s/n)·(ȳ₁ₛ − ȳ₀ₛ), which is what makes it cross-engine exact
    (integer-cents sums; per-stratum terms quantized before the final
    weighted sum).  The causal-inference companion to
    gate:cuped_adjusted_ab: that adjusts a randomized A/B, this adjusts
    an OBSERVATIONAL contrast for confounding by balance.  Two groupBys
    plus a 10-row broadcast — scales like a count(*)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    base = (
        cust.join(spend, cust["c_custkey"] == spend["o_custkey"], "left")
        .selectExpr(
            f"{_IPW_STRATUM} AS stratum",
            f"{_IPW_TREAT} AS t",
            "coalesce(cents, 0) AS y",
        )
    )
    per_s = base.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n_s"),
        F.sum("t").cast("long").alias("n1"),
        F.sum(1 - F.col("t")).cast("long").alias("n0"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("y1"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("y0"),
    )
    complete = per_s.filter((F.col("n1") > 0) & (F.col("n0") > 0))
    terms = complete.selectExpr("n_s", f"{_IPW_TERM_U} AS term_u")
    ate = terms.selectExpr(f"{_IPW_ATE6} AS ate")
    return (
        complete.crossJoin(F.broadcast(ate))
        .selectExpr(
            "stratum",
            "n_s",
            "n1 AS n_treat",
            "n0 AS n_ctrl",
            f"{_IPW_DIFF6} AS diff",
            "ate",
        )
        .orderBy("stratum")
    )


# ---------------------------------------------------------------------------
# Difference-in-differences on the 2×2 (cohort × era) design.

_DID_SPLIT = "TIMESTAMP '1998-01-01 00:00:00'"
_DID_MEANS = {
    "m_t_pre": "(CAST(s_t_pre AS DOUBLE) / n_t_pre / 100.0)",
    "m_t_post": "(CAST(s_t_post AS DOUBLE) / n_t_post / 100.0)",
    "m_c_pre": "(CAST(s_c_pre AS DOUBLE) / n_c_pre / 100.0)",
    "m_c_post": "(CAST(s_c_post AS DOUBLE) / n_c_post / 100.0)",
}
_DID_EXPR = (
    f"(({_DID_MEANS['m_t_post']} - {_DID_MEANS['m_t_pre']})"
    f" - ({_DID_MEANS['m_c_post']} - {_DID_MEANS['m_c_pre']}))"
)
_DID_CELL_SUMS = """
      SELECT
        CAST(sum(CASE WHEN t = 1 AND post = 0 THEN c ELSE 0 END) AS BIGINT) AS s_t_pre,
        CAST(sum(CASE WHEN t = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
        CAST(sum(CASE WHEN t = 1 AND post = 1 THEN c ELSE 0 END) AS BIGINT) AS s_t_post,
        CAST(sum(CASE WHEN t = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
        CAST(sum(CASE WHEN t = 0 AND post = 0 THEN c ELSE 0 END) AS BIGINT) AS s_c_pre,
        CAST(sum(CASE WHEN t = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
        CAST(sum(CASE WHEN t = 0 AND post = 1 THEN c ELSE 0 END) AS BIGINT) AS s_c_post,
        CAST(sum(CASE WHEN t = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post
"""
_DID_OUT = [
    "n_t_pre",
    "n_t_post",
    "n_c_pre",
    "n_c_post",
    f"CAST(round({_DID_MEANS['m_t_pre']}, 6) AS DOUBLE) AS mean_t_pre",
    f"CAST(round({_DID_MEANS['m_t_post']}, 6) AS DOUBLE) AS mean_t_post",
    f"CAST(round({_DID_MEANS['m_c_pre']}, 6) AS DOUBLE) AS mean_c_pre",
    f"CAST(round({_DID_MEANS['m_c_post']}, 6) AS DOUBLE) AS mean_c_post",
    f"CAST(round({_DID_EXPR}, 6) AS DOUBLE) AS did",
]


@gate(
    "diff_in_diff_revenue",
    oracle=f"""
    WITH cells AS (
      SELECT CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END AS t,
             CASE WHEN o_orderdate >= {_DID_SPLIT} THEN 1 ELSE 0 END AS post,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders
    ),
    s AS ({_DID_CELL_SUMS} FROM cells)
    SELECT {", ".join(_DID_OUT)} FROM s
    """,
)
def q_diff_in_diff_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on the 2×2 cohort-parity × pre/post-1998
    design over order revenue — the parallel-trends causal estimator
    (and, on this synthetic data, a placebo test: the true effect is 0).
    ONE conditional-sum aggregation in integer cents, four cell means
    and the DiD divided out at the end with the op order pinned by a
    shared SQL string — scales like a count(*)."""
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.selectExpr(
        "CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END AS t",
        f"CASE WHEN o_orderdate >= {_DID_SPLIT} THEN 1 ELSE 0 END AS post",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS c",
    )
    s = cells.selectExpr(
        *[x.strip() for x in _DID_CELL_SUMS.replace("SELECT", "", 1).split(",")]
    )
    return s.selectExpr(*_DID_OUT)


# ---------------------------------------------------------------------------
# 1-D Wasserstein (earth-mover) distance between two price eras on a
# fixed 100-bucket grid: W1 = Σ |F(b) − G(b)| · gap(b) · width, with the
# CDF difference held as EXACT integers (cum_r·n_c − cum_c·n_r) and the
# gap to the next OCCUPIED bin carrying the constant CDF difference
# across empty buckets.  The magnitude-carrying drift companion to
# gate:js_divergence_drift (JSD saturates; W1 says "the mean moved $X").

_W1_SPLIT = "TIMESTAMP '1998-07-01 00:00:00'"
_W1_BIN = "least(99, CAST(floor(l_extendedprice / 1100.0) AS BIGINT))"
_W1_WIDTH = 1100.0
_W1_OUT = (
    f"CAST(round({_W1_WIDTH!r} * CAST(sum_term AS DOUBLE)"
    " / (CAST(n_r AS DOUBLE) * n_c), 6) AS DOUBLE)"
)


@gate(
    "wasserstein_binned_drift",
    oracle=f"""
    WITH b AS (
      SELECT {_W1_BIN} AS bin,
             CASE WHEN l_shipdate < {_W1_SPLIT} THEN 1 ELSE 0 END AS is_r
      FROM lineitem
    ),
    per_bin AS (
      SELECT bin, CAST(sum(is_r) AS BIGINT) AS cnt_r,
             CAST(sum(1 - is_r) AS BIGINT) AS cnt_c
      FROM b GROUP BY bin
    ),
    tot AS (SELECT CAST(sum(cnt_r) AS BIGINT) AS n_r,
                   CAST(sum(cnt_c) AS BIGINT) AS n_c FROM per_bin),
    cum AS (
      SELECT bin,
             sum(cnt_r) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS cum_r,
             sum(cnt_c) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS cum_c,
             coalesce(lead(bin) OVER (ORDER BY bin), bin + 1) - bin AS gap
      FROM per_bin
    ),
    terms AS (
      SELECT abs(cum_r * n_c - cum_c * n_r) * gap AS term, n_r, n_c
      FROM cum CROSS JOIN tot
    ),
    sums AS (
      SELECT CAST(sum(term) AS BIGINT) AS sum_term,
             CAST(min(n_r) AS BIGINT) AS n_r,
             CAST(min(n_c) AS BIGINT) AS n_c,
             CAST(count(*) AS BIGINT) AS n_bins
      FROM terms
    )
    SELECT {_W1_OUT} AS w1, n_r AS n_ref, n_c AS n_cur, n_bins
    FROM sums
    """,
)
def q_wasserstein_binned_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned 1-D Wasserstein distance between pre- and post-1998H2
    price distributions — the drift metric that carries MAGNITUDE in
    dollars (JSD/PSI are dimensionless and saturate).  The CDF
    difference stays in exact integer cross-products (cum_r·n_c −
    cum_c·n_r) so no float accumulates; empty buckets are handled by
    multiplying each term by the gap to the next occupied bin (the CDF
    difference is constant across them); the cumulative windows run
    over the ≤100-bucket domain."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.selectExpr(
        f"{_W1_BIN} AS bin",
        f"CASE WHEN l_shipdate < {_W1_SPLIT} THEN 1 ELSE 0 END AS is_r",
    )
    per_bin = b.groupBy("bin").agg(
        F.sum("is_r").cast("long").alias("cnt_r"),
        F.sum(1 - F.col("is_r")).cast("long").alias("cnt_c"),
    )
    tot = per_bin.agg(
        F.sum("cnt_r").cast("long").alias("n_r"),
        F.sum("cnt_c").cast("long").alias("n_c"),
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wl = Window.orderBy("bin")
    cum = per_bin.select(
        "bin",
        F.sum("cnt_r").over(wc).alias("cum_r"),
        F.sum("cnt_c").over(wc).alias("cum_c"),
        (F.coalesce(F.lead("bin").over(wl), F.col("bin") + 1) - F.col("bin")).alias(
            "gap"
        ),
    )
    terms = cum.crossJoin(F.broadcast(tot)).select(
        (F.abs(F.col("cum_r") * F.col("n_c") - F.col("cum_c") * F.col("n_r"))
         * F.col("gap")).alias("term"),
        "n_r",
        "n_c",
    )
    sums = terms.agg(
        F.sum("term").cast("long").alias("sum_term"),
        F.min("n_r").cast("long").alias("n_r"),
        F.min("n_c").cast("long").alias("n_c"),
        F.count("*").cast("long").alias("n_bins"),
    )
    return sums.selectExpr(
        f"{_W1_OUT} AS w1", "n_r AS n_ref", "n_c AS n_cur", "n_bins"
    )


# ---------------------------------------------------------------------------
# X-bar control chart over weekly order-revenue subgroups: per-week mean
# vs 3-sigma limits from the POOLED population sigma (z scaled by
# sqrt(n_w)).  Revenue held in DOLLARS, not cents — the squared sum in
# cents overflows BIGINT (the gini_grouped_revenue sf10 lesson); dollars
# keep s2 < 2^63 through ~3.7e16 rows.

_XBAR_Z = (
    "((CAST(s1_w AS DOUBLE) / n_w - CAST(s1 AS DOUBLE) / n)"
    " * sqrt(CAST(n_w AS DOUBLE))"
    " / sqrt(CAST(s2 AS DOUBLE) / n"
    " - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))"
)
_XBAR_OUT = [
    "wk",
    "n_w",
    "CAST(round(CAST(s1_w AS DOUBLE) / n_w, 6) AS DOUBLE) AS mean_dollars",
    f"CAST(round({_XBAR_Z}, 6) AS DOUBLE) AS z",
    f"CAST(CASE WHEN abs(CAST(round({_XBAR_Z}, 6) AS DOUBLE)) > 3.0"
    " THEN 1 ELSE 0 END AS BIGINT) AS oob",
]


@gate(
    "xbar_control_chart",
    oracle=f"""
    WITH d AS (
      SELECT CAST(datediff('day', DATE '1970-01-01', o_orderdate) // 7
                  AS BIGINT) AS wk,
             CAST(round(o_totalprice) AS BIGINT) AS dollars
      FROM orders
    ),
    per_wk AS (
      SELECT wk, CAST(count(*) AS BIGINT) AS n_w,
             CAST(sum(dollars) AS BIGINT) AS s1_w,
             CAST(sum(dollars * dollars) AS BIGINT) AS s2_w
      FROM d GROUP BY wk
    ),
    g AS (SELECT CAST(sum(n_w) AS BIGINT) AS n, CAST(sum(s1_w) AS BIGINT) AS s1,
                 CAST(sum(s2_w) AS BIGINT) AS s2 FROM per_wk)
    SELECT {", ".join(_XBAR_OUT)}
    FROM per_wk CROSS JOIN g ORDER BY wk
    """,
)
def q_xbar_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-bar control chart over weekly revenue subgroups: each week's
    mean order value as a z-score against the pooled population sigma
    scaled by sqrt(n_w), with the out-of-control flag decided on the
    ROUNDED z (so the 3.0 boundary can't flip between engines) — the
    manufacturing-SPC view of the drift family (gate:page_hinkley_drift
    detects a changepoint in sequence; this localizes WHICH subgroup is
    out of spec).  One groupBy(week) of integer dollar sums plus a 1-row
    broadcast of the pooled moments; the only ordered pass is the output
    ORDER BY over weeks."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.selectExpr(
        "CAST(datediff(o_orderdate, DATE '1970-01-01') div 7 AS BIGINT) AS wk",
        "CAST(round(o_totalprice) AS BIGINT) AS dollars",
    )
    per_wk = d.groupBy("wk").agg(
        F.count("*").cast("long").alias("n_w"),
        F.sum("dollars").cast("long").alias("s1_w"),
        F.sum(F.col("dollars") * F.col("dollars")).cast("long").alias("s2_w"),
    )
    g = per_wk.agg(
        F.sum("n_w").cast("long").alias("n"),
        F.sum("s1_w").cast("long").alias("s1"),
        F.sum("s2_w").cast("long").alias("s2"),
    )
    return (
        per_wk.crossJoin(F.broadcast(g)).selectExpr(*_XBAR_OUT).orderBy("wk")
    )
