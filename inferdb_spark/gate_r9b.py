"""Round-9 STAGED gates, batch 2: the two-group inference family the
round-7/8 batteries still lacked — Welch's t, standardized effect sizes,
Cliff's delta, the G-test, and the one-way intraclass correlation.

Reference parity: the reference evaluates models with point metrics only
(src/transpiler.py:241-377); these are the comparison statistics an
experimentation/QA pipeline runs NEXT (is variant A's mean different,
and by how much, with what overlap) — the same extension family as
gate:cuped_adjusted_ab / gate:anova_oneway_priority.

Cross-engine determinism (the anova_oneway_priority discipline
throughout): per-group moments are exact BIGINTs in whole dollars; every
per-group or per-cell fractional quantity is unit/micro-quantized BEFORE
any cross-group sum; the final division chains are single shared SQL
strings run verbatim by both engines; transcendental outputs round to
6dp on both sides; means are reported in KILOdollars (6dp above ~1e9 is
not cross-engine-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inferdb_spark.catalog import load_table
from inferdb_spark.gate import gate
from inferdb_spark.gate_r8i import _PRIO_MOM_DUCK, _prio_mom
from inferdb_spark.gate_stats import _CONTINGENCY_SQL

# ---------------------------------------------------------------------------
# Welch's t-test + standardized effect sizes: order value, URGENT vs LOW
# priority (priorities are price-independent in this data -> placebo,
# like anova_oneway_priority).
# ---------------------------------------------------------------------------

_G_A, _G_B = "1-URGENT", "5-LOW"

# pivot the two groups' exact moments into one row; SS_g = qg - round(sg^2/ng)
# (the anova t_u quantization, exact BIGINT afterwards)
_TWO_PIVOT_SQL = f"""
      SELECT
        CAST(max(CASE WHEN grp = '{_G_A}' THEN ng END) AS BIGINT) AS n1,
        CAST(max(CASE WHEN grp = '{_G_A}' THEN sg END) AS BIGINT) AS s1,
        CAST(max(CASE WHEN grp = '{_G_A}' THEN qg
                 - CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                              / CAST(ng AS DOUBLE)) AS BIGINT) END)
             AS BIGINT) AS ss1,
        CAST(max(CASE WHEN grp = '{_G_B}' THEN ng END) AS BIGINT) AS n2,
        CAST(max(CASE WHEN grp = '{_G_B}' THEN sg END) AS BIGINT) AS s2,
        CAST(max(CASE WHEN grp = '{_G_B}' THEN qg
                 - CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                              / CAST(ng AS DOUBLE)) AS BIGINT) END)
             AS BIGINT) AS ss2
"""

# shared scalar fragments (dollars; vi = SSi/(ni-1), mi = si/ni).
# Every zero-able denominator is nullif-guarded (degenerate-input
# battery, round-8 verdict #6): ANSI mode raises DIVIDE_BY_ZERO on ANY
# zero divisor, doubles included, so single-row groups (ni-1 = 0) and
# zero within-group variance (se2 = 0) must yield NULL, not a crash.
# nullif is the identity on the real tables (groups are large,
# variances positive), so gate hashes are unchanged.
_M1 = "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
_M2 = "(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
_V1 = "(CAST(ss1 AS DOUBLE) / nullif(CAST(n1 - 1 AS DOUBLE), 0.0))"
_V2 = "(CAST(ss2 AS DOUBLE) / nullif(CAST(n2 - 1 AS DOUBLE), 0.0))"
_SE2 = f"({_V1} / CAST(n1 AS DOUBLE) + {_V2} / CAST(n2 AS DOUBLE))"

_WELCH_OUT = [
    "n1",
    "n2",
    f"CAST(round({_M1} / 1000.0, 6) AS DOUBLE) AS mean1_k6",
    f"CAST(round({_M2} / 1000.0, 6) AS DOUBLE) AS mean2_k6",
    f"CAST(round(({_M1} - {_M2}) / nullif(sqrt({_SE2}), 0.0), 6) AS DOUBLE) AS t6",
    f"CAST(round({_SE2} * {_SE2} / nullif("
    f"({_V1} / CAST(n1 AS DOUBLE)) * ({_V1} / CAST(n1 AS DOUBLE))"
    f" / nullif(CAST(n1 - 1 AS DOUBLE), 0.0)"
    f" + ({_V2} / CAST(n2 AS DOUBLE)) * ({_V2} / CAST(n2 AS DOUBLE))"
    f" / nullif(CAST(n2 - 1 AS DOUBLE), 0.0), 0.0), 6) AS DOUBLE) AS df6",
]


def _two_group_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_g = _prio_mom(spark, sf_dir).filter(F.col("grp").isin(_G_A, _G_B))
    return per_g.selectExpr("grp", "ng", "sg", "qg").agg(
        F.expr(
            f"CAST(max(CASE WHEN grp = '{_G_A}' THEN ng END) AS BIGINT)"
        ).alias("n1"),
        F.expr(
            f"CAST(max(CASE WHEN grp = '{_G_A}' THEN sg END) AS BIGINT)"
        ).alias("s1"),
        F.expr(
            f"CAST(max(CASE WHEN grp = '{_G_A}' THEN qg"
            " - CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)"
            " / CAST(ng AS DOUBLE)) AS BIGINT) END) AS BIGINT)"
        ).alias("ss1"),
        F.expr(
            f"CAST(max(CASE WHEN grp = '{_G_B}' THEN ng END) AS BIGINT)"
        ).alias("n2"),
        F.expr(
            f"CAST(max(CASE WHEN grp = '{_G_B}' THEN sg END) AS BIGINT)"
        ).alias("s2"),
        F.expr(
            f"CAST(max(CASE WHEN grp = '{_G_B}' THEN qg"
            " - CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)"
            " / CAST(ng AS DOUBLE)) AS BIGINT) END) AS BIGINT)"
        ).alias("ss2"),
    )


@gate(
    "welch_t_test",
    oracle=f"""
    WITH per_g AS ({_PRIO_MOM_DUCK}),
    two AS ({_TWO_PIVOT_SQL} FROM per_g WHERE grp IN ('{_G_A}', '{_G_B}'))
    SELECT {", ".join(_WELCH_OUT)} FROM two
    """,
)
def q_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test for mean order value, URGENT vs
    LOW priority, with the Welch-Satterthwaite degrees of freedom — the
    default two-sample mean test (cuped_adjusted_ab is its
    variance-reduced A/B sibling; anova generalizes to k groups).  A
    placebo on this data: priorities are assigned independently of price.

    Exactness: the two groups' (n, sum, sum-of-squares) moments are exact
    whole-dollar BIGINTs; SS_g = qg - round(sg^2/ng) quantizes the single
    fractional per-group term before the pivot; t and df divide once in a
    shared SQL string; means are reported in kilodollars at 6dp.
    Scale: one map-side-combinable groupBy; everything after is one row."""
    return _two_group_pivot(spark, sf_dir).selectExpr(*_WELCH_OUT)


_POOLED_SD = (
    "nullif(sqrt((CAST(ss1 AS DOUBLE) + CAST(ss2 AS DOUBLE))"
    " / nullif(CAST(n1 + n2 - 2 AS DOUBLE), 0.0)), 0.0)"
)
_EFFECT_OUT = [
    "n1",
    "n2",
    f"CAST(round(({_M1} - {_M2}) / {_POOLED_SD}, 6) AS DOUBLE) AS cohens_d6",
    f"CAST(round(({_M1} - {_M2}) / {_POOLED_SD}"
    f" * (1.0 - 3.0 / nullif(4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0, 0.0)), 6)"
    " AS DOUBLE) AS hedges_g6",
    f"CAST(round(({_M1} - {_M2}) / nullif(sqrt({_V2}), 0.0), 6) AS DOUBLE)"
    " AS glass_delta6",
]


@gate(
    "effect_sizes_two_group",
    oracle=f"""
    WITH per_g AS ({_PRIO_MOM_DUCK}),
    two AS ({_TWO_PIVOT_SQL} FROM per_g WHERE grp IN ('{_G_A}', '{_G_B}'))
    SELECT {", ".join(_EFFECT_OUT)} FROM two
    """,
)
def q_effect_sizes_two_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes for the same URGENT-vs-LOW contrast:
    Cohen's d (pooled SD), Hedges' g (small-sample bias correction
    1 - 3/(4N-9)), and Glass's delta (control-group SD) — the magnitude
    companions to gate:welch_t_test's significance.  Same exact-moment
    relation, same quantization discipline, one shared division chain."""
    return _two_group_pivot(spark, sf_dir).selectExpr(*_EFFECT_OUT)


# ---------------------------------------------------------------------------
# Cliff's delta on $100 price bins (the mann_whitney_binned grid)
# ---------------------------------------------------------------------------

_CLIFF_BIN_CENTS = 10_000  # $100 bins — the kruskal/mann-whitney grid

_CLIFF_OUT = [
    "n1",
    "n2",
    "gt_pairs",
    "lt_pairs",
    "CAST(round((CAST(gt_pairs AS DOUBLE) - CAST(lt_pairs AS DOUBLE))"
    " / nullif(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE), 0.0), 6) AS DOUBLE)"
    " AS cliffs_delta6",
]


@gate(
    "cliffs_delta_binned",
    oracle=f"""
    WITH binned AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) // {_CLIFF_BIN_CENTS}
               AS v,
             CAST(CASE WHEN o_orderpriority = '{_G_A}' THEN 1 ELSE 0 END
                  AS BIGINT) AS c1f,
             CAST(CASE WHEN o_orderpriority = '{_G_B}' THEN 1 ELSE 0 END
                  AS BIGINT) AS c2f
      FROM orders
      WHERE o_orderpriority IN ('{_G_A}', '{_G_B}')
    ),
    hist AS (
      SELECT v, CAST(sum(c1f) AS BIGINT) AS c1, CAST(sum(c2f) AS BIGINT) AS c2
      FROM binned GROUP BY v
    ),
    cum AS (
      SELECT v, c1, c2,
             CAST(coalesce(sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c2_below,
             CAST(sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS c2_upto,
             CAST(sum(c2) OVER () AS BIGINT) AS n2_all
      FROM hist
    ),
    tr AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(max(n2_all) AS BIGINT) AS n2,
             CAST(sum(c1 * c2_below) AS BIGINT) AS gt_pairs,
             CAST(sum(c1 * (n2_all - c2_upto)) AS BIGINT) AS lt_pairs
      FROM cum
    )
    SELECT {", ".join(_CLIFF_OUT)} FROM tr
    """,
)
def q_cliffs_delta_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta (= the rank-biserial correlation of the
    Mann-Whitney U) for URGENT vs LOW order values on the shared $100
    bin grid: P(X1 > X2) - P(X1 < X2), the nonparametric effect size
    that complements gate:mann_whitney_binned's significance.

    Exactness: pure integer pair counting — gt/lt pair totals come from
    ONE cumulative window over the domain-bounded bin relation (never a
    bin x bin cross join), with the single division at the end.  Scale:
    one groupBy(bin); the window runs over ~5k bins regardless of row
    count."""
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(_G_A, _G_B)
    )
    binned = od.select(
        F.expr(
            f"CAST(round(o_totalprice * 100) AS BIGINT) div {_CLIFF_BIN_CENTS}"
        ).alias("v"),
        F.when(F.col("o_orderpriority") == _G_A, 1).otherwise(0)
        .cast("long")
        .alias("c1f"),
        F.when(F.col("o_orderpriority") == _G_B, 1).otherwise(0)
        .cast("long")
        .alias("c2f"),
    )
    hist = binned.groupBy("v").agg(
        F.sum("c1f").cast("long").alias("c1"),
        F.sum("c2f").cast("long").alias("c2"),
    )
    w_below = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w_upto = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "c1",
        F.coalesce(F.sum("c2").over(w_below), F.lit(0)).cast("long").alias(
            "c2_below"
        ),
        F.sum("c2").over(w_upto).cast("long").alias("c2_upto"),
        F.sum("c2").over(w_all).cast("long").alias("n2_all"),
    )
    tr = cum.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.max("n2_all").cast("long").alias("n2"),
        F.sum(F.col("c1") * F.col("c2_below")).cast("long").alias("gt_pairs"),
        F.sum(F.col("c1") * (F.col("n2_all") - F.col("c2_upto")))
        .cast("long")
        .alias("lt_pairs"),
    )
    return tr.selectExpr(*_CLIFF_OUT)


# ---------------------------------------------------------------------------
# G-test (log-likelihood-ratio chi-squared) of independence
# ---------------------------------------------------------------------------

_G_TERM = (
    "CAST(round(2.0 * CAST(nab AS DOUBLE)"
    " * ln(CAST(nab AS DOUBLE) * CAST(n AS DOUBLE)"
    " / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) * 1000000) AS BIGINT)"
)


@gate(
    "g_test_independence",
    oracle=f"""
    WITH {_CONTINGENCY_SQL},
    cells AS (SELECT {_G_TERM} AS term_micro FROM marg),
    dims AS (
      SELECT CAST((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS BIGINT)
               AS dof
      FROM obs
    )
    SELECT CAST(sum(term_micro) AS BIGINT) AS g_micro,
           (SELECT dof FROM dims) AS dof,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM cells
    """,
)
def q_g_test_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio chi-squared) for return flag x line
    status: G = 2 sum O ln(O/E) — gate:chi2_independence's
    information-theoretic twin (G/2 = n * mutual information in nats),
    preferred when any O/E ratio is large.  Same contingency relation,
    same per-cell micro-quantization before the BIGINT sum; the ln runs
    on the identical operand order in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.groupBy(
        F.col("l_returnflag").alias("a"), F.col("l_linestatus").alias("b")
    ).agg(F.count("*").cast("long").alias("nab"))
    marg = (
        obs.withColumn("na", F.sum("nab").over(Window.partitionBy("a")))
        .withColumn("nb", F.sum("nab").over(Window.partitionBy("b")))
        .withColumn("n", F.sum("nab").over(Window.partitionBy()))
    )
    cells = marg.selectExpr(f"{_G_TERM} AS term_micro")
    dof = obs.agg(
        (
            (F.countDistinct("a") - 1) * (F.countDistinct("b") - 1)
        ).cast("long").alias("dof")
    )
    return cells.agg(
        F.sum("term_micro").cast("long").alias("g_micro"),
        F.count("*").cast("long").alias("n_cells"),
    ).crossJoin(F.broadcast(dof)).select("g_micro", "dof", "n_cells")


# ---------------------------------------------------------------------------
# One-way intraclass correlation, ICC(1): order values grouped by customer
# ---------------------------------------------------------------------------

_ICC_TG = (
    "CAST(round(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)"
    " / CAST(ng AS DOUBLE)) AS BIGINT)"
)
_MSB = (
    "((CAST(t_sum AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
    " / nullif(CAST(g - 1 AS DOUBLE), 0.0))"
)
_MSW = (
    "((CAST(q_sum AS DOUBLE) - CAST(t_sum AS DOUBLE))"
    " / nullif(CAST(n - g AS DOUBLE), 0.0))"
)
_K0 = (
    "((CAST(n AS DOUBLE) - CAST(nn_sum AS DOUBLE) / CAST(n AS DOUBLE))"
    " / nullif(CAST(g - 1 AS DOUBLE), 0.0))"
)
_ICC_OUT = [
    "g",
    "n",
    f"CAST(round({_K0}, 6) AS DOUBLE) AS k0_6",
    f"CAST(round({_MSB} / nullif({_MSW}, 0.0), 6) AS DOUBLE) AS f6",
    f"CAST(round(({_MSB} - {_MSW})"
    f" / nullif({_MSB} + ({_K0} - 1.0) * {_MSW}, 0.0), 6)"
    " AS DOUBLE) AS icc1_6",
]


@gate(
    "icc_oneway_customer",
    oracle=f"""
    WITH per_c AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS sg,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)
                      * CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS qg
      FROM orders GROUP BY o_custkey
    ),
    quant AS (SELECT ng, sg, qg, {_ICC_TG} AS t_u FROM per_c),
    gtot AS (
      SELECT CAST(count(*) AS BIGINT) AS g, CAST(sum(ng) AS BIGINT) AS n,
             CAST(sum(sg) AS BIGINT) AS s, CAST(sum(qg) AS BIGINT) AS q_sum,
             CAST(sum(t_u) AS BIGINT) AS t_sum,
             CAST(sum(ng * ng) AS BIGINT) AS nn_sum
      FROM quant
    )
    SELECT {", ".join(_ICC_OUT)} FROM gtot
    """,
)
def q_icc_oneway_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICC(1): how much of order-value variance is BETWEEN customers —
    the clustering diagnostic that says whether per-customer random
    effects (or clustered standard errors) are needed before any A/B
    read-out; k0 is the unbalanced-design group-size correction
    (N - sum n_i^2/N)/(G-1).  Near zero here: the synthetic generator
    draws order values independently of customer.

    Exactness: identical moment/quantization scheme as
    gate:anova_oneway_priority (whole-dollar BIGINTs, per-group
    sg^2/ng unit-quantized, shared division chain).  Scale: one
    groupBy(custkey) — row-proportional; the reduce sees one row per
    customer, the output one row."""
    od = load_table(spark, sf_dir, "orders")
    d = F.round(F.col("o_totalprice")).cast("long")
    per_c = od.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("ng"),
        F.sum(d).cast("long").alias("sg"),
        F.sum(d * d).cast("long").alias("qg"),
    )
    quant = per_c.selectExpr("ng", "sg", "qg", f"{_ICC_TG} AS t_u")
    gtot = quant.agg(
        F.count("*").cast("long").alias("g"),
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("qg").cast("long").alias("q_sum"),
        F.sum("t_u").cast("long").alias("t_sum"),
        F.sum(F.col("ng") * F.col("ng")).cast("long").alias("nn_sum"),
    )
    return gtot.selectExpr(*_ICC_OUT)
