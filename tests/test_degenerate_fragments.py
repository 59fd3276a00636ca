"""Degenerate-input battery for the r8/r9 statistic FRAGMENTS.

Round-8 verdict #6: every gate_r8/r9 statistic with a division or
variance denominator must return NULL on degenerate inputs — never raise
ANSI DIVIDE_BY_ZERO (the log-rank zero-variance class, round-7 #1).

These gates compute over fixed tables, so their degenerate regimes can't
be reached through the tables themselves; instead this battery drives the
SHARED SQL fragment constants (used verbatim by both the Spark selectExpr
and the DuckDB oracle, so one nullif guard fixes both engines) with
synthetic moment rows that zero each denominator:

- single-row groups (n-1 = 0), single group (k-1 = 0), one row per group
  (n-k = 0), zero within-group variance, all-ties rank inputs, empty
  samples, collinear covariates, perfect autocorrelation, unanimous
  raters, zero-revenue totals.

Contract: collect() succeeds and the undefined statistic is NULL.
"""

from __future__ import annotations

import pytest

from inferdb_spark import gate_r8a, gate_r8b, gate_r8i, gate_r8k, gate_r9b, gate_r9c


def _run(spark, schema: str, row: tuple, exprs: list[str]):
    df = spark.createDataFrame([row], schema)
    return df.selectExpr(*exprs).collect()[0]


# ---------------------------------------------------------------------------
# r9b: Welch t / effect sizes (pivot moments n1,s1,ss1,n2,s2,ss2)
# ---------------------------------------------------------------------------

_PIVOT_SCHEMA = "n1 long, s1 long, ss1 long, n2 long, s2 long, ss2 long"

WELCH_DEGENERATE = [
    (1, 5, 0, 1, 7, 0),        # singleton groups: n-1 = 0
    (3, 9, 0, 4, 20, 0),       # zero within-group variance: se2 = 0
    (1, 5, 0, 4, 20, 6),       # one singleton, one healthy
]


@pytest.mark.parametrize("row", WELCH_DEGENERATE)
def test_welch_degenerate(spark, row):
    r = _run(spark, _PIVOT_SCHEMA, row, gate_r9b._WELCH_OUT)
    assert r["t6"] is None and r["df6"] is None


@pytest.mark.parametrize("row", WELCH_DEGENERATE[:2])
def test_effect_sizes_degenerate(spark, row):
    r = _run(spark, _PIVOT_SCHEMA, row, gate_r9b._EFFECT_OUT)
    # pooled sd is 0 or undefined in both cases above
    assert r["cohens_d6"] is None and r["hedges_g6"] is None


def test_effect_sizes_one_singleton_group(spark):
    # (1, healthy): pooled dof = 3 > 0 so d is defined; no raise either way
    r = _run(spark, _PIVOT_SCHEMA, (1, 5, 0, 4, 20, 6), gate_r9b._EFFECT_OUT)
    assert r["cohens_d6"] is not None


def test_effect_sizes_glass_zero_control_variance(spark):
    r = _run(spark, _PIVOT_SCHEMA, (4, 20, 6, 3, 9, 0), gate_r9b._EFFECT_OUT)
    assert r["glass_delta6"] is None          # control variance = 0
    assert r["cohens_d6"] is not None         # pooled sd > 0: still defined


def test_welch_healthy_matches_python(spark):
    n1, s1, ss1, n2, s2, ss2 = 4, 20, 6, 5, 10, 8
    r = _run(spark, _PIVOT_SCHEMA, (n1, s1, ss1, n2, s2, ss2), gate_r9b._WELCH_OUT)
    v1, v2 = ss1 / (n1 - 1), ss2 / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    want_t = round((s1 / n1 - s2 / n2) / se2 ** 0.5, 6)
    assert abs(r["t6"] - want_t) < 2e-6


# ---------------------------------------------------------------------------
# r9b: Cliff's delta (n1, n2, gt_pairs, lt_pairs)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("row", [(5, 0, 0, 0), (0, 0, 0, 0)])
def test_cliffs_delta_empty_group(spark, row):
    r = _run(
        spark,
        "n1 long, n2 long, gt_pairs long, lt_pairs long",
        row,
        gate_r9b._CLIFF_OUT,
    )
    assert r["cliffs_delta6"] is None


# ---------------------------------------------------------------------------
# r9b: ICC(1) (g, n, s, q_sum, t_sum, nn_sum)
# ---------------------------------------------------------------------------

_ICC_SCHEMA = "g long, n long, s long, q_sum long, t_sum long, nn_sum long"


def test_icc_single_group(spark):
    r = _run(spark, _ICC_SCHEMA, (1, 5, 10, 30, 20, 25), gate_r9b._ICC_OUT)
    assert r["f6"] is None and r["icc1_6"] is None and r["k0_6"] is None


def test_icc_all_singleton_groups(spark):
    # n = g: MSW dof = 0
    r = _run(spark, _ICC_SCHEMA, (3, 3, 6, 14, 14, 3), gate_r9b._ICC_OUT)
    assert r["f6"] is None


def test_icc_zero_within_variance(spark):
    # q_sum = t_sum: MSW = 0 -> F undefined, ICC still defined (=1 regime)
    r = _run(spark, _ICC_SCHEMA, (3, 9, 18, 110, 110, 27), gate_r9b._ICC_OUT)
    assert r["f6"] is None


# ---------------------------------------------------------------------------
# r9b: G-test term (nab, na, nb, n) — no zero denominator is reachable
# from a groupBy count, but the fragment must survive the 1-cell table
# ---------------------------------------------------------------------------


def test_g_term_single_cell(spark):
    r = _run(
        spark,
        "nab long, na long, nb long, n long",
        (1, 1, 1, 1),
        [f"{gate_r9b._G_TERM} AS term_micro"],
    )
    assert r["term_micro"] == 0  # 2*1*ln(1) = 0


# ---------------------------------------------------------------------------
# r8i: ANOVA (k, n, s, q_sum, t_sum)
# ---------------------------------------------------------------------------

_ANOVA_SCHEMA = "k long, n long, s long, q_sum long, t_sum long"


@pytest.mark.parametrize(
    "row",
    [
        (1, 5, 10, 30, 20),   # single group: k-1 = 0
        (3, 3, 6, 14, 14),    # one row per group: n-k = 0
        (3, 9, 18, 110, 110), # zero within-group variance: MSW = 0
    ],
)
def test_anova_degenerate(spark, row):
    r = _run(spark, _ANOVA_SCHEMA, row, gate_r8i._ANOVA_OUT)
    assert r["f6"] is None


# ---------------------------------------------------------------------------
# r8i: Kruskal-Wallis (n, k, hsum, tie_term)
# ---------------------------------------------------------------------------


def test_kw_single_row(spark):
    r = _run(
        spark,
        "n long, k long, hsum double, tie_term long",
        (1, 1, 0.0, 0),
        gate_r8i._KW_OUT,
    )
    assert r["c6"] is None and r["h_tied6"] is None


def test_kw_all_ties(spark):
    # every value in one bin: tie_term = n^3 - n -> correction c = 0
    r = _run(
        spark,
        "n long, k long, hsum double, tie_term long",
        (5, 2, 0.0, 120),
        gate_r8i._KW_OUT,
    )
    assert r["c6"] == 0.0 and r["h_tied6"] is None


# ---------------------------------------------------------------------------
# r8i: Bartlett (outer: n, k, sp2, wsum, isum; per-group: ng, sg, qg)
# ---------------------------------------------------------------------------


def test_bartlett_single_group(spark):
    r = _run(
        spark,
        "n long, k long, sp2 double, wsum double, isum double",
        (5, 1, 2.0, 1.0, 0.5),
        gate_r8i._BART_OUT,
    )
    assert r["t6"] is None  # correction divides by 3(k-1) = 0


def test_bartlett_zero_pooled_variance(spark):
    # ln(0) -> NULL propagates, no raise
    r = _run(
        spark,
        "n long, k long, sp2 double, wsum double, isum double",
        (6, 2, 0.0, 1.0, 0.5),
        gate_r8i._BART_OUT,
    )
    assert r["t6"] is None


def test_bartlett_lnv_singleton_group(spark):
    r = _run(
        spark,
        "ng long, sg long, qg long",
        (1, 5, 25),
        [f"{gate_r8i._BART_LNV} AS lnvg"],
    )
    assert r["lnvg"] is None  # ng(ng-1) = 0


def test_bartlett_lnv_zero_variance_group(spark):
    r = _run(
        spark,
        "ng long, sg long, qg long",
        (4, 8, 16),
        [f"{gate_r8i._BART_LNV} AS lnvg"],
    )
    assert r["lnvg"] is None  # ln(0) -> NULL in both engines


# ---------------------------------------------------------------------------
# r8k: Dunn z (all-ties input zeroes the rank variance)
# ---------------------------------------------------------------------------


def test_dunn_all_ties(spark):
    # n = 4, tie_term = 60 = n^3 - n: V = 4*5/12 - 60/36 = 0
    r = _run(
        spark,
        "g1 string, g2 string, n1 long, n2 long, r2g_1 long, r2g_2 long,"
        " n long, tie_term long",
        ("A", "B", 2, 2, 10, 10, 4, 60),
        gate_r8k._DUNN_OUT,
    )
    assert r["z6"] is None and r["significant"] == 0


def test_dunn_single_row_total(spark):
    r = _run(
        spark,
        "g1 string, g2 string, n1 long, n2 long, r2g_1 long, r2g_2 long,"
        " n long, tie_term long",
        ("A", "B", 1, 1, 3, 3, 1, 0),
        gate_r8k._DUNN_OUT,
    )
    assert r["z6"] is None  # 12(n-1) = 0


# ---------------------------------------------------------------------------
# r8k: Mood per-cell chi2 term (a column total of zero)
# ---------------------------------------------------------------------------


def test_mood_term_zero_column_total(spark):
    r = _run(
        spark,
        "n_above long, n_below_eq long, ng long, n long,"
        " tot_above long, tot_below long",
        (0, 4, 4, 4, 0, 4),
        [
            f"{gate_r8k._mood_term('n_above', 'tot_above')} AS t_above",
            f"{gate_r8k._mood_term('n_below_eq', 'tot_below')} AS t_below",
        ],
    )
    assert r["t_above"] is None and r["t_below"] is not None


# ---------------------------------------------------------------------------
# r8k: partial correlation (zero-variance margin; collinear z)
# ---------------------------------------------------------------------------

_PC_SCHEMA = (
    "n long, sx long, sy long, sz long, qx long, qy long, qz long,"
    " cxy long, cxz long, cyz long"
)


def test_partial_corr_zero_variance_margin(spark):
    # x constant: qx = sx^2/n exactly -> var(x) = 0 -> r_xy undefined
    r = _run(
        spark, _PC_SCHEMA, (4, 8, 10, 6, 16, 30, 14, 20, 12, 16),
        gate_r8k._PC_INNER,
    )
    assert r["r_xy6"] is None and r["r_xz6"] is None


def test_partial_corr_collinear_z(spark):
    # feed the OUTER stage rounded correlations with |r_xz| = 1
    r = _run(
        spark,
        "n long, r_xy6 double, r_xz6 double, r_yz6 double",
        (10, 0.5, 1.0, 0.5),
        gate_r8k._PC_OUTER,
    )
    assert r["r_xy_given_z6"] is None


# ---------------------------------------------------------------------------
# r8k: PACF Durbin-Levinson (perfect lag-1 autocorrelation)
# ---------------------------------------------------------------------------


def test_pacf_perfect_rho1(spark):
    r = _run(
        spark,
        "n_weeks long, rho1_6 double, rho2_6 double, rho3_6 double",
        (52, 1.0, 1.0, 1.0),
        gate_r8k._PACF_OUT,
    )
    assert r["pacf2_6"] is None and r["pacf3_6"] is None


# ---------------------------------------------------------------------------
# r9c: Krippendorff alpha (unanimous raters: expected disagreement = 0)
# ---------------------------------------------------------------------------


def test_krippendorff_unanimous(spark):
    # 4 items x 3 raters all category 0: c0 = 12 = 3N, d_sum = 0, De = 0
    r = _run(
        spark,
        "n_items long, d_sum long, c0 long, c1 long, c2 long",
        (4, 0, 12, 0, 0),
        gate_r9c._KRIPP_OUT,
    )
    assert r["alpha6"] is None


# ---------------------------------------------------------------------------
# r9c: concentration indices (zero total revenue)
# ---------------------------------------------------------------------------


def test_concentration_zero_total(spark):
    r = _run(
        spark,
        "ns long, tot long, hhi long, theil long, sq long",
        (3, 0, 0, 0, 0),
        gate_r9c._CONC_OUT,
    )
    assert r["atkinson_half6"] is None
    terms = _run(
        spark,
        "rev long, tot long, ns long",
        (0, 0, 3),
        gate_r9c._CONC_TERMS,
    )
    assert terms["hhi_nano"] is None and terms["theil_micro"] is None


# ---------------------------------------------------------------------------
# r8b: CvM / energy two-sample terms (one empty sample)
# ---------------------------------------------------------------------------


def test_cvm_energy_empty_sample(spark):
    r = _run(
        spark,
        "w long, d long, n_r long, n_c long, gap long",
        (3, 5, 0, 7, 1),
        [
            f"{gate_r8b._CVM_TERM} AS cvm_u",
            f"{gate_r8b._ENERGY_TERM} AS energy_u",
        ],
    )
    assert r["cvm_u"] is None and r["energy_u"] is None


# ---------------------------------------------------------------------------
# r8b: RDD local-linear (all mass at one running-variable value)
# ---------------------------------------------------------------------------


def test_rdd_constant_running_variable(spark):
    # both sides: u identical everywhere -> n*suu - su^2 = 0
    row = (3, 6, 12, 30, 60, 3, 6, 12, 30, 60)
    schema = (
        "n_l long, su_l long, suu_l long, sy_l long, suy_l long,"
        " n_r long, su_r long, suu_r long, sy_r long, suy_r long"
    )
    r = _run(spark, schema, row, gate_r8b._RDD_OUT)
    assert r["slope_left6"] is None and r["tau6"] is None


# ---------------------------------------------------------------------------
# r8a: Cronbach alpha (zero-variance item / zero-variance total)
# ---------------------------------------------------------------------------

_CRON_SCHEMA = (
    "n long, s1 long, s2 long, s3 long, st long,"
    " q1 long, q2 long, q3 long, qt long,"
    " c12 long, c13 long, c23 long"
)


def test_cronbach_zero_total_variance(spark):
    # constant total score: qt = st^2/n -> var_tot = 0 -> alpha undefined
    row = (4, 4, 4, 4, 12, 8, 8, 8, 36, 2, 2, 2)
    r = _run(spark, _CRON_SCHEMA, row, gate_r8a._CRON_INNER)
    assert r["alpha_raw6"] is None


def test_cronbach_outer_degenerate_correlations(spark):
    # r_ij = -0.5 each: 1 + 2*rbar = 0 -> standardized alpha undefined
    r = _run(
        spark,
        "n long, s1 long, s2 long, s3 long, st long,"
        " var1_6 double, var2_6 double, var3_6 double, var_tot6 double,"
        " alpha_raw6 double, r12_6 double, r13_6 double, r23_6 double",
        (4, 1, 1, 1, 3, 1.0, 1.0, 1.0, 0.5, 0.2, -0.5, -0.5, -0.5),
        gate_r8a._CRON_OUTER,
    )
    assert r["alpha_std6"] is None
