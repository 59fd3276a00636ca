"""Degenerate-input battery for the r10 statistic fragments.

Round-9 verdict #6: every r10 gate with a variance/denominator needs a
battery row under the NULL-not-raise contract (the log-rank
zero-variance class).  Same method as test_degenerate_fragments: the
gates compute over fixed tables, so the battery drives the SHARED SQL
fragment constants (used verbatim by the Spark selectExpr AND the
DuckDB oracle — one nullif guard fixes both engines) with synthetic
moment rows that zero each denominator.

Contract: collect() succeeds and the undefined statistic is NULL —
never NaN, never Inf, never an ANSI raise.

Covered denominator classes: empty paired sample (Wilcoxon n=0, sign
m=0), all-ties variance (Wilcoxon tie term), too-short series
(Ljung-Box lags, variance-ratio n=1), constant series (Dickey-Fuller
det, KPSS sigma2, Granger own-lag), collinear lags (Granger det),
epsilon-negative quantized LRV (Newey-West), degenerate OLS points
(Weibull single point), zero-variance features (ridge OLS det),
single ordered group (Jonckheere), empty distribution side (Hellinger,
Hotelling), disjoint supports (Bhattacharyya -ln 0), singleton-group
pooled dof (Hotelling), degree-regular graph (assortativity), absent
predicted class (MCC), zero compliance (IV-Wald).
"""

from __future__ import annotations

import math

import pytest

from inferdb_spark import gate_r10a, gate_r10b, gate_r10c, gate_r10d


def _run(spark, schema: str, row: tuple, exprs: list[str]):
    return spark.createDataFrame([row], schema).selectExpr(*exprs).collect()[0]


def _defined(v) -> bool:
    return v is not None and not (isinstance(v, float) and not math.isfinite(v))


# ---------------------------------------------------------------------------
# r10a — Wilcoxon / sign / Ljung-Box / Granger
# ---------------------------------------------------------------------------

_WILCOX_SCHEMA = "n long, w2_pos long, tie_term long"


@pytest.mark.parametrize("row", [
    (0, 0, 0),      # empty paired sample
    (2, 6, 60),     # all-ties: tie_term = 2n(n+1)(2n+1) zeroes the variance
])
def test_wilcoxon_degenerate(spark, row):
    r = _run(spark, _WILCOX_SCHEMA, row, gate_r10a._WILCOX_OUT)
    assert r["z6"] is None


def test_sign_test_degenerate(spark):
    r = _run(spark, "m long, k_pos long", (0, 0), gate_r10a._SIGN_OUT)
    assert r["z6"] is None and r["z_cc6"] is None


_LB_SCHEMA = "n_weeks long, rho1_6 double, rho2_6 double, rho3_6 double"


@pytest.mark.parametrize("n_weeks", [1, 2, 3])
def test_ljung_box_short_series(spark, n_weeks):
    r = _run(spark, _LB_SCHEMA, (n_weeks, 0.5, 0.2, 0.1), gate_r10a._LB_OUT)
    assert r["q3_6"] is None
    assert r["reject_white_noise"] == 0  # NULL Q never rejects


_GC_SCHEMA = ("n long, syt long, sxt long, sy1 long, sx1 long, qyt long, "
              "qxt long, qy1 long, qx1 long, pyty1 long, pytx1 long, "
              "pxty1 long, pxtx1 long, py1x1 long")

GC_DEGENERATE = [
    # constant series: every moment zero -> own-lag variance s11 = 0
    (5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    # collinear lags: y1 == x1 == (1,2,3,4) with yt = xt = 0 -> det = 0
    (4, 0, 0, 10, 10, 0, 0, 30, 30, 0, 0, 0, 0, 30),
]


@pytest.mark.parametrize("row", GC_DEGENERATE)
def test_granger_degenerate(spark, row):
    r = _run(spark, _GC_SCHEMA, row, gate_r10a._GC_OUT)
    assert r["f_orders_to_revenue6"] is None
    assert r["f_revenue_to_orders6"] is None


# ---------------------------------------------------------------------------
# r10b — MCC / IV-Wald / Weibull / ridge
# ---------------------------------------------------------------------------


def test_mcc_absent_predicted_class(spark):
    # tp + fp = 0: MCC undefined, balanced accuracy still defined
    r = _run(spark, "tp long, fp long, fn long, tn long", (0, 0, 3, 7),
             gate_r10b._MCC_OUT)
    assert r["mcc6"] is None
    assert r["balanced_acc6"] == 0.5


def test_iv_wald_zero_compliance(spark):
    # identical first-stage means: Wald ratio undefined, ITT defined
    r = _run(spark, "n0 long, n1 long, sx0 long, sx1 long, sy0 long, sy1 long",
             (2, 2, 4, 4, 10000, 20000), gate_r10b._IV_OUT)
    assert r["wald_beta6"] is None
    assert _defined(r["itt_k6"])


@pytest.mark.parametrize("row", [
    (1, 0, -500000, 0, 0),          # single KM point: OLS det = 0
    (0, None, None, None, None),    # no KM points at all
])
def test_weibull_degenerate(spark, row):
    r = _run(spark, "np long, su long, sv long, suu long, suv long", row,
             gate_r10b._WB_OUT)
    assert r["shape6"] is None and r["ln_scale6"] is None


def test_ridge_zero_variance_features(spark):
    # constant-zero features: OLS det = 0 AND lam = 0 so ridge det = 0 too
    r = _run(spark,
             "n long, s1 long, s2 long, sy long, q1 long, q2 long, "
             "c12 long, c1y long, c2y long",
             (5, 0, 0, 10, 0, 0, 0, 0, 0), gate_r10b._RR_OUT)
    assert r["b1_ols6"] is None and r["b2_ols6"] is None
    assert r["b1_ridge6"] is None and r["b2_ridge6"] is None


# ---------------------------------------------------------------------------
# r10c — Dickey-Fuller / KPSS / Newey-West / variance ratio
# ---------------------------------------------------------------------------

_DF_SCHEMA = "n long, sx long, sxx long, sd long, sxd long, sdd long"


@pytest.mark.parametrize("row", [
    (5, 35, 245, 0, 0, 0),   # constant series: det = n*sxx - sx^2 = 0
    (1, 3, 9, 0, 0, 0),      # single observation
])
def test_dickey_fuller_degenerate(spark, row):
    r = _run(spark, _DF_SCHEMA, row, gate_r10c._DF_OUT)
    assert r["b6"] is None and r["t_df6"] is None


def test_kpss_constant_series(spark):
    r = _run(spark, "n long, sy long, syy long, ssq double",
             (5, 35, 245, 0.0), gate_r10c._KPSS_OUT)
    assert r["sigma2_m6"] == 0.0
    assert r["eta6"] is None


def test_newey_west_negative_quantized_lrv(spark):
    # Bartlett-weighted sum dips epsilon-negative after quantization:
    # the se is undefined (NULL), never sqrt(-x) = NaN
    r = _run(spark, "n long, g0 long, g1 long, g2 long, g3 long, g4 long",
             (10, 0, -100, 0, 0, 0), gate_r10c._NW_OUT)
    assert r["lrv_m6"] is not None  # the (negative) LRV itself is reported
    assert r["se_mean6"] is None


def test_variance_ratio_single_diff(spark):
    # n = 1: var1 dof = 0 -> ratio and z undefined
    r = _run(spark, "n long, sd long, sdd long, nq long, sq_ long, sqq long",
             (1, 5, 25, 0, None, None), gate_r10c._VR_OUT)
    assert r["vr4_6"] is None and r["z6"] is None


# ---------------------------------------------------------------------------
# r10d — Jonckheere / Hellinger / Hotelling / assortativity / t-closeness
# ---------------------------------------------------------------------------


def test_jonckheere_single_group(spark):
    # one ordered group: null variance N^2(2N+3) - sum n_i^2(2n_i+3) = 0
    n = 5
    vsum = n * n * (2 * n + 3)
    r = _run(spark, "k long, n long, j2 long, e2 long, vsum long",
             (1, n, 0, 0, vsum), gate_r10d._JT_OUT)
    assert r["z6"] is None


@pytest.mark.parametrize("row,want_h", [
    ((0, 10, 3, None), None),   # one side empty: everything undefined
    ((5, 5, 2, 0), 1.0),        # disjoint supports: H = 1, -ln(0) undefined
])
def test_hellinger_degenerate(spark, row, want_h):
    r = _run(spark, "na long, nb long, n_bins long, bc_nano long", row,
             gate_r10d._HB_OUT)
    assert r["bhattacharyya6"] is None
    assert r["hellinger6"] == want_h


_HT_SCHEMA = ("n_a long, n_b long, s1_a long, s1_b long, s2_a long, "
              "s2_b long, q11_a long, q11_b long, q22_a long, q22_b long, "
              "q12_a long, q12_b long")


@pytest.mark.parametrize("row", [
    # singleton groups: pooled dof = 0
    (1, 1, 5, 7, 2, 3, 25, 49, 4, 9, 10, 21),
    # empty 'a' group with otherwise(0) moments: 0/0 means without guard
    (0, 3, 0, 9, 0, 6, 0, 29, 0, 14, 0, 19),
])
def test_hotelling_degenerate(spark, row):
    r = _run(spark, _HT_SCHEMA, row, gate_r10d._HT_OUT)
    assert r["t2_6"] is None
    for col in ("d1_6", "d2_6"):
        assert r[col] is None or _defined(r[col])


def test_assortativity_regular_graph(spark):
    # every degree 1: zero variance on both sides
    r = _run(spark, "ne long, sa long, sb long, saa long, sbb long, sab long",
             (4, 4, 4, 4, 4, 4), gate_r10d._DA_OUT)
    assert r["assortativity6"] is None
    assert r["mean_deg_s6"] == 1.0


def test_t_closeness_identical_distribution(spark):
    # group matches global exactly: EMD 0, no violation (sanity row —
    # the ng/n denominators are nonzero by construction in the gate)
    r = _run(spark, "nat long, seg string, ng long, c0 long, c1 long, "
                    "n long, g0 long, g1 long",
             (1, "S", 4, 2, 1, 8, 4, 2), gate_r10d._TC_OUT)
    assert r["emd6"] == 0.0 and r["violates_t"] == 0
