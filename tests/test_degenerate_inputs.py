"""Degenerate-input battery for the stats/eval operator family.

Round-7 verdict #1/#4: Hypothesis found an ANSI DIVIDE_BY_ZERO in the
log-rank chi² on a zero-variance input (all deaths in one group at one
time).  That bug is a CLASS — any statistic whose denominator is a group
count, variance, or rank normalizer crashes under `spark.sql.ansi.enabled`
when the input is constant / single-group / single-class / all-ties.

Contract checked here: on degenerate inputs the operators return NULL (or
a defined default) for the undefined statistic — never raise — and on
near-degenerate inputs they still match a pure-python oracle.  Hypothesis
sweeps UNFILTERED label/score/group distributions (the r7 property tests
filtered to well-posed inputs; these deliberately do not).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from inferdb_spark.operators.metrics import (
    average_precision,
    binary_auc,
    binary_classification_report,
    youden_threshold,
)
from inferdb_spark.operators.survival import log_rank, nelson_aalen

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# labels deliberately UNFILTERED: all-positive / all-negative / single-row
# inputs are the point
SCORED_ANY = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 1)), min_size=1, max_size=20
)
# (t, obs, grp) with no constraint: single-group, all-censored, all-ties
DURS_ANY = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1), st.integers(0, 1)),
    min_size=1,
    max_size=16,
)


def _auc_oracle(pairs):
    pos = sorted(s for s, y in pairs if y == 1)
    neg = sorted(s for s, y in pairs if y == 0)
    if not pos or not neg:
        return None
    wins = sum((s > t) + 0.5 * (s == t) for s in pos for t in neg)
    return round(wins / (len(pos) * len(neg)), 6)


@given(SCORED_ANY)
@_SLOW
def test_binary_auc_degenerate(spark, pairs):
    df = spark.createDataFrame(pairs, "score long, label long")
    row = binary_auc(df, "score", "label").collect()[0]
    want = _auc_oracle(pairs)
    if want is None:
        assert row["auc"] is None
    else:
        assert row["auc"] is not None and abs(row["auc"] - want) < 2e-6
    assert row["n_pos"] == sum(y for _, y in pairs)
    assert row["n_neg"] == sum(1 - y for _, y in pairs)


def _ap_oracle(pairs):
    n_pos = sum(y for _, y in pairs)
    if n_pos == 0:
        return None
    # step-interpolated AP at unique thresholds, descending, micro-quantized
    # exactly like the operator (floor-free: round to 1e-6 then mean)
    from collections import Counter

    cnt = Counter()
    pos = Counter()
    for s, y in pairs:
        cnt[s] += 1
        pos[s] += y
    cum_c = cum_p = 0
    wsum_u = 0
    for s in sorted(cnt, reverse=True):
        cum_c += cnt[s]
        cum_p += pos[s]
        prec_u = round(cum_p / cum_c * 1000000)
        wsum_u += pos[s] * prec_u
    return round(wsum_u / 1000000.0 / n_pos, 6)


@given(SCORED_ANY)
@_SLOW
def test_average_precision_degenerate(spark, pairs):
    df = spark.createDataFrame(pairs, "score long, label long")
    row = average_precision(df, "score", "label").collect()[0]
    want = _ap_oracle(pairs)
    if want is None:
        assert row["ap"] is None
    else:
        assert row["ap"] is not None and abs(row["ap"] - want) < 2e-6


@given(SCORED_ANY)
@_SLOW
def test_youden_degenerate(spark, pairs):
    df = spark.createDataFrame(pairs, "score long, label long")
    rows = youden_threshold(df, "score", "label").collect()
    assert len(rows) == 1
    r = rows[0]
    n_pos = sum(y for _, y in pairs)
    n_neg = len(pairs) - n_pos
    if n_pos == 0 or n_neg == 0:
        assert r["j"] is None  # undefined, never a DIVIDE_BY_ZERO
    else:
        assert r["j"] is not None and -1e-9 <= r["j"] <= 1 + 1e-9
        assert abs(r["j"] - (r["tpr"] - r["fpr"])) < 3e-6


def test_classification_report_one_class(spark):
    # all-positive predictions AND labels: precision defined, recall
    # defined, but fp+tn = 0 paths exercise every safe_div branch
    df = spark.createDataFrame([(1.0, 1)] * 5, "prediction double, label int")
    r = binary_classification_report(df).collect()[0]
    assert r["accuracy"] == 1.0 and r["f1"] == 1.0
    df0 = spark.createDataFrame([(0.0, 1)] * 3, "prediction double, label int")
    r0 = binary_classification_report(df0).collect()[0]
    # no positive predictions: precision = safe_div default 0, f1 = 0
    assert r0["accuracy"] == 0.0 and r0["precision"] == 0.0 and r0["f1"] == 0.0


def _log_rank_oracle(durs):
    """pure-python hypergeometric O/E/V with the operator's micro-quantize."""
    times = sorted({t for t, o, g in durs if o == 1})
    o1 = e1_u = v_u = 0
    nt = 0
    for t in times:
        n = sum(1 for tt, _, _ in durs if tt >= t)
        n1 = sum(1 for tt, _, g in durs if tt >= t and g == 0)
        d = sum(o for tt, o, _ in durs if tt == t and o == 1)
        d1 = sum(o for tt, o, g in durs if tt == t and o == 1 and g == 0)
        if d == 0:
            continue
        nt += 1
        o1 += d1
        e1_u += int(math.floor(d * n1 / n * 1e6 + 0.5))
        if n > 1:
            v_u += int(math.floor(d * n1 * (n - n1) * (n - d) / n / n / (n - 1) * 1e6 + 0.5))
    return o1, e1_u, v_u, nt


@given(DURS_ANY)
@_SLOW
def test_log_rank_degenerate(spark, durs):
    df = spark.createDataFrame(durs, "t long, obs long, grp long")
    r = log_rank(df).collect()[0]
    o1, e1_u, v_u, nt = _log_rank_oracle(durs)
    assert r["n_times"] == nt
    if nt == 0:
        assert r["o1"] is None and r["chi2"] is None
        return
    assert r["o1"] == o1
    assert abs(r["e1"] - e1_u / 1e6) < 2e-6
    if v_u == 0:
        assert r["chi2"] is None  # zero-variance: undefined, not a crash
    else:
        want = round((o1 - e1_u / 1e6) ** 2 / (v_u / 1e6), 6)
        assert abs(r["chi2"] - want) < 2e-6


@given(DURS_ANY)
@_SLOW
def test_nelson_aalen_degenerate(spark, durs):
    df = spark.createDataFrame(
        [(t, o) for t, o, _ in durs], "t long, obs long"
    )
    rows = nelson_aalen(df).collect()
    n_event_times = len({t for t, o, _ in durs if o == 1})
    assert len(rows) == n_event_times  # all-censored input: empty, no crash
    prev = 0.0
    for r in rows:
        assert r["n_risk"] >= r["d"] >= 1
        assert r["h"] >= prev - 1e-9  # cumulative hazard is monotone
        prev = r["h"]
