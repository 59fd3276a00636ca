"""Property-based tests (hypothesis) for the round-7 operator additions:
skyline dominance, k-core peeling, and PR-AUC/Youden — each Spark result
checked against an independent brute-force oracle on ARBITRARY inputs
(small example budgets: every example is a full Spark round-trip)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from inferdb_spark.operators.graph import k_core
from inferdb_spark.operators.metrics import average_precision, youden_threshold
from inferdb_spark.operators.skyline import skyline_2d

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _round6_half_up(x: float) -> float:
    """Spark's HALF_UP rounding for positive values — python's round()
    is banker's (half-to-even) and disagrees on exact .5 ties at the
    6th decimal (hypothesis found 0.8333335: Spark 0.833334, python
    0.833333)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

POINTS = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=25
)
EDGES = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] < e[1]),
    min_size=1,
    max_size=15,
    unique=True,
)
SCORED = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 1)), min_size=2, max_size=30
).filter(lambda ps: 0 < sum(y for _, y in ps) < len(ps))


@given(POINTS)
@_SLOW
def test_skyline_property(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"], r["n_rows"]) for r in skyline_2d(df, "x", "y").collect()}

    def dominated(p):
        return any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in pts
        )

    mult = Counter(pts)
    want = {(x, y, mult[(x, y)]) for (x, y) in set(pts) if not dominated((x, y))}
    assert got == want


@given(EDGES, st.integers(2, 3))
@_SLOW
def test_kcore_property(spark, edges, k):
    df = spark.createDataFrame(edges, "u long, v long")
    got = {tuple(r) for r in k_core(df, k, n_rounds=10).collect()}

    cur = set(edges)
    while True:
        deg = Counter()
        for u, v in cur:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(u, v) for u, v in cur if u in keep and v in keep}
        if nxt == cur:
            break
        cur = nxt
    assert got == cur


@given(SCORED)
@_SLOW
def test_ap_and_youden_property(spark, pairs):
    df = spark.createDataFrame(pairs, "s long, y int")

    by_s, pos_s = Counter(), Counter()
    for s, y in pairs:
        by_s[s] += 1
        pos_s[s] += y
    n_pos = sum(pos_s.values())
    n_neg = len(pairs) - n_pos

    cum_cnt = cum_pos = 0
    ap_u = 0
    for s in sorted(by_s, reverse=True):
        cum_cnt += by_s[s]
        cum_pos += pos_s[s]
        ap_u += pos_s[s] * round(cum_pos / cum_cnt * 1_000_000)
    row = average_precision(df, "s", "y").collect()[0]
    assert row["ap"] == _round6_half_up(ap_u / 1_000_000 / n_pos)
    assert 0.0 <= row["ap"] <= 1.0

    best = None
    for thr in sorted(by_s):
        tp = sum(y for s, y in pairs if s >= thr)
        fp = sum(1 - y for s, y in pairs if s >= thr)
        m = tp * n_neg - fp * n_pos  # the exact integer margin
        if best is None or m > best[1]:
            best = (thr, m)
    yrow = youden_threshold(df, "s", "y").collect()[0]
    assert yrow["thr"] == best[0]
    assert yrow["j"] == _round6_half_up(best[1] / (n_pos * n_neg))


DURS = st.lists(
    st.tuples(st.integers(0, 10), st.integers(0, 1), st.integers(0, 1)),
    min_size=4,
    max_size=40,
).filter(
    lambda ds: sum(o for _, o, _ in ds) > 0  # at least one observed event
    and 0 < sum(g for _, _, g in ds) < len(ds)  # both groups present
)


def _floor_u(x: float, scale: float) -> int:
    import math as m

    return int(m.floor(x * scale + 0.5))


@given(DURS)
@_SLOW
def test_log_rank_property(spark, durs):
    from inferdb_spark.operators.survival import log_rank

    df = spark.createDataFrame(durs, "t long, obs int, grp long")
    row = log_rank(df).collect()[0]

    times = sorted({t for t, o, _ in durs if o == 1})
    n = len(durs)
    n1 = sum(1 for _, _, g in durs if g == 0)
    o1 = e1_u = v_u = 0
    for t in times:
        d = sum(o for tt, o, _ in durs if tt == t)
        d1 = sum(o for tt, o, g in durs if tt == t and g == 0)
        at_risk = sum(1 for tt, _, _ in durs if tt >= t)
        at_risk1 = sum(1 for tt, _, g in durs if tt >= t and g == 0)
        o1 += d1
        e1_u += _floor_u(d * at_risk1 / at_risk, 1e6)
        if at_risk > 1:
            v_u += _floor_u(
                d * at_risk1 * (at_risk - at_risk1) * (at_risk - d)
                / at_risk / at_risk / (at_risk - 1),
                1e6,
            )
    assert row["o1"] == o1
    assert row["n_times"] == len(times)
    assert row["e1"] == _round6_half_up(e1_u / 1e6)
    assert row["v"] == _round6_half_up(v_u / 1e6)


@given(DURS)
@_SLOW
def test_nelson_aalen_property(spark, durs):
    from inferdb_spark.operators.survival import nelson_aalen

    df = spark.createDataFrame(
        [(t, o) for t, o, _ in durs], "t long, obs int"
    )
    rows = nelson_aalen(df).collect()

    times = sorted({t for t, o, _ in durs if o == 1})
    assert [r["t"] for r in rows] == times
    h_u = 0
    for r, t in zip(rows, times):
        d = sum(o for tt, o, _ in durs if tt == t)
        at_risk = sum(1 for tt, _, _ in durs if tt >= t)
        assert (r["d"], r["n_risk"]) == (d, at_risk)
        h_u += _floor_u(d / at_risk, 1e9)
        assert r["h"] == _round6_half_up(h_u / 1e9)
