"""Third-implementation checks for the round-7 batch-7/8 statistics
gates: each Spark result is recomputed with a PURE-PYTHON reference
directly off the parquet (via duckdb fetch, python arithmetic) — an
independent path from both the Spark plan and the SQL oracle, so a
shared-misconception bug in the gate/oracle pair can't hide."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

LIN_Q, LIN_D, LIN_T, LIN_B = 0.0625, -8.0, 12.0, -1.5


def _li(sf_dir):
    return duckdb.sql(
        f"select l_quantity, l_discount, l_tax, l_returnflag, l_extendedprice,"
        f" l_shipdate from read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()


def test_mcnemar_reference(spark, sf_dir):
    from inferdb_spark.gate_r7g import q_mcnemar_paired_test

    row = q_mcnemar_paired_test(spark, sf_dir).collect()[0]
    b = c = 0
    for q, d, t, rf, *_ in _li(sf_dir):
        pa = 1 if q >= 25 else 0
        s = round((q * LIN_Q + d * LIN_D + t * LIN_T + LIN_B) * 1000)
        pb = 1 if s > 0 else 0
        y = 1 if rf == "R" else 0
        if pa == y and pb != y:
            b += 1
        if pa != y and pb == y:
            c += 1
    assert (row["b"], row["c"]) == (b, c)
    assert row["chi2"] == pytest.approx((b - c) ** 2 / (b + c), abs=1e-5)


def test_fleiss_kappa_reference(spark, sf_dir):
    from inferdb_spark.functions.hashing import MERSENNE_P  # noqa: F401
    from inferdb_spark.gate_r7g import q_fleiss_kappa_raters

    row = q_fleiss_kappa_raters(spark, sf_dir).collect()[0]
    import hashlib
    import re

    docs = duckdb.sql(
        f"select text, n_chars from read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    n = len(docs)
    s_sum = 0
    cat = Counter()
    for text, n_chars in docs:
        r1 = 0 if n_chars < 216 else (1 if n_chars < 374 else 2)
        spaces = len(text) - len(text.replace(" ", ""))
        r2 = 0 if spaces < 35 else (1 if spaces < 60 else 2)
        h = int(hashlib.md5(text[:16].encode()).hexdigest()[:13], 16)
        r3 = h % 3
        rs = (r1, r2, r3)
        s_sum += 9 if r1 == r2 == r3 else (5 if len(set(rs)) == 2 else 3)
        for r in rs:
            cat[r] += 1
    assert row["n_items"] == n and row["s_sum"] == s_sum
    assert (row["c0"], row["c1"], row["c2"]) == (cat[0], cat[1], cat[2])
    pbar = (s_sum - 3 * n) / (6 * n)
    pe = sum(cat[j] ** 2 for j in (0, 1, 2)) / (9 * n * n)
    assert row["kappa"] == pytest.approx((pbar - pe) / (1 - pe), abs=1e-5)


def test_jsd_and_w1_reference(spark, sf_dir):
    from inferdb_spark.gate_r7g import q_js_divergence_drift
    from inferdb_spark.gate_r7h import q_wasserstein_binned_drift

    jrow = q_js_divergence_drift(spark, sf_dir).collect()[0]
    wrow = q_wasserstein_binned_drift(spark, sf_dir).collect()[0]

    import datetime

    split = datetime.datetime(1998, 7, 1)
    jr, jc = Counter(), Counter()
    wr, wc = Counter(), Counter()
    for _, _, _, _, price, ship in _li(sf_dir):
        ref = ship < split
        jb = min(20, int(price // 5000))
        wb = min(99, int(price // 1100))
        (jr if ref else jc)[jb] += 1
        (wr if ref else wc)[wb] += 1

    n_r, n_c = sum(jr.values()), sum(jc.values())
    assert (jrow["n_ref"], jrow["n_cur"]) == (n_r, n_c)
    jsd = 0.0
    for b in set(jr) | set(jc):
        p, q = jr[b] / n_r, jc[b] / n_c
        m = (p + q) / 2
        jsd += (p * math.log(p / m) if p > 0 else 0.0) / 2
        jsd += (q * math.log(q / m) if q > 0 else 0.0) / 2
    assert jrow["jsd"] == pytest.approx(jsd, abs=1e-5)
    assert 0.0 <= jrow["jsd"] <= math.log(2) + 1e-9

    nwr, nwc = sum(wr.values()), sum(wc.values())
    bins = sorted(set(wr) | set(wc))
    w1 = cum_r = cum_c = 0.0
    for i, b in enumerate(bins):
        cum_r += wr[b] / nwr
        cum_c += wc[b] / nwc
        gap = (bins[i + 1] - b) if i + 1 < len(bins) else 1
        w1 += abs(cum_r - cum_c) * gap * 1100.0
    assert wrow["w1"] == pytest.approx(w1, abs=1e-4)


def test_ipw_and_did_reference(spark, sf_dir):
    from inferdb_spark.gate_r7h import (
        q_diff_in_diff_revenue,
        q_ipw_ate_stratified,
    )

    cust = duckdb.sql(
        f"select c_custkey, c_acctbal, c_mktsegment"
        f" from read_parquet('{sf_dir}/customer.parquet')"
    ).fetchall()
    orders = duckdb.sql(
        f"select o_custkey, o_totalprice, o_orderdate"
        f" from read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()

    spend = defaultdict(int)
    for ck, tp, _ in orders:
        spend[ck] += round(tp * 100)
    strata = defaultdict(lambda: [0, 0, 0, 0])  # n1, n0, y1, y0
    for ck, bal, seg in cust:
        s = min(9, max(0, int((bal + 1000.0) // 1100.0)))
        t = 1 if seg == "BUILDING" else 0
        y = spend.get(ck, 0)
        if t:
            strata[s][0] += 1
            strata[s][2] += y
        else:
            strata[s][1] += 1
            strata[s][3] += y
    num = den = 0.0
    for s, (n1, n0, y1, y0) in strata.items():
        if n1 > 0 and n0 > 0:
            n_s = n1 + n0
            num += (y1 / n1 - y0 / n0) * n_s
            den += n_s
    ate = num / den / 100.0
    rows = q_ipw_ate_stratified(spark, sf_dir).collect()
    assert rows[0]["ate"] == pytest.approx(ate, abs=1e-4)
    got_strata = {r["stratum"]: r for r in rows}
    for s, (n1, n0, y1, y0) in strata.items():
        if n1 > 0 and n0 > 0:
            assert (got_strata[s]["n_treat"], got_strata[s]["n_ctrl"]) == (n1, n0)

    import datetime

    split = datetime.datetime(1998, 1, 1)
    cells = defaultdict(lambda: [0, 0])
    for ck, tp, od in orders:
        key = (ck % 2 == 0, od >= split)
        cells[key][0] += round(tp * 100)
        cells[key][1] += 1
    m = {k: v[0] / v[1] / 100.0 for k, v in cells.items()}
    did = (m[(True, True)] - m[(True, False)]) - (
        m[(False, True)] - m[(False, False)]
    )
    drow = q_diff_in_diff_revenue(spark, sf_dir).collect()[0]
    assert drow["did"] == pytest.approx(did, abs=1e-5)


def test_xbar_reference(spark, sf_dir):
    from inferdb_spark.gate_r7h import q_xbar_control_chart

    rows = q_xbar_control_chart(spark, sf_dir).collect()
    orders = duckdb.sql(
        f"select o_orderdate, o_totalprice"
        f" from read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    per_wk = defaultdict(list)
    allv = []
    for od, tp in orders:
        wk = (od - epoch).days // 7
        # python round is banker's; values are x.5-free after the
        # synthetic generator's 2dp money, so plain round matches
        d = round(tp)
        per_wk[wk].append(d)
        allv.append(d)
    n = len(allv)
    mu = sum(allv) / n
    sigma = math.sqrt(sum(v * v for v in allv) / n - mu * mu)
    assert len(rows) == len(per_wk)
    for r in rows:
        vals = per_wk[r["wk"]]
        assert r["n_w"] == len(vals)
        z = (sum(vals) / len(vals) - mu) * math.sqrt(len(vals)) / sigma
        assert r["z"] == pytest.approx(z, abs=1e-4)
        if abs(abs(z) - 3.0) > 1e-3:  # skip the knife-edge: python's
            # banker's round on x.5 dollars can differ by 1 ulp from SQL
            assert r["oob"] == (1 if abs(z) > 3.0 else 0)
