"""Round-7 batch-6 corpus-law gates vs brute-force references."""

from __future__ import annotations

import math

import pytest

from inferdb_spark.gate_r7f import _HEAPS_CKPTS, _ZIPF_TOP, q_heaps_law_curve, q_zipf_slope_fit


def _tok(text: str) -> list[str]:
    import re

    norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", text.lower())).strip()
    return norm.split(" ") if norm else []


def test_heaps_curve_matches_bruteforce(spark, sf_dir):
    rows = {r["c"]: r for r in q_heaps_law_curve(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    m = max(r["doc_id"] for r in docs) + 1
    pts = []
    for c in range(1, _HEAPS_CKPTS + 1):
        thr = (c * m) // _HEAPS_CKPTS
        vocab = set()
        tokens = 0
        for r in docs:
            if r["doc_id"] < thr:
                ts = _tok(r["text"])
                tokens += len(ts)
                vocab.update(ts)
        assert rows[c]["tokens"] == tokens
        assert rows[c]["vocab"] == len(vocab)
        pts.append(
            (round(math.log(tokens) * 1e6), round(math.log(len(vocab)) * 1e6))
        )
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    for r in rows.values():
        assert r["heaps_beta"] == pytest.approx(beta, abs=1e-6)
    # vocabulary growth is monotone and sublinear-ish
    vs = [rows[c]["vocab"] for c in range(1, _HEAPS_CKPTS + 1)]
    assert vs == sorted(vs)
    # the synthetic corpus draws from a FIXED tiny vocabulary, so the
    # curve saturates immediately and beta is exactly 0 — which is the
    # diagnostic doing its job (flat beta = saturated/duplicated corpus)
    assert 0.0 <= beta < 1.0


def test_zipf_slope_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    out = q_zipf_slope_fit(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts = Counter(t for r in docs for t in _tok(r["text"]))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_TOP]
    got = sorted(out, key=lambda r: r["rank"])
    assert [(r["term"], r["freq"]) for r in got] == top
    pts = [
        (round(math.log(i + 1) * 1e6), round(math.log(f) * 1e6))
        for i, (_, f) in enumerate(top)
    ]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert got[0]["zipf_slope"] == pytest.approx(slope, abs=1e-6)
    assert slope < 0.0


def test_benford_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    from inferdb_spark.gate_r7f import _BENFORD_P_U, q_benford_digit_test

    rows = {r["d"]: r for r in q_benford_digit_test(spark, sf_dir).collect()}
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    digs = Counter(
        int(str(int(math.floor(r["o_totalprice"] * 100 + 0.5)))[0])
        for r in od
        if r["o_totalprice"] > 0
    )
    n = sum(digs.values())
    chi_u = 0
    for d, p in enumerate(_BENFORD_P_U, start=1):
        e = n * p / 1e6
        chi_u += round((digs.get(d, 0) - e) ** 2 / e * 1e6)
    for d, r in rows.items():
        assert r["obs"] == digs.get(d, 0)
        assert r["expected_p"] == pytest.approx(
            _BENFORD_P_U[d - 1] / 1e6, abs=1e-6
        )
        assert r["chi2"] == pytest.approx(chi_u / 1e6, abs=1e-6)


def test_mahalanobis_matches_numpy(spark, sf_dir):
    import numpy as np

    from inferdb_spark.gate_r7f import q_mahalanobis_outliers

    got = q_mahalanobis_outliers(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    xs = np.array([float(int(r["l_quantity"])) for r in li])
    ys = np.array(
        [float(int(math.floor(r["l_extendedprice"] + 0.5))) for r in li]
    )
    rid = np.array(
        [r["l_orderkey"] * 10 + r["l_linenumber"] for r in li], dtype=np.int64
    )
    n = len(xs)
    mx, my = xs.sum() / n, ys.sum() / n
    vx = (n * (xs * xs).sum() - xs.sum() ** 2) / (n * n)
    vy = (n * (ys * ys).sum() - ys.sum() ** 2) / (n * n)
    cxy = (n * (xs * ys).sum() - xs.sum() * ys.sum()) / (n * n)
    det = vx * vy - cxy * cxy
    d2 = ((xs - mx) ** 2 * vy - 2 * (xs - mx) * (ys - my) * cxy + (ys - my) ** 2 * vx) / det
    d2r = np.round(d2, 6)
    order = sorted(range(n), key=lambda i: (-d2r[i], rid[i]))[:20]
    want = [(int(rid[i]), float(d2r[i])) for i in order]
    assert [(r["rid"], r["d2"]) for r in got] == pytest.approx(want)
    # every reported outlier is at least as extreme as the 20th
    assert min(r["d2"] for r in got) >= sorted(d2r, reverse=True)[19] - 1e-9
