"""Round-7 batch-4 gate math vs independent references (sf0.001)."""

from __future__ import annotations

import math

import pytest

from inferdb_spark.gate_r7d import (
    _MMD_S2,
    q_brier_decomposition,
    q_cramers_v_theils_u,
    q_decile_lift_table,
    q_gamma_somers_d,
    q_mmd_poly_two_sample,
)
from inferdb_spark.gate_r7c import _ECE_B0, _ECE_BD, _ECE_BQ


def _snap_u(m: float) -> int:
    return int(math.floor((1.0 / (1.0 + math.exp(-m))) * 1_000_000.0 + 0.5))


def test_gamma_somers_consistent_with_kendall_grid(spark, sf_dir):
    from inferdb_spark.gate_r7 import q_kendall_tau_binned

    g = q_gamma_somers_d(spark, sf_dir).first()
    k = q_kendall_tau_binned(spark, sf_dir).first()
    # same grid -> identical concordant/discordant counts
    assert (g["conc"], g["disc"]) == (k["conc"], k["disc"])
    c, d = g["conc"], g["disc"]
    assert g["gamma"] == pytest.approx((c - d) / (c + d), abs=1e-6)
    # |somers| <= |gamma| (gamma drops ties from the denominator)
    assert abs(g["somers_d_yx"]) <= abs(g["gamma"]) + 1e-9


def test_cramers_v_theils_u_match_bruteforce(spark, sf_dir):
    from collections import Counter

    row = q_cramers_v_theils_u(spark, sf_dir).first()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cells = Counter(
        (r["l_returnflag"], r["l_linestatus"])
        for r in li.select("l_returnflag", "l_linestatus").collect()
    )
    n = sum(cells.values())
    na = Counter()
    nb = Counter()
    for (a, b), c in cells.items():
        na[a] += c
        nb[b] += c
    chi_u = mi_u = ha_u = 0
    for (a, b), c in cells.items():
        e = na[a] * nb[b] / n
        chi_u += round((c - e) ** 2 / e * 1e6)
        mi_u += round(c / n * math.log(c * n / (na[a] * nb[b])) * 1e6)
        ha_u += round(c / n * math.log(na[a] / n) * 1e6)
    v = math.sqrt((chi_u / 1e6) / (n * (min(len(na), len(nb)) - 1)))
    u = (mi_u / 1e6) / (-ha_u / 1e6)
    assert row["cramers_v"] == pytest.approx(v, abs=1e-6)
    assert row["theils_u"] == pytest.approx(u, abs=1e-6)
    assert 0.0 <= row["cramers_v"] <= 1.0 and 0.0 <= row["theils_u"] <= 1.0


def test_decile_lift_properties(spark, sf_dir):
    rows = sorted(
        q_decile_lift_table(spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n = sum(r["n_d"] for r in rows)
    # ntile balance: sizes differ by at most 1
    assert max(r["n_d"] for r in rows) - min(r["n_d"] for r in rows) <= 1
    # cumulative lift ends at exactly 1 (full population)
    assert rows[-1]["cum_lift"] == pytest.approx(1.0, abs=1e-6)
    # response rate equals resp/n_d
    for r in rows:
        assert r["resp_rate"] == pytest.approx(r["resp"] / r["n_d"], abs=1e-6)


def test_brier_decomposition_matches_bruteforce(spark, sf_dir):
    row = q_brier_decomposition(spark, sf_dir).first()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    recs = []
    for r in li.select("l_quantity", "l_discount", "l_returnflag").collect():
        m = (_ECE_B0 + (_ECE_BQ * r["l_quantity"])) + (_ECE_BD * r["l_discount"])
        recs.append((_snap_u(m), 1 if r["l_returnflag"] == "R" else 0))
    n = len(recs)
    brier = sum(
        round((p - 1_000_000 * y) ** 2 / 1e6) for p, y in recs
    ) / (n * 1e6)
    assert row["brier"] == pytest.approx(brier, abs=1e-6)
    pos = sum(y for _, y in recs)
    assert row["uncertainty"] == pytest.approx(
        (pos / n) * (1 - pos / n), abs=1e-6
    )
    bins = {}
    for p, y in recs:
        b = min(p // 100_000, 9)
        nb, acc, conf = bins.get(b, (0, 0, 0))
        bins[b] = (nb + 1, acc + y, conf + p)
    rel_u = sum(
        round((conf / nb - 1e6 * acc / nb) ** 2 * nb / 1e6)
        for nb, acc, conf in bins.values()
    )
    res_u = sum(
        round((1e6 * acc / nb - 1e6 * pos / n) ** 2 * nb / 1e6)
        for nb, acc, conf in bins.values()
    )
    assert row["reliability"] == pytest.approx(rel_u / (n * 1e6), abs=1e-6)
    assert row["resolution"] == pytest.approx(res_u / (n * 1e6), abs=1e-6)


def test_mmd_matches_pairwise_kernel(spark, sf_dir):
    row = q_mmd_poly_two_sample(spark, sf_dir).first()
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    xs, ys = [], []
    for r in od.select("o_totalprice", "o_orderpriority").collect():
        v = round(r["o_totalprice"] / 1000.0)
        if r["o_orderpriority"] == "1-URGENT":
            xs.append(v)
        elif r["o_orderpriority"] == "5-LOW":
            ys.append(v)

    def k(a, b):
        return (a * b / _MMD_S2 + 1.0) ** 2

    # brute-force pair sums on a capped subsample to keep the test fast
    xs_s, ys_s = xs[:250], ys[:250]
    kxx = sum(
        k(a, b) for i, a in enumerate(xs_s) for j, b in enumerate(xs_s) if i != j
    ) / (len(xs_s) * (len(xs_s) - 1))
    # the moment identity must reproduce the brute-force within float noise
    s1 = sum(xs_s)
    s2 = sum(v * v for v in xs_s)
    s4 = sum(v**4 for v in xs_s)
    nn = len(xs_s) * (len(xs_s) - 1)
    kxx_mom = ((s2 * s2 - s4) / (_MMD_S2**2) + 2 * (s1 * s1 - s2) / _MMD_S2 + nn) / nn
    assert kxx_mom == pytest.approx(kxx, rel=1e-9)
    # full-data check: mmd2 identity from the gate's own terms
    assert row["mmd2"] == pytest.approx(
        row["kxx"] + row["kyy"] - 2 * row["kxy"], abs=3e-6
    )
    assert row["nx"] == len(xs) and row["ny"] == len(ys)


def test_decile_lift_histogram_consistent_with_exact(spark, sf_dir):
    """The histogram form must agree with the exact-ntile form on totals
    and converge to the same deciles up to score-tie bucket granularity."""
    from inferdb_spark.gate_r7d import q_decile_lift_histogram

    hrows = sorted(
        q_decile_lift_histogram(spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    erows = sorted(
        q_decile_lift_table(spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in hrows] == list(range(1, 11))
    assert sum(r["n_d"] for r in hrows) == sum(r["n_d"] for r in erows)
    assert sum(r["resp"] for r in hrows) == sum(r["resp"] for r in erows)
    # full-population cumulative lift is exactly 1 in both forms
    assert hrows[-1]["cum_lift"] == pytest.approx(1.0, abs=1e-6)
    # decile sizes differ from n/10 only by bucket granularity (max
    # count of a single tied score value)
    n = sum(r["n_d"] for r in hrows)
    from collections import Counter

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    pc = Counter(
        _snap_u((_ECE_B0 + (_ECE_BQ * r["l_quantity"])) + (_ECE_BD * r["l_discount"]))
        for r in li
    )
    max_bucket = max(pc.values())
    for r in hrows:
        assert abs(r["n_d"] - n / 10) <= max_bucket
