"""Optimal-binning correctness + quality benchmark (SURVEY.md §7.2).

Three layers:
1. the DP solver is EXACT: equals brute-force enumeration over all
   contiguous partitions under identical constraints (support, monotone
   trend, <=k segments);
2. under identical constraints the DP objective dominates the round-1
   greedy merge on the shared prebin space;
3. end-model quality on the verdict's two fixtures (creditcard-like,
   pm25-like) — measured, recorded via tools/binning_quality_report.py,
   sanity-asserted here on small sizes.
"""

from __future__ import annotations

import itertools
import math

import pytest

from inferdb_spark.operators.optimal_binning import (
    _PrebinStats,
    _auto_trend,
    _segment_cost_sse,
    _segment_gain_iv,
    _solve_partition,
    fit_optimal_bins,
)


def _brute_force(P, k, value, mean, support, minimize, min_support, trend):
    """Enumerate every contiguous partition of 0..P-1 into <= k segments."""
    best = None
    for nseg in range(1, min(k, P) + 1):
        for cuts in itertools.combinations(range(1, P), nseg - 1):
            bounds = [0, *cuts, P]
            segs = [(bounds[i], bounds[i + 1] - 1) for i in range(nseg)]
            if any(support(a, b) < min_support for a, b in segs):
                continue
            if trend is not None:
                ms = [mean(a, b) for a, b in segs]
                diffs = [ms[i + 1] - ms[i] for i in range(len(ms) - 1)]
                if trend == 1 and any(d < 0 for d in diffs):
                    continue
                if trend == -1 and any(d > 0 for d in diffs):
                    continue
                if trend in ("peak", "valley"):
                    flip = 1 if trend == "peak" else -1
                    # non-decreasing then non-increasing (peak); mirror valley
                    phase = 0
                    ok = True
                    for d in diffs:
                        dd = d * flip
                        if phase == 0 and dd < 0:
                            phase = 1
                        elif phase == 1 and dd > 0:
                            ok = False
                            break
                    if not ok:
                        continue
            obj = sum(value(a, b) for a, b in segs)
            if best is None or (obj < best if minimize else obj > best):
                best = obj
    return best


def _rand_stats(rng, P):
    n = [int(rng.randint(1, 40)) for _ in range(P)]
    sy = [float(rng.uniform(-5, 5)) * ni for ni in n]
    sy2 = [abs(s) * 2 + ni * float(rng.uniform(0.1, 3)) for s, ni in zip(sy, n)]
    npos = [int(rng.randint(0, ni + 1)) for ni in n]
    return _PrebinStats(ids=list(range(P)), n=n, sum_y=sy, sum_y2=sy2, n_pos=npos)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("objective", ["sse", "iv"])
def test_dp_matches_brute_force(seed, objective):
    import numpy as np

    rng = np.random.RandomState(seed)
    P = int(rng.randint(4, 9))
    k = int(rng.randint(2, 5))
    stats = _rand_stats(rng, P)
    if objective == "sse":
        P_, value, mean, support = _segment_cost_sse(stats)
        minimize = True
    else:
        P_, value, mean, support = _segment_gain_iv(stats)
        minimize = False
    for trend in (None, 1, -1, "peak", "valley"):
        for min_support in (1, 15):
            expect = _brute_force(
                P_, k, value, mean, support, minimize, min_support, trend
            )
            got = _solve_partition(
                P_, k, value, mean, support, minimize, min_support, trend
            )
            if expect is None:
                assert got is None
            else:
                assert got is not None
                assert math.isclose(got[0], expect, rel_tol=1e-12, abs_tol=1e-12), (
                    seed, objective, trend, min_support,
                )


def test_dp_dominates_greedy_on_shared_prebins(spark):
    """Same prebins, no constraints: DP objective <= greedy SSE (regression)
    and >= greedy IV (classification)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.binning_quality_report import compare_binning, make_creditcard_like

    df = make_creditcard_like(spark, n=4000)
    res = compare_binning(df, ["f0", "f2"], "classification", max_bins=5, pre_bins=24)
    # classification objective = total IV (higher is better).  The DP is
    # constrained (monotone trend) while greedy is not, so dominance is not
    # guaranteed per-feature — but across the fixture's mixed monotone/
    # U-shaped features optimal must not lose overall quality materially.
    assert res["optimal_accuracy"] >= res["greedy_accuracy"] - 0.02
    assert res["optimal_objective"] > 0


def test_dp_unconstrained_objective_dominance(spark):
    """Apples-to-apples: monotonic=None DP vs greedy on ONE feature —
    the DP's in-sample SSE can never exceed greedy's."""
    from pyspark.sql import functions as F

    from inferdb_spark.operators.binning import (
        fit_quantile_bins,
        fit_supervised_bins,
    )
    from inferdb_spark.operators.optimal_binning import (
        _collect_prebin_stats,
        _segment_cost_sse,
    )
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.binning_quality_report import _prebin_upper, make_pm25_like

    df = make_pm25_like(spark, n=4000)
    col, pre_bins, max_bins = "weekofyear", 24, 5
    greedy = fit_supervised_bins(df, col, "target", max_bins=max_bins, pre_bins=pre_bins)
    optimal = fit_optimal_bins(
        df, col, "target", task="regression", max_bins=max_bins,
        pre_bins=pre_bins, monotonic=None, min_frac=0.0,
    )
    pre = fit_quantile_bins(df, col, pre_bins)
    stats = _collect_prebin_stats(df, pre, "target")
    _P, cost, _m, _s = _segment_cost_sse(stats)
    id2pos = {b: i for i, b in enumerate(stats.ids)}

    def partition_sse(spec):
        spans = {}
        for b, pos in id2pos.items():
            fb = sum(1 for sp in spec.splits if _prebin_upper(pre, b) > sp)
            spans.setdefault(fb, []).append(pos)
        return sum(cost(min(v), max(v)) for v in spans.values())

    assert partition_sse(optimal) <= partition_sse(greedy) + 1e-9


def test_auto_trend_direction():
    up = _PrebinStats(
        ids=[0, 1, 2, 3], n=[10, 10, 10, 10],
        sum_y=[1.0, 5.0, 9.0, 14.0], sum_y2=[1, 5, 9, 20], n_pos=[0, 2, 5, 9],
    )
    assert _auto_trend(up, "regression") == 1
    assert _auto_trend(up, "classification") == 1
    down = _PrebinStats(
        ids=[0, 1, 2, 3], n=[10, 10, 10, 10],
        sum_y=[14.0, 9.0, 5.0, 1.0], sum_y2=[20, 9, 5, 1], n_pos=[9, 5, 2, 0],
    )
    assert _auto_trend(down, "regression") == -1


def test_fit_optimal_bins_end_to_end(spark):
    """Monotone-enforced splits on a monotone feature; split values are
    drawn from the quantile prebin edges; respects max_bins."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.binning_quality_report import make_creditcard_like

    df = make_creditcard_like(spark, n=4000)
    spec = fit_optimal_bins(
        df, "f0", "target", task="classification", max_bins=5, pre_bins=24
    )
    assert spec.kind == "numeric"
    assert 1 <= len(spec.splits) <= 4
    assert spec.splits == sorted(spec.splits)


def _rand_mc_stats(rng, P, K=3):
    from inferdb_spark.operators.optimal_binning import _MulticlassStats

    classes = [f"c{j}" for j in range(K)]
    cls = []
    n = []
    for _ in range(P):
        d = {c: int(rng.randint(0, 30)) for c in classes}
        if sum(d.values()) == 0:
            d[classes[0]] = 1
        cls.append(d)
        n.append(sum(d.values()))
    return _MulticlassStats(ids=list(range(P)), n=n, cls=cls, classes=classes)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_multiclass_dp_matches_brute_force(seed):
    """Σ one-vs-rest IV objective: DP optimum == brute-force enumeration
    (the MulticlassOptimalBinning parity claim, reference
    src/encoder.py:49-55)."""
    import numpy as np

    from inferdb_spark.operators.optimal_binning import (
        _segment_gain_iv_multiclass,
    )

    rng = np.random.RandomState(seed)
    P = int(rng.randint(4, 8))
    k = int(rng.randint(2, 5))
    stats = _rand_mc_stats(rng, P)
    P_, value, mean, support = _segment_gain_iv_multiclass(stats)
    for min_support in (1, 20):
        expect = _brute_force(P_, k, value, mean, support, False, min_support, None)
        got = _solve_partition(P_, k, value, mean, support, False, min_support, None)
        if expect is None:
            assert got is None
        else:
            assert got is not None
            assert math.isclose(got[0], expect, rel_tol=1e-12, abs_tol=1e-12)


def test_fit_optimal_bins_multiclass_end_to_end(spark):
    """3-class mnist-like signal: class identity flips at x=10 and x=20;
    the multiclass fit must place splits near both flips (binary
    one-vs-rest on a single class would miss one)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(3)
    n = 6000
    x = rng.uniform(0, 30, n)
    y = np.where(x < 10, "a", np.where(x < 20, "b", "c"))
    # 5% label noise so no prebin is pure
    noise = rng.rand(n) < 0.05
    y = np.where(noise, rng.choice(["a", "b", "c"], n), y)
    df = spark.createDataFrame(pd.DataFrame({"x": x, "y": y})).localCheckpoint()
    spec = fit_optimal_bins(
        df, "x", "y", task="multiclass", max_bins=4, pre_bins=32
    )
    assert spec.splits, "multiclass fit produced no splits"
    assert any(abs(s - 10) < 1.5 for s in spec.splits), spec.splits
    assert any(abs(s - 20) < 1.5 for s in spec.splits), spec.splits


def test_fit_optimal_categorical_bins(spark):
    """hits-like categorical: 6 frequent categories with 3 distinct event
    rates + a tail of rare ones.  The fit must (a) pool the rare tail via
    cat_cutoff, (b) group same-rate categories together, (c) separate the
    three rate levels."""
    import numpy as np
    import pandas as pd

    from inferdb_spark.operators.optimal_binning import (
        fit_optimal_categorical_bins,
    )

    rng = np.random.RandomState(4)
    n = 9000
    # frequent cats: low rate {A,B}, mid {C,D}, high {E,F}; rare r0..r9
    freq_cats = ["A", "B", "C", "D", "E", "F"]
    rates = {"A": 0.05, "B": 0.06, "C": 0.45, "D": 0.46, "E": 0.9, "F": 0.91}
    v = rng.choice(freq_cats, n).astype(object)
    rare_rows = rng.rand(n) < 0.03
    v[rare_rows] = rng.choice([f"r{i}" for i in range(10)], int(rare_rows.sum()))
    y = np.array([
        float(rng.rand() < rates.get(c, 0.5)) for c in v
    ])
    df = spark.createDataFrame(pd.DataFrame({"c": v, "y": y})).localCheckpoint()
    # max_bins=3 forces the DP to spend its two cuts on the BIG rate gaps
    # (0.06->0.45 and 0.5->0.9), grouping same-rate pairs
    spec = fit_optimal_categorical_bins(
        df, "c", "y", task="classification", max_bins=3, cat_cutoff=0.05
    )
    assert spec.kind == "categorical"
    by_cat = {c: i for i, g in enumerate(spec.groups) for c in g}
    # same-rate pairs grouped
    assert by_cat["A"] == by_cat["B"]
    assert by_cat["C"] == by_cat["D"]
    assert by_cat["E"] == by_cat["F"]
    # distinct rates separated
    assert len({by_cat["A"], by_cat["C"], by_cat["E"]}) == 3
    # rare categories all pooled into one group (the ~0.5-rate pool lands
    # with the mid-rate pair)
    rare_groups = {by_cat[f"r{i}"] for i in range(10) if f"r{i}" in by_cat}
    assert len(rare_groups) == 1
    assert rare_groups == {by_cat["C"]}


def test_outlier_range_filter_parity(spark):
    """Injected extreme outliers must not shift the fitted splits when
    outlier_detector='range' is on: splits equal those fitted on the clean
    relation (the reference's default, src/encoder.py:38-44) — and differ
    without the filter (quantile prebins absorb the outlier mass)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(5)
    n = 5000
    x = rng.uniform(0, 10, n)
    y = (x > 5).astype(float) * 3 + rng.normal(0, 0.1, n)
    clean = pd.DataFrame({"x": x, "y": y})
    out_x = np.concatenate([x, np.full(150, 1e6), np.full(150, -1e6)])
    out_y = np.concatenate([y, np.zeros(300)])
    dirty = pd.DataFrame({"x": out_x, "y": out_y})
    df_clean = spark.createDataFrame(clean).localCheckpoint()
    df_dirty = spark.createDataFrame(dirty).localCheckpoint()
    kw = dict(task="regression", max_bins=4, pre_bins=16)
    s_clean = fit_optimal_bins(df_clean, "x", "y", **kw)
    s_filtered = fit_optimal_bins(
        df_dirty, "x", "y", outlier_detector="range", **kw
    )
    s_unfiltered = fit_optimal_bins(df_dirty, "x", "y", **kw)
    assert s_filtered.splits == s_clean.splits
    assert s_unfiltered.splits != s_clean.splits
