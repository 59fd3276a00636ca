"""Information-value feature scoring + greedy index-feature selection.

This is the reference's core "optimizer" (src/optimizer.py): each candidate
feature set is scored by information value computed from per-bin target
aggregates; features are added greedily in IV-descending order and kept only
if joint IV improves by >0.2% (threshold 1.002, src/optimizer.py:175-231),
then reordered by bin count ascending (src/optimizer.py:210-211).

Spark-first: every IV evaluation is ONE groupBy over the (cached) encoded
DataFrame returning <= #paths rows; the greedy loop on the driver only
sequences those jobs.  WoE uses the reference's 0.5 adjustment and safe
division (src/optimizer.py:53, 61-71).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inferdb_spark.functions.math_fns import safe_div
from inferdb_spark.operators.binning import BinSpec


def woe_iv_classification(
    encoded: DataFrame, bin_cols: list[str], target: str, adjust: float = 0.5
) -> DataFrame:
    """Per-bin WoE/IV rows for a binary target (src/optimizer.py:73-82).

    Returns (bin_cols..., n, events, non_events, woe, iv_term); total IV =
    sum(iv_term).  The 0.5 adjustment keeps log() finite on pure bins.
    """
    y = F.col(target).cast("double")
    tot = encoded.agg(
        F.count("*").alias("N"), F.sum(y).alias("E")
    ).first()
    n_total, e_total = tot["N"], float(tot["E"] or 0.0)
    ne_total = n_total - e_total
    g = encoded.groupBy(*bin_cols).agg(
        F.count("*").alias("n"), F.sum(y).alias("events")
    )
    ev = F.col("events")
    nev = F.col("n") - ev
    # adjusted distribution ratios (reference adds 0.5 to both numerators)
    dist_ev = (ev + F.lit(adjust)) / F.lit(e_total if e_total else 1.0)
    dist_nev = (nev + F.lit(adjust)) / F.lit(ne_total if ne_total else 1.0)
    woe = F.log(safe_div(dist_ev, dist_nev, 1.0))
    return g.select(
        *bin_cols,
        F.col("n"),
        ev.alias("events"),
        nev.alias("non_events"),
        woe.alias("woe"),
        ((dist_ev - dist_nev) * woe).alias("iv_term"),
    )


def iv_classification(encoded: DataFrame, bin_cols: list[str], target: str) -> float:
    row = (
        woe_iv_classification(encoded, bin_cols, target)
        .agg(F.sum("iv_term").alias("iv"))
        .first()
    )
    return float(row["iv"] or 0.0)


def iv_multiclass(
    encoded: DataFrame, bin_cols: list[str], target: str, adjust: float = 0.5
) -> float:
    """Multi-class IV: sum of one-vs-rest binary IVs over the observed
    classes (src/optimizer.py:83-98 joins per-class instance counts onto
    the per-bin counts; one groupBy on (bins, class) here gives the same
    numbers without the pandas join)."""
    y = F.col(target).cast("long")
    totals = {
        r["y"]: r["n"]
        for r in encoded.groupBy(y.alias("y")).agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(totals.values())
    per = (
        encoded.groupBy(*bin_cols, y.alias("y"))
        .agg(F.count("*").alias("n"))
        .groupBy(*bin_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("y"), F.col("n")))
            ).alias("cls_n"),
            F.sum("n").alias("bin_n"),
        )
        .collect()
    )
    iv = 0.0
    import math

    for cls, e_total in totals.items():
        ne_total = n_total - e_total
        if e_total == 0 or ne_total == 0:
            continue
        for r in per:
            ev = r["cls_n"].get(cls, 0)
            nev = r["bin_n"] - ev
            de = (ev + adjust) / e_total
            dn = (nev + adjust) / ne_total
            woe = math.log(de / dn) if dn else 0.0
            iv += (de - dn) * woe
    return iv


def iv_regression(encoded: DataFrame, bin_cols: list[str], target: str) -> float:
    """Regression IV analog: sum over bins of |mean_bin - mean_global| *
    (n_bin/N) (src/optimizer.py:99-102)."""
    y = F.col(target).cast("double")
    tot = encoded.agg(F.count("*").alias("N"), F.avg(y).alias("M")).first()
    n_total, m_global = tot["N"], float(tot["M"] or 0.0)
    row = (
        encoded.groupBy(*bin_cols)
        .agg(F.count("*").alias("n"), F.avg(y).alias("m"))
        .agg(
            F.sum(
                F.abs(F.col("m") - F.lit(m_global)) * (F.col("n") / F.lit(n_total))
            ).alias("iv")
        )
        .first()
    )
    return float(row["iv"] or 0.0)


def greedy_select(
    encoded: DataFrame,
    specs: list[BinSpec],
    target: str,
    task: str = "classification",
    improvement: float = 1.002,
    suffix: str = "_bin",
) -> list[BinSpec]:
    """Greedy feature-subset search (src/optimizer.py:175-231).

    1. score each feature's solo IV; order descending;
    2. add features in that order, keeping one only if joint IV > best *
       `improvement`;
    3. reorder the selection by bin count ascending (storage minimization).

    `encoded` should be cached by the caller — each step is one aggregation
    job over it.
    """
    iv_fn = {
        "classification": iv_classification,
        "multiclass": iv_multiclass,
        "regression": iv_regression,
    }[task]
    solo = [(s, iv_fn(encoded, [s.column + suffix], target)) for s in specs]
    solo.sort(key=lambda t: -t[1])
    selected: list[BinSpec] = []
    best = 0.0
    for s, _ in solo:
        cand = selected + [s]
        iv = iv_fn(encoded, [c.column + suffix for c in cand], target)
        if not selected or iv > best * improvement:
            selected = cand
            best = iv
    selected.sort(key=lambda s: s.n_bins)
    return selected


def brute_force_select(
    encoded: DataFrame,
    specs: list[BinSpec],
    target: str,
    task: str = "classification",
    suffix: str = "_bin",
    max_features: int | None = None,
) -> tuple[list[BinSpec], float]:
    """Exhaustive feature-subset search — the reference's optimality
    baseline for greedy_select (src/optimizer.py:233-247, exercised by
    experiments/microbenchmarks/feature_selection/brute_force_fs.py:148-180).

    Evaluates every non-empty subset (up to `max_features`) by joint IV
    and returns (best subset ordered by bin count, its IV).  2^n - 1
    aggregation jobs over the cached encoded frame — a microbenchmark
    tool, not a production path (greedy is the production path; the test
    asserts greedy reaches the brute-force optimum on small spaces within
    the reference's 1.002 improvement tolerance)."""
    from itertools import combinations

    iv_fn = {
        "classification": iv_classification,
        "multiclass": iv_multiclass,
        "regression": iv_regression,
    }[task]
    best_subset: list[BinSpec] = []
    best_iv = float("-inf")
    limit = max_features or len(specs)
    for k in range(1, limit + 1):
        for combo in combinations(specs, k):
            iv = iv_fn(encoded, [c.column + suffix for c in combo], target)
            if iv > best_iv:
                best_iv, best_subset = iv, list(combo)
    best_subset.sort(key=lambda s: s.n_bins)
    return best_subset, best_iv
