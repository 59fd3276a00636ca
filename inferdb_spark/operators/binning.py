"""Feature discretization (the reference's Encoder, src/encoder.py:22-153).

The reference fits target-aware optimal bins per column (optbinning) on the
driver, then discretizes rows with generated CASE-WHEN SQL or a plpgsql
binary search (sql_scripts/binary_search_numeric.sql).  Spark-first design:

- *fit* runs as Spark aggregations (quantile pre-bins via exact/approx
  percentile, per-prebin target stats via one groupBy) — only tiny aggregate
  results reach the driver, so fitting scales to arbitrarily large tables.
- *apply* is a vectorized expression per column: a chained `F.when` for few
  splits, `Bucketizer` semantics either way (half-open intervals, unseen
  categorical values -> extra bin, matching src/encoder.py:113-126).

A BinSpec is a plain, serializable description — the analog of the
reference burning fitted splits into SQL literals (src/transpiler.py:
1122-1166), except we emit Column trees instead of SQL strings.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class BinSpec:
    """Discretization of one feature.

    Numeric: `splits` are interior thresholds s_0<...<s_{k-2}; value x maps
    to bin i where i = #{s_j : x > s_j} (so x <= s_0 -> 0, x > s_{k-2} ->
    k-1), mirroring the reference's CASE chain (src/transpiler.py:1122-1147).
    NULLs map to `null_bin` (defaults to 0 — the reference imputes before
    encoding; we keep a defined behavior regardless).

    Categorical: `groups` is a list of value-lists; membership in group i ->
    bin i, unseen values -> len(groups) (src/encoder.py:123-126).
    """

    column: str
    kind: str = "numeric"  # "numeric" | "categorical"
    splits: list[float] = field(default_factory=list)
    groups: list[list[str]] = field(default_factory=list)
    null_bin: int = 0

    @property
    def n_bins(self) -> int:
        return len(self.splits) + 1 if self.kind == "numeric" else len(self.groups) + 1

    def expr(self, col: Column | None = None) -> Column:
        """Bin-id expression (IntegerType)."""
        c = F.col(self.column) if col is None else col
        if self.kind == "numeric":
            e = F.lit(0)
            for s in self.splits:
                e = e + F.when(c > F.lit(float(s)), 1).otherwise(0)
            return F.when(c.isNull(), F.lit(self.null_bin)).otherwise(e).cast("int")
        e = F.lit(len(self.groups))  # unseen -> extra bin
        for i in reversed(range(len(self.groups))):
            e = F.when(c.cast("string").isin(self.groups[i]), F.lit(i)).otherwise(e)
        return F.when(c.isNull(), F.lit(self.null_bin)).otherwise(e).cast("int")


def fit_quantile_bins(
    df: DataFrame, column: str, n_bins: int, relative_error: float = 0.0
) -> BinSpec:
    """Equi-depth bins from (approx)Quantile; relative_error=0 is exact
    (distributed exact percentile — a single pass + small state)."""
    probs = [i / n_bins for i in range(1, n_bins)]
    qs = df.approxQuantile(column, probs, relative_error)
    splits = sorted(set(qs))
    return BinSpec(column=column, kind="numeric", splits=splits)


def fit_width_bins(df: DataFrame, column: str, n_bins: int) -> BinSpec:
    """Equi-width bins from global min/max (one tiny aggregate)."""
    lo, hi = df.agg(F.min(column), F.max(column)).first()
    if lo is None or hi is None or hi <= lo:
        return BinSpec(column=column, kind="numeric", splits=[])
    w = (hi - lo) / n_bins
    return BinSpec(
        column=column, kind="numeric", splits=[lo + w * i for i in range(1, n_bins)]
    )


def fit_supervised_bins(
    df: DataFrame,
    column: str,
    target: str,
    max_bins: int = 8,
    pre_bins: int = 64,
    min_frac: float = 0.01,
    outlier_detector: str | None = None,
) -> BinSpec:
    """Target-aware binning — the optbinning stand-in (SURVEY.md §7 item 2).

    1. quantile pre-bin into `pre_bins` buckets (Spark exact percentile);
    2. one groupBy(prebin) -> (count, mean(target)) — tiny result to driver;
    3. greedily merge the adjacent pair with the most similar target mean
       (count-weighted) until `max_bins` remain; pairs below `min_frac`
       support merge first.

    Only step 3 runs on the driver, over <= pre_bins rows of aggregates, so
    the fit is insensitive to table size.  outlier_detector='range'
    excludes IQR-range outliers from the fit (the reference passes it on
    every optbinning call, src/encoder.py:38-44).
    """
    if outlier_detector == "range":
        from inferdb_spark.operators.optimal_binning import iqr_range_filter

        df = iqr_range_filter(df, column)
    pre = fit_quantile_bins(df, column, pre_bins)
    if not pre.splits:
        return pre
    stats = (
        df.select(pre.expr().alias("b"), F.col(target).cast("double").alias("y"))
        .groupBy("b")
        .agg(F.count("*").alias("n"), F.avg("y").alias("m"))
        .orderBy("b")
        .collect()
    )
    # contiguous runs over observed pre-bins; edges between run i and i+1
    # correspond to pre.splits boundary indices
    bins = [[r.b, r.n, r.m] for r in stats]
    total = sum(r.n for r in stats)

    def merge_cost(i: int) -> float:
        (_, n1, m1), (_, n2, m2) = bins[i], bins[i + 1]
        if min(n1, n2) < min_frac * total:  # under-supported pairs merge first
            return 0.0
        return abs(m1 - m2)

    while len(bins) > max_bins:
        i = min(range(len(bins) - 1), key=merge_cost)
        b1, b2 = bins[i], bins[i + 1]
        n, m = b1[1] + b2[1], (b1[1] * b1[2] + b2[1] * b2[2]) / (b1[1] + b2[1])
        bins[i] = [b2[0], n, m]  # keep upper pre-bin id as the boundary owner
        del bins[i + 1]
    # boundary between kept bin groups = pre-split at index (first prebin of
    # next group) - 1
    kept_upper = [b[0] for b in bins[:-1]]
    splits = [pre.splits[u] for u in kept_upper if u < len(pre.splits)]
    return BinSpec(column=column, kind="numeric", splits=sorted(set(splits)))


def fit_categorical_bins(
    df: DataFrame, column: str, target: str, max_groups: int = 8
) -> BinSpec:
    """Group categories by target mean (one groupBy; driver merges).

    Categories sorted by mean(target) are sliced into `max_groups` contiguous
    groups of near-equal support — the categorical analog of optimal binning
    (reference: optbinning categorical mode, src/encoder.py:35-97).
    """
    stats = (
        df.groupBy(F.col(column).cast("string").alias("v"))
        .agg(F.count("*").alias("n"), F.avg(F.col(target).cast("double")).alias("m"))
        .orderBy("m", "v")
        .collect()
    )
    total = sum(r.n for r in stats) or 1
    groups: list[list[str]] = [[]]
    acc = 0
    per = total / max_groups
    for r in stats:
        if acc >= per * len(groups) and len(groups) < max_groups:
            groups.append([])
        groups[-1].append(r.v)
        acc += r.n
    return BinSpec(column=column, kind="categorical", groups=[g for g in groups if g])


def apply_bins(df: DataFrame, specs: list[BinSpec], suffix: str = "_bin") -> DataFrame:
    """Add one int bin-id column per spec — a single projection, no shuffle."""
    return df.withColumns({s.column + suffix: s.expr() for s in specs})


def apply_bins_bucketizer(
    df: DataFrame, specs: list[BinSpec], suffix: str = "_bin"
) -> DataFrame:
    """Bucketizer-based application for WIDE feature sets (SURVEY.md §7
    known-hard 3: MNIST-class tables with hundreds of columns would blow
    whole-stage-codegen's 64KB method limit as when-chains; Bucketizer is
    the reference's binary_search_numeric.sql, vectorized).

    Multi-column Bucketizer bins all numeric specs in ONE pass.  Bucketizer
    uses [lo, hi) half-open buckets on sorted split boundaries; BinSpec
    semantics are #{s : x > s}, i.e. buckets (-inf, s0], (s0, s1], ... — we
    negate inputs and splits to flip interval closure, then remap ids
    (Bucketizer on -x with splits -s_rev gives bucket j == n-1-bin).
    Categorical specs fall back to the expression path (they are never the
    wide ones).
    """
    from pyspark.ml.feature import Bucketizer

    numeric = [s for s in specs if s.kind == "numeric" and s.splits]
    rest = [s for s in specs if s not in numeric]
    out = df
    if numeric:
        in_cols, buck_cols, splits_arr = [], [], []
        tmp = {}
        for s in numeric:
            neg = f"_neg_{s.column}"
            tmp[neg] = -F.coalesce(
                F.col(s.column).cast("double"), F.lit(float("-inf"))
            )  # null -> -(-inf) = +inf -> last negated bucket -> bin 0 == null_bin
            in_cols.append(neg)
            buck_cols.append(f"_buck_{s.column}")
            splits_arr.append(
                [float("-inf")] + [-x for x in reversed(s.splits)] + [float("inf")]
            )
        out = out.withColumns(tmp)
        buck = Bucketizer(
            splitsArray=splits_arr, inputCols=in_cols, outputCols=buck_cols
        )
        out = buck.transform(out)
        remap = {
            s.column
            + suffix: (F.lit(len(s.splits)) - F.col(f"_buck_{s.column}")).cast("int")
            for s in numeric
        }
        out = out.withColumns(remap).drop(*in_cols, *buck_cols)
    if rest:
        out = out.withColumns({s.column + suffix: s.expr() for s in rest})
    return out


def key_expr(specs: list[BinSpec], suffix: str = "_bin") -> Column:
    """Dot-separated compound key, the reference's index key format
    (src/transpiler.py:940-950): '0.3.11'."""
    return F.concat_ws(".", *[F.col(s.column + suffix).cast("string") for s in specs])
