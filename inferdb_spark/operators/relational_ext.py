"""Relational extensions beyond the reference's operator set: as-of join,
sessionization, pivot/unpivot — the time-series / event-analytics operators
a user of a general engine expects (SURVEY.md §2.3 notes the reference has
no as-of/range joins; these are the Spark-native constructions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    suffix: str = "_asof",
    right_seq_col: str | None = None,
    tolerance=None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    right_ts <= left_ts on matching keys (LEFT semantics: no match → NULL).
    Output: every left column, plus `{v}{suffix}` per right value and
    `{right_ts}{suffix}` (the matched right timestamp).

    Spark has no native as-of join.  The scalable construction (NOT
    per-group pandas merge_asof): tag and union both sides, then one
    window pass per key ordered by (ts, side, seq) carries the last
    non-null right PAYLOAD STRUCT forward — right rows sort before left
    rows at equal timestamps, giving inclusive `<=` semantics, and the
    single struct makes the matched row atomic (per-column fills could
    mix rows under duplicate right timestamps).  `right_seq_col` pins
    the winner among equal right timestamps (greatest wins — the
    latest-written record); `tolerance` (same unit as the ts columns —
    pass integer epochs) nulls matches older than left_ts - tolerance
    (pandas merge_asof semantics).  One shuffle on the key, linear in
    |L|+|R|, no row explosion — survives arbitrarily large sides where
    a range cross-join would not.
    """
    lcols = [c for c in left.columns]
    seq = F.col(right_seq_col) if right_seq_col else F.lit(0)
    pay = F.struct(
        *[F.col(v).alias(v) for v in right_values],
        F.col(right_ts).alias("_rt"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_asof_t"),
        F.lit(0).alias("_asof_side"),
        seq.cast("long").alias("_asof_seq"),
        pay.alias("_asof_p"),
    )
    pay_type = r_tagged.schema["_asof_p"].dataType
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("_asof_t"),
        F.lit(1).alias("_asof_side"),
        F.lit(0).cast("long").alias("_asof_seq"),
        F.lit(None).cast(pay_type).alias("_asof_p"),
    )
    for c in lcols:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    u = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    w = (
        W.partitionBy(*on)
        .orderBy(
            F.col("_asof_t").asc(),
            F.col("_asof_side").asc(),
            F.col("_asof_seq").asc(),
        )
        .rowsBetween(W.unboundedPreceding, 0)
    )
    out = u.withColumn(
        "_asof_m", F.last("_asof_p", ignorenulls=True).over(w)
    ).filter(F.col("_asof_side") == 1)
    m: Column = F.col("_asof_m")
    if tolerance is not None:
        within = m.isNotNull() & (
            (F.col(left_ts) - m["_rt"]) <= F.lit(tolerance)
        )
        m = F.when(within, F.col("_asof_m"))
    return out.select(
        *[F.col(c) for c in lcols],
        *[m[v].alias(f"{v}{suffix}") for v in right_values],
        m["_rt"].alias(f"{right_ts}{suffix}"),
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap to the
    previous event exceeds `gap_minutes` (lag + cumulative sum over one
    window — the standard scalable sessionization; one shuffle on key)."""
    order = [F.col(ts).asc()] + ([F.col(order_tiebreak).asc()] if order_tiebreak else [])
    w = W.partitionBy(key).orderBy(*order)
    gap_s = F.unix_timestamp(F.col(ts)) - F.unix_timestamp(F.lag(ts).over(w))
    new_sess = F.when(
        gap_s.isNull() | (gap_s > gap_minutes * 60), 1
    ).otherwise(0)
    return df.withColumn("_new_sess", new_sess).withColumn(
        "session_id",
        F.sum("_new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
    ).drop("_new_sess")


def pivot_counts(
    df: DataFrame,
    group_col: str | Column,
    pivot_col: str,
    pivot_values: list[str],
    agg: Column,
    group_alias: str = "grp",
) -> DataFrame:
    """Pivot with an EXPLICIT value list (never the two-pass value-discovery
    scan) — each pivoted cell is a conditional aggregate, one shuffle."""
    g = group_col if isinstance(group_col, Column) else F.col(group_col)
    return (
        df.groupBy(g.alias(group_alias))
        .pivot(pivot_col, pivot_values)
        .agg(agg)
    )


def unpivot(
    df: DataFrame, id_cols: list[str], value_cols: list[str],
    var_name: str = "variable", value_name: str = "value",
) -> DataFrame:
    """melt/stack: wide -> long via stack() (no shuffle; row explosion only)."""
    n = len(value_cols)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    return df.selectExpr(
        *id_cols, f"stack({n}, {stack_expr}) as ({var_name}, {value_name})"
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    band_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join for two LARGE sides (left_ts in
    [right_start, right_end), plus equi-keys `on`).

    Spark plans a bare inequality join as BroadcastNestedLoopJoin /
    cartesian — O(|L|·|R|) and undistributable when neither side fits in
    memory.  The scalable construction *bands* time: each left row maps
    to bucket floor(epoch/band); each right interval explodes to the
    buckets it spans (`F.sequence` — bounded when band_seconds is chosen
    >= typical interval length, so spans are 1-2 buckets); the join is
    then a plain shuffled equi-join on (keys..., bucket) followed by the
    exact containment filter.  Work is O(|L| + |R|·spans) with full
    partition parallelism.  SURVEY §2.3 notes the reference has no
    range/interval joins; this is the general big-big form of
    gate_olap.q_range_join_bands (whose small side can simply be
    broadcast).
    """
    lb = left.withColumn("_ij_bucket", (F.unix_timestamp(F.col(left_ts)) / band_seconds).cast("long"))
    rb = right.withColumn(
        "_ij_bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(right_start)) / band_seconds).cast("long"),
                (F.unix_timestamp(F.col(right_end)) / band_seconds).cast("long"),
            )
        ),
    )
    joined = lb.join(rb, [*on, "_ij_bucket"], how).filter(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) < F.col(right_end))
    )
    return joined.drop("_ij_bucket")


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """CDC upsert/merge without a table format: reconcile a base snapshot
    (implicit version −∞) with a change log of upserts/deletes into the
    final state — latest version per key wins, ties broken toward the
    change log, deleted keys dropped.

    One window pass over the unioned relation (single shuffle on the
    key); no MERGE INTO / transactional storage needed, so it runs on
    plain parquet snapshots.  At scale this is the standard
    snapshot+delta compaction: base and delta shuffle once each, output
    is the new snapshot (idempotent — re-applying the same delta is a
    no-op).
    """
    from pyspark.sql import Window

    b = base.withColumn(version_col, F.lit(None).cast(changes.schema[version_col].dataType)) \
        if version_col not in base.columns else base
    b = b.withColumn(op_col, F.lit("U")) if op_col not in base.columns else b
    b = b.withColumn("_src", F.lit(0))
    c = changes.withColumn("_src", F.lit(1))
    allrows = b.unionByName(c, allowMissingColumns=True)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc_nulls_last(), F.col("_src").desc()
    )
    latest = (
        allrows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    return latest.filter(F.col(op_col) != delete_op).drop(op_col)
