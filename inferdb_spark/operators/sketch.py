"""Mergeable distinct-count sketches (KMV / k-minimum-values).

The reference computes exact `COUNT(DISTINCT ...)` everywhere (e.g. the
index-size accounting in `src/optimizer.py:225-231` counts distinct
compound keys exactly).  At 100 TB an exact global distinct is a full
shuffle of every distinct value; the standard scale substitute is a
mergeable sketch.  Spark ships HLL (`approx_count_distinct`) but its
register layout is engine-internal — it cannot be hash-compared against an
independent oracle, and its partials cannot be stored as plain columns.

KMV is the oracle-friendly alternative: keep the k smallest values of a
deterministic uniform hash (functions/hashing.h52, md5-derived, portable to
any engine).  Properties that matter at cluster scale:

- **partials are plain relations** (`group_cols, kmv array<bigint>`): they
  can be written to parquet per partition/day/source and re-merged later
  without touching the base data — the incremental-rollup pattern;
- **merge is associative + idempotent**: min-k of a union of min-k sets ==
  min-k of the union, so partial granularity is free to choose;
- **estimate is deterministic**: (k-1) * 2^52 / kth_min_hash, pure integer
  inputs into one IEEE division — bit-identical across engines, unlike HLL
  whose estimate depends on register encoding;
- groups with fewer than k distinct hashes are EXACT (the sketch holds all
  of them).

Plan shape: one shuffle for the per-group distinct-hash dedup, one narrow
rank-filter per group.  No Python, no UDAF — `row_number` + `collect_list`
only, all whole-stage-codegen'd except the final small aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from inferdb_spark.functions.hashing import h52

# h52 is uniform over [0, 16^13) = [0, 2^52)
H52_SPACE = 1 << 52


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: Column, k: int
) -> DataFrame:
    """Per-group KMV sketch: the k smallest distinct h52(value) hashes.

    Returns `group_cols + (kmv array<bigint>, n_kept bigint)`.  The
    distinct() is the only wide dependency on the input size; the
    rank-filter shuffles only the (already deduplicated) hash relation.
    """
    dh = df.select(*group_cols, h52(value_col).alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        dh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list("h")).alias("kmv"),
            F.count("*").alias("n_kept"),
        )
    )


def kmv_merge(sketches: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Merge partial sketches (finer grouping) up to `group_cols`.

    Explode → distinct → re-rank-filter: exactly the build-side plan but
    over the tiny sketch relation, never the base data.  Associative and
    idempotent, so partials may be merged in any order / any number of
    times — safe under task retry and speculative execution.
    """
    ex = sketches.select(*group_cols, F.explode("kmv").alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        ex.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list("h")).alias("kmv"),
            F.count("*").alias("n_kept"),
        )
    )


def kmv_estimate(sketches: DataFrame, k: int) -> DataFrame:
    """Distinct-count estimate column from a sketch relation.

    n_kept < k  → the group had fewer than k distinct hashes: exact.
    n_kept == k → (k-1) * 2^52 / kth_min  (classic KMV estimator).

    (k-1)*2^52 and the kth hash are both exact in double precision
    (< 2^59 with ≤ 6 significant bits × 2^52), so the single division is
    correctly rounded and engine-portable; rounded to 4dp for the gate.
    """
    kth = F.element_at("kmv", k).cast("double")
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.round(F.lit(float((k - 1) * H52_SPACE)) / kth, 4))
    return sketches.withColumn("est_distinct", est).withColumn(
        "kth_hash", F.when(F.col("n_kept") >= k, F.element_at("kmv", k)).otherwise(F.lit(None).cast("long"))
    )


def kmv_pairwise_overlap(sketches: DataFrame, key_col: str, k: int) -> DataFrame:
    """Set algebra over sketches: union / intersection / Jaccard estimates
    for every key pair, from the sketch relation ALONE.

    The k smallest hashes of A ∪ B are a uniform sample of the union, and
    any union-sample member h ∈ A iff h appears in A's sketch (h is below
    the union's kth minimum ≤ A's kth minimum).  So per pair:

      u        = k smallest of (kmv_a ∪ kmv_b)
      n_both   = |{h ∈ u : h ∈ kmv_a ∧ h ∈ kmv_b}|
      J        = n_both / |u|              (exact when |u| < k)
      |A ∪ B|  = KMV estimate on u
      |A ∩ B|  = J · |A ∪ B|

    Pure array expressions over the tiny sketch relation — the 100 TB
    base data is never re-read to answer "how much do sources overlap",
    which is the cross-source contamination / mixture-planning question.
    """
    a, b = sketches.alias("a"), sketches.alias("b")
    ka, kb = F.col("a.kmv"), F.col("b.kmv")
    pairs = a.join(b, F.col(f"a.{key_col}") < F.col(f"b.{key_col}")).select(
        F.col(f"a.{key_col}").alias(f"{key_col}_a"),
        F.col(f"b.{key_col}").alias(f"{key_col}_b"),
        F.slice(F.array_sort(F.array_distinct(F.concat(ka, kb))), 1, k).alias("u"),
        ka.alias("ka"),
        kb.alias("kb"),
    )

    def in_both(h: Column) -> Column:
        return F.array_contains(F.col("ka"), h) & F.array_contains(F.col("kb"), h)

    n_u = F.size("u")
    n_both = F.size(F.filter(F.col("u"), in_both)).cast("long")
    union_raw = F.when(n_u < k, n_u.cast("double")).otherwise(
        F.lit(float((k - 1) * H52_SPACE)) / F.element_at("u", k).cast("double")
    )
    jacc_raw = n_both.cast("double") / n_u.cast("double")
    return pairs.select(
        f"{key_col}_a",
        f"{key_col}_b",
        n_u.cast("long").alias("n_union_kept"),
        n_both.alias("n_both"),
        F.round(union_raw, 4).alias("union_est"),
        F.round(jacc_raw, 6).alias("jaccard_est"),
        F.round(n_both.cast("double") * union_raw / n_u.cast("double"), 4).alias(
            "intersect_est"
        ),
    )


# ---------------------------------------------------------------------------
# Fixed-boundary histogram quantile sketch (mergeable approx percentiles)


def hist_quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Per-group equi-width histogram over [lo, hi): the mergeable quantile
    sketch (t-digest / `approx_percentile` stand-in whose state is a plain
    relation and whose estimate is engine-portable).

    State = `group_cols + (bin bigint, cnt bigint)`, ≤ n_bins rows per
    group regardless of input size.  Merge = additive union (groupBy sum —
    associative, commutative), so per-partition/day/source partials roll
    up without re-reading the base data.  Build is ONE shuffle with
    map-side partial aggregation; error is bounded by one bin width.
    Values outside [lo, hi) clamp into the edge bins.
    """
    w = (hi - lo) / n_bins
    b = F.floor((value_col - F.lit(lo)) / F.lit(w)).cast("long")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("cnt"))
    )


def hist_quantile_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Roll partial histograms (finer grouping) up to `group_cols`:
    a plain additive aggregation over the tiny sketch relation."""
    return sketches.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantile_estimate(
    sketches: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Quantile estimates from a histogram sketch relation.

    For each q: target integer rank r = ceil(q·n); find the bin whose
    cumulative count first reaches r; interpolate within the bin by
    (r - cum_prev)/cnt.  Integer ranks + one fixed double expression
    order make the estimate bit-portable across engines.  Output:
    group_cols + (q, est) rows, rounded to 6dp.
    """
    w = (hi - lo) / n_bins
    win = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sketches.withColumn("cum", F.sum("cnt").over(win)).withColumn(
        "total", F.sum("cnt").over(Window.partitionBy(*group_cols))
    )
    qdf = cum.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    j = cum.crossJoin(F.broadcast(qdf))
    # clamp the target rank to >=1 so q=0.0 returns the minimum-bin
    # estimate instead of an empty result (ceil(0*n)=0 matches no bin)
    r = F.greatest(
        F.ceil(F.col("q") * F.col("total").cast("double")).cast("long"),
        F.lit(1).cast("long"),
    )
    hit = j.filter((F.col("cum") >= r) & ((F.col("cum") - F.col("cnt")) < r))
    frac = (r - (F.col("cum") - F.col("cnt"))).cast("double") / F.col("cnt").cast(
        "double"
    )
    est = F.lit(lo) + (F.col("bin").cast("double") + frac) * F.lit(w)
    return hit.select(*group_cols, "q", F.round(est, 6).alias("est"))


# ---------------------------------------------------------------------------
# Portable Bloom filter as a relation (semi-join pre-filter)

BLOOM_WORD_BITS = 32  # bits per word, stored in BIGINT (mask stays positive)


def _bloom_positions(key: Column, n_hashes: int, m_bits: int) -> list[Column]:
    from inferdb_spark.functions.hashing import h52

    return [
        h52(F.concat(F.lit(f"b{i}."), key)) % F.lit(m_bits)
        for i in range(n_hashes)
    ]


def bloom_build(
    df: DataFrame, key: Column, n_hashes: int, m_bits: int
) -> DataFrame:
    """Bloom filter over a key column, materialized as a RELATION
    `(word bigint, bits bigint)` — at most m_bits/32 rows.

    Spark's runtime bloom pushdown (injected, engine-internal) cannot be
    persisted or shipped; this one can: write the word relation to
    parquet, broadcast it into any job — or any OTHER engine — and
    pre-filter a 100 TB probe side before the exact join.  Positions are
    h52-derived (portable); words hold 32 bits each so every mask is a
    positive BIGINT on every engine; build is one explode + bit_or
    aggregation over #keys × n_hashes rows.
    """
    pos = F.explode(F.array(*_bloom_positions(key, n_hashes, m_bits)))
    p = df.select(pos.alias("p"))
    return (
        p.select(
            (F.col("p") / BLOOM_WORD_BITS).cast("long").alias("word"),
            F.expr(f"shiftleft(1L, CAST(p % {BLOOM_WORD_BITS} AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame, key: Column, bloom: DataFrame, n_hashes: int, m_bits: int
) -> DataFrame:
    """Rows of `df` whose key MAY be in the bloom set (all n_hashes bits
    set).  The bloom relation broadcasts; a probe row survives iff it
    matches a set bit for every hash — counted via an inner join on word
    + bit test, keeping rows with n_hashes hits.  False positives are
    possible (bounded by the m/n choice), false negatives are not —
    exactly the semi-join pre-filter contract.

    Membership depends only on the key, so the probe runs over DISTINCT
    keys and the surviving key set is semi-joined back to `df`.  (The
    earlier form tagged rows with monotonically_increasing_id and
    referenced the tagged frame in two plan branches — ids can differ
    between the branches' evaluations under AQE / task retry, silently
    keeping or dropping the wrong rows.  A key-derived probe is
    deterministic by construction.)
    """
    keys = df.select(key.alias("_probe_key")).distinct()
    pos = F.explode(
        F.array(*_bloom_positions(F.col("_probe_key"), n_hashes, m_bits))
    )
    probes = keys.select("_probe_key", pos.alias("p")).select(
        "_probe_key",
        (F.col("p") / BLOOM_WORD_BITS).cast("long").alias("word"),
        F.expr(f"shiftleft(1L, CAST(p % {BLOOM_WORD_BITS} AS INT))").alias("mask"),
    )
    hits = (
        probes.join(F.broadcast(bloom), "word")
        .filter((F.col("bits").bitwiseAND(F.col("mask"))) != 0)
        .groupBy("_probe_key")
        .agg(F.count("*").alias("n_hits"))
        .filter(F.col("n_hits") == n_hashes)
        .select("_probe_key")
    )
    return df.join(hits, key == F.col("_probe_key"), "left_semi")


# ---------------------------------------------------------------------------
# Count-min sketch (mergeable frequency estimation)


def cms_positions(value: Column, depth: int, width: int) -> list[Column]:
    from inferdb_spark.functions.hashing import h52

    return [
        h52(F.concat(F.lit(f"r{i}."), value)) % F.lit(width) for i in range(depth)
    ]


def cms_build(df: DataFrame, value: Column, depth: int, width: int) -> DataFrame:
    """Count-min sketch over a value column as a relation
    `(row bigint, col bigint, cnt bigint)` — at most depth×width rows.

    Fully deterministic (h52 rows, exact integer counters) and additively
    mergeable (groupBy sum of partials), unlike Spark's
    `count_min_sketch` whose binary blob is engine-internal.  Build = one
    explode to depth rows per input row, one map-side-combined shuffle on
    (row, col).  Completes the relation-sketch suite: KMV (distinct),
    histogram (quantiles), bloom (membership), CMS (frequency).
    """
    # round-5 cut: hash each DISTINCT value once.  Term-frequency inputs
    # repeat values heavily (sf1: 25M tokens, ~10^5 distinct), and the
    # md5-portable positions cost depth hashes per input row — so first
    # reduce to (value, weight) with one map-side-combined groupBy, then
    # position only the distinct values and SUM the weights.  The output
    # relation is bit-identical (exact integer counts either way).
    counts = df.select(value.alias("_v")).groupBy("_v").agg(
        F.count(F.lit(1)).alias("_c")
    )
    pos = F.posexplode(F.array(*cms_positions(F.col("_v"), depth, width)))
    return (
        counts.select(pos.alias("row", "col"), "_c")
        .groupBy(
            F.col("row").cast("long").alias("row"),
            F.col("col").cast("long").alias("col"),
        )
        .agg(F.sum("_c").cast("long").alias("cnt"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Additive merge of partial CMS relations (same depth/width)."""
    return sketches.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame, probes: DataFrame, value: Column, depth: int, width: int
) -> DataFrame:
    """Point-frequency estimates for probe values: min over the depth
    counters at the value's positions.  A probe position whose counter
    row is absent means count 0 — coalesced, so estimates never miss
    low.  est >= true count always (collisions only inflate).
    """
    pos = F.posexplode(F.array(*cms_positions(value, depth, width)))
    pp = probes.select(value.alias("probe"), pos.alias("row", "col")).select(
        "probe", F.col("row").cast("long").alias("row"), F.col("col").cast("long").alias("col")
    )
    return (
        pp.join(F.broadcast(cms), ["row", "col"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy("probe")
        .agg(F.min("cnt").cast("long").alias("est"))
    )


# ---------------------------------------------------------------------------
# Misra-Gries / SpaceSaving heavy hitters as a MERGEABLE relation
# (Agarwal et al., "Mergeable Summaries", PODS'12).  The reference's
# frequency questions are exact GROUP BY counts (the class-frequency
# aggregates behind WoE/IV, src/encoder.py); at 100 TB an exact global
# term count is a full shuffle of every distinct term.  The MG summary is
# the deterministic sketch substitute: per logical shard keep only the
# `capacity` most frequent terms with their counts REDUCED by the
# (capacity+1)-th count t_s; merging shard summaries by summation yields
# estimates that undercount by at most Σ_s t_s ≤ Σ_s n_s/(capacity+1) —
# a bound the summary itself reports.
#
# Everything is relational and engine-portable: shards are LOGICAL
# (h52(row_key) % n_shards, not physical partitions, so an independent
# oracle reproduces them bit-for-bit), the per-shard reduction is one
# window over (cnt DESC, term ASC), and the merge is a groupBy sum.
# Scale: the post-shard relation is ≤ n_shards × capacity rows —
# broadcastable; the only wide shuffle is the (shard, term) count, which
# is map-side combined.


def mg_shard_summaries(
    df: DataFrame,
    shard_key: Column,
    term_col: Column,
    n_shards: int,
    capacity: int,
) -> DataFrame:
    """Per-shard Misra-Gries summaries: (shard, term, residual, t_s).
    residual = cnt − t_s for the top-`capacity` terms of the shard (ties
    to the lexicographically lowest term), t_s = the (capacity+1)-th
    count (0 when the shard has ≤ capacity distinct terms)."""
    shard = (h52(F.concat(F.lit("mg"), shard_key.cast("string"))) % F.lit(n_shards)).alias(
        "shard"
    )
    counts = (
        df.select(shard, term_col.alias("term"))
        .groupBy("shard", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("shard").orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = counts.withColumn("rk", F.row_number().over(w))
    thresholds = ranked.groupBy("shard").agg(
        F.max(F.when(F.col("rk") == capacity + 1, F.col("cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("t_s")
    )
    return (
        ranked.filter(F.col("rk") <= capacity)
        .join(thresholds, "shard")
        .withColumn("residual", (F.col("cnt") - F.col("t_s")).cast("long"))
        .filter(F.col("residual") > 0)
        .select("shard", "term", "residual", "t_s")
    )


def mg_heavy_hitters(
    summaries: DataFrame, thresholds: DataFrame, top_k: int
) -> DataFrame:
    """Merge shard summaries into global heavy hitters: est = Σ residual
    (undercounts by ≤ err_bound = Σ_s t_s, reported alongside), top-k by
    (est DESC, term ASC).  `thresholds` is the distinct (shard, t_s)
    relation (pass the summaries themselves — it is deduped here)."""
    err = thresholds.select("shard", "t_s").distinct().agg(
        F.sum("t_s").cast("long").alias("err_bound")
    )
    return (
        summaries.groupBy("term")
        .agg(F.sum("residual").cast("long").alias("est"))
        .crossJoin(F.broadcast(err))
        .orderBy(F.col("est").desc(), F.col("term").asc())
        .limit(top_k)
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet et al. 2007) with EXPLICIT registers.
#
# The KMV module header documents why Spark's built-in HLL
# (`approx_count_distinct`) cannot be oracle-verified: its register layout
# is engine-internal.  This is the missing half of that story — an HLL
# whose registers are a plain (bucket, rho) RELATION derived from the
# md5-portable h52 hash, so any engine recomputes them bit-for-bit:
#
#   bucket = h52 % m            (p low-order bits, m = 2^p registers)
#   rem    = floor(h52 / m)     (the remaining 52-p bits; /2^p is exact
#                                in doubles since h52 < 2^52)
#   rho    = leading zeros of rem in a (52-p)-bit window + 1
#          = (52 - p) - bitlen(rem) + 1      (rem = 0 → 52 - p + 1)
#
# bitlen is a descending CASE chain over power-of-two thresholds — pure
# integer comparisons, no libm.  Registers merge by MAX (associative,
# idempotent — the same parquet-partials pattern as kmv_merge).  The
# harmonic sum Σ 2^-rho is kept EXACT by scaling with 2^(52-p+1): every
# term 2^(52-p+1-rho) is then an integer, so `inv_scaled` is a BIGINT and
# the raw estimate alpha·m²/S is a single IEEE division — deterministic
# without any snapping.  Only the small-range correction m·ln(m/V) touches
# libm and is 6dp-rounded on both engines per the cookbook.
#
# Reference anchor: exact-distinct accounting in src/optimizer.py:225-231;
# HLL is its 100 TB mergeable substitute alongside KMV.


def hll_rho(rem: Column, rem_bits: int) -> Column:
    """rho = leading zeros of `rem` in a rem_bits window + 1, via a
    descending threshold CASE chain (no libm)."""
    w = None
    for k in range(rem_bits - 1, -1, -1):
        cond = rem >= F.lit(1 << k)
        val = F.lit(rem_bits - k)
        w = F.when(cond, val) if w is None else w.when(cond, val)
    return w.otherwise(F.lit(rem_bits + 1)).cast("long")


def duckdb_hll_rho(rem_expr: str, rem_bits: int) -> str:
    """DuckDB twin of hll_rho."""
    whens = " ".join(
        f"WHEN {rem_expr} >= {1 << k} THEN {rem_bits - k}"
        for k in range(rem_bits - 1, -1, -1)
    )
    return f"CAST(CASE {whens} ELSE {rem_bits + 1} END AS BIGINT)"


def hll_registers(df: DataFrame, key: Column, p_bits: int = 6) -> DataFrame:
    """(bucket, rho) register relation of SEEN buckets (max-rho per bucket).
    `key` must be a string column (hash input).  One shuffle on bucket with
    map-side-combined MAX — at 100 TB this is the per-partition-partials
    shape: write these m-row relations per shard and re-merge with
    hll_merge."""
    m = 1 << p_bits
    rem_bits = 52 - p_bits
    h = h52(key)
    bucket = (h % F.lit(m)).cast("long")
    rem = F.floor(h / F.lit(float(m))).cast("long")
    return (
        df.select(bucket.alias("bucket"), hll_rho(rem, rem_bits).alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(registers: DataFrame) -> DataFrame:
    """Merge register relations (union them first): MAX per bucket."""
    return registers.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_full_registers(registers: DataFrame, p_bits: int = 6) -> DataFrame:
    """Left-join the 2^p bucket domain so empty registers appear with
    rho = 0 (required by both the harmonic sum and the zeros count)."""
    m = 1 << p_bits
    spark = registers.sparkSession
    domain = spark.range(m).select(F.col("id").cast("long").alias("bucket"))
    return domain.join(F.broadcast(registers), "bucket", "left").select(
        "bucket", F.coalesce(F.col("rho"), F.lit(0)).cast("long").alias("rho")
    )


def hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(full_registers: DataFrame, p_bits: int = 6) -> DataFrame:
    """One-row estimate relation from the FULL (domain-joined) register
    set: exact-integer harmonic sum, raw alpha·m²/S estimate, 6dp-rounded
    small-range (linear-counting) correction."""
    m = 1 << p_bits
    rem_bits = 52 - p_bits
    alpha = hll_alpha(m)
    scale = float(1 << (rem_bits + 1))
    # exact-integer harmonic term: 2^(rem_bits+1-rho) via a bit shift —
    # no libm anywhere in the sum (rho ∈ [0, rem_bits+1] → shift ∈ [0, 47])
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({rem_bits + 1} - rho AS INT))"
    )
    agg = full_registers.agg(
        F.sum(term).alias("inv_scaled"),
        F.sum((F.col("rho") == 0).cast("long")).alias("v_zeros"),
    )
    raw = (F.lit(alpha * m * m)) / (F.col("inv_scaled").cast("double") / F.lit(scale))
    corrected = F.when(
        (F.col("v_zeros") > 0) & (raw <= F.lit(2.5 * m)),
        F.round(
            F.lit(float(m))
            * F.log(F.lit(float(m)) / F.col("v_zeros").cast("double")),
            6,
        ),
    ).otherwise(F.round(raw, 6))
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        F.col("v_zeros").cast("long"),
        F.col("inv_scaled").cast("long"),
        corrected.cast("double").alias("est6"),
    )
