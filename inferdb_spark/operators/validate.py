"""Data-quality operators: column profiling and expectation checks.

A 100 TB ingest pipeline gates every batch on cheap profile aggregates
(null fractions, domain violations, cardinalities) before expensive
downstream work.  The reference has no data-validation surface; this is
a first-class training-data-pipeline extension (the profile is ONE
map-side-combined aggregation pass — cost ~ a count(*)).

`countDistinct` is exact (oracle-checkable); pass approx=True at scale
to swap in approx_count_distinct (HLL, mergeable sketch) — same plan
shape, bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """Long-format per-column profile: (column, n, n_null, n_distinct,
    min_str, max_str) — one aggregation job for all columns (each stat
    is decomposable; the single pass beats per-column loops by #cols)."""
    distinct_fn = F.approx_count_distinct if approx else F.countDistinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            distinct_fn(F.col(c)).alias(f"{c}__dist"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacks = []
    for c in cols:
        stacks.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").cast("long").alias("n"),
                F.col(f"{c}__null").cast("long").alias("n_null"),
                F.col(f"{c}__dist").cast("long").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*stacks)).alias("p")).select("p.*")


def expect(
    df: DataFrame, checks: dict[str, F.Column]
) -> DataFrame:
    """Expectation evaluation: each named boolean Column counts its
    violations in one pass; returns (check, n_violations).  Compose with
    a threshold filter to gate a batch."""
    aggs = [
        F.sum((~cond).cast("long")).alias(name) for name, cond in checks.items()
    ]
    wide = df.agg(*aggs)
    stacks = [
        F.struct(F.lit(name).alias("check"), F.col(name).cast("long").alias("n_violations"))
        for name in checks
    ]
    return wide.select(F.explode(F.array(*stacks)).alias("c")).select("c.*")


def k_anonymity_suppress(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity enforcement by suppression: drop every row whose
    quasi-identifier combination occurs fewer than k times (the release
    would otherwise re-identify members of small groups).  One groupBy on
    the quasi columns + a broadcast-friendly semi join of qualifying
    groups — the privacy gate a training-data release pipeline runs after
    PII redaction.  Deterministic: membership depends only on exact
    counts."""
    groups = (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") >= k)
        .drop("_n")
    )
    # null-safe equality: groupBy treats NULL as a group, so the semi
    # join must too — a plain equi-join (NULL = NULL unknown) would
    # silently suppress every NULL-quasi row regardless of group size
    g = groups.select(
        *[F.col(c).alias(f"_g_{c}") for c in quasi_cols]
    )
    cond = None
    for c in quasi_cols:
        e = F.col(c).eqNullSafe(F.col(f"_g_{c}"))
        cond = e if cond is None else cond & e
    return df.join(g, cond, "left_semi")


def l_diversity_suppress(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity enforcement by suppression (Machanavajjhala et al.
    2007): drop every row whose quasi-identifier group carries fewer
    than `l` DISTINCT sensitive values — k-anonymity's complement (a
    large group whose members all share one sensitive value still leaks
    it; count-distinct is the fix).  Same shape as k_anonymity_suppress:
    one groupBy + a null-safe semi join of qualifying groups (NULL quasi
    values form groups of their own and must compare equal in the join).
    NULL sensitive values are ignored by count(distinct) on both engines
    — a group of all-NULL sensitives has diversity 0 and is suppressed.
    Deterministic: membership depends only on exact distinct counts."""
    groups = (
        df.groupBy(*quasi_cols)
        .agg(F.countDistinct(sensitive_col).alias("_l"))
        .where(F.col("_l") >= int(l))
        .drop("_l")
    )
    g = groups.select(*[F.col(c).alias(f"_g_{c}") for c in quasi_cols])
    cond = None
    for c in quasi_cols:
        e = F.col(c).eqNullSafe(F.col(f"_g_{c}"))
        cond = e if cond is None else cond & e
    return df.join(g, cond, "left_semi")


def fd_violation_g3(df: DataFrame, fd_name: str, lhs: str, rhs: str) -> DataFrame:
    """Approximate functional-dependency audit lhs → rhs via the classic
    g3 error: the minimum fraction of rows one must delete for the FD to
    hold exactly (Huhtala et al., TANE).  g3 = 1 − (Σ_lhs max_rhs count)/n.

    One row: (fd_name, n_rows, n_lhs, n_keepable, g3).  Plan: two stacked
    aggregations — groupBy(lhs, rhs) counts, then groupBy(lhs) max — both
    map-side combinable, no sort, no join; at 100 TB this is the shape of
    a count-distinct, and skew on a hot lhs value is absorbed by partial
    aggregation.  Exact fractions: integer counts divided once at the end.
    Profiling extension (no reference analog — validate.profile_columns
    covers single columns; this covers column PAIRS, the dependency
    structure schema-inference and dedup-key selection need)."""
    pair = df.groupBy(F.col(lhs).alias("l"), F.col(rhs).alias("r")).agg(
        F.count("*").alias("c")
    )
    per_lhs = pair.groupBy("l").agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
    return per_lhs.agg(
        F.lit(fd_name).alias("fd_name"),
        F.sum("tot").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_lhs"),
        F.sum("mx").cast("long").alias("n_keepable"),
        F.round(
            F.lit(1.0) - F.sum("mx").cast("double") / F.sum("tot"), 6
        ).cast("double").alias("g3"),
    )


def inclusion_coverage(
    fk_df: DataFrame, fk_col: str, pk_df: DataFrame, pk_col: str, name: str
) -> DataFrame:
    """Inclusion-dependency audit (foreign-key discovery): what fraction
    of the DISTINCT non-null values of fk_col appear in pk_col?

    One row: (candidate, n_distinct_fk, n_contained, containment).
    Plan: distinct on the FK side (map-side combinable), distinct on the
    PK side, one left join to tag hits, one count — the join key is the
    value domain, so the shuffle is domain-sized, not row-sized.  A
    containment of 1.0 nominates a join key; the deliberately-wrong
    candidates a schema crawler tests score near 0."""
    d = (
        fk_df.filter(F.col(fk_col).isNotNull())
        .select(F.col(fk_col).alias("val"))
        .distinct()
    )
    p = (
        pk_df.filter(F.col(pk_col).isNotNull())
        .select(F.col(pk_col).alias("val"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return d.join(p, "val", "left").agg(
        F.lit(name).alias("candidate"),
        F.count("*").cast("long").alias("n_distinct_fk"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_contained"),
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double") / F.count("*"), 6
        ).cast("double").alias("containment"),
    )
