"""Entity resolution (record linkage) as composable DataFrame stages.

The reference resolves near-duplicate records with in-database string
matching over its key-value index tables (src/transpiler.py's string
normalization + the index build's distinct-key discipline); this module
re-expresses the classic three-stage linkage pipeline Spark-first:

1. **Blocking** — records self-join ONLY within cheap equality blocks
   (e.g. nation × balance band), so the quadratic verify stage is
   bounded by Σ_b |b|² instead of n².  Block granularity is the scale
   knob: at sf1, $1000 bands produced ~2B candidate pairs where $10
   bands produce ~22M (measured, DESIGN_SCALE.md).
2. **Verify** — exact Levenshtein on the candidate pairs (JVM
   ``F.levenshtein``, no Python), keeping pairs at distance ≤ k.
3. **Cluster** — distributed connected components over the match
   edges (operators/graph.py min-label propagation, O(log n) rounds,
   one row of state per record), canonical record = lowest id per
   component.

Every stage is a plain DataFrame → DataFrame function so callers can
swap the verify predicate (e.g. jaro-winkler via expr, n-gram overlap
from operators/dedup) or feed the match edges into a different
clustering.  The ``entity_resolution`` gate (gate_r5.py) composes all
three and replays the identical chain as a recursive-CTE DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "blocked_candidate_pairs",
    "resolve_entities",
    "resolve_entities_contracted",
    "cluster_summary",
]


def blocked_candidate_pairs(
    records: DataFrame,
    block_cols: Sequence[str],
    *,
    id_col: str = "rec_id",
    name_col: str = "name",
    max_distance: int = 1,
    verify: Column | None = None,
    max_block_size: int | None = 2000,
    max_candidate_pairs: int | None = 500_000_000,
) -> DataFrame:
    """Blocking self-join + string verify → match edges (src, dst).

    Joins records to themselves on equality of every ``block_cols``
    entry with ``a.id < b.id`` (each unordered pair once), then keeps
    pairs whose names are within Levenshtein ``max_distance`` — or a
    caller-supplied ``verify`` Column predicate over the ``a``/``b``
    aliases.  The join is a hash equi join on the block key (plan-audited:
    never a cartesian), so candidate volume — and the cost of the
    quadratic verify — is Σ_b |b|², tunable entirely by block
    granularity.

    ``max_block_size`` / ``max_candidate_pairs`` are the block-level
    ``assert_small_side`` (round-8 verdict #4): the in-block pair volume
    is quadratic in block size, so ONE oversized block (a hub key —
    empty name, duplicated record cloned 100x, a catch-all phonetic
    code) OR uniformly densified blocks (every block grown k× grows the
    TOTAL candidate volume k²×, the sf10 clone regime) can turn the
    verify stage unbounded.  Before building the join, ONE map-side-
    combinable count over ``block_cols`` checks both the max block and
    the exact total Σ|b|(|b|-1)/2; breaching either raises, naming the
    offenders and the real mitigations — exact-dedup the records FIRST
    (a duplicated entity contributes |dups|² candidate pairs and zero
    new information; operators/dedup.exact_dedup), or refine
    ``block_cols`` (the $1000→$10 band narrowing cut sf1 candidates
    100x, DESIGN_SCALE.md).  Pass ``None`` to skip either check
    (callers that already bound their blocks by construction).
    Defaults: 2000/block (≤ ~2M verify pairs per block; observed
    real-data max block is 5 at sf0.1) and 5e8 total (~10 minutes of
    distributed Levenshtein work — sf1 runs at ~22M in ~23 s, the sf10
    clone-densified probe at ~2.1e8; genuinely unbounded inputs sit
    orders of magnitude above).
    """
    if max_block_size is not None or max_candidate_pairs is not None:
        stats = (
            records.groupBy(*[F.col(c) for c in block_cols])
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.max("_n").alias("max_block"),
                F.sum(F.col("_n") * (F.col("_n") - 1) / 2)
                .cast("long")
                .alias("total_pairs"),
            )
            .collect()[0]
        )
        mitigation = (
            "Exact-dedup the records first (operators/dedup), refine "
            "block_cols, or pass max_block_size=None / "
            "max_candidate_pairs=None if the blocks are bounded by "
            "construction."
        )
        if max_block_size is not None and (stats["max_block"] or 0) > max_block_size:
            raise ValueError(
                f"blocked_candidate_pairs: largest block has "
                f"{stats['max_block']} records (> max_block_size="
                f"{max_block_size}) — the in-block pair join is quadratic "
                f"in a hub key. {mitigation}"
            )
        if (
            max_candidate_pairs is not None
            and (stats["total_pairs"] or 0) > max_candidate_pairs
        ):
            raise ValueError(
                f"blocked_candidate_pairs: Σ|block|·(|block|-1)/2 = "
                f"{stats['total_pairs']} candidate pairs (> "
                f"max_candidate_pairs={max_candidate_pairs}) — the verify "
                f"stage would be effectively unbounded. {mitigation}"
            )
    a, b = records.alias("a"), records.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for col in block_cols:
        cond = (F.col(f"a.{col}") == F.col(f"b.{col}")) & cond
    if verify is None:
        verify = (
            F.levenshtein(F.col(f"a.{name_col}"), F.col(f"b.{name_col}"))
            <= max_distance
        )
    return (
        a.join(b, cond)
        .where(verify)
        .select(
            F.col(f"a.{id_col}").alias("src"), F.col(f"b.{id_col}").alias("dst")
        )
    )


def resolve_entities(
    records: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "rec_id",
    variant: str = "min_label",
) -> DataFrame:
    """Match edges → (node, component) via distributed connected
    components.

    Self-loops for every record are unioned in so singletons (records
    that matched nothing) still receive a component — themselves.
    ``variant`` picks the CC algorithm: ``"min_label"`` (path-halving
    label propagation — one row of state per record, re-joins the full
    edge list each round) or ``"star"`` (alternating large-star/
    small-star contraction — the edge set SHRINKS every round, so
    per-round shuffle + checkpoint volume decays; the right pick when
    the match graph is edge-dominated, e.g. the sf10 clone regime's
    126M-edge graph over 20M records).  Both return identical labels
    (component = min reachable id).
    """
    from inferdb_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    loops = records.select(
        F.col(id_col).alias("src"), F.col(id_col).alias("dst")
    )
    edges = pairs.union(loops)
    if variant == "star":
        return connected_components_star(edges, "src", "dst")
    return connected_components(edges, "src", "dst")


def resolve_entities_contracted(
    records: DataFrame,
    block_cols: Sequence[str],
    *,
    id_col: str = "rec_id",
    name_col: str = "name",
    max_distance: int = 1,
    max_block_size: int | None = 2000,
    max_candidate_pairs: int | None = 500_000_000,
    variant: str = "min_label",
) -> DataFrame:
    """Full blocking→verify→cluster chain over the EXACT-CLONE QUOTIENT
    graph — identical output to composing `blocked_candidate_pairs` +
    `resolve_entities`, at a fraction of the cost when records repeat.

    Records with identical ``(block_cols, name_col)`` are
    verify-equivalent under any predicate that reads only those columns:
    they match each other at Levenshtein 0, and an edge from one to any
    record x implies the same edge from every clone.  So the component
    structure of the full graph is exactly the component structure of
    the quotient graph over one REPRESENTATIVE (min id) per clone
    group, with clones inheriting their representative's component.
    And because min-label CC labels a component by its minimum member,
    the quotient labels are already the true labels: the globally
    minimal id in a component is ≥ its own group representative, which
    is in the same component — so min over representatives = min over
    all ids.

    Why it matters at scale: a clone group of size g contributes
    g·(g-1)/2 candidate pairs and zero information.  The round-9 sf10
    probe measured 61% of 206M Levenshtein candidates as exact clone
    matches; contraction removes them from BOTH the quadratic verify
    stage and the CC edge list before any join runs.  The block-level
    volume guards then apply to the contracted relation — the one whose
    quadratic cost is real.

    Restriction: the verify predicate is the built-in Levenshtein form
    (a function of ``name_col`` alone, with ``max_distance >= 0``);
    callers with predicates over other columns must use the uncontracted
    chain.  Returns (node, component) for EVERY input record.
    """
    blocks = [F.col(c) for c in block_cols]
    # one row per clone group: representative = min id (groupBy, never a
    # window — map-side combinable, no per-group sort)
    rec2rep = records.groupBy(*blocks, F.col(name_col)).agg(
        F.min(F.col(id_col)).alias("_rep"),
        F.collect_list(F.col(id_col)).alias("_members"),
    )
    reps = rec2rep.select(
        F.col("_rep").alias(id_col), F.col(name_col), *blocks
    )
    pairs = blocked_candidate_pairs(
        reps,
        block_cols,
        id_col=id_col,
        name_col=name_col,
        max_distance=max_distance,
        max_block_size=max_block_size,
        max_candidate_pairs=max_candidate_pairs,
    )
    cc = resolve_entities(reps, pairs, id_col=id_col, variant=variant)
    # expand: every member of a clone group inherits its representative's
    # component.  collect_list is bounded by the clone-group size — the
    # same quantity max_block_size already caps.
    members = rec2rep.select(
        F.explode("_members").alias("member"), F.col("_rep")
    )
    return members.join(cc, members["_rep"] == cc["node"]).select(
        F.col("member").alias("node"), "component"
    )


def cluster_summary(
    records: DataFrame,
    assignments: DataFrame,
    *,
    id_col: str = "rec_id",
    name_col: str = "name",
) -> DataFrame:
    """(component, size, canonical_name): canonical record = the
    component label itself (min-label CC makes it the lowest id), so the
    canonical name is one broadcast-eligible join back to records — no
    per-cluster argmin pass."""
    return (
        assignments.groupBy(F.col("component").cast("long").alias("component"))
        .agg(F.count(F.lit(1)).cast("long").alias("size"))
        .join(
            records.select(
                F.col(id_col).alias("component"),
                F.col(name_col).alias("canonical_name"),
            ),
            "component",
        )
        .select("component", "size", "canonical_name")
    )
