"""operators/entity_resolution: blocking join, verify, CC clustering.

The gate (gate_r5.py entity_resolution) pins one end-to-end instance
against a recursive-CTE DuckDB oracle; these tests pin the module
pieces on hand-checkable records.
"""

import pytest
from pyspark.sql import functions as F

from inferdb_spark.operators.entity_resolution import (
    blocked_candidate_pairs,
    cluster_summary,
    resolve_entities,
)


@pytest.fixture()
def records(spark):
    rows = [
        # block (1, 0): three names within distance 1 of each other -> one cluster
        (1, "alice", 1, 0),
        (2, "alice", 1, 0),
        (3, "alicx", 1, 0),
        # same names but different block: must NOT pair with the above
        (4, "alice", 2, 0),
        # same block, name too far: singleton
        (5, "zzzzz", 1, 0),
    ]
    return spark.createDataFrame(rows, "rec_id long, name string, nat long, band long")


def test_blocked_pairs_respects_blocks_and_distance(records):
    pairs = blocked_candidate_pairs(records, ["nat", "band"], max_distance=1)
    got = {(r["src"], r["dst"]) for r in pairs.collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_blocked_pairs_plan_is_equi_join(records):
    pairs = blocked_candidate_pairs(records, ["nat", "band"])
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_custom_verify_predicate(records):
    # exact-equality verify instead of Levenshtein
    pairs = blocked_candidate_pairs(
        records, ["nat", "band"], verify=F.col("a.name") == F.col("b.name")
    )
    got = {(r["src"], r["dst"]) for r in pairs.collect()}
    assert got == {(1, 2)}


def test_resolve_and_summary(records):
    pairs = blocked_candidate_pairs(records, ["nat", "band"], max_distance=1)
    cc = resolve_entities(records, pairs)
    assign = {r["node"]: r["component"] for r in cc.collect()}
    assert assign == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}
    summary = cluster_summary(records, cc)
    got = {(r["component"], r["size"], r["canonical_name"])
           for r in summary.collect()}
    assert got == {(1, 3, "alice"), (4, 1, "alice"), (5, 1, "zzzzz")}


def test_hash_fn_validation_raises(spark):
    from inferdb_spark.operators.dedup import _shingle_hashes
    from inferdb_spark.operators.textprep import ngram_hash_postings

    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    with pytest.raises(ValueError, match="hash_fn"):
        ngram_hash_postings(df, "doc_id", "text", 2, hash_fn="sha1")
    with pytest.raises(ValueError, match="hash_fn"):
        _shingle_hashes(F.col("text"), 4, "char", hash_fn="sha1")


def test_block_size_guard_raises(records):
    # 'records' has a 3-record block; a cap of 2 must trip the guard
    with pytest.raises(ValueError, match="max_block_size"):
        blocked_candidate_pairs(records, ["nat", "band"], max_block_size=2)


def test_candidate_volume_guard_raises(records):
    # total pairs = C(3,2) = 3 in the shared fixture; cap at 2
    with pytest.raises(ValueError, match="max_candidate_pairs"):
        blocked_candidate_pairs(
            records, ["nat", "band"], max_candidate_pairs=2
        )


def test_guards_disabled_passthrough(records):
    pairs = blocked_candidate_pairs(
        records, ["nat", "band"], max_block_size=None,
        max_candidate_pairs=None, max_distance=1,
    )
    assert pairs.count() > 0
