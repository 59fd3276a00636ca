"""Connected components vs a driver-side union-find oracle."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from inferdb_spark.operators.graph import connected_components, dedup_clusters


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node id per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def test_connected_components_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(nodes, edges + [(n, n) for n in nodes])

    edf = spark.createDataFrame(
        edges + [(n, n) for n in nodes], "src int, dst int"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edf, "src", "dst").collect()
    }
    assert got == expected


def test_connected_components_long_chain_converges(spark):
    # path graph 0-1-2-...-63: worst case for naive propagation (diameter 63);
    # path halving must still converge within max_iters=50
    edges = [(i, i + 1) for i in range(63)]
    edf = spark.createDataFrame(edges, "src int, dst int")
    got = connected_components(edf, "src", "dst").collect()
    assert len(got) == 64
    assert {r["component"] for r in got} == {0}


def test_dedup_clusters_assigns_singletons(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a int, id_b int")
    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id int")
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup_clusters(pairs, ids, "doc_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}
    reps = [d for d, c in got.items() if d == c]
    assert sorted(reps) == [1, 10, 99]


def test_pagerank_integer_properties(spark):
    # star graph: hub receives all mass; ranks deterministic across runs
    from inferdb_spark.operators.graph import pagerank_integer
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 9)] + [(0, i) for i in range(1, 9)],
        "src long, dst long",
    )
    r1 = {r["node"]: r["rank_micro"] for r in pagerank_integer(edges, 4).collect()}
    r2 = {r["node"]: r["rank_micro"] for r in pagerank_integer(edges, 4).collect()}
    assert r1 == r2  # bit-reproducible
    assert r1[0] > r1[1]  # hub dominates
    assert len({r1[i] for i in range(1, 9)}) == 1  # leaves symmetric


def test_star_cc_matches_label_propagation_random_graphs(spark):
    # property: large-star/small-star and min-label propagation compute the
    # same (node, component) relation on arbitrary graphs
    from inferdb_spark.operators.graph import connected_components_star

    for seed, n_nodes, n_edges in [(3, 60, 30), (11, 80, 120), (23, 50, 200)]:
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        rows = edges + [(n, n) for n in range(n_nodes)]
        edf = spark.createDataFrame(rows, "src int, dst int")
        lp = {
            r["node"]: r["component"]
            for r in connected_components(edf, "src", "dst").collect()
        }
        star = {
            r["node"]: r["component"]
            for r in connected_components_star(edf, "src", "dst").collect()
        }
        assert star == lp, f"seed={seed}"


def test_star_cc_long_chain(spark):
    from inferdb_spark.operators.graph import connected_components_star

    edges = [(i, i + 1) for i in range(63)]
    edf = spark.createDataFrame(edges, "src int, dst int")
    got = connected_components_star(edf, "src", "dst").collect()
    assert len(got) == 64
    assert {r["component"] for r in got} == {0}
