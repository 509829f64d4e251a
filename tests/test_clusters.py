"""Connected-components duplicate clustering (operators/clusters.py).

Correctness model: a pure-Python union-find over the same pairs — the
algorithm under test (alternating large-star/small-star) must reproduce
exact component minima on structured worst cases (chains = maximum
diameter, rings = cycles) and on a seeded random graph.

The chain test doubles as the lineage-truncation regression: without the
per-round localCheckpoint the 40-node chain OOMs the JVM on plan analysis
alone (each star round self-joins, quadrupling the logical plan).
"""

import random

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators import clusters, dedup


def _union_find(n_nodes, edges):
    parent = {i: i for i in n_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for x in n_nodes:
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comp.values() for x in members}


def _pairs_df(spark, edges):
    return spark.createDataFrame(edges, "id_a string, id_b string")


def test_chain_converges_to_single_component(spark):
    # a chain is the maximum-diameter graph: label propagation would need
    # n rounds; star rounds must close it in O(log n)
    ids = [f"n{i:02d}" for i in range(40)]
    edges = list(zip(ids, ids[1:]))
    got = {(r.node, r.component) for r in
           clusters.connected_components(_pairs_df(spark, edges)).collect()}
    assert got == {(i, "n00") for i in ids}


def test_rings_and_isolated_pairs(spark):
    ring = [(f"r{i}", f"r{(i + 1) % 6}") for i in range(6)]
    pair = [("x2", "x1")]
    got = {(r.node, r.component) for r in
           clusters.connected_components(
               _pairs_df(spark, ring + pair)).collect()}
    expect = {(f"r{i}", "r0") for i in range(6)} | {("x1", "x1"),
                                                    ("x2", "x1")}
    assert got == expect


def test_random_graph_matches_union_find(spark):
    rnd = random.Random(7)
    ids = [f"d{i:03d}" for i in range(120)]
    edges = [(rnd.choice(ids), rnd.choice(ids)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    got = {(r.node, r.component) for r in
           clusters.connected_components(_pairs_df(spark, edges)).collect()}
    touched = {x for e in edges for x in e}
    expect = set(_union_find(touched, edges).items())
    assert got == expect


def test_null_and_self_pairs_dropped(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("c", "c"), (None, "d"), ("e", None)],
        "id_a string, id_b string")
    got = {(r.node, r.component) for r in
           clusters.connected_components(df).collect()}
    assert got == {("a", "a"), ("b", "a")}


def test_duplicate_clusters_labels_every_document(spark):
    docs = spark.createDataFrame([(f"d{i}",) for i in range(8)],
                                 "doc_id string")
    pairs = _pairs_df(spark, [("d1", "d3"), ("d3", "d5"), ("d6", "d7")])
    rows = clusters.duplicate_clusters(docs, pairs, "doc_id").collect()
    got = {r.doc_id: (r.cluster_id, r.cluster_size) for r in rows}
    assert got == {
        "d0": ("d0", 1), "d2": ("d2", 1), "d4": ("d4", 1),
        "d1": ("d1", 3), "d3": ("d1", 3), "d5": ("d1", 3),
        "d6": ("d6", 2), "d7": ("d6", 2),
    }


def test_cluster_dedup_keeps_representatives_and_singletons(spark):
    docs = spark.createDataFrame([(f"d{i}", f"text {i}") for i in range(6)],
                                 "doc_id string, text string")
    pairs = _pairs_df(spark, [("d0", "d1"), ("d1", "d2"), ("d4", "d5")])
    kept = {r.doc_id for r in
            clusters.cluster_dedup(docs, pairs, "doc_id").collect()}
    assert kept == {"d0", "d3", "d4"}


def test_empty_pairs_all_singletons(spark):
    docs = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    pairs = spark.createDataFrame([], "id_a string, id_b string")
    rows = clusters.duplicate_clusters(docs, pairs, "doc_id").collect()
    assert {(r.doc_id, r.cluster_id, r.cluster_size) for r in rows} \
        == {("a", "a", 1), ("b", "b", 1)}
    assert clusters.connected_components(pairs).count() == 0


def test_nonconvergence_raises(spark):
    pairs = _pairs_df(spark, [(f"n{i:02d}", f"n{i + 1:02d}")
                              for i in range(12)])
    with pytest.raises(RuntimeError, match="did not converge"):
        clusters.connected_components(pairs, max_iter=1)


def test_no_persist_registry_leak(spark):
    # clusters uses localCheckpoint + ContextCleaner, never the dedup
    # persist registry — repeated calls must not accumulate handles there
    before = len(dedup._PERSISTED)
    pairs = _pairs_df(spark, [("a", "b"), ("b", "c")])
    clusters.connected_components(pairs).count()
    assert len(dedup._PERSISTED) == before
