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


# --- x-dedup / x-langid DSL integration ------------------------------------

def _docs_df(spark):
    return spark.createDataFrame(
        [("a", "the quick brown fox jumps over the lazy dog today", "en"),
         ("b", "the quick brown fox jumps over the lazy dog today", "en"),
         ("c", "the quick brown fox jumps over the lazy dog zzzzz", "en"),
         ("d", "der schnelle braune fuchs springt und der hund ist faul", "en"),
         ("e", "le renard brun rapide saute et le chien est paresseux", "fr"),
         ("f", None, "en")],
        "doc_id string, text string, lang string")


def _compile(spark, schema_for_text):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    df = _docs_df(spark)
    return df, compile_ruleset(
        {"type": "object", "properties": {"text": schema_for_text}},
        df.schema, name="docs")


def test_dedup_violations_exact(spark):
    got = clusters.dedup_violations(_docs_df(spark), "text", "doc_id")
    rows = {r.row_id: r for r in got.collect()}
    # only the NON-canonical twin violates; NULL text is never a duplicate
    assert set(rows) == {"b"}
    assert rows["b"].actual == "a"
    assert rows["b"].message == (
        "Must be unique content (exact sha256 match): duplicate of `a`")
    assert rows["b"].keyword == "dedup"


def test_dedup_violations_jaccard_transitive(spark):
    # a~b exact, b~c near (one token differs): one cluster {a,b,c};
    # survivors = min id only
    got = clusters.dedup_violations(
        _docs_df(spark), "text", "doc_id", method="jaccard",
        block_col="lang", threshold=0.5)
    assert {r.row_id for r in got.collect()} == {"b", "c"}


def test_dedup_violations_jaccard_requires_block(spark):
    with pytest.raises(ValueError, match="block_col"):
        clusters.dedup_violations(_docs_df(spark), "text", "doc_id",
                                  method="jaccard").collect()


def test_x_dedup_compiles_to_table_check(spark):
    df, compiled = _compile(spark, {
        "type": "string", "x-dedup": {"id": "doc_id", "method": "jaccard",
                                      "block": "lang", "threshold": 0.5}})
    assert compiled.table_checks == [
        ("dedup", "text", {"id": "doc_id", "method": "jaccard",
                           "block": "lang", "n": 3, "threshold": 0.5,
                           "max_distance": 3, "severity": "warning"})]
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    res = validate_with_table_checks(df, compiled, row_id="doc_id")
    assert {r.row_id for r in res.violations.collect()} == {"b", "c"}


def test_x_dedup_nested_is_unknown(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    df = _docs_df(spark)
    schema = {"type": "object", "properties": {"text": {
        "type": "string",
        "anyOf": [{"x-dedup": {"id": "doc_id"}}, {"minLength": 1}]}}}
    compiled = compile_ruleset(schema, df.schema, name="docs")
    assert not compiled.table_checks
    # surfaced via the composition-probe path as a dropped declaration
    assert any(kw.startswith("x-dedup") for _p, kw in compiled.unknown)


def test_x_langid_flags_mismatch_only(spark):
    df, compiled = _compile(spark, {
        "type": "string", "x-langid": {"declared": "lang", "min_tokens": 3}})
    from remark_lint_frontmatter_schema_spark import validate
    res = validate(df, compiled, row_id="doc_id")
    rows = {r.row_id: r for r in res.violations.collect()}
    # d: German text declared en -> violation with detected lang as actual;
    # e: French declared fr -> consistent; f: NULL text -> skipped
    assert set(rows) == {"d"}
    assert rows["d"].actual == "de"
    assert rows["d"].keyword == "x-langid"
    assert "lang" in compiled.columns_read


def test_x_langid_min_tokens_guard(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset, validate
    df = spark.createDataFrame([("a", "der und", "en")],
                               "doc_id string, text string, lang string")
    rs = {"type": "object", "properties": {"text": {
        "type": "string", "x-langid": {"declared": "lang",
                                       "min_tokens": 5}}}}
    compiled = compile_ruleset(rs, df.schema, name="docs")
    assert validate(df, compiled, row_id="doc_id").violations.count() == 0


def test_x_langid_missing_declared_column_surfaces(spark):
    df, compiled = _compile(spark, {
        "type": "string", "x-langid": {"declared": "no_such_col"}})
    assert any(kw == "x-langid:no_such_col" for _p, kw in compiled.unknown)
    assert not any(c.keyword == "x-langid" for c in compiled.checks)


def test_x_dedup_x_langid_malformed_rejected(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    df = _docs_df(spark)
    for bad in ({"x-dedup": {"method": "exact"}},          # id missing
                {"x-dedup": {"id": "doc_id", "method": "nope"}},
                {"x-langid": {}},                           # declared missing
                {"x-langid": {"declared": "lang", "min_tokens": -1}}):
        with pytest.raises(RulesetCompileError):
            compile_ruleset(
                {"type": "object",
                 "properties": {"text": {"type": "string", **bad}}},
                df.schema, name="docs")
