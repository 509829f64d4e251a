"""Benchmark decontamination (operators/decontaminate.py): word-n-gram
overlap against a small broadcast benchmark set."""

from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators import decontaminate


def _dfs(spark):
    docs = spark.createDataFrame(
        [("d1", "the quick brown fox jumps over the lazy dog"),
         ("d2", "a completely different sentence about weather patterns"),
         ("d3", "THE QUICK BROWN FOX jumps over something else entirely"),
         ("d4", None),
         ("d5", "too short")],
        "doc_id string, text string")
    bench = spark.createDataFrame(
        [("b1", "quiz question: the quick brown fox jumps over what"),
         ("b2", "unrelated benchmark prompt with unique vocabulary")],
        "bench_id string, text string")
    return docs, bench


def test_contamination_pairs_and_case_insensitivity(spark):
    docs, bench = _dfs(spark)
    got = {(r.doc_id, r.bench_id): r.n_shared for r in
           decontaminate.contamination_pairs(
               docs, bench, "text", "doc_id", bench_id_col="bench_id",
               n=5).collect()}
    # d1 shares the 5-grams of "the quick brown fox jumps" + "quick brown
    # fox jumps over" with b1; d3 matches case-insensitively
    assert ("d1", "b1") in got and got[("d1", "b1")] == 2
    assert ("d3", "b1") in got and got[("d3", "b1")] == 2
    assert not any(b == "b2" for _d, b in got)


def test_decontaminate_drops_only_contaminated(spark):
    docs, bench = _dfs(spark)
    kept = {r.doc_id for r in decontaminate.decontaminate(
        docs, bench, "text", "doc_id", bench_id_col="bench_id",
        n=5).collect()}
    # NULL and short texts can never contaminate and must survive
    assert kept == {"d2", "d4", "d5"}


def test_min_shared_threshold(spark):
    docs, bench = _dfs(spark)
    got = decontaminate.contamination_pairs(
        docs, bench, "text", "doc_id", bench_id_col="bench_id",
        n=5, min_shared=3)
    assert got.count() == 0  # max overlap is 2 shingles


def test_matches_python_reference(spark):
    import random
    rnd = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]

    def sent(k):
        return " ".join(rnd.choice(vocab) for _ in range(k))

    docs = [(f"d{i}", sent(rnd.randint(3, 25))) for i in range(60)]
    bench = [(f"b{i}", sent(rnd.randint(5, 15))) for i in range(8)]
    n = 4

    def shingles(t):
        toks = t.lower().split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    expect = {}
    for did, dt in docs:
        for bid, bt in bench:
            k = len(shingles(dt) & shingles(bt))
            if k >= 1:
                expect[(did, bid)] = k

    ddf = spark.createDataFrame(docs, "doc_id string, text string")
    bdf = spark.createDataFrame(bench, "bench_id string, text string")
    got = {(r.doc_id, r.bench_id): r.n_shared for r in
           decontaminate.contamination_pairs(
               ddf, bdf, "text", "doc_id", bench_id_col="bench_id",
               n=n).collect()}
    assert got == expect


def test_broadcast_plan(spark):
    docs, bench = _dfs(spark)
    pairs = decontaminate.contamination_pairs(
        docs, bench, "text", "doc_id", bench_id_col="bench_id", n=5)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_x_decontaminate_dsl(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    docs, bench = _dfs(spark)
    rs = {"type": "object", "properties": {"text": {
        "type": "string",
        "x-decontaminate": {"id": "doc_id", "bench": "eval_set", "n": 5}}}}
    compiled = compile_ruleset(rs, docs.schema, name="docs")
    assert compiled.table_checks[0][0] == "decontaminate"
    res = validate_with_table_checks(
        docs, compiled, row_id="doc_id", dims={"eval_set": bench.withColumnRenamed("bench_id", "doc_id")})
    rows = [r for r in res.violations.collect()
            if r.keyword == "decontaminate"]
    assert {r.row_id for r in rows} == {"d1", "d3"}
    assert all(r.actual == "b1" for r in rows)
    assert "5-gram" in rows[0].message


def test_x_decontaminate_missing_bench_is_routing_artifact(spark):
    from remark_lint_frontmatter_schema_spark.plans.routing import (
        route_and_validate)
    docs, _bench = _dfs(spark)
    docs = docs.withColumn("ruleset_id", F.lit("rs"))
    reg = {"rs": {"type": "object", "properties": {"text": {
        "x-decontaminate": {"id": "doc_id", "bench": "eval_set"}}}}}
    rep = route_and_validate(docs, row_id="doc_id", registry=reg,
                             ruleset_col="ruleset_id")
    assert any(stage == "table-check" and "eval_set" in msg
               for _n, stage, msg in rep.errors)


def test_x_decontaminate_malformed_rejected(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError)
    import pytest as _pt
    docs, _ = _dfs(spark)
    for bad in ({"x-decontaminate": {"bench": "b"}},        # id missing
                {"x-decontaminate": {"id": "doc_id", "bench": "b",
                                     "n": 0}}):
        with _pt.raises(RulesetCompileError):
            compile_ruleset({"type": "object", "properties": {
                "text": {"type": "string", **bad}}},
                docs.schema, name="docs")


def test_bloom_path_matches_broadcast_path(spark):
    """use_bloom=True must return EXACTLY the broadcast path's pairs
    (Bloom false positives die at the exact join), with the bench side
    joined un-broadcast and the corpus prefiltered map-side."""
    docs, bench = _dfs(spark)
    kw = dict(bench_id_col="bench_id", n=5)
    a = sorted(map(tuple, decontaminate.contamination_pairs(
        docs, bench, "text", "doc_id", **kw).collect()))
    b = sorted(map(tuple, decontaminate.contamination_pairs(
        docs, bench, "text", "doc_id", use_bloom=True, n_items_hint=64,
        **kw).collect()))
    assert a == b and a
    plan = decontaminate.contamination_pairs(
        docs, bench, "text", "doc_id", use_bloom=True, n_items_hint=64,
        **kw)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan          # the Bloom prefilter stage


def test_x_decontaminate_bloom_param(spark):
    from remark_lint_frontmatter_schema_spark import compile_ruleset
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        validate_with_table_checks)
    docs, bench = _dfs(spark)
    rs = {"type": "object", "properties": {"text": {
        "x-decontaminate": {"id": "doc_id", "bench": "eval",
                            "bench_id_col": "bench_id", "n": 5,
                            "bloom": True, "n_items": 64}}}}
    compiled = compile_ruleset(rs, docs.schema, name="docs")
    (_k, _c, params), = compiled.table_checks
    assert params["bloom"] is True and params["n_items"] == 64
    res = validate_with_table_checks(docs, compiled, row_id="doc_id",
                                     dims={"eval": bench})
    assert {r.row_id for r in res.violations.collect()} == {"d1", "d3"}
