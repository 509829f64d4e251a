"""Composite-key uniqueness (root x-unique list) + Benford MAD gate."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators.drift import (
    benford_violations)
from remark_lint_frontmatter_schema_spark.operators.uniqueness import (
    duplicate_keys_multi, uniqueness_violations_multi)
from remark_lint_frontmatter_schema_spark.plans.compiler import (
    RulesetCompileError, compile_ruleset)


@pytest.fixture()
def pairs(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "a"), (2, "a"),
            (None, "a"), (3, None)]
    return spark.createDataFrame(rows, "k1 int, k2 string")


def test_duplicate_keys_multi(spark, pairs):
    got = {(r.k1, r.k2): r.n_occurrences
           for r in duplicate_keys_multi(pairs, ["k1", "k2"]).collect()}
    assert got == {(1, "a"): 2, (2, "a"): 3}  # NULL components excluded
    with pytest.raises(ValueError):
        duplicate_keys_multi(pairs, ["k1"])


def test_uniqueness_violations_multi_shape(spark, pairs):
    v = {r.row_id: r for r in uniqueness_violations_multi(
        pairs, ["k1", "k2"]).collect()}
    assert set(v) == {"1|a", "2|a"}
    r = v["2|a"]
    assert r.constraint_id == "unique:(k1, k2)"
    assert r.message == "Must be unique: (k1, k2) occurs 3 times"
    assert r.instance_path == "/k1/k2"


def test_root_x_unique_list_dsl(spark, pairs):
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        table_check_violations)
    df = pairs.withColumn("rid", F.monotonically_increasing_id())
    doc = {"type": "object", "x-unique": ["k1", "k2"],
           "properties": {"k1": {"type": "integer"}}}
    compiled = compile_ruleset(doc, df.schema, name="cu")
    assert [(k, p["keys"]) for k, _, p in compiled.table_checks] == \
        [("unique_multi", ["k1", "k2"])]
    out = table_check_violations(df, compiled, row_id="rid")
    assert sorted(r.row_id for r in out.collect()) == ["1|a", "2|a"]
    # unknown column in the key tuple -> unknown, never a silent pass
    c2 = compile_ruleset({"x-unique": ["k1", "nope"]}, df.schema,
                         name="cu2")
    assert ("", "x-unique") in c2.unknown and not c2.table_checks
    # non-root list -> unknown
    c3 = compile_ruleset({"properties": {"k1": {
        "x-unique": ["k1", "k2"]}}}, df.schema, name="cu3")
    assert ("/k1", "x-unique") in c3.unknown
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"x-unique": ["k1", "k1"]}, df.schema, name="bad")
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"x-unique": ["k1"]}, df.schema, name="bad")


def test_benford_gate(spark):
    import numpy as np
    rng = np.random.default_rng(3)
    nat = spark.createDataFrame(
        [(float(10 ** u),) for u in rng.uniform(0, 4, 3000)], "v double")
    assert benford_violations(nat, "v", max_mad=0.02).collect() == []
    fab = spark.createDataFrame([(5000.0 + i,) for i in range(2000)],
                                "v double")
    v = benford_violations(fab, "v", max_mad=0.015).collect()
    assert len(v) == 1
    assert v[0].keyword == "x-benford"
    assert "(limit 0.015)" in v[0].message
    assert float(v[0].actual) > 0.05
    with pytest.raises(ValueError):
        benford_violations(fab, "v", max_mad=0)


def test_x_benford_dsl(spark):
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        table_check_violations)
    df = spark.createDataFrame([(float(5000 + i),) for i in range(500)],
                               "v double") \
        .withColumn("rid", F.monotonically_increasing_id())
    doc = {"type": "object", "properties": {"v": {
        "type": "number", "x-benford": {"max_mad": 0.01}}}}
    compiled = compile_ruleset(doc, df.schema, name="bf")
    out = table_check_violations(df, compiled, row_id="rid").collect()
    assert len(out) == 1 and out[0].keyword == "x-benford"
    # non-numeric -> unknown
    df2 = df.withColumn("s", F.lit("x"))
    c2 = compile_ruleset({"properties": {"s": {"x-benford": {}}}},
                         df2.schema, name="bf2")
    assert ("/s", "x-benford") in c2.unknown
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"properties": {"v": {
            "x-benford": {"max_mad": -1}}}}, df.schema, name="bad")


def test_benford_gate_fails_closed_on_empty(spark):
    df = spark.createDataFrame([(0.0,), (None,)], "v double")
    v = benford_violations(df, "v", max_mad=0.015).collect()
    assert len(v) == 1 and v[0].actual is None
    assert "no measurable first digits" in v[0].message
