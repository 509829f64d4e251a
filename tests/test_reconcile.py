"""Aggregate reconciliation: report, violations, x-reconcile DSL."""

import pytest
from pyspark.sql import functions as F

from remark_lint_frontmatter_schema_spark.operators.reconcile import (
    reconcile, reconcile_violations)


@pytest.fixture()
def tables(spark):
    fact = spark.createDataFrame(
        [(1, 10.0), (1, 15.0), (2, 7.0), (2, 3.0), (4, 99.0)],
        "k long, v double")
    # key 1 stored correctly, key 2 off by +5, key 3 has no fact rows
    dim = spark.createDataFrame(
        [(1, 25.0), (2, 15.0), (3, 50.0)], "k long, total double")
    return fact, dim


def test_report_statuses(spark, tables):
    fact, dim = tables
    rep = {r.k: r for r in reconcile(
        fact, dim, key="k", fact_value="v", dim_value="total").collect()}
    assert rep[1].status == "ok" and rep[1].diff == 0.0
    assert rep[2].status == "mismatch" and rep[2].diff == -5.0
    assert rep[2].actual == 10.0 and rep[2].expected == 15.0
    assert rep[3].status == "missing_fact" and rep[3].actual is None
    assert 4 not in rep  # fact-only keys are x-ref's finding


def test_tolerance_and_aggs(spark, tables):
    fact, dim = tables
    rep = {r.k: r.status for r in reconcile(
        fact, dim, key="k", fact_value="v", dim_value="total",
        tolerance=5.0).collect()}
    assert rep[2] == "ok"  # |diff| == 5.0 is within tolerance (not >)
    cnt_dim = spark.createDataFrame([(1, 2.0), (2, 1.0)],
                                    "k long, n double")
    rep2 = {r.k: r.status for r in reconcile(
        fact, cnt_dim, key="k", fact_value="v", dim_value="n",
        agg="count").collect()}
    assert rep2[1] == "ok" and rep2[2] == "mismatch"
    with pytest.raises(ValueError):
        reconcile(fact, dim, key="k", fact_value="v", dim_value="total",
                  agg="median")
    with pytest.raises(ValueError):
        reconcile(fact, dim, key="k", fact_value="v", dim_value="total",
                  tolerance=-1)


def test_violations_shape_and_on_missing(spark, tables):
    fact, dim = tables
    v = {r.row_id: r for r in reconcile_violations(
        fact, dim, key="k", fact_value="v", dim_value="total").collect()}
    assert set(v) == {"2", "3"}
    m = v["2"]
    assert m.keyword == "x-reconcile"
    assert m.constraint_id == "reconcile:total"
    assert m.message == ("Must reconcile: sum(v) = 10.0, stored 15.0 "
                         "(diff -5.0, tolerance 0.0)")
    assert m.actual == "10.0" and m.expected == ["15.0"]
    assert v["3"].message == "Must reconcile: no fact rows support " \
        "stored 'total'"
    assert v["3"].actual is None
    ign = reconcile_violations(
        fact, dim, key="k", fact_value="v", dim_value="total",
        on_missing="ignore").collect()
    assert [r.row_id for r in ign] == ["2"]
    with pytest.raises(ValueError):
        reconcile_violations(fact, dim, key="k", fact_value="v",
                             dim_value="total", on_missing="bogus")


def test_x_reconcile_declarative(spark, tables):
    from remark_lint_frontmatter_schema_spark.operators.table_checks import (
        table_check_violations)
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        compile_ruleset)
    fact, dim = tables
    doc = {"type": "object", "properties": {
        "k": {"type": "integer"},
        "total": {"type": "number",
                  "x-reconcile": {"fact": "lines", "key": "k",
                                  "fact_value": "v"}}}}
    compiled = compile_ruleset(doc, dim.schema, name="recon")
    assert [(k, c) for k, c, _ in compiled.table_checks] == \
        [("reconcile", "total")]
    out = table_check_violations(dim, compiled, row_id="k",
                                 dims={"lines": fact})
    assert sorted(r.row_id for r in out.collect()) == ["2", "3"]
    # missing fact table -> artifact callback, check skipped
    missing = []
    out2 = table_check_violations(dim, compiled, row_id="k", dims={},
                                  on_missing_dim=missing.append)
    assert missing == ["lines"] and out2 is None


def test_x_reconcile_guards(spark, tables):
    from remark_lint_frontmatter_schema_spark.plans.compiler import (
        RulesetCompileError, compile_ruleset)
    _, dim = tables
    with pytest.raises(RulesetCompileError):
        compile_ruleset({"properties": {"total": {
            "x-reconcile": {"fact": "f", "key": "k"}}}},  # no fact_value
            dim.schema, name="bad")
    # non-numeric dim column -> unknown, not a table check
    dim2 = dim.withColumn("total_s", F.col("total").cast("string"))
    c = compile_ruleset({"properties": {"total_s": {
        "x-reconcile": {"fact": "f", "key": "k", "fact_value": "v"}}}},
        dim2.schema, name="t")
    assert ("/total_s", "x-reconcile") in c.unknown
    assert not c.table_checks


def test_null_stored_fails_closed(spark):
    fact = spark.createDataFrame([(1, 10.0), (2, 5.0)], "k long, v double")
    dim = spark.createDataFrame([(1, None), (2, 5.0)],
                                "k long, total double")
    rep = {r.k: r.status for r in reconcile(
        fact, dim, key="k", fact_value="v", dim_value="total").collect()}
    assert rep == {1: "null_stored", 2: "ok"}
    v = reconcile_violations(fact, dim, key="k", fact_value="v",
                             dim_value="total").collect()
    assert len(v) == 1 and v[0].row_id == "1"
    assert v[0].message == ("Must reconcile: stored 'total' is NULL/NaN "
                            "(nothing to reconcile against)")
