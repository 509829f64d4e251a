"""Composition keywords respect Ajv presence semantics: an absent
(NULL) property never fires anyOf/oneOf/not — only the parent's
`required` can complain about absence (index.ts semantics: Ajv skips
value keywords on missing properties)."""

import pyspark.sql.types as T

from remark_lint_frontmatter_schema_spark import compile_ruleset, validate

SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("size", T.IntegerType()),
    T.StructField("kind", T.StringType()),
    T.StructField("brand", T.StringType()),
])

RULESET = {
    "type": "object",
    "properties": {
        "size": {"anyOf": [{"maximum": 10}, {"minimum": 40}]},
        "kind": {"oneOf": [{"pattern": "COPPER$"}, {"pattern": "^PROMO"}]},
        "brand": {"not": {"enum": ["bad"]}},
    },
}


def _violations(spark, row):
    df = spark.createDataFrame([row], SCHEMA)
    compiled = compile_ruleset(RULESET, df.schema, name="comp")
    return {
        (v.constraint_id, v.keyword)
        for v in validate(df, compiled, row_id="id").violations.collect()
    }


def test_null_property_fires_nothing(spark):
    assert _violations(spark, ("r0", None, None, None)) == set()


def test_anyof_fires_between_bounds(spark):
    assert _violations(spark, ("r1", 20, "X COPPER", "ok")) == {
        ("comp:/size:anyOf", "anyOf")}


def test_oneof_fires_on_zero_and_two_matches(spark):
    assert _violations(spark, ("r2", 5, "STANDARD TIN", "ok")) == {
        ("comp:/kind:oneOf", "oneOf")}
    assert _violations(spark, ("r3", 45, "PROMO COPPER", "ok")) == {
        ("comp:/kind:oneOf", "oneOf")}


def test_not_fires_only_on_present_match(spark):
    assert _violations(spark, ("r4", 5, "X COPPER", "bad")) == {
        ("comp:/brand:not", "not")}


def test_malformed_subtree_under_absent_column_fails_compile(spark):
    """Ajv compiles the full schema: `enum: []` must fail even when the
    property's column does not exist in the table (verify-drive finding)."""
    import pytest as _pytest
    from remark_lint_frontmatter_schema_spark.plans.bundler import (
        RulesetCompileError)
    df = spark.createDataFrame([("a",)], "id string")
    for bad in (
        {"properties": {"ghost": {"enum": []}}},
        {"anyOf": [{"properties": {"x": {"maxLength": "nope"}}}]},
        {"$defs": {"d": {"pattern": 123}}},
    ):
        with _pytest.raises(RulesetCompileError):
            compile_ruleset(bad, df.schema, name="bad")


def test_ajv_options_analog(spark):
    """`options` mirrors Settings.ajvOptions (index.ts:49): strict makes
    unknown keywords fatal; all_errors=False keeps one violation per row."""
    import pytest as _pytest
    from remark_lint_frontmatter_schema_spark.plans.bundler import (
        RulesetCompileError)
    df = spark.createDataFrame([("a", None, "zz", "bad")],
                               "id string, size int, kind string, brand string")
    with _pytest.raises(RulesetCompileError):
        compile_ruleset({"properties": {"kind": {"frobnicate": 1}}},
                        df.schema, options={"strict": True})
    with _pytest.raises(RulesetCompileError):
        compile_ruleset({}, df.schema, options={"nope": 1})

    multi = {"properties": {"kind": {"minLength": 3, "pattern": "^a"}},
             "required": ["size"]}
    c_all = compile_ruleset(multi, df.schema, name="m")
    c_one = compile_ruleset(multi, df.schema, name="m",
                            options={"all_errors": False})
    res_all = validate(df, c_all, row_id="id")
    res_one = validate(df, c_one, row_id="id")
    assert res_all.violations.count() == 3
    assert res_one.violations.count() == 1
    v_all = res_all.verdicts.collect()[0]
    v_one = res_one.verdicts.collect()[0]
    assert v_all.n_violations == 3 and v_one.n_violations == 1
    assert v_all.n_failed_rows == v_one.n_failed_rows == 1
